package graft

import org.apache.spark.sql.functions._
import graft.operators.Feature

/** Feature-prep operators: percentile clip, per-group integer scaling,
  * forward fill.
  */
class FeatureSpec extends SparkSpec {
  import spark.implicits._

  test("winsorize clips to discrete percentiles, passes values through bit-identical, keeps nulls null") {
    // 1..20: p(0.1) disc = 2, p(0.9) disc = 18
    val df = (1 to 20).map(i => (i.toLong, Some(i.toDouble))).toDF("id", "v")
      .union(Seq((99L, Option.empty[Double])).toDF("id", "v"))
    val got = Feature.winsorize(df, "v", 0.1, 0.9)
      .select("id", "clipped").as[(Long, Option[Double])].collect().toMap
    assert(got(1L).contains(2.0) && got(2L).contains(2.0), "low tail raised to p10")
    assert(got(19L).contains(18.0) && got(20L).contains(18.0), "high tail lowered to p90")
    assert(got(10L).contains(10.0), "interior untouched")
    assert(got(99L).isEmpty, "null stays null — greatest/least skip nulls unguarded")
  }

  test("scaleMinMax: exact integer permille per group; degenerate group -> 0; null -> null") {
    val df = Seq(
      ("a", 0L), ("a", 25L), ("a", 100L), // permille 0, 250, 1000
      ("b", 7L), ("b", 7L)                // degenerate: max == min
    ).toDF("k", "v")
      .union(Seq(("a", Option.empty[Long])).toDF("k", "v"))
    val got = Feature.scaleMinMax(df, "k", col("v"), den = 1000L)
      .select("k", "v", "scaled")
      .as[(String, Option[Long], Option[Long])].collect().toSet
    assert(got.contains(("a", Some(0L), Some(0L))))
    assert(got.contains(("a", Some(25L), Some(250L))))
    assert(got.contains(("a", Some(100L), Some(1000L))))
    assert(got.contains(("b", Some(7L), Some(0L))), "degenerate group scales to 0")
    assert(got.contains(("a", None, None)), "null value scales to null")
  }

  test("gapFill carries last non-null forward in total order; leading rows stay null; keys isolated") {
    val df = Seq(
      (1L, 1L, Some(10L)), (1L, 2L, None), (1L, 3L, None),
      (1L, 4L, Some(40L)), (1L, 5L, None),
      (2L, 1L, None), (2L, 2L, Some(7L))
    ).toDF("u", "o", "v")
    val got = Feature.gapFill(df.repartition(5), "u", Seq(col("o")), col("v"))
      .select("u", "o", "filled").as[(Long, Long, Option[Long])]
      .collect().map { case (u, o, f) => (u, o) -> f }.toMap
    assert(got((1L, 2L)).contains(10L) && got((1L, 3L)).contains(10L))
    assert(got((1L, 4L)).contains(40L) && got((1L, 5L)).contains(40L))
    assert(got((2L, 1L)).isEmpty, "before the key's first value: null (not cross-key leak)")
    assert(got((2L, 2L)).contains(7L))
  }

  test("densifyDays fills every (key, day) cell over the global range with zeros") {
    val daily = Seq(
      ("a", "2024-01-01", 5L), ("a", "2024-01-04", 2L), // gaps 01-02, 01-03
      ("b", "2024-01-02", 7L)                            // b missing the rest
    ).toDF("k", "day", "n")
    val got = Feature.densifyDays(daily, "k", "day", "n")
      .as[(String, String, Long)].collect().toSet
    val days = Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04")
    assert(got.size == 8, "2 keys x 4 days")
    assert(got == Set(
      ("a", "2024-01-01", 5L), ("a", "2024-01-02", 0L),
      ("a", "2024-01-03", 0L), ("a", "2024-01-04", 2L),
      ("b", "2024-01-01", 0L), ("b", "2024-01-02", 7L),
      ("b", "2024-01-03", 0L), ("b", "2024-01-04", 0L)))
    assert(days.forall(d => got.exists(_._2 == d)))
  }

  test("interpolateLinear: exact integer lerp, no extrapolation, tied-t degenerate span") {
    val df = Seq(
      (1L, 0L, Some(100L)), (1L, 25L, None), (1L, 50L, None), (1L, 100L, Some(300L)),
      (1L, 150L, None), // after last obs -> null
      (2L, 5L, None),   // before first obs -> null
      (2L, 10L, Some(7L))
    ).toDF("u", "t", "v")
    val got = Feature.interpolateLinear(df.repartition(3), "u",
        Seq(col("t")), col("t"), col("v"))
      .select("u", "t", "interp").as[(Long, Long, Option[Long])]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got((1L, 25L)).contains(150L), "100 + 200*25/100")
    assert(got((1L, 50L)).contains(200L))
    assert(got((1L, 100L)).contains(300L), "observations pass through")
    assert(got((1L, 150L)).isEmpty && got((2L, 5L)).isEmpty, "no extrapolation")
    // tied timestamps around a null: prev and next at the same t -> prev value
    val tied = Seq((9L, 10L, 1L, Some(4L)), (9L, 10L, 2L, None), (9L, 10L, 3L, Some(8L)))
      .toDF("u", "t", "o", "v")
    val g2 = Feature.interpolateLinear(tied, "u", Seq(col("t"), col("o")),
        col("t"), col("v"))
      .select("o", "interp").as[(Long, Option[Long])].collect().toMap
    assert(g2(2L).contains(4L), "zero-length span takes prev, never divides by zero")
  }

  test("densifyDays excludes null keys entirely (no zero-faked series, no dropped counts)") {
    val daily = Seq((Some("a"), "2024-01-01", 5L), (None, "2024-01-02", 7L))
      .toDF("k", "day", "n")
    val got = Feature.densifyDays(daily, "k", "day", "n")
      .as[(String, String, Long)].collect().toSet
    // the null-key row must not appear at all — an equi-join scaffold
    // would have emitted a fabricated all-zero series for it while
    // silently dropping the real count of 7
    assert(got == Set(("a", "2024-01-01", 5L)),
      s"null key must be excluded, not zero-faked: $got")
  }

  test("scaleMinMax plans ONE exchange for both min and max windows") {
    val df = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    val plan = Feature.scaleMinMax(df, "k", col("v"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 keyed exchange, got $exchanges:\n$plan")
  }
}
