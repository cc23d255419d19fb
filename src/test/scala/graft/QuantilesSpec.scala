package graft

import org.apache.spark.sql.functions._
import graft.operators.{Feature, Histogram, Profile, Quantiles}

/** The scale-safe percentile family (round-7 audit item #1): exact
  * `percentile_disc` semantics with NO per-group ordered-set buffer in
  * the plan. Equivalence is asserted against the buffered forms on
  * tie-heavy data (the case where disc-percentile definitions diverge
  * fastest), and the plan contract — no PercentileDisc aggregate, no
  * SinglePartition window — is asserted on the physical plan string.
  */
class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  // tie-heavy, multi-key, null-bearing frame: 3 keys × values drawn from
  // a small domain so every percentile pick lands on a tie run
  private lazy val tied = {
    val rows = for {
      k <- Seq("a", "b", "c")
      i <- 0 until 200
    } yield (k, Some(((i * 7919 + k.hashCode.abs) % 13).toLong * 10L))
    (rows :+ (("a", Option.empty[Long]))).toDF("k", "v")
      .repartition(5)
  }

  test("histPercentiles == buffered percentile_disc on tie-heavy data") {
    val got = Quantiles.histPercentiles(
      tied, Seq("k"), col("v"),
      Seq(("p10", 1L, 10L), ("p50", 1L, 2L), ("p90", 9L, 10L)))
    val want = tied.filter(col("v").isNotNull).groupBy("k").agg(
      count(lit(1)).as("n"),
      expr("percentile_disc(0.1) WITHIN GROUP (ORDER BY v)").cast("long").as("p10"),
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY v)").cast("long").as("p50"),
      expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY v)").cast("long").as("p90"))
    val g = got.select("k", "n", "p10", "p50", "p90")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val w = want.select("k", "n", "p10", "p50", "p90")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(g == w, s"hist form diverged from buffered form:\n$g\n$w")
  }

  test("histPercentiles boundary rationals: p=1 is the max, p→0+ is the min") {
    val df = Seq(("k", 1L), ("k", 2L), ("k", 3L)).toDF("k", "v")
    val got = Quantiles.histPercentiles(df, Seq("k"), col("v"),
        Seq(("lo", 1L, 1000000L), ("hi", 1L, 1L)))
      .select("lo", "hi").as[(Long, Long)].collect().head
    assert(got == ((1L, 3L)), s"rational boundary picks wrong: $got")
  }

  test("histPercentiles plan: no ordered-set buffer, no single-partition window, 2 shuffles") {
    val plan = Quantiles.histPercentiles(
        tied, Seq("k"), col("v"), Seq(("p50", 1L, 2L)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("percentile_disc") && !plan.contains("PercentileDisc"),
      s"ordered-set aggregate leaked into the scale-safe plan:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"single-partition stage in the grouped-percentile plan:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles <= 2,
      s"expected ≤2 keyed exchanges (hist agg + window; final agg reuses), got $shuffles:\n$plan")
  }

  test("madRobustHist == Profile.madRobust (buffered) including ties") {
    val got = Quantiles.madRobustHist(tied, "k", col("v"))
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val want = Profile.madRobust(tied, "k", col("v"))
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == want, s"hist MAD diverged from buffered MAD:\n$got\n$want")
    val plan = Quantiles.madRobustHist(tied, "k", col("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("percentile_disc") && !plan.contains("PercentileDisc"),
      s"ordered-set aggregate leaked into madRobustHist:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"single-partition stage in madRobustHist:\n$plan")
  }

  test("equiDepthSampled at rate 1.0 == equiDepth; deterministic across invocations") {
    val df = (1 to 400).map(v => (v.toLong, v.toDouble)).toDF("id", "x")
    val full = Histogram.equiDepth(df, "x", buckets = 8)
      .as[(Long, Long)].collect().toMap
    val sampled = Histogram.equiDepthSampled(df, "x", 8, col("id"), rate = 1.0)
      .as[(Long, Long)].collect().toMap
    assert(sampled == full, "rate=1.0 must reproduce the unsampled histogram")
    val a = Histogram.equiDepthSampled(df, "x", 8, col("id"), 0.3, "s1")
      .as[(Long, Long)].collect().toMap
    val b = Histogram.equiDepthSampled(df, "x", 8, col("id"), 0.3, "s1")
      .as[(Long, Long)].collect().toMap
    assert(a == b, "md5 draw must make the sampled histogram reproducible")
    assert(a.values.sum == 400L, "counts still cover the FULL table, only bounds are sampled")
  }

  test("winsorizeSampled: full-table rows pass through, bounds from the sample only") {
    val df = (1 to 200).map(v => (v.toLong, v.toDouble)).toDF("id", "x")
    val got = Feature.winsorizeSampled(df, "x", 0.05, 0.95, col("id"), rate = 1.0)
      .select("x", "clipped").as[(Double, Double)].collect()
    val want = Feature.winsorize(df, "x", 0.05, 0.95)
      .select("x", "clipped").as[(Double, Double)].collect()
    assert(got.sortBy(_._1).toSeq == want.sortBy(_._1).toSeq,
      "rate=1.0 winsorizeSampled must equal winsorize")
    // at rate<1 every input row still appears exactly once
    val n = Feature.winsorizeSampled(df, "x", 0.05, 0.95, col("id"), 0.25, "w1").count()
    assert(n == 200L, "sampling affects BOUNDS only, never the clipped row set")
  }

  test("bucketByGroupTerciles: exact rational boundaries, inclusive at t1/t2, per-group independence") {
    import spark.implicits._
    // group a: scores 1..9 → t1 = 3 (cum 3·3 ≥ 9), t2 = 6
    // group b: constant scores → everything is head (t1 = t2 = 5)
    val df = ((1 to 9).map(v => ("a", v.toLong)) ++
      Seq.fill(4)(("b", 5L))).toDF("lang", "score")
    val got = Quantiles.bucketByGroupTerciles(df, "lang", "score")
      .select(col("lang"), col("score"), col("t1"), col("t2"),
        col("bucket"))
      .as[(String, Long, Long, Long, String)].collect()
    val a = got.filter(_._1 == "a").sortBy(_._2)
    assert(a.forall(r => r._3 == 3L && r._4 == 6L), s"bounds: ${a.toSeq}")
    assert(a.map(_._5).toSeq == Seq("head", "head", "head",
      "middle", "middle", "middle", "tail", "tail", "tail"),
      s"score==t1 is head, score==t2 is middle (inclusive): ${a.toSeq}")
    val b = got.filter(_._1 == "b")
    assert(b.forall(r => r._3 == 5L && r._5 == "head"),
      s"degenerate group: ${b.toSeq}")
  }
}
