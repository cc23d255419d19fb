package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{GroupShare, TopK}

/** W1 dense_rank tie semantics; J3/J4 join-back ≡ window property. */
class OperatorSpec extends SparkSpec {
  import spark.implicits._

  test("W1: dense_rank lets more than K rows survive a boundary tie") {
    // 12 items; counts 12, 11, then ten items tied at 10 -> with k=2 the
    // tie at position 2... use: one at 12, eleven tied at 10, k=2:
    // position 1 (count 12) + eleven rows at position 2 = 12 rows out.
    val rows = ("a", 12L) +: (1 to 11).map(i => (s"t$i", 10L))
    val df = rows.toDF("item", "cnt")
    val out = TopK.denseTopK(df.withColumn("g", lit(1)), Seq("g"), $"cnt".desc, 2)
    assert(out.count() == 12)
    assert(out.filter($"position" === 2).count() == 11)
  }

  test("W1: distinct positions are dense (no gaps after ties)") {
    val df = Seq(("x", 5L), ("y", 5L), ("z", 3L)).toDF("item", "cnt")
    val out = TopK.denseTopK(df.withColumn("g", lit(1)), Seq("g"), $"cnt".desc, 10)
      .select("item", "position").as[(String, Long)].collect().toMap
    assert(out("x") == 1 && out("y") == 1 && out("z") == 2)
  }

  test("J3/J4 property: join-back share == window share on random groups") {
    val genRows = Gen.listOfN(60, for {
      g <- Gen.choose(1, 4)
      z <- Gen.choose(1, 3)
      v <- Gen.choose(1, 1000)
    } yield (s"g$g", s"z$z", v.toLong))
    (0 until 10).foreach { i =>
      val rows = genRows.apply(Gen.Parameters.default, Seed(42L + i)).get
      val df = rows.toDF("g", "z", "v")
      val a = GroupShare.withSharePct(df, Seq("g", "z"), "v", "pct")
        .select("g", "z", "v", "pct")
      val b = GroupShare.withSharePctJoinBack(df, Seq("g", "z"), "v", "pct")
        .select("g", "z", "v", "pct")
      val diff = a.except(b).count() + b.except(a).count()
      assert(diff == 0, s"iteration $i: join-back != window")
    }
  }

  test("shares sum to ~100 within each partition") {
    val df = Seq(("m1", 10L), ("m1", 30L), ("m2", 5L), ("m2", 15L)).toDF("m", "v")
    val sums = GroupShare.withSharePct(df, Seq("m"), "v", "pct")
      .groupBy("m").agg(sum($"pct").as("s")).select("s").as[Double].collect()
    sums.foreach(s => assert(math.abs(s - 100.0) < 1e-9))
  }

  test("asofLeft: inclusive bound, per-key isolation, no-match nulls, atomic right-row carry") {
    import graft.operators.AsofJoin
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      ("A", ts("2024-01-01 10:00:00"), "l-early"),   // before any right row -> nulls
      ("A", ts("2024-01-01 12:00:00"), "l-mid"),     // between r1 and r2 -> r1
      ("A", ts("2024-01-01 13:00:00"), "l-tie"),     // EXACTLY r2's time -> r2 (inclusive)
      ("B", ts("2024-01-01 12:00:00"), "l-otherkey") // B's rows must not see A's
    ).toDF("k", "t", "l_val")
    val right = Seq(
      ("A", ts("2024-01-01 11:00:00"), Some("r1")),
      ("A", ts("2024-01-01 13:00:00"), Option.empty[String]), // null VALUE still a real match
      ("B", ts("2024-01-01 11:30:00"), Some("rB"))
    ).toDF("k", "rt", "r_val")

    val out = AsofJoin.asofLeft(left, right, "k", "t", "rt", Seq("r_val"))
      .select($"l_val", date_format($"asof_time", "HH:mm").as("at"), $"r_val")
      .as[(String, Option[String], Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("l-early") == ((None, None)))
    assert(out("l-mid") == ((Some("11:00"), Some("r1"))))
    // the 13:00 right row matched (inclusive <=) and its null value rode
    // along atomically — NOT spliced with r1's non-null value
    assert(out("l-tie") == ((Some("13:00"), None)))
    assert(out("l-otherkey") == ((Some("11:30"), Some("rB"))))

    // structural guarantee: one keyed window, never a theta/nested-loop join
    val plan = AsofJoin.asofLeft(left, right, "k", "t", "rt", Seq("r_val"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    assert(plan.contains("Window"))
  }
}
