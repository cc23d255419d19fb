package graft

import org.apache.spark.sql.functions._
import graft.operators.Intervals

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  test("coalesceIntervals merges overlap and touch, splits on gaps") {
    val iv = Seq(
      ("a", 1L, 5L), ("a", 3L, 7L), // overlap → [1,7]
      ("a", 8L, 9L), ("a", 9L, 12L), ("a", 12L, 15L), // chain via touch → [8,15]
      ("a", 20L, 21L), // gap → own span
      ("b", 1L, 2L)).toDF("k", "s", "e")
    val got = Intervals.coalesceIntervals(iv, "k", "s", "e")
      .select("k", "span_seq", "span_start", "span_end", "n_merged")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("a", 1L, 1L, 7L, 2L), ("a", 2L, 8L, 15L, 3L), ("a", 3L, 20L, 21L, 1L),
      ("b", 1L, 1L, 2L, 1L)))
  }

  test("contained intervals and duplicate (start,end) rows stay in one span") {
    val iv = Seq(
      ("k", 1L, 100L), ("k", 10L, 20L), // contained
      ("k", 10L, 20L), ("k", 10L, 20L)).toDF("k", "s", "e") // exact duplicates
    val got = Intervals.coalesceIntervals(iv, "k", "s", "e")
      .select("span_start", "span_end", "n_merged")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 100L, 4L)))
  }

  test("null-bounded intervals are dropped; result is partition-stable") {
    val iv = Seq(
      ("k", Some(1L), Some(3L)), ("k", None, Some(9L)), ("k", Some(5L), None))
      .toDF("k", "s", "e")
    val got = Intervals.coalesceIntervals(iv, "k", "s", "e")
      .select("span_start", "span_end").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L)))

    val big = (0L until 3000L)
      .map(i => (s"k${i % 7}", i % 50, i % 50 + i % 13)).toDF("k", "s", "e")
    val a = Intervals.coalesceIntervals(big, "k", "s", "e")
      .agg(sum("span_start"), sum("span_end"), sum("n_merged")).head.toSeq
    val b = Intervals.coalesceIntervals(big.repartition(17), "k", "s", "e")
      .agg(sum("span_start"), sum("span_end"), sum("n_merged")).head.toSeq
    assert(a == b, "partitioning changed the merge")
  }

  test("both windows run per-key (no SinglePartition exchange)") {
    val iv = (0L until 1000L).map(i => (s"k${i % 5}", i, i + 3)).toDF("k", "s", "e")
    val plan = Intervals.coalesceIntervals(iv, "k", "s", "e")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"global window detected:\n$plan")
  }

  test("concurrency: cross-bucket carry equals the global sweep; inclusive ends; zero-length") {
    // bucket width 10. Intervals: [1,12] spans buckets, [3,4], [4,4]
    // (zero-length), [15,16]. Sweep: t1:1 t3:2 t4:3 t5:1 t13:0 t15:1 t17:0
    val iv = Seq((1L, 12L), (3L, 4L), (4L, 4L), (15L, 16L)).toDF("s", "e")
    val got = Intervals.concurrency(iv.repartition(3), col("s"), col("e"), 10L)
      .select("ts_us", "conc").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 1L,
      13L -> 0L, 15L -> 1L, 17L -> 0L))
    // brute-force cross-check on random intervals: conc at each boundary
    // == count of intervals whose [s, e] covers it
    val rnd = new scala.util.Random(7)
    val ivs = Seq.fill(200)((rnd.nextInt(500).toLong, rnd.nextInt(60).toLong))
      .map { case (s, d) => (s, s + d) }
    val gotR = Intervals.concurrency(ivs.toDF("s", "e"), col("s"), col("e"), 100L)
      .select("ts_us", "conc").as[(Long, Long)].collect().toMap
    gotR.foreach { case (t, c) =>
      val want = ivs.count { case (s, e) => s <= t && t <= e }
      assert(c == want, s"at t=$t: got $c, brute $want")
    }
  }

  test("concurrency: the within-bucket window is keyed, not global") {
    val iv = (0L until 2000L).map(i => (i, i + 5)).toDF("s", "e")
    val plan = Intervals.concurrency(iv, col("s"), col("e"), 100L)
      .queryExecution.executedPlan.toString
    // exactly one SinglePartition window is allowed: the bucket-grain
    // carry (one row per bucket); the data-grain running sum must be
    // hash-partitioned by bucket
    val single = "SinglePartition".r.findAllIn(plan).size
    assert(plan.contains("hashpartitioning(bucket"), s"no keyed window:\n$plan")
    assert(single <= 2, s"too many global stages ($single):\n$plan")
  }
}
