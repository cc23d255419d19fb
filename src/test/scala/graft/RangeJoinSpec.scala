package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def naive(pts: Seq[Long], ivs: Seq[(Long, Long, Long)]): Set[(Long, Long)] =
    (for {
      p <- pts
      (id, lo, hi) <- ivs
      if p >= lo && p < hi
    } yield (p, id)).toSet

  test("bucketed == naive theta join, boundaries and multi-bucket spans") {
    // intervals spanning 1..4 buckets at width 10, points on every edge
    val ivs = Seq((1L, 0L, 10L), (2L, 5L, 15L), (3L, 9L, 40L), (4L, -25L, -5L),
      (5L, 7L, 8L), (6L, 100L, 100L), (7L, 50L, 45L)) // empty: 6 (hi==lo), 7 (hi<lo)
    val pts = Seq(-25L, -6L, -5L, 0L, 5L, 7L, 9L, 10L, 14L, 15L, 39L, 40L, 99L, 100L)
    val got = RangeJoin.pointInInterval(
        pts.toDF("p"), "p", ivs.toDF("id", "lo", "hi"), "lo", "hi", bucketWidth = 10)
      .select("p", "id").as[(Long, Long)].collect().toSet
    assert(got == naive(pts, ivs))
    assert(!got.exists(_._2 == 6L) && !got.exists(_._2 == 7L))
  }

  test("no duplicate rows when an interval spans many buckets") {
    val ivs = Seq((1L, 0L, 100L)).toDF("id", "lo", "hi")
    val pts = (0L until 100L).toDF("p")
    val out = RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", bucketWidth = 3)
    assert(out.count() == 100)
    assert(out.distinct().count() == 100)
  }

  test("physical plan is an equi-join — no nested loop, no cartesian") {
    val ivs = (0L until 50L).map(i => (i, i * 10, i * 10 + 7)).toDF("id", "lo", "hi")
    val pts = (0L until 500L).toDF("p")
    val plan = RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", bucketWidth = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"nested loop in plan:\n$plan")
  }
}
