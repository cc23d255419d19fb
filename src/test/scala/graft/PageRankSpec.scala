package graft

import org.apache.spark.sql.functions._
import graft.operators.PageRank

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** In-memory mirror of the fixed-point algorithm — every op Long. */
  private def model(edges: Set[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).toSeq.sorted
    val n = nodes.size
    val out = edges.groupBy(_._1).map { case (k, v) => k -> v.size }
    var rank = nodes.map(_ -> 1000000000000L / n).toMap
    for (_ <- 1 to iters) {
      val in = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((s, d) <- edges) in(d) += rank(s) / out(s)
      rank = nodes.map(nd =>
        nd -> (((1000000000000L * 15) / 100) / n + in(nd) * 85 / 100)).toMap
    }
    rank
  }

  test("pageRank matches the integer model exactly, any partitioning") {
    val edges = (0L until 200L).flatMap(i =>
      Seq((i % 23, (i * 7 + 3) % 23), (i % 19, (i * 5 + 1) % 23)))
      .filter { case (s, d) => s != d }
    val df = edges.toDF("src", "dst")
    val want = model(edges.toSet, iters = 4)
    val got = PageRank.pageRank(df, "src", "dst", iterations = 4)
      .as[(Long, Long)].collect().toMap
    assert(got == want, "fixed-point ranks must be bit-identical to the model")
    val gotR = PageRank.pageRank(df.repartition(11), "src", "dst", iterations = 4)
      .as[(Long, Long)].collect().toMap
    assert(gotR == want, "partitioning changed integer ranks")
  }

  test("a hub every node links to out-ranks the spokes; mass ~conserved") {
    val spokes = (1L to 30L)
    val edges = spokes.map(i => (i, 0L)) ++ spokes.map(i => (0L, i))
    val ranks = PageRank.pageRank(edges.toDF("src", "dst"), "src", "dst", 5)
      .as[(Long, Long)].collect().toMap
    assert(ranks(0L) > ranks(1L) * 5, s"hub should dominate: ${ranks(0L)} vs ${ranks(1L)}")
    val total = ranks.values.sum
    // integer divs leak bounded remainder mass; stay within 1% of units
    assert(total > 990000000000L && total <= 1000000000000L, s"mass off: $total")
  }
}
