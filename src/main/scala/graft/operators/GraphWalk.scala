package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic hash-driven graph walks — the DeepWalk/node2vec
  * corpus-generation step (Perozzi et al. KDD 2014) made replayable:
  * from each seed node, `steps` hops; at every hop the walker moves to
  * the out-neighbor minimizing md5("seed:step:u:v") (ties — md5
  * collisions — break on the neighbor id). This is the engine's
  * md5-threshold sampling discipline (q58/q107) applied to graphs: a
  * fixed pseudo-random choice BOTH engines can replay exactly, so the
  * sampled walks are row-certifiable against a step-unrolled SQL
  * oracle instead of being "random-looking, trust me".
  *
  * Walks don't branch (one row per seed per step) and a dead-end node
  * simply ends its walk early. Multi-edges collapse (the neighbor SET
  * decides); the walk is uniform over neighbors in the md5 order, not
  * degree-weighted.
  *
  * 100-TB shape: `steps` bounded joins of the frontier (|seeds| rows)
  * against the distinct edge table, each one keyed shuffle + one
  * argmin partial aggregate; localCheckpoint per hop keeps the
  * iterative lineage flat (the ConnectedComponents discipline). No
  * per-walk state beyond the frontier row.
  */
object GraphWalk {

  def walks(
      edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, steps: Int): DataFrame = {
    require(steps >= 1, s"steps must be >= 1, got $steps")
    val e = edges.select(col(srcCol).as("__u"), col(dstCol).as("__v")).distinct()
    var frontier = seeds.select(col(seedCol).as("seed")).distinct()
      .select(col("seed"), lit(0).as("step"), col("seed").as("node"))
      .localCheckpoint()
    var out = frontier
    for (i <- 1 to steps) {
      frontier = frontier.join(e, frontier("node") === e("__u"))
        .select(col("seed"),
          struct(
            md5(concat_ws(":", col("seed"), lit(i), col("node"), col("__v"))).as("h"),
            col("__v").as("cand")).as("__hc"))
        .groupBy("seed")
        .agg(min(col("__hc")).getField("cand").as("node"))
        .select(col("seed"), lit(i).as("step"), col("node"))
        .localCheckpoint()
      out = out.unionByName(frontier)
    }
    out
  }

  /** Skip-gram training pairs from a walk corpus — the second half of
    * the DeepWalk data prep: every (center, context) node pair within
    * `window` steps on the same walk, counted. Per-walk cost is
    * L·window pairs (L = walk length, both bounded), through one
    * per-seed equi-join and one keyed count — no corpus-wide window.
    */
  def skipGramPairs(walks: DataFrame, window: Int): DataFrame = {
    val a = walks.select(col("seed"), col("step").as("__i"), col("node").as("center"))
    val b = walks.select(col("seed"), col("step").as("__j"), col("node").as("context"))
    a.join(b, Seq("seed"))
      .filter(col("__i") =!= col("__j") && abs(col("__i") - col("__j")) <= window)
      .groupBy("center", "context")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Deterministic negative sampling — the other half of the
    * skip-gram training set: per center, the k nodes minimizing
    * md5("center:neg:node") that are neither the center itself nor
    * one of its positive contexts (replayable like the walks, so the
    * negatives row-certify too). `nodes` is the candidate dictionary
    * (one `node` column) — the graph's node set here; at web scale
    * pass a bounded sample of it, which changes the candidate pool,
    * not the mechanics. Cost: |centers|·|dictionary| rows through one
    * broadcast cross join + an anti-join + a per-center top-k window.
    */
  /** Integer node-feature engineering — the aggregation half of a
    * GraphSAGE-style pipeline, all-integer so it row-certifies: per
    * node its out/in degree, the mass of its out-neighborhood (sum of
    * neighbors' out-degrees = its 2-hop path count), and its distinct
    * 2-hop out-reach. Shapes: degree aggregates + one edge⨝edge
    * equi-join for the 2-hop rows — no iteration, no corpus-wide
    * window; every node of the graph keeps a row (degrees 0-filled).
    */
  def nodeFeatures(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).as("__u"), col(dstCol).as("__v")).distinct()
    val nodes = e.select(col("__u").as("node"))
      .unionByName(e.select(col("__v").as("node"))).distinct()
    val outDeg = e.groupBy(col("__u").as("node")).agg(count(lit(1)).as("out_deg"))
    val inDeg = e.groupBy(col("__v").as("node")).agg(count(lit(1)).as("in_deg"))
    val twoHop = e.as("a").join(e.as("b"), col("a.__v") === col("b.__u"))
      .groupBy(col("a.__u").as("node"))
      .agg(count(lit(1)).as("n_paths2"),
        count_distinct(col("b.__v")).as("n_reach2"))
    nodes
      .join(outDeg, Seq("node"), "left")
      .join(inDeg, Seq("node"), "left")
      .join(twoHop, Seq("node"), "left")
      .na.fill(0L, Seq("out_deg", "in_deg", "n_paths2", "n_reach2"))
  }

  def negativeSamples(pairs: DataFrame, nodes: DataFrame, k: Int): DataFrame = {
    val cand = pairs.select("center").distinct()
      .crossJoin(broadcast(nodes.select(col("node").as("negative"))))
      .filter(col("center") =!= col("negative"))
      .join(pairs.select(col("center"), col("context").as("negative")),
        Seq("center", "negative"), "left_anti")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("center")
      .orderBy(md5(concat_ws(":", col("center"), lit("neg"), col("negative"))).asc,
        col("negative").asc)
    cand
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
  }
}
