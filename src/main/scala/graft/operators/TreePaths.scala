package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Root-and-depth resolution over a parent-pointer forest (category
  * trees, org charts, thread reply chains) by POINTER DOUBLING: each
  * round replaces every node's ancestor pointer with its ancestor's
  * ancestor and adds the depths, so the distance-to-root halves—
  * O(log depth) self-joins instead of the O(depth) rounds of a naive
  * walk (a 1M-deep chain resolves in 20 joins, not a million). The
  * same round-doubling discipline as ConnectedComponents: per-round
  * localCheckpoint (truncates the exploding lineage) and an in-plan
  * convergence fingerprint (a 2-value aggregate — no row data reaches
  * the driver).
  *
  * Input: (node, parent) with roots self-parented (node == parent).
  * Output: (node, root, depth). Cycles are the caller's bug: a cycle
  * never converges, so the loop throws after `maxRounds` (default 64
  * ≈ depth 2^64) rather than spin.
  */
object TreePaths {

  def rootAndDepth(edges: DataFrame, maxRounds: Int = 64): DataFrame = {
    // Precondition, validated loudly (round-7 advisory): every parent id
    // must itself be a node. The jump join below is INNER on `anc`, so a
    // dangling parent pointer would silently drop its node's row (and,
    // over rounds, the whole subtree hanging off it) — a cycle fails via
    // maxRounds but a dangling pointer would be invisible row loss. One
    // bounded anti-join job on the distinct parent set; id-grain, cheap
    // next to the doubling rounds themselves.
    val dangling = edges.select(col("parent")).distinct()
      .join(edges.select(col("node")), col("parent") === col("node"), "left_anti")
      .limit(3).collect()
    require(dangling.isEmpty,
      s"dangling parent pointer(s) not in the node set, e.g. " +
        s"${dangling.map(_.get(0)).mkString(", ")} — the forest must have " +
        "parents ⊆ nodes with roots self-parented")
    var cur = edges
      .select(col("node"), col("parent").as("anc"),
        when(col("node") === col("parent"), 0L).otherwise(1L).as("depth"))
      .localCheckpoint()
    var lastSum = -1L
    var rounds = 0
    while (rounds < maxRounds) {
      // jump: anc := anc's anc, depth += anc's depth. Roots are fixed
      // points (their anc is themselves with depth 0).
      val jumps = cur.select(col("node").as("anc"),
        col("anc").as("anc2"), col("depth").as("d2"))
      val next = cur.join(jumps, Seq("anc"))
        .select(col("node"), col("anc2").as("anc"),
          (col("depth") + col("d2")).as("depth"))
        .localCheckpoint()
      val s = next.agg(sum(col("depth")).cast("long")).head().getLong(0)
      cur = next
      rounds += 1
      if (s == lastSum) { // fixpoint: every anc is a root
        return cur.select(col("node"), col("anc").as("root"), col("depth"))
      }
      lastSum = s
    }
    throw new IllegalStateException(
      s"no convergence after $maxRounds doubling rounds — cycle in the parent pointers?")
  }
}
