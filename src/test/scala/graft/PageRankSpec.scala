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

  test("nodeFeatures: hand-computed degrees, 2-hop paths/reach, isolated sink 0-filled") {
    import graft.operators.GraphWalk
    // 1→2, 1→3, 2→3, 3→4: node 1 has paths 1-2-3 and 1-3-4 (reach {3,4})
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val got = GraphWalk.nodeFeatures(edges, "src", "dst")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) == ((2L, 0L, 2L, 2L)))
    assert(got(2L) == ((1L, 1L, 1L, 1L)))  // 2-3-4
    assert(got(3L) == ((1L, 2L, 0L, 0L)))  // 4 is a sink
    assert(got(4L) == ((0L, 1L, 0L, 0L)), "sink keeps a 0-filled row")
  }

  test("negativeSamples: never the center or a positive context, ≤k per center, deterministic") {
    import graft.operators.GraphWalk
    val pairs = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 1L, 2L)).toDF("center", "context", "cnt")
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("node")
    val neg = GraphWalk.negativeSamples(pairs, nodes, k = 2)
      .as[(Long, Long, Long)].collect()
    // 16 probes over a 6-node dictionary: both centers have ≥3 allowed
    // nodes, so the bounded pool fills k here (and may not in general)
    assert(neg.count(_._1 == 1L) == 2 && neg.count(_._1 == 2L) == 2)
    neg.foreach { case (c, n, _) =>
      assert(c != n, "a center is never its own negative")
      assert(!Set((1L, 2L), (1L, 3L), (2L, 1L)).contains((c, n)),
        s"positive pair ($c,$n) leaked into the negatives")
    }
    val again = GraphWalk.negativeSamples(pairs, nodes, k = 2)
      .as[(Long, Long, Long)].collect()
    assert(neg.toSet == again.toSet)
    // partition invariance: the draw is a function of (salt, keys) only
    val rep = GraphWalk.negativeSamples(
      pairs.repartition(7), nodes.repartition(5), k = 2)
      .as[(Long, Long, Long)].collect()
    assert(rep.toSet == neg.toSet, "repartitioning changed the negatives")
  }

  test("negativeSamples: candidate cost is centers×probes; dictionary is never broadcast") {
    import graft.operators.GraphWalk
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    val pairs = (1L to 20L).map(c => (c, (c % 7) + 30L, 1L))
      .toDF("center", "context", "cnt")
    val nodes = (1L to 500L).toDF("node")
    // AQE off for this probe: executedPlan is then the concrete tree,
    // so BroadcastExchange subtrees are directly collectable. Auto-
    // broadcast off too: it models the web-scale regime — a tiny test
    // dictionary legitimately auto-broadcasts, but nothing in the plan
    // may REQUIRE it (suites run sequentially in the forked test JVM —
    // the flips are safe)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = GraphWalk.negativeSamples(pairs, nodes, k = 3, probes = 8)
      val plan = df.queryExecution.executedPlan
      val bcasts = plan.collect { case b: BroadcastExchangeExec => b }
      assert(bcasts.nonEmpty, "the offset/total range join should broadcast")
      bcasts.foreach { b =>
        assert(b.collect { case a: BaseAggregateExec => a }.nonEmpty,
          s"a broadcast subtree without an aggregate beneath it — the raw " +
            s"dictionary is being broadcast:\n$b")
      }
      // non-vacuity: the retired full-dictionary shape (crossJoin ⨯
      // broadcast(nodes)) fails exactly this assertion
      val old = pairs.select("center").distinct()
        .crossJoin(broadcast(nodes.select(col("node").as("negative"))))
      val oldB = old.queryExecution.executedPlan
        .collect { case b: BroadcastExchangeExec => b }
      assert(oldB.exists(_.collect { case a: BaseAggregateExec => a }.isEmpty),
        "probe shape: a raw-relation broadcast must be detectable")
      // bounded pool: at most centers×probes candidates ever exist —
      // with k == probes the yield is pool-limited, never beyond it
      val counts = GraphWalk.negativeSamples(pairs, nodes, k = 8, probes = 8)
        .groupBy("center").count().as[(Long, Long)].collect()
      assert(counts.nonEmpty && counts.forall(_._2 <= 8),
        "more negatives than probes is impossible")
      intercept[IllegalArgumentException] {
        GraphWalk.negativeSamples(pairs, nodes, k = 9, probes = 8)
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("nodeFeatures: salted 2-hop == unsalted on a planted power-law hub; skew spread bounded") {
    import graft.operators.GraphWalk
    // hub 0: 40 in-edges (spokes 1..40 → 0) and 40 out-edges
    // (0 → 101..140) ⇒ 1600 two-hop rows land on intermediate key 0
    val in = (1L to 40L).map(i => (i, 0L))
    val outE = (1L to 40L).map(i => (0L, 100L + i))
    val tail = (1L to 60L).map(i => (200L + i, 300L + (i % 13)))
    val edges = (in ++ outE ++ tail).toDF("src", "dst")
    def rows(b: Int) = GraphWalk.nodeFeatures(edges, "src", "dst", saltBuckets = b)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val unsalted = rows(1)
    assert(rows(8) == unsalted, "salting must not change the features")
    // hub sanity: every spoke has the 2-hop paths through the hub
    val byNode = unsalted.map(r => r._1 -> r).toMap
    assert(byNode(1L)._4 == 40L, "spoke 1 reaches 40 nodes via the hub")
    // per-reducer bound: the salted join keys on (mid, salt), so the
    // planted hub's 1600 intermediate rows must spread across buckets —
    // measure the actual max per join key, the quantity one reducer sees
    val a = edges.select(col("src").as("__src"), col("dst").as("__mid")).distinct()
      .withColumn("__salt", pmod(xxhash64(col("__src"), col("__mid")), lit(8L)))
    val b = edges.select(col("src").as("__mid"), col("dst").as("__dst")).distinct()
      .withColumn("__salt", explode(sequence(lit(0L), lit(7L))))
    val perKey = a.join(b, Seq("__mid", "__salt"))
      .groupBy("__mid", "__salt").count().as[(Long, Long, Long)].collect()
    val hubMax = perKey.filter(_._1 == 0L).map(_._3).max
    assert(hubMax <= 2 * 1600 / 8,
      s"hub bucket holds $hubMax rows; salting should bound it near 1600/8")
  }

  test("walksBucketedEdges == walks; per-hop join never reshuffles the bucketed edge side") {
    import graft.operators.GraphWalk
    val edges = (0L until 400L).flatMap(i =>
      Seq((i % 37, (i * 7 + 3) % 37), (i % 31, (i * 5 + 1) % 37)))
      .filter { case (s, d) => s != d }.toDF("src", "dst")
    val seeds = edges.select(col("src"))
    val table = "graft_edges_spec"
    val path = java.nio.file.Files
      .createTempDirectory("graft-bedges").toString + "/t"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val plain = GraphWalk.walks(edges, "src", "dst", seeds, "src", steps = 3)
      .as[(Long, Int, Long)].collect().toSet
    val bucketed = GraphWalk.walksBucketedEdges(edges, "src", "dst", seeds, "src",
      steps = 3, buckets = 4, table = table, path = path)
    assert(bucketed.as[(Long, Int, Long)].collect().toSet == plain,
      "bucketed-edges walks must be byte-identical to the plain form")
    // the per-hop join must read the edge buckets in place: no exchange
    // may repartition the edge side on its join key (the frontier is
    // the only thing allowed through a shuffle)
    val hop = seeds.select(col("src").as("seed"), lit(0).as("step"),
        col("src").as("node")).distinct()
      .join(spark.table(table), col("node") === col("__u"))
    val plan = hop.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(__u"),
      s"bucketed edge side was reshuffled:\n$plan")
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("GraphWalk: valid edges per hop, one row per live walk, dead-end stops, deterministic") {
    import graft.operators.GraphWalk
    // 1→{2,3}, 2→{3}, 3→∅ (dead end), 9 isolated-seed (no out-edges)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val seeds = Seq(1L, 9L).toDF("n")
    val w = GraphWalk.walks(edges, "src", "dst", seeds, "n", steps = 3)
      .as[(Long, Int, Long)].collect().toSet
    // step 0: both seeds; seed 9 dead-ends immediately
    assert(w.contains((1L, 0, 1L)) && w.contains((9L, 0, 9L)))
    assert(!w.exists { case (s, st, _) => s == 9L && st > 0 })
    // seed 1 walks: step1 ∈ {2,3}; path follows real edges and stops at 3
    val path = w.filter(_._1 == 1L).toSeq.sortBy(_._2).map(_._3)
    assert(path.head == 1L)
    path.sliding(2).foreach { case Seq(a, b) =>
      assert(Set((1L, 2L), (1L, 3L), (2L, 3L)).contains((a, b)),
        s"hop $a->$b is not a real edge")
    }
    assert(path.last == 3L, "every path through this DAG ends at the dead end")
    // one row per (seed, step) while live — walks never branch
    assert(w.groupBy(x => (x._1, x._2)).forall(_._2.size == 1))
    // deterministic replay
    val w2 = GraphWalk.walks(edges, "src", "dst", seeds, "n", steps = 3)
      .as[(Long, Int, Long)].collect().toSet
    assert(w == w2)
  }
}
