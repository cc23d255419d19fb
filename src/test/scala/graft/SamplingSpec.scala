package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val ids = (0L until 10000L).toDF("id")

  test("rate is honored within binomial noise and is deterministic") {
    val n1 = Sampling.hashSample(ids, col("id"), 0.2, "s1").count()
    val n2 = Sampling.hashSample(ids.repartition(7), col("id"), 0.2, "s1").count()
    assert(n1 == n2, "partitioning changed the sample")
    // 3 sigma for Binomial(10000, 0.2) is ~120
    assert(math.abs(n1 - 2000L) < 200, s"rate off: $n1/10000 at 0.2")
  }

  test("lower rate samples are strict subsets of higher rate samples") {
    val s02 = Sampling.hashSample(ids, col("id"), 0.2, "s").as[Long].collect().toSet
    val s05 = Sampling.hashSample(ids, col("id"), 0.5, "s").as[Long].collect().toSet
    assert(s02.subsetOf(s05))
  }

  test("different salts decorrelate") {
    val a = Sampling.hashSample(ids, col("id"), 0.5, "saltA").as[Long].collect().toSet
    val b = Sampling.hashSample(ids, col("id"), 0.5, "saltB").as[Long].collect().toSet
    val inter = (a & b).size.toDouble
    // independent 0.5 samples overlap on ~25% of the universe
    assert(math.abs(inter / 10000.0 - 0.25) < 0.05, s"overlap ${inter / 10000.0}")
  }

  test("stratified rates and default rate apply per stratum") {
    val df = ids.withColumn("stratum",
      when(col("id") % 3 === 0, "a").when(col("id") % 3 === 1, "b").otherwise("c"))
    val out = Sampling.stratifiedSample(df, "stratum", col("id"),
      Map("a" -> 0.9, "b" -> 0.1), defaultRate = 0.0)
    val counts = out.groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(math.abs(counts("a") - 3000L) < 200, s"a: ${counts.get("a")}")
    assert(math.abs(counts("b") - 333L) < 120, s"b: ${counts.get("b")}")
    assert(!counts.contains("c"), s"default 0.0 leaked rows: ${counts.get("c")}")
  }

  test("rate >= 1.0 keeps everything; rate 0.0 keeps nothing") {
    assert(Sampling.hashSample(ids, col("id"), 1.0).count() == 10000)
    assert(Sampling.hashSample(ids, col("id"), 0.0).count() == 0)
  }

  test("epochMix: whole copies exact, fractional copies at the expected rate, consistent with hashSample") {
    val df = ids.withColumn("src", lit("a"))
    val out = Sampling.epochMix(df, "src", col("id"), Map("a" -> 2.5), salt = "em")
    val perId = out.groupBy("id").count().as[(Long, Long)].collect().toMap
    assert(perId.values.forall(c => c == 2 || c == 3))
    val n3 = perId.values.count(_ == 3)
    assert(math.abs(n3 - 5000) < 250, s"frac rate off: $n3/10000")
    // the extra-copy set IS the hashSample(0.5) set (same draw)
    val extra = perId.filter(_._2 == 3).keySet
    val half = Sampling.hashSample(ids, col("id"), 0.5, "em").as[Long].collect().toSet
    assert(extra == half)
    // epoch indices are 1..copies
    val epochs = out.filter(col("id") === extra.head).select("epoch")
      .as[Long].collect().sorted
    assert(epochs.sameElements(Array(1L, 2L, 3L)))
  }

  test("epochMix: zero-weight strata vanish, integral weights replicate exactly") {
    val df = ids.withColumn("src",
      when(col("id") % 2 === 0, "keep").otherwise("drop"))
    val out = Sampling.epochMix(df, "src", col("id"),
      Map("keep" -> 3.0), defaultWeight = 0.0)
    assert(out.filter(col("src") === "drop").count() == 0)
    assert(out.filter(col("src") === "keep").count() == 5000 * 3)
  }

  test("sampling filter pushes down to the scan (no shuffle)") {
    val plan = Sampling.hashSample(ids, col("id"), 0.3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling introduced a shuffle:\n$plan")
  }

  test("shuffleShards: reproducible permutation, per-shard ranks, no global sort") {
    val a = Sampling.shuffleShards(ids, col("id"), "s").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val b = Sampling.shuffleShards(ids.repartition(13), col("id"), "s")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(a.toSet == b.toSet, "partitioning changed the permutation")
    // ranks are dense 1..n within each shard
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.sameElements(1L to rows.size))
    }
    // the ranking window partitions by shard — never a global sort
    val plan = Sampling.shuffleShards(ids, col("id"), "s")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"global sort in shuffle plan:\n$plan")
  }

  test("clusterSafeSplit: a near-dup cluster never straddles splits; singletons fall back to own id") {
    // 1000 docs in 100 clusters of 10 (cluster id = min member), plus
    // 500 unclustered singletons
    val docs = (0L until 1500L).toDF("doc_id")
    val clusters = (0L until 1000L).map(i => (i, i / 10 * 10)).toDF("doc_id", "cluster")
    val out = Sampling.clusterSafeSplit(docs, "doc_id", clusters,
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "s")
      .select("doc_id", "cluster", "split").as[(Long, Long, String)].collect()

    // contamination property: one split per cluster
    val perCluster = out.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
    assert(perCluster.forall(_._2.size == 1),
      s"clusters straddling splits: ${perCluster.filter(_._2.size > 1).keys.take(5)}")
    // singleton fallback: cluster == own id for the unclustered tail
    assert(out.filter(_._1 >= 1000L).forall(r => r._2 == r._1))
    // rough ratios at the CLUSTER grain (100 + 500 draws)
    val byDraw = out.groupBy(_._2).map(_._2.head._3).toSeq
    val train = byDraw.count(_ == "train").toDouble / byDraw.size
    assert(math.abs(train - 0.8) < 0.06, s"train share $train")
    // weights must sum to 1
    intercept[IllegalArgumentException] {
      Sampling.clusterSafeSplit(docs, "doc_id", clusters, Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("negativePairs: k distinct same-shard partners, never self, deterministic") {
    val df = (0L until 5000L).toDF("doc_id")
    val out = Sampling.negativePairs(df, col("doc_id"), k = 3, salt = "n1")
      .as[(Long, Long, Long)].collect()
    // never a self-pair
    assert(out.forall { case (a, b, _) => a != b })
    // anchors carry k negatives (k-1 tolerated only on wrap collisions)
    val perAnchor = out.groupBy(_._1).view.mapValues(_.length)
    assert(perAnchor.values.forall(n => n == 3 || n == 2))
    assert(perAnchor.values.count(_ == 3) > perAnchor.size * 0.9,
      "nearly all anchors should get their full k negatives")
    // the k draws per anchor are distinct partners
    out.groupBy(_._1).foreach { case (a, rows) =>
      assert(rows.map(_._2).distinct.length == rows.length, s"anchor $a drew a duplicate")
    }
    // deterministic across partitioning
    val again = Sampling.negativePairs(df.repartition(13), col("doc_id"), 3, "n1")
      .as[(Long, Long, Long)].collect().toSet
    assert(again == out.toSet)
    // negatives are spread, not clustered: a fixed anchor's partners
    // differ under a different salt
    val other = Sampling.negativePairs(df, col("doc_id"), 3, "n2")
      .as[(Long, Long, Long)].collect().toSet
    assert(other != out.toSet)
  }

  test("sampleExactN: exact per-stratum counts, deterministic, short strata kept whole") {
    val df = (0L until 3000L).toDF("id")
      .withColumn("s", when(col("id") < 2950, "big").otherwise("tiny")) // tiny has 50 < n
    val out = Sampling.sampleExactN(df, "s", col("id"), n = 100, salt = "e1")
    val counts = out.groupBy("s").count().as[(String, Long)].collect().toMap
    assert(counts("big") == 100L, s"exact n: ${counts("big")}")
    assert(counts("tiny") == 50L, "stratum smaller than n keeps all rows")
    // deterministic across partitioning
    val a = out.agg(sum("id")).head.getLong(0)
    val b = Sampling.sampleExactN(df.repartition(17), "s", col("id"), 100, "e1")
      .agg(sum("id")).head.getLong(0)
    assert(a == b)
    // different salt draws a (mostly) different sample
    val c = Sampling.sampleExactN(df, "s", col("id"), 100, "e2")
      .select("id").as[Long].collect().toSet
    val base = out.select("id").as[Long].collect().toSet
    assert((base & c).size < base.size, "salt must decorrelate the draw")
  }

  test("prioritySample matches the w/u model exactly and is partition-stable") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def draw(salt: String, key: Long): Long = {
      val h = md.digest(s"$salt:$key".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.substring(0, 8), 16)
    }
    val rows = (0L until 2000L).map(i => (i, 1L + i % 97)) // (id, weight)
    val expect = rows
      .map { case (id, w) => (id, w, w.toDouble * 4294967296.0 / (draw("p", id) + 1).toDouble) }
      .sortBy { case (id, _, q) => (-q, id) }
      .take(25)
    val df = rows.toDF("id", "w")
    val got = Sampling.prioritySample(df, col("id"), col("w"), k = 25, salt = "p")
      .select("id", "w", "priority").as[(Long, Long, Double)].collect().toSeq
    assert(got == expect, "model mismatch (values must be bit-exact)")
    val gotRepart = Sampling.prioritySample(df.repartition(13), col("id"), col("w"),
      k = 25, salt = "p").select("id").as[Long].collect().toSeq
    assert(gotRepart == expect.map(_._1), "partitioning changed the sample")
  }

  test("apportion: Hamilton quotas + largest remainders, Σ alloc == budget exactly") {
    // strata 70/20/10 rows, budget 7: quotas 4/1/0, remainders 90/40/70
    // → leftover 2 goes to a (rem 90) and c (rem 70)
    val df = (0 until 70).map(i => ("a", i)) ++ (0 until 20).map(i => ("b", i)) ++
      (0 until 10).map(i => ("c", i))
    val got = Sampling.apportion(df.toDF("s", "i"), "s", budget = 7L)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map("a" -> ((70L, 5L)), "b" -> ((20L, 1L)), "c" -> ((10L, 1L))))
    // exactness holds across budgets, including budget > smallest quota grain
    for (b <- Seq(0L, 1L, 99L, 100L)) {
      val total = Sampling.apportion(df.toDF("s", "i"), "s", b)
        .agg(sum("alloc")).head.getLong(0)
      assert(total == b, s"budget $b apportioned to $total")
    }
  }

  test("priorityApportion: exactly budget rows, per-stratum counts == alloc, stable") {
    val df = (0L until 1000L)
      .map(i => (s"s${i % 4}", i, 1L + i % 37)).toDF("s", "id", "w")
    val alloc = Sampling.apportion(df, "s", 60L)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    val out = Sampling.priorityApportion(df, "s", col("id"), col("w"), 60L, "bm")
    val perStratum = out.groupBy("s").count().as[(String, Long)].collect().toMap
    assert(perStratum == alloc, s"per-stratum counts must equal the apportionment")
    assert(out.count() == 60L)
    val a = out.agg(sum("id")).head.getLong(0)
    val b = Sampling.priorityApportion(df.repartition(13), "s", col("id"), col("w"),
      60L, "bm").agg(sum("id")).head.getLong(0)
    assert(a == b, "partitioning changed the mixture")
  }

  test("topPCoverage keeps the minimal prefix incl. the boundary row; 100% keeps all") {
    // key "a": weights 50,30,15,5 — exclusive cums 0,50,80,95 vs 4/5·100=80:
    // keep 50 (0<80), 30 (50<80), drop 15 (80<80 false), drop 5
    val df = Seq(("a", "w", 50L), ("a", "x", 30L), ("a", "y", 15L), ("a", "z", 5L),
      ("b", "q", 1L)).toDF("k", "id", "wt")
    val got = Sampling.topPCoverage(df, "k", col("wt"), col("id"), num = 4, den = 5)
      .select("k", "id").as[(String, String)].collect().toSet
    assert(got == Set(("a", "w"), ("a", "x"), ("b", "q")))
    val all = Sampling.topPCoverage(df, "k", col("wt"), col("id"), 1, 1).count()
    assert(all == 5L, "num/den = 1 must keep every row")
    // boundary inclusion: 60/40 at 50% — the first row alone crosses the line
    val half = Seq(("c", "a", 60L), ("c", "b", 40L)).toDF("k", "id", "wt")
    val kept = Sampling.topPCoverage(half, "k", col("wt"), col("id"), 1, 2)
      .select("id").as[String].collect().toSeq
    assert(kept == Seq("a"), "the crossing row is kept, nothing after it")
  }

  test("prorataAllocate: per-key sums exact, remainder to largest-rem rows, zero-weight groups dropped") {
    val df = Seq(
      // key a: total 10 over weights 1,1,1 → quotas 3,3,3, leftover 1
      // equal rems → tie on id: id1 gets the unit
      ("a", 1L, 10L, 1L), ("a", 1L, 10L, 2L), ("a", 1L, 10L, 3L),
      // key b: total 7 over weights 5,2 → quotas 5,2 exactly
      ("b", 5L, 7L, 1L), ("b", 2L, 7L, 2L),
      // key z: all-zero weights → dropped
      ("z", 0L, 9L, 1L), ("z", 0L, 9L, 2L)
    ).toDF("k", "w", "t", "id")
    val got = Sampling.prorataAllocate(df.repartition(5), "k", "w", "t", Seq("id"))
      .select("k", "id", "alloc").as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("a", 1L)) == 4L && got(("a", 2L)) == 3L && got(("a", 3L)) == 3L)
    assert(got(("b", 1L)) == 5L && got(("b", 2L)) == 2L)
    assert(!got.keySet.exists(_._1 == "z"), "no-positive-weight groups have no pro-rata basis")
    // invariant on random data: per-key Σ alloc == total
    val rnd = new scala.util.Random(11)
    val big = (0 until 500).map(i =>
      (s"k${i % 17}", rnd.nextInt(1000).toLong, 100L + (i % 17) * 13L, i.toLong))
      .toDF("k", "w", "t", "id")
    val sums = Sampling.prorataAllocate(big, "k", "w", "t", Seq("id"))
      .groupBy("k").agg(sum("alloc").as("s")).as[(String, Long)].collect().toMap
    (0 until 17).foreach { g =>
      assert(sums(s"k$g") == 100L + g * 13L, s"k$g: ${sums(s"k$g")}")
    }
  }

  test("prioritySample favors heavy rows and plans TakeOrdered") {
    // two-point weights: 100 heavy rows (w=1000) among 5000 light (w=1)
    val df = (0L until 5000L).map(i => (i, if (i % 50 == 0) 1000L else 1L)).toDF("id", "w")
    val picked = Sampling.prioritySample(df, col("id"), col("w"), k = 50, salt = "h")
    val heavy = picked.filter(col("w") === 1000L).count()
    assert(heavy > 30, s"expected mostly heavy rows in the top-50, got $heavy")
    val plan = picked.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected TakeOrdered:\n$plan")
  }

  test("selectByBudget: greedy prefix by (score desc, id), inclusive boundary, partitioning-invariant") {
    // heavy score ties force the id tie-break to carry every cum_cost
    val rows = (1L to 90L).map(i => (i, (i * i) % 7, 10L + i % 5))
    val base = rows.toDF("id", "score", "cost")
    // reference: driver-side greedy over the same total order
    val ordered = rows.sortBy { case (i, s, _) => (-s, i) }
    val cums = ordered.scanLeft(0L)(_ + _._3).tail
    val want = ordered.zip(cums)
      .map { case ((i, _, _), c) => i -> ((c, c <= 400L)) }.toMap
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.selectByBudget(df, "id", "score", "cost", 400L)
        .select(col("id"), col("cum_cost"), col("selected"))
        .as[(Long, Long, Boolean)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    val got = run(base.repartition(7))
    assert(got == want, "distributed prefix sum must equal the greedy reference")
    assert(run(base.repartition(13, col("id"))) == got,
      "result must not depend on input partitioning")
    // inclusive boundary: budget exactly on a cum_cost selects that row
    val exact = Sampling.selectByBudget(
      Seq((1L, 5L, 100L), (2L, 4L, 100L), (3L, 3L, 100L))
        .toDF("id", "score", "cost"), "id", "score", "cost", 200L)
      .select(col("id"), col("selected")).as[(Long, Boolean)]
      .collect().toMap
    assert(exact == Map(1L -> true, 2L -> true, 3L -> false),
      s"cum==budget is selected: $exact")
  }

  test("weightedInterleave: every prefix holds the target mix to " +
      "within one item per source; deterministic under repartition") {
    import graft.operators.Sampling
    // three sources, weights 3:2:1 -> target shares 1/2, 1/3, 1/6
    val df = (for (s <- Seq("a", "b", "c"); i <- 1 to 60)
      yield (s, s + f"$i%03d")).toDF("src", "id")
    val w = Map("a" -> 3L, "b" -> 2L, "c" -> 1L)
    val out = Sampling.weightedInterleave(df, "src", "id", w)
      .orderBy("position")
      .select("src", "position").as[(String, Long)].collect()
    assert(out.length == 180)
    // error-diffusion bound: |count_s(P) - P*w_s/W| <= 1 for every
    // prefix P while every source still has items (low-discrepancy)
    val wsum = 6.0
    var counts = Map("a" -> 0, "b" -> 0, "c" -> 0)
    for ((src, pos) <- out.take(120)) {
      counts = counts.updated(src, counts(src) + 1)
      for ((s, c) <- counts) {
        val target = pos * (w(s) / wsum)
        assert(math.abs(c - target) <= 1.0,
          s"prefix $pos: source $s has $c vs target $target")
      }
    }
    // determinism: a hostile repartition yields the identical order
    val again = Sampling.weightedInterleave(
        df.repartition(7, col("id")), "src", "id", w)
      .orderBy("position").select("src", "position")
      .as[(String, Long)].collect()
    assert(out.toSeq == again.toSeq)
    // unmapped sources weigh 1 (documented default)
    val withUnknown = df.union(Seq(("d", "d001")).toDF("src", "id"))
    assert(Sampling.weightedInterleave(withUnknown, "src", "id", w)
      .count() == 181)
  }

  test("sizeSourcesToWeights: exact longest exhaustion-free trim, and " +
      "the sized interleave audits tie-block-BOUNDED where the unsized " +
      "one drifts (the q349→q355 flip)") {
    import graft.operators.Sampling
    // equal-sized sources under weights 3:2:1 — the heavy sources are
    // UNDERSIZED relative to their weights, q349's failure shape
    val df = (for (s <- Seq("a", "b", "c"); i <- 1 to 60)
      yield (s, s + f"$i%03d")).toDF("src", "id")
    val w = Map("a" -> 3L, "b" -> 2L, "c" -> 1L)
    val sized = Sampling.sizeSourcesToWeights(df, "src", "id", w)
    // W=6, T = min(60·6/3, 60·6/2, 60·6/1) = 120 → exact 60/40/20
    assert(sized.groupBy("src").count().as[(String, Long)].collect().toMap
      == Map("a" -> 60L, "b" -> 40L, "c" -> 20L))
    def maxDev(input: org.apache.spark.sql.DataFrame): Long =
      Sampling.scheduleMixReport(
          Sampling.weightedInterleave(input, "src", "id", w),
          "src", "src_rank", "position", w)
        .agg(max(col("max_dev_units"))).as[Long].head()
    // unsized: c's tail runs alone after a and b exhaust — deviation
    // grows with the remaining length (here 180 units = 30 items)
    assert(maxDev(df) > 6L, "unsized fixture must exhibit the drift")
    // sized: every source exhausts at the same schedule position (±1
    // apportionment unit), so the whole schedule stays inside the
    // tie-block bound W
    assert(maxDev(sized) <= 6L, "sized schedule must stay bounded")
    // determinism under hostile repartition (the resumable contract)
    val again = Sampling.sizeSourcesToWeights(
      df.repartition(7, col("id")), "src", "id", w)
    assert(again.as[(String, String)].collect().sorted.toSeq
      == sized.as[(String, String)].collect().sorted.toSeq)
    // a remainder case: counts force non-zero leftovers — Σ == T and
    // per-source alloc within 1 of the exact share
    val df2 = (for ((s, n) <- Seq(("a", 11), ("b", 9), ("c", 50)); i <- 1 to n)
      yield (s, s + f"$i%03d")).toDF("src", "id")
    val c2 = Sampling.sizeSourcesToWeights(df2, "src", "id", w)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    // T = min(11·6/3, 9·6/2, 50·6/1) = min(22, 27, 300) = 22
    // quotas: a 11, b 7 (rem 2), c 3 (rem 4); left 1 → c gets it
    assert(c2 == Map("a" -> 11L, "b" -> 7L, "c" -> 4L), c2.toString)
    assert(c2.values.sum == 22L)
    // ── TIE CONTRACT (round-19 advice fix): globalDenseSeq's running
    // sum makes duplicate (src, order) keys PEERS sharing one
    // sequence value, so an alloc boundary inside a peer group keeps
    // all-or-none of it. With every key duplicated, the tie-less call
    // violates Σ alloc == T (the negative control proving the
    // documented hazard is real); a key-completing tieBreak restores
    // the exact counts — changing WHICH equal-score rows survive,
    // never how many.
    val dup = (for ((s, n) <- Seq(("a", 11), ("b", 9), ("c", 50));
        i <- 1 to n; copy <- Seq(0, 1))
      yield (s, s + f"$i%03d", s"$i-$copy")).toDF("src", "score", "id")
    val noTie = Sampling.sizeSourcesToWeights(dup, "src", "score", w)
      .count()
    assert(noTie != 44L, s"tie fixture must exhibit the drift ($noTie)")
    val tied = Sampling.sizeSourcesToWeights(
        dup, "src", "score", w, tieBreak = Seq(col("id")))
      .groupBy("src").count().as[(String, Long)].collect().toMap
    // doubled counts: T = min(22·6/3, 18·6/2, 100·6/1) = 44;
    // quotas: a 22, b 14 (rem 4), c 7 (rem 2); left 1 → b gets it
    assert(tied == Map("a" -> 22L, "b" -> 15L, "c" -> 7L), tied.toString)
    assert(tied.values.sum == 44L)
  }

  test("sizeSourcesToWeights plan: no WindowExec partitioned by the " +
      "source column — the trim rank must ride globalDenseSeq, never " +
      "a per-source window (one source = one task at 100 TB)") {
    import org.apache.spark.sql.execution.window.WindowExec
    def srcWindows(df: org.apache.spark.sql.DataFrame,
        srcCol: String): Seq[String] =
      df.queryExecution.executedPlan.collect {
        case w: WindowExec if w.partitionSpec.exists(
            _.references.exists(_.name == srcCol)) =>
          w.partitionSpec.map(_.sql).mkString(",")
      }
    val df = (for (s <- Seq("a", "b", "c"); i <- 1 to 40)
      yield (s, s + f"$i%03d")).toDF("src", "id")
    val w = Map("a" -> 3L, "b" -> 2L, "c" -> 1L)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false") // plain tree
    try {
      // positive control: the pre-round-18 shape (row_number over a
      // per-source window) must trip the detector
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy(col("src")).orderBy(col("id"))
      assert(srcWindows(
        df.withColumn("__srk", row_number().over(win)), "src").nonEmpty,
        "detector failed to flag a per-source window")
      assert(srcWindows(
        Sampling.sizeSourcesToWeights(df, "src", "id", w), "src").isEmpty,
        "trim must not window-partition by the source column")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("scheduleMixReport: W sums the EFFECTIVE weights of the " +
      "schedule's sources — unmapped sources count at 1 (round-17 fix)") {
    import graft.operators.Sampling
    // hand-authored perfect 2:1 schedule; y is ABSENT from the map,
    // so W must be 3 (2 + 1), not the map-sum 2
    val sched = Seq(
      ("x", 1L, 1L), ("y", 1L, 2L), ("x", 2L, 3L))
      .toDF("src", "src_rank", "position")
    val got = Sampling.scheduleMixReport(sched, "src", "src_rank",
        "position", Map("x" -> 2L))
      .as[(String, Long, Long, Long)].collect().toSet
    // devs at W=3: x@pos1 |1·3−1·2|=1, x@pos3 |2·3−3·2|=0; y@pos2
    // |1·3−2·1|=1 — the old map-only W=2 would have scored x as
    // (0, 2) and reported w_total 2
    assert(got == Set(("x", 2L, 1L, 3L), ("y", 1L, 1L, 3L)), got.toString)
  }
}
