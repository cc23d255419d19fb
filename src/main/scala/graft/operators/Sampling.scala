package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling — the training-data mixing
  * primitive. `df.sample()` draws from a per-task RNG: results change
  * with partitioning, retries, and scale factor, which makes pipeline
  * runs unreproducible and oracle checks impossible. The deterministic
  * form hashes a stable row key to a uniform value in [0, 2^32) — the
  * first 8 hex chars of md5(salt:key) — and keeps the row iff that
  * value falls under the rate threshold. Properties a 100-TB pipeline
  * needs:
  *
  *  - Pure per-row predicate: no shuffle, no RNG state, pushes into the
  *    scan, identical output on any cluster/partitioning/retry.
  *  - CONSISTENT across runs and tables: the same key always draws the
  *    same unit value, so rate=0.2 is a strict subset of rate=0.3, and
  *    downsampling can be re-run incrementally.
  *  - Salt decorrelates independent samples (different salt ⇒ fresh
  *    uniform draw per key).
  *
  * The threshold compare happens on the hex STRING (lowercase hex is
  * order-isomorphic to the number), so any engine with md5 reproduces
  * the exact row set — which is how the oracle certifies it.
  *
  * Reference scope: the reference engine has no sampling surface; this
  * is part of the 100-TB extension family (SURVEY.md north star).
  */
object Sampling {

  /** Uniform draw in [0, 2^32) for a key, as an 8-hex-char string. */
  def hashUnit(key: Column, salt: String): Column =
    substring(md5(concat_ws(":", lit(salt), key.cast("string"))), 1, 8)

  /** 8-hex-digit threshold: keep iff hashUnit < this. */
  def thresholdHex(rate: Double): String = {
    require(rate >= 0 && rate < 1, s"rate must be in [0,1), got $rate")
    f"${math.floor(rate * 4294967296.0).toLong}%08x"
  }

  /** Keep each row with probability `rate`, deterministically in the
    * row's `key`.
    */
  def hashSample(df: DataFrame, key: Column, rate: Double, salt: String = ""): DataFrame =
    if (rate >= 1.0) df
    else df.filter(hashUnit(key, salt) < lit(thresholdHex(rate)))

  /** Epoch-weighted OVERsampling — the other half of data mixing: a
    * stratum weight w means each row appears floor(w) times plus one
    * more with probability frac(w), decided by the same deterministic
    * md5 draw as `hashSample` (so w = 2.5 ⇒ every row twice, half the
    * rows — a fixed, reproducible half — a third time). Emits an
    * `epoch` column (1..copies) so downstream shuffles can
    * decorrelate repeats. Pure per-row explode, no shuffle; rows with
    * zero copies are filtered before the explode (Spark's sequence()
    * would generate a DESCENDING range for copies = 0).
    */
  /** DETERMINISTIC weighted interleave — the data-MIXING SCHEDULE a
    * training run consumes: given integer per-source weights, produce
    * one global order in which every prefix holds the target source
    * proportions WHILE EVERY SOURCE STILL HAS ITEMS — to within a
    * few items, bounded by the tie-block width (~#sources),
    * INDEPENDENT of corpus length; once a finite source exhausts,
    * the remainder re-normalizes over the survivors and
    * [[scheduleMixReport]] reports the drift (error-diffusion /
    * low-discrepancy interleaving: item k of source s sits at
    * rational position (k − ½)/w_s, realized as the INTEGER key
    * (2k−1)·(L/w_s) with L = lcm(weights) — no doubles, both engines
    * order identically). Sources absent from the map weigh 1.
    *
    * Contrast with [[temperatureMix]]/[[balancedMix]]: those decide
    * WHICH rows are in the mix; this decides the ORDER they are seen
    * in — upstream selection composes with this schedule.
    *
    * 100-TB shape: NO per-source window (a giant source would pin a
    * partition) — the per-source rank comes from ONE
    * [[Layout.globalDenseSeq]] over (source, order) minus broadcast
    * per-source offsets (a ≤|sources|-row aggregate), and the final
    * position from a second globalDenseSeq over the interleave key.
    * Two range exchanges total; deterministic across cluster configs
    * (the resumable-schedule contract).
    *
    * Returns the input columns + (src_rank, position), position
    * 1..n.
    */
  def weightedInterleave(
      df: DataFrame, sourceCol: String, orderCol: String,
      weights: Map[String, Long]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val lcm = weights.values.foldLeft(1L)((a, b) => a / gcd(a, b) * b)
    val mult = weights.foldLeft(lit(lcm)) { case (acc, (src, w)) =>
      when(col(sourceCol) === src, lit(lcm / w)).otherwise(acc)
    }
    val seqd = Layout.globalDenseSeq(df,
      Seq(col(sourceCol), col(orderCol)), "__gseq")
    val offs = seqd.groupBy(col(sourceCol).as("__src"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(
        sum(col("__n")).over(org.apache.spark.sql.expressions.Window
          .orderBy("__src")) - col("__n"), lit(0L)))
      .select(col("__src"), col("__off"))
    val ranked = seqd
      .join(broadcast(offs), col(sourceCol) === col("__src"))
      .withColumn("src_rank", col("__gseq") - col("__off"))
      .drop("__src", "__off", "__gseq")
      .withColumn("__key", (col("src_rank") * 2L - 1L) * mult)
    Layout.globalDenseSeq(ranked,
        Seq(col("__key"), col(sourceCol)), "position")
      .drop("__key")
  }

  /** Schedule-mix AUDIT — the validation tool for ANY interleave
    * order (ours or an external one): at every row's arrival, the
    * source's running count is its src_rank and the prefix length is
    * its position, so the deviation from the target mix is
    * |src_rank·W − position·w_s| in exact integer units of 1/W — no
    * doubles, no extra pass. Reports the worst arrival-point
    * deviation per source. The audit catches BOTH failure modes:
    * construction error (bounded by the tie-block width while all
    * sources have items) and EXHAUSTION DRIFT — once a finite heavy
    * source runs out, the tail re-normalizes over the survivors and
    * the light sources' deviation grows with the remaining length
    * (q349 measures exactly this on the equal-sized fixture: the
    * drift scales with corpus size, which is the finding a real mix
    * audit exists to surface — fix it upstream with the
    * [[sizeSourcesToWeights]] pre-pass, whose q355 composition flips
    * exactly this fixture to a bounded audit). Deviation
    * BETWEEN arrivals is bounded by the next arrival's value + w_s
    * and deliberately not enumerated.
    *
    * Input must carry (sourceCol, rankCol, positionCol) — exactly
    * [[weightedInterleave]]'s output shape. Sources absent from the
    * map weigh 1 (the interleave's default), and W sums the EFFECTIVE
    * weights of the schedule's distinct sources — not the map's —
    * so auditing a schedule with unmapped sources uses the same
    * target mix the interleave produced. Pure per-row arithmetic +
    * two small aggregates; nothing global.
    * Returns (source, n_items, max_dev_units, w_total) where
    * max_dev_units/W items is the worst deviation.
    */
  def scheduleMixReport(
      schedule: DataFrame, sourceCol: String, rankCol: String,
      positionCol: String, weights: Map[String, Long]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    val w = weights.foldLeft(lit(1L)) { case (acc, (src, wt)) =>
      when(col(sourceCol) === src, lit(wt)).otherwise(acc)
    }
    // W = Σ weights over the schedule's DISTINCT sources, each at its
    // effective weight — mapped value, or 1 for a source absent from
    // the map ([[weightedInterleave]]'s documented default). Round-17
    // review fix: summing the MAP alone understated W whenever the
    // schedule carried unmapped sources, skewing max_dev_units for
    // every source. Computed in-plan (a ≤|sources|-row aggregate,
    // broadcast back) so the audit stays one lazy query.
    val wTot = schedule.select(col(sourceCol).as("__s"), w.as("__w"))
      .groupBy("__s").agg(first(col("__w")).as("__w"))
      .agg(sum(col("__w")).as("w_total"))
    schedule
      .select(col(sourceCol).as("source"), col(rankCol).as("__rk"),
        col(positionCol).as("__pos"), w.as("__w"))
      .crossJoin(broadcast(wTot))
      .select(col("source"),
        abs(col("__rk") * col("w_total") - col("__pos") * col("__w"))
          .as("__dev"),
        col("w_total"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_items"),
        max(col("__dev")).cast("long").as("max_dev_units"),
        first(col("w_total")).as("w_total"))
  }

  /** SIZE-SOURCES-TO-WEIGHTS pre-pass — the upstream fix for the
    * exhaustion drift [[scheduleMixReport]] surfaces (q349's finding):
    * [[weightedInterleave]] holds the target mix only WHILE EVERY
    * SOURCE STILL HAS ITEMS; once a finite heavy source runs dry the
    * tail re-normalizes over the survivors and the light sources'
    * deviation grows with the remaining length. This operator trims
    * the corpus so that cannot happen: it computes the LONGEST total
    * schedule T every source can supply at its target share —
    * T = min_s floor(n_s·W / w_s), W = Σ effective weights over the
    * sources PRESENT (unmapped sources weigh 1, the interleave's
    * default) — apportions T across sources largest-remainder exact
    * (the [[apportion]] discipline, proportional to WEIGHTS instead
    * of counts; Σ alloc == T, and alloc_s ≤ n_s always: quota_s =
    * floor(T·w_s/W) ≤ n_s by T's definition, and a remainder unit
    * only lands where the quota strictly truncated), then keeps each
    * source's first alloc_s rows in `orderCol` order. The sized
    * corpus exhausts every source AT THE SAME SCHEDULE POSITION (to
    * within the ±1 apportionment rounding), so the interleave's
    * tie-block-bounded guarantee holds through the WHOLE schedule —
    * q355 certifies the composition: q349's fixture flips from
    * length-proportional drift to a bounded audit.
    *
    * All-integer arithmetic (contract: n_s·W fits a Long — at
    * 100 TB, n_s ~ 10¹³ and W in the thousands leave two orders of
    * headroom), so both engines produce the identical row set.
    *
    * CONTRACT (round-19 advice fix): `(orderCol, tieBreak…)` must be
    * a TOTAL order within each source — [[Layout.globalDenseSeq]]'s
    * running sum uses the default RANGE frame, so duplicate keys are
    * PEERS sharing one sequence value, and an alloc boundary landing
    * inside a peer group keeps the whole group or none of it (the
    * Σ alloc == T exhaustion-free invariant silently breaks, possibly
    * to zero rows for a source). When `orderCol` alone is not unique
    * per source (e.g. a quality score), pass a key-completing
    * `tieBreak` (e.g. the document id) — it changes WHICH equal-score
    * rows survive, never how many.
    *
    * 100-TB shape: ONE corpus-scale count aggregate; T, quotas,
    * remainders AND per-source offsets live on the STRATA frame
    * (metadata-grain — the [[apportion]] argument: a single
    * tiny-frame window is a non-issue by construction), broadcast
    * back; the per-source trim rank comes from ONE
    * [[Layout.globalDenseSeq]] over (source, order) minus the
    * broadcast offsets — the [[weightedInterleave]] discipline. A
    * per-source `row_number` window would pin each source to a
    * single task (WindowGroupLimit can't push a COLUMN limit), so a
    * 40-TB web crawl among the sources serializes one executor
    * (round-18 fix of the round-17 verdict's one perf-weak finding).
    * Never a global sort, never a driver collect.
    */
  def sizeSourcesToWeights(
      df: DataFrame, sourceCol: String, orderCol: String,
      weights: Map[String, Long], tieBreak: Seq[Column] = Nil): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    def wOf(c: Column): Column = weights.foldLeft(lit(1L)) {
      case (acc, (src, wt)) => when(c === src, lit(wt)).otherwise(acc)
    }
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    val wRank = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
      .orderBy(col("__rem").desc, col("__src"))
    val alloc = df.groupBy(col(sourceCol).as("__src"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__w", wOf(col("__src")))
      .withColumn("__Wt", sum(col("__w")).over(wAll))
      .withColumn("__T", min(expr("(__n * __Wt) div __w")).over(wAll))
      .withColumn("quota", expr("(__T * __w) div __Wt"))
      .withColumn("__rem", expr("(__T * __w) % __Wt"))
      .withColumn("__left", col("__T") - sum(col("quota")).over(wAll))
      .withColumn("__rk", row_number().over(wRank))
      .withColumn("__alloc",
        col("quota") + when(col("__rk") <= col("__left"), 1L).otherwise(0L))
      // per-source EXCLUSIVE prefix counts in source order — the
      // offsets that turn the global dense seq below into a
      // per-source rank (same strata frame, no extra corpus pass)
      .withColumn("__off", coalesce(
        sum(col("__n")).over(org.apache.spark.sql.expressions.Window
          .orderBy("__src")) - col("__n"), lit(0L)))
      .select(col("__src"), col("__alloc"), col("__off"))
    val seqd = Layout.globalDenseSeq(
      df, Seq(col(sourceCol), col(orderCol)) ++ tieBreak, "__gseq")
    seqd.join(broadcast(alloc), col(sourceCol) === col("__src"))
      .filter(col("__gseq") - col("__off") <= col("__alloc"))
      .drop("__src", "__alloc", "__off", "__gseq")
  }

  def epochMix(
      df: DataFrame, stratumCol: String, key: Column,
      weights: Map[String, Double], defaultWeight: Double = 1.0,
      salt: String = ""): DataFrame = {
    val unit = hashUnit(key, salt)
    def copiesFor(w: Double): Column = {
      require(w >= 0, s"weight must be >= 0, got $w")
      val whole = math.floor(w).toLong
      val frac = w - whole
      if (frac <= 0) lit(whole)
      else lit(whole) + when(unit < lit(thresholdHex(frac)), 1L).otherwise(0L)
    }
    val copies = weights.toSeq.sortBy(_._1).foldLeft(when(lit(false), lit(0L))) {
      case (acc, (stratum, w)) => acc.when(col(stratumCol) === stratum, copiesFor(w))
    }.otherwise(copiesFor(defaultWeight))
    df.withColumn("__copies", copies)
      .filter(col("__copies") >= 1)
      .withColumn("epoch", explode(sequence(lit(1L), col("__copies"))))
      .drop("__copies")
  }

  /** Deterministic corpus shuffle for training: every row gets a
    * (shard, shard_rank) address — reading shards in shard order, each
    * sequentially by rank, yields a reproducible pseudo-random
    * permutation of the corpus (the "shuffle once, stream sequentially"
    * layout training jobs want; `df.orderBy(rand())` is neither
    * reproducible nor oracle-checkable). The shard is the first
    * `hexChars` characters of the md5 draw (16^hexChars shards) and the
    * rank orders by the full hex (ties broken by key), so the ranking
    * window partitions BY SHARD — 16^hexChars independent partial
    * sorts, never a global single-partition sort. Scale knob: pick
    * hexChars so corpus/16^hexChars rows fit one task's sort buffer.
    */
  def shuffleShards(
      df: DataFrame, key: Column, salt: String = "", hexChars: Int = 2): DataFrame = {
    require(hexChars >= 1 && hexChars <= 8, s"hexChars in [1,8], got $hexChars")
    val h = md5(concat_ws(":", lit(salt), key.cast("string")))
    df.withColumn("shard", substring(h, 1, hexChars))
      .withColumn("shard_rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard")).orderBy(h, key)).cast("long"))
  }

  /** Contamination-safe train/val/test split. Near-duplicate documents
    * must land in the SAME split, or the held-out sets leak training
    * content — the classic train/test contamination bug that per-doc
    * random splits cannot avoid. The draw is therefore keyed on the
    * doc's dedup-CLUSTER id (the min-id representative from
    * `ConnectedComponents.dedupClusters`), so every member of a near-dup
    * cluster inherits one deterministic draw; docs without a cluster row
    * fall back to their own id (singleton semantics). `splits` are
    * (name, weight) in declared order, weights summing to 1; assignment
    * is the usual cumulative-threshold when-chain on the md5 hex draw,
    * so any engine with md5 reproduces the exact assignment.
    *
    * Scale note: pass only the NON-SINGLETON cluster rows
    * (cluster_size > 1) — the left join's own-id fallback makes that
    * equivalent to passing the full doc-grain map, and it shrinks the
    * join's right side from |corpus| to the dup mass (typically a few
    * percent), which is what makes it broadcastable. The draw itself is
    * a pure projection.
    */
  def clusterSafeSplit(
      docs: DataFrame, idCol: String, clusters: DataFrame,
      splits: Seq[(String, Double)], salt: String = ""): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got ${splits.map(_._2).sum}")
    val joined = docs
      .join(clusters.select(col(idCol), col("cluster")), Seq(idCol), "left")
      .withColumn("cluster", coalesce(col("cluster"), col(idCol)))
    val unit = hashUnit(col("cluster"), salt)
    val cums = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val assign = splits.init.zip(cums.init).foldLeft(when(lit(false), lit(""))) {
      case (acc, ((name, _), cum)) => acc.when(unit < lit(thresholdHex(cum)), name)
    }.otherwise(lit(splits.last._1))
    joined.withColumn("split", assign)
  }

  /** Stratified deterministic sample: per-stratum rates (training-data
    * mixing weights). Strata absent from `rates` fall back to
    * `defaultRate`. The predicate is a single when-chain in stratum-name
    * order — still a pure per-row filter.
    */
  def stratifiedSample(
      df: DataFrame, stratumCol: String, key: Column,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      salt: String = ""): DataFrame = {
    val unit = hashUnit(key, salt)
    def keepAt(rate: Double): Column =
      if (rate >= 1.0) lit(true) else unit < lit(thresholdHex(rate))
    val keep = rates.toSeq.sortBy(_._1).foldLeft(when(lit(false), lit(true))) {
      case (acc, (stratum, rate)) => acc.when(col(stratumCol) === stratum, keepAt(rate))
    }.otherwise(keepAt(defaultRate))
    df.filter(keep)
  }

  /** DATA-DRIVEN stratified sampling — mixing rates computed from the
    * corpus itself, fully in-plan (no `.collect()`, so the rate table
    * never rides through the driver and the operator composes into one
    * lazy query). `stratifiedSample` above takes rates the caller
    * already knows; at 100 TB the per-domain counts that determine the
    * rates are themselves a query.
    *
    * Shape: one tiny groupBy(stratum) count (combiner-pushed, output =
    * #domains rows), a 1-row min aggregate, then a BROADCAST join of
    * the rate table back onto the corpus and a per-row threshold
    * filter — the big side is never shuffled.
    *
    * `balancedMix` downsamples every stratum to the size of the
    * smallest (uniform domain mixture, the α→0 temperature limit).
    * Cross-engine-exact by construction: the threshold is
    * floor((min_n / n) · 2³²) computed with IEEE ÷, ×, floor — all
    * correctly-rounded ops, so ANY engine evaluating the same
    * expression produces the identical row set (this is what lets the
    * DuckDB oracle certify it hash-exactly; pow/log-based weights are
    * libm-dependent and live in [[temperatureMix]] instead). The
    * smallest stratum keeps ALL rows via the explicit n = min_n arm —
    * rate 1.0 has no 8-hex-digit threshold (2³² overflows it).
    */
  def balancedMix(
      df: DataFrame, stratumCol: String, key: Column, salt: String = ""): DataFrame = {
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__n"))
    val minN = counts.agg(min(col("__n")).as("__minn"))
    val rates = counts.crossJoin(broadcast(minN)).withColumn(
      "__thr",
      lpad(lower(hex(floor(
        (col("__minn").cast("double") / col("__n").cast("double")) * lit(4294967296.0)
      ).cast("long"))), 8, "0"))
    df.join(broadcast(rates), Seq(stratumCol))
      .filter(col("__n") === col("__minn") || hashUnit(key, salt) < col("__thr"))
      .drop("__n", "__minn", "__thr")
  }

  /** Deterministic NEGATIVE-PAIR sampling — contrastive-training prep:
    * k pseudo-random "negative" partners per anchor row, reproducible
    * across runs/partitionings/engines (`rand()`-based negatives
    * change every run, which breaks both replay and the oracle).
    *
    * Built on the [[shuffleShards]] permutation: every row gets a
    * (shard, shard_rank) address; anchor at rank r draws its j-th
    * negative at rank (r-1 + j·stride + j) mod shard_size + 1 of the
    * SAME shard, stride = shard_size div (k+1) — spread across the
    * shard, offset per j so the k draws are distinct for any
    * shard_size > k+1. Since shard assignment is itself an md5 draw,
    * a same-shard partner is a uniform random partner. Self-pairs
    * (possible when the modular walk wraps onto the anchor) are
    * filtered — an anchor then carries k-1 negatives, never a wrong
    * one.
    *
    * Scale shape: ranks are per-shard (16^hexChars independent
    * windows, the q86 discipline — no global sort), the shard-size
    * frame is #shards rows broadcast, and the partner lookup is one
    * (shard, rank)-keyed equi self-join. Output: (key, neg_key, j).
    */
  def negativePairs(
      df: DataFrame, key: Column, k: Int, salt: String = "",
      hexChars: Int = 2): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val addressed = shuffleShards(df.select(key.as("__key")), col("__key"), salt, hexChars)
      .select(col("__key"), col("shard"), col("shard_rank"))
    val sizes = addressed.groupBy("shard").agg(count(lit(1)).as("shard_size"))
    val anchors = addressed.join(broadcast(sizes), Seq("shard"))
      .withColumn("j", explode(sequence(lit(1L), lit(k.toLong))))
      .withColumn("neg_rank",
        pmod(col("shard_rank") - 1 +
            col("j") * expr(s"shard_size div ${k + 1}") + col("j"),
          col("shard_size")) + 1)
      .filter(col("neg_rank") =!= col("shard_rank"))
    anchors.join(
        addressed.select(col("shard"), col("shard_rank").as("neg_rank"),
          col("__key").as("neg_key")),
        Seq("shard", "neg_rank"))
      .select(col("__key").as("key"), col("neg_key"), col("j"))
  }

  /** EXACT-N deterministic sample per stratum — eval/validation-set
    * construction: "exactly 500 docs per source, reproducibly".
    * Rate-based sampling ([[hashSample]]/[[stratifiedSample]]) gives
    * binomial-noise counts; here each stratum's rows are ranked by
    * their md5 draw (ties by key — total order) and the first `n`
    * kept, so the count is exact whenever the stratum has ≥ n rows,
    * and the selection is a deterministic function of (salt, keys) —
    * stable across runs, partitionings, and engines (the oracle
    * reproduces it with the same ORDER BY).
    *
    * Scale shape: one stratum-keyed rank window. Spark 4 plans a
    * row_number ≤ n filter as WindowGroupLimit with a PARTIAL pass
    * before the exchange, so each map task forwards at most n rows per
    * stratum — the shuffle carries O(#strata · n · #tasks), not the
    * corpus (PlansSpec asserts the partial limit is present).
    */
  def sampleExactN(
      df: DataFrame, stratumCol: String, key: Column, n: Int,
      salt: String = ""): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol)).orderBy(hashUnit(key, salt), key)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }

  /** Temperature-weighted domain mixture (the general form): target
    * share of stratum d is q_d ∝ (n_d)^α (α = 1 natural proportions,
    * α < 1 flattens toward uniform, α = 0 IS uniform — use
    * [[balancedMix]] for the exact-arithmetic version), and each
    * stratum is downsampled to rate min(1, budget·q_d / n_d) for a
    * total expected output of ~`budget` rows. Same no-shuffle shape as
    * balancedMix; `pow` makes the thresholds libm-dependent in the last
    * ulp, so this variant is spec-certified (row-count tolerances)
    * rather than oracle-hashed.
    */
  def temperatureMix(
      df: DataFrame, stratumCol: String, key: Column, alpha: Double,
      budget: Long, salt: String = ""): DataFrame = {
    require(alpha >= 0, s"alpha must be >= 0, got $alpha")
    require(budget > 0, s"budget must be positive, got $budget")
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__n"))
    val z = counts.agg(sum(pow(col("__n").cast("double"), lit(alpha))).as("__z"))
    val rates = counts.crossJoin(broadcast(z))
      .withColumn("__q", pow(col("__n").cast("double"), lit(alpha)) / col("__z"))
      .withColumn("__rate",
        least(lit(1.0), lit(budget.toDouble) * col("__q") / col("__n").cast("double")))
      .withColumn("__thr",
        lpad(lower(hex(floor(col("__rate") * lit(4294967296.0)).cast("long"))), 8, "0"))
    df.join(broadcast(rates), Seq(stratumCol))
      .filter(col("__rate") >= 1.0 || hashUnit(key, salt) < col("__thr"))
      .drop("__n", "__z", "__q", "__rate", "__thr")
  }

  /** Priority sampling (Duffield-Lund-Thorup, JACM 2007): weighted
    * sampling WITHOUT replacement — each row draws u_i uniform in
    * (0, 1], gets priority q_i = w_i / u_i, and the k highest
    * priorities win. Heavy rows are near-certain picks (w_i large ⇒
    * q_i large for any draw), light rows win only on a lucky small u —
    * exactly the "sample docs proportional to token count" primitive a
    * training-data pipeline needs, with the DLT estimator (ŵ = max(w,
    * τ) for the kept rows, τ = the (k+1)-th priority) available
    * downstream because the priority column is emitted.
    *
    * Determinism and cross-engine exactness: u_i is the md5 draw as an
    * integer v in [0, 2^32) shifted to v+1 ∈ [1, 2^32], and the
    * priority is computed as (w · 2^32) / (v+1) — the multiply is
    * exact in double for integer weights below 2^21 (token/char counts
    * qualify) and the divide is one correctly-rounded IEEE op, so any
    * engine reproduces the exact double, and the top-k cut (tie-broken
    * by key — total order) is engine-independent.
    *
    * Shape: pure per-row projection + TakeOrderedAndProject — only k
    * rows per partition reach the driver-side merge, no global sort,
    * no shuffle of the corpus.
    */
  def prioritySample(
      df: DataFrame, key: Column, weight: Column, k: Int,
      salt: String = ""): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val v = conv(hashUnit(key, salt), 16, 10).cast("long")
    df.withColumn("priority",
        weight.cast("double") * lit(4294967296.0) / (v + lit(1L)).cast("double"))
      .orderBy(col("priority").desc, key)
      .limit(k)
  }

  /** Top-p (nucleus) coverage selection: per key, keep the smallest
    * prefix of rows — heaviest `weight` first — whose cumulative weight
    * reaches num/den of the key's total. The "which domains cover 95%
    * of traffic" / nucleus-truncation primitive. A row is kept iff its
    * EXCLUSIVE running weight is still below the threshold (so the row
    * that crosses the line is included, and a 100% threshold keeps
    * everything), tested as den·cum_excl < num·total — all-integer,
    * engine-exact. `tieCol` must make the per-key order total (weight
    * ties would otherwise make the boundary row engine-dependent).
    *
    * Shape: one keyed exchange, two same-spec windows over one sort
    * (running sum + partition total) — the Intervals pattern.
    */
  def topPCoverage(
      df: DataFrame, keyCol: String, weight: Column, tieCol: Column,
      num: Long, den: Long): DataFrame = {
    require(num >= 0 && den > 0 && num <= den,
      s"threshold num/den must be in [0,1], got $num/$den")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(weight.desc, tieCol)
    df.withColumn("__w", weight.cast("long"))
      .withColumn("__cum",
        coalesce(sum(col("__w")).over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__tot",
        sum(col("__w")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(keyCol)))
      .filter(lit(den) * col("__cum") < lit(num) * col("__tot"))
      .drop("__w", "__cum", "__tot")
  }

  /** Largest-remainder (Hamilton) apportionment of an integer `budget`
    * across strata, proportional to stratum row counts: quota =
    * (budget·n_d) div total, and the budget − Σ quota leftover units go
    * one each to the strata with the largest remainders (ties by
    * stratum name — total order). Σ alloc == budget EXACTLY whenever
    * budget ≥ 0 — the property rate-based mixing can't give you, and
    * all-integer arithmetic, so engine-exact.
    *
    * Shape: one corpus-scale count aggregate; everything after runs on
    * the STRATA frame (metadata-grain — domains/sources, thousands at
    * most), where the single global remainder-rank window is a
    * non-issue by construction.
    */
  def apportion(df: DataFrame, stratumCol: String, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n_rows"))
    val total = counts.agg(sum(col("n_rows")).as("__total"))
    val q = counts.crossJoin(broadcast(total))
      .withColumn("quota", expr(s"(${budget}L * n_rows) div __total"))
      .withColumn("__rem", expr(s"(${budget}L * n_rows) % __total"))
    val left = q.agg((lit(budget) - sum(col("quota"))).as("__left"))
    q.crossJoin(broadcast(left))
      .withColumn("__rk", row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("__rem").desc, col(stratumCol))))
      .withColumn("alloc",
        col("quota") + when(col("__rk") <= col("__left"), 1L).otherwise(0L))
      .select(col(stratumCol), col("n_rows"), col("alloc"))
  }

  /** Exact pro-rata allocation at JOIN grain (payment splitting, cost
    * attribution, revenue sharing): within each `keyCol` group, split
    * that group's `totalCol` units across its rows proportionally to
    * `weightCol`, largest-remainder exact — Σ alloc == total PER KEY,
    * all-integer (the Hamilton discipline of [[apportion]] applied
    * per-group with weights instead of counts). `tieCols` must make
    * the within-key order total (the q94 lesson) or the remainder
    * units land on engine-dependent rows. Zero-weight-sum groups
    * allocate everything to rank 1..total? No — they have no basis:
    * quota is 0 for every row and the leftover goes to the first
    * `total mod n`… meaningless; such groups are DROPPED (a group
    * with no positive weight cannot be split pro-rata).
    *
    * Shape: one keyed exchange shared by the two window passes (group
    * sum + remainder rank) and the projection — no joins, no driver.
    */
  def prorataAllocate(
      df: DataFrame, keyCol: String, weightCol: String, totalCol: String,
      tieCols: Seq[String]): DataFrame = {
    require(tieCols.nonEmpty, "need tie-break columns for a total order")
    val wKey = org.apache.spark.sql.expressions.Window.partitionBy(keyCol)
    val wRank = org.apache.spark.sql.expressions.Window.partitionBy(keyCol)
      .orderBy(col("__rem").desc +: tieCols.map(col): _*)
    df.select(Seq(col(keyCol), col(weightCol).cast("long").as("__w"),
        col(totalCol).cast("long").as("__t")) ++ tieCols.map(col): _*)
      .filter(col("__w") >= 0)
      .withColumn("__ws", sum(col("__w")).over(wKey))
      .filter(col("__ws") > 0)
      .withColumn("quota", expr("(__t * __w) div __ws"))
      .withColumn("__rem", expr("(__t * __w) % __ws"))
      .withColumn("__left", col("__t") - sum(col("quota")).over(wKey))
      .withColumn("__rk", row_number().over(wRank))
      .withColumn("alloc",
        col("quota") + when(col("__rk") <= col("__left"), 1L).otherwise(0L))
      .select((col(keyCol) +: tieCols.map(col)) ++
        Seq(col("__w").as("weight"), col("alloc")): _*)
  }

  /** Exact-budget weighted mixture: [[apportion]] splits the budget
    * across strata by size, then each stratum keeps its `alloc`
    * highest-priority rows under the [[prioritySample]] draw (w/u
    * priorities — heavy rows win). The output size is EXACTLY
    * min(budget, corpus) rows, deterministically, with within-stratum
    * selection weighted by `weight` — the "give me exactly N training
    * docs, fairly across domains, favoring long docs" primitive.
    *
    * Scale note: the per-stratum rank is a dynamic-limit window (alloc
    * is a column), so unlike [[sampleExactN]]'s static n it gets no
    * WindowGroupLimit partial — each stratum pays one bounded sort.
    */
  def priorityApportion(
      df: DataFrame, stratumCol: String, key: Column, weight: Column,
      budget: Long, salt: String = ""): DataFrame = {
    val alloc = apportion(df, stratumCol, budget)
      .select(col(stratumCol), col("alloc"))
    val v = conv(hashUnit(key, salt), 16, 10).cast("long")
    df.withColumn("priority",
        weight.cast("double") * lit(4294967296.0) / (v + lit(1L)).cast("double"))
      .join(broadcast(alloc), Seq(stratumCol))
      .withColumn("__rk", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(stratumCol).orderBy(col("priority").desc, key)))
      .filter(col("__rk") <= col("alloc"))
      .drop("__rk", "alloc")
  }

  /** TOKEN-BUDGET corpus selection: greedily keep the best-scoring
    * documents until a global cost budget (token count, bytes) is
    * spent. Exact semantics: order all rows by (score DESC, id ASC) —
    * a total order, ids unique — take the running INCLUSIVE sum of
    * `costCol`, and select while `cum_cost <= budget`. Every input
    * row comes back with its cum_cost and a `selected` flag (the
    * boundary row that lands exactly ON the budget is selected).
    *
    * The naive plan is a global orderBy + single-partition running
    * window — the WindowExec "moving all data to a single partition"
    * trap. Delegates to [[graft.operators.Layout.globalRunningSum]]
    * (the globalDenseSeq machinery, shared): range-partition on the
    * order key, cumsum WITHIN each partition, then an exclusive
    * prefix sum over the ≤P-row per-partition totals, broadcast back.
    * Result depends only on the total order, never on partition
    * boundaries — deterministic across cluster configs and AQE
    * decisions.
    *
    * CONTRACT: score and cost non-null (engines disagree on DESC null
    * placement), cost ≥ 0 (a negative cost would make the greedy
    * prefix non-monotone and the budget cut meaningless).
    */
  def selectByBudget(
      df: DataFrame, idCol: String, scoreCol: String, costCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0L, s"budget must be nonnegative, got $budget")
    Layout.globalRunningSum(df,
        Seq(col(scoreCol).desc, col(idCol).asc), col(costCol), "cum_cost")
      .withColumn("selected", col("cum_cost") <= budget)
  }
}
