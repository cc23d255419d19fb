package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication at training-corpus scale.
  *
  * Two levels:
  *  - exact: hash-groupBy on a canonical content hash — one shuffle on
  *    the hash key, fully distributed.
  *  - near-dup: MinHash + banded LSH. Signatures are computed per-row
  *    (no shuffle); candidate pairs come from a self-equi-join on
  *    (band, band-hash) buckets — NEVER an all-pairs product — then a
  *    single exact-Jaccard verification pass over candidates only.
  *    At 100 TB the bucket join shuffles each doc's 32 band keys, i.e.
  *    O(n·bands) rows, and the pair verification is proportional to the
  *    number of colliding pairs, not n².
  *
  * Skew note: a pathological bucket (thousands of byte-identical docs)
  * would make the bucket self-join quadratic in that bucket. Run
  * `exactDedup` first so byte-identical mass collapses to one
  * representative before LSH, and leave AQE skew-join on for the rest.
  */
object Dedup {

  /** MinHash universe: h_i(x) = (a_i·x + b_i) mod P over x = base
    * shingle hash in [0, P). P = 2^31-1 (prime); a,b < P so a·x + b
    * stays under 2^62 — no 64-bit overflow.
    */
  val P = 2147483647L

  /** Fixed seed pairs: java.util.Random's LCG is specified by the JDK
    * spec, so these are deterministic across JVMs/runs.
    */
  def seedPairs(numHashes: Int, seed: Long = 42L): Seq[(Long, Long)] = {
    val rnd = new java.util.Random(seed)
    def next(bound: Long): Long = math.floorMod(rnd.nextLong(), bound)
    Seq.fill(numHashes)((next(P - 1) + 1, next(P)))
  }

  /** Exact dedup by canonical hash: one row per distinct content, with
    * the deterministic representative (min id) and the duplicate count.
    * (Spark's dropDuplicates keeps an *arbitrary* row; min-id keep makes
    * the result reproducible and oracle-checkable.)
    */
  def exactDedup(df: DataFrame, idCol: String, keyCol: Column): DataFrame =
    df.groupBy(keyCol.as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact n-gram-Jaccard near-dup pairs via a shingle inverted index:
    * pairs come from the self-equi-join on shared shingles (postings),
    * so work is Σ|posting list|² — candidates share content by
    * construction, never an all-pairs product. Returns
    * (doc_a, doc_b, jaccard) with jaccard >= threshold, doc_a < doc_b.
    *
    * Scale hazard: a stop-shingle ("of the and"-style) with a huge
    * posting list makes its join quadratic (posting-join work is
    * Σ df², unbounded without a cap). Two pruning knobs, composable:
    *  - `maxShingleDf`: absolute document-frequency cap (classic
    *    inverted-index pruning).
    *  - `maxShingleDfPermille`: corpus-relative stop-shingle cap —
    *    drop shingles appearing in more than pm‰ of documents, with
    *    cap = greatest(1, n_docs·pm div 1000) in pure integer
    *    arithmetic so a SQL oracle reproduces it bit-for-bit. Relative
    *    is the right near-dup semantics: duplicate-cluster shingles
    *    have df ≈ cluster size (signal, grows with the corpus), while
    *    stop-shingles have df ≈ a corpus fraction (noise).
    * Near-dup pairs still share plenty of rare shingles; both None
    * keeps the operator exact. For corpora where any posting join is
    * too hot, use the minhash-LSH variant below.
    */
  def ngramJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, threshold: Double = 0.5,
      maxShingleDf: Option[Int] = None,
      maxShingleDfPermille: Option[Int] = None): DataFrame = {

    // repartition by doc id first: see the note in nearDupPairsMinhash
    val base = TextAnalysis.withShingleSet(
        docs.select(col(idCol).as("__id"), col(textCol).as("__text"))
          .repartition(col("__id")), "__text", shingleK, "__sh")
      .select(col("__id"), col("__sh"))
    val feat = base
      .select(col("__id"), explode_outer(col("__sh")).as("__f"))
      .filter(col("__f").isNotNull)
    val posting =
      if (maxShingleDf.isEmpty && maxShingleDfPermille.isEmpty) feat
      else {
        val dfreq = feat.groupBy("__f").agg(count(lit(1)).as("__df"))
        val absPruned = maxShingleDf.map(c => dfreq.filter(col("__df") <= c)).getOrElse(dfreq)
        val pruned = maxShingleDfPermille match {
          case Some(pm) =>
            // n_docs as a broadcast 1-row frame, not a driver .count():
            // the cap stays inside the plan, no extra action
            val tot = base.agg(count(lit(1)).as("__tot"))
            absPruned.crossJoin(broadcast(tot))
              .filter(col("__df") <= greatest(lit(1L), expr(s"(__tot * $pm) div 1000")))
          case None => absPruned
        }
        feat.join(pruned.select("__f"), Seq("__f")).select("__id", "__f")
      }
    val sz = feat.groupBy("__id").agg(count(lit(1)).as("__n"))
    val inter = posting.as("a")
      .join(posting.as("b"), col("a.__f") === col("b.__f") && col("a.__id") < col("b.__id"))
      .groupBy(col("a.__id").as("doc_a"), col("b.__id").as("doc_b"))
      .agg(count(lit(1)).as("__i"))
    inter
      .join(sz.select(col("__id"), col("__n").as("__na")), col("doc_a") === col("__id")).drop("__id")
      .join(sz.select(col("__id"), col("__n").as("__nb")), col("doc_b") === col("__id")).drop("__id")
      .withColumn("jaccard",
        col("__i").cast("double") / (col("__na") + col("__nb") - col("__i")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Near-duplicate pairs by minhash-LSH with exact n-gram-Jaccard
    * verification. Returns (doc_a, doc_b, jaccard) for verified pairs
    * with Jaccard >= threshold, doc_a < doc_b.
    *
    * Signature shape: explode the shingle set, hash each shingle ONCE,
    * then numHashes `min` aggregations grouped by doc (map-side partial
    * combine, one shuffle keyed by doc id). The tempting per-row
    * alternative — nested higher-order array expressions — is a trap:
    * Catalyst's projection collapse inlines the shared base-hash
    * subexpression into every one of the 128 array_min lambdas,
    * recomputing xxhash64 |shingles|×128 times per row (measured 20×
    * slower at sf0.1).
    *
    * With bands=32 × rowsPerBand=4 (128 hashes) the probability of
    * missing a pair at similarity s is (1-s^4)^32 — ~1e-15 at s=0.9 —
    * so at thresholds below the corpus's near-dup band the candidate
    * set is effectively exhaustive while doing no all-pairs work.
    */
  /** INCREMENTAL near-dup: pairs (new_id, corpus_id, jaccard) between a
    * new batch and an existing corpus — the production shape (dedup
    * today's crawl against the historical index). The banded join is
    * strictly cross-side, so corpus×corpus candidates NEVER
    * materialize: per-batch work is O(|new|·bands + matching corpus
    * buckets), not a full self-join re-run. At real scale the corpus
    * side's signatures/bands would be precomputed and stored — the
    * pipeline here recomputes them, but the JOIN shape is already the
    * incremental one. Ids must be distinct across the two frames.
    */
  def nearDupPairsMinhashAgainst(
      newDocs: DataFrame, corpus: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 128, bands: Int = 32,
      threshold: Double = 0.8): DataFrame = {
    require(numHashes == bands * (numHashes / bands), "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val seeds = seedPairs(numHashes)
    def prep(df: DataFrame, side: String): DataFrame =
      TextAnalysis.withShingleSet(
          df.select(col(idCol).as("__id"), col(textCol).as("__text"))
            .repartition(col("__id")), "__text", shingleK, "__sh")
        .select(col("__id"), col("__sh"), lit(side).as("__side"))
    val base = prep(newDocs, "n").unionByName(prep(corpus, "c"))
    val minAggs = seeds.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("__x") * a + b, lit(P))).as(s"__m$i")
    }
    val sig = base
      .select(col("__id"), col("__side"), explode_outer(col("__sh")).as("__f"))
      .filter(col("__f").isNotNull)
      .withColumn("__x", pmod(xxhash64(col("__f")), lit(P)))
      .groupBy("__id", "__side")
      .agg(minAggs.head, minAggs.tail: _*)
    val bandCols = (0 until bands).map { bd =>
      xxhash64(lit(bd) +: (0 until rowsPerBand).map(r => col(s"__m${bd * rowsPerBand + r}")): _*)
    }
    val banded = sig
      .select(col("__id"), col("__side"), posexplode(array(bandCols: _*)))
      .toDF("__id", "__side", "band", "bh")
    val cands = banded.filter(col("__side") === "n").as("x")
      .join(banded.filter(col("__side") === "c").as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh"))
      .select(col("x.__id").as("new_id"), col("y.__id").as("corpus_id"))
      .distinct()
    cands
      .join(base.filter(col("__side") === "n")
        .select(col("__id"), col("__sh").as("__sha")), col("new_id") === col("__id"))
      .drop("__id", "__side")
      .join(base.filter(col("__side") === "c")
        .select(col("__id"), col("__sh").as("__shb")), col("corpus_id") === col("__id"))
      .drop("__id", "__side")
      .withColumn("__inter", size(array_intersect(col("__sha"), col("__shb"))))
      .withColumn("__union", size(col("__sha")) + size(col("__shb")) - col("__inter"))
      .withColumn("jaccard", col("__inter").cast("double") / col("__union").cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("new_id", "corpus_id", "jaccard")
  }

  def nearDupPairsMinhash(
      docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 128, bands: Int = 32,
      threshold: Double = 0.8): DataFrame = {
    require(numHashes == bands * (numHashes / bands), "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val seeds = seedPairs(numHashes)

    // repartition by doc id BEFORE the shingle/hash work: a small corpus
    // arrives as one parquet split, which would run the whole CPU-heavy
    // scan-side pipeline (regex tokenize, shingle, hash) on a single
    // task. Hash-partitioning the raw (id, text) rows spreads that work
    // across the cluster AND already satisfies the signature aggregate's
    // clustering, so the exchange that would otherwise sit after the
    // (much wider) exploded feature stream is elided — the shuffle moves
    // earlier and smaller. At 100 TB the scan is naturally multi-split,
    // and pre-clustering by id is still the cheaper place to shuffle.
    val base = TextAnalysis.withShingleSet(
        docs.select(col(idCol).as("__id"), col(textCol).as("__text"))
          .repartition(col("__id")), "__text", shingleK, "__sh")
      .select(col("__id"), col("__sh"))

    // one base hash per (doc, shingle) row, then 128 partial-agg mins.
    // explode_OUTER + isNotNull on the generator OUTPUT, not a plain
    // explode: for a plain Generate, InferFiltersFromGenerate
    // synthesizes `size(input) > 0` and pushdown inlines the entire
    // shingle expression — per-element regex re-evaluation included —
    // into a per-row scan predicate (measured ~15s of pure waste at
    // sf0.1). The outer variant infers nothing, and a predicate on the
    // generate output cannot be pushed below the Generate.
    val minAggs = seeds.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("__x") * a + b, lit(P))).as(s"__m$i")
    }
    val sig = base
      .select(col("__id"), explode_outer(col("__sh")).as("__f"))
      .filter(col("__f").isNotNull)
      .withColumn("__x", pmod(xxhash64(col("__f")), lit(P)))
      .groupBy("__id")
      .agg(minAggs.head, minAggs.tail: _*)

    // band key = hash of the band's rowsPerBand signature slots
    val bandCols = (0 until bands).map { bd =>
      xxhash64(lit(bd) +: (0 until rowsPerBand).map(r => col(s"__m${bd * rowsPerBand + r}")): _*)
    }
    val banded = sig
      .select(col("__id"), posexplode(array(bandCols: _*)))
      .toDF("__id", "band", "bh")

    val cands = banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.__id") < col("y.__id"))
      .select(col("x.__id").as("doc_a"), col("y.__id").as("doc_b"))
      .distinct()

    val withSets = cands
      .join(base.select(col("__id"), col("__sh").as("__sha")), col("doc_a") === col("__id"))
      .drop("__id")
      .join(base.select(col("__id"), col("__sh").as("__shb")), col("doc_b") === col("__id"))
      .drop("__id")

    withSets
      .withColumn("__inter", size(array_intersect(col("__sha"), col("__shb"))))
      .withColumn("__union", size(col("__sha")) + size(col("__shb")) - col("__inter"))
      .withColumn("jaccard", col("__inter").cast("double") / col("__union").cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }
}
