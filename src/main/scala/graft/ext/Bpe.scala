package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair encoding, the real thing (Sennrich, Haddow, Birch, ACL
  * 2016): learn the top-k symbol merges over the corpus word-type
  * vocabulary, then tokenize by applying them in rank order. q106
  * induces ONE round of pair statistics; this closes the loop — an
  * actual trained subword tokenizer with a distributed encoder, the
  * operator a training-data pipeline runs to budget token counts.
  *
  * Distributed shape (the part that must survive 100 TB):
  *  - the corpus is touched ONCE, by the word-count aggregate — one
  *    keyed shuffle down to the word-TYPE table, which is
  *    vocabulary-sized (bounded by language, not corpus: ~10^5-10^6
  *    rows at any scale);
  *  - each training round is one pair-count aggregate over the vocab
  *    table plus a single-row argmax to the driver (a bounded
  *    convergence collect, k rows total across the train — the
  *    TreePaths class of driver access, not a data collect);
  *  - merge application is a pure string projection on the vocab
  *    table; encoding joins the exploded corpus tokens against the
  *    encoded dictionary — the corpus-sized side flows through ONE
  *    equi-join against a broadcastable side and never re-runs the
  *    merge chain per occurrence.
  *
  * Representation: every symbol is wrapped in '.' delimiters and
  * concatenated — "the" → ".t..h..e.". A merge (x, y) is the literal
  * replace of ".x..y." with ".xy.": since '.' never occurs inside a
  * symbol ([a-z0-9] only), the pattern matches exactly full-symbol
  * adjacency, and left-to-right non-overlapping replace IS the BPE
  * merge rule (".a..a..a." merges the leftmost pair only). Pair
  * STATISTICS count overlapping adjacencies ("aaa" has two (a,a)
  * pairs) — the classic get_stats/apply asymmetry, preserved here.
  * DuckDB's replace has identical semantics, which is what makes the
  * whole train+encode loop oracle-certifiable (q197/q198).
  *
  * Ties in pair counts break lexicographically on the "x y" pair
  * string (ASCII-only alphabet, so both engines compare identically).
  * No end-of-word marker symbol: merges never cross word boundaries
  * and the marker adds nothing under the [a-z0-9]+ pre-tokenizer
  * (documented divergence from the paper's '</w>').
  */
object Bpe {

  final case class Merge(rank: Int, x: String, y: String, cnt: Long)

  /** '.'-wrapped symbol string of a word: "ab1" → ".a..b..1.". */
  def wrapChars(word: Column): Column =
    concat(lit("."), array_join(regexp_extract_all(word, lit("."), lit(0)), ".."), lit("."))

  /** Symbols of a wrapped string — [a-z0-9]+ runs between the dots. */
  def symsOf(sym: Column): Column =
    regexp_extract_all(sym, lit("[a-z0-9]+"), lit(0))

  /** Literal (non-regex) replace — REPLACE in both engines: all
    * occurrences, left to right, non-overlapping.
    */
  private def replaceLit(s: Column, from: String, to: String): Column =
    call_function("replace", s, lit(from), lit(to))

  private def applyMerge(sym: Column, x: String, y: String): Column =
    replaceLit(sym, s".$x..$y.", s".$x$y.")

  /** (word, freq) types with their initial symbol strings. */
  private def vocabOf(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .withColumn("__sym", wrapChars(col("w")))

  /** Adjacent-pair counts over the vocab, weighted by word frequency. */
  private def pairCounts(vocab: DataFrame): DataFrame = {
    val s = symsOf(col("__sym"))
    vocab
      .select(col("freq"), explode(
        zip_with(slice(s, lit(1), size(s) - 1), slice(s, lit(2), size(s) - 1),
          (a, b) => concat(a, lit(" "), b))).as("pair"))
      .groupBy("pair").agg(sum(col("freq")).as("cnt"))
  }

  /** Train k merges. Each round: one vocab-table aggregate + a 1-row
    * driver argmax (count DESC, pair ASC). Stops early if no pair is
    * left (fully merged vocabulary).
    */
  def learnMerges(docs: DataFrame, textCol: String, k: Int): Seq[Merge] = {
    var vocab = vocabOf(docs, textCol).localCheckpoint()
    val out = Seq.newBuilder[Merge]
    var r = 1
    var done = false
    while (r <= k && !done) {
      val best = pairCounts(vocab)
        .orderBy(col("cnt").desc, col("pair").asc).limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val pair = best(0).getAs[String]("pair")
        val cnt = best(0).getAs[Long]("cnt")
        val Array(x, y) = pair.split(" ", 2)
        out += Merge(r, x, y, cnt)
        // materialize the new round's checkpoint, then free the previous
        // one — otherwise a k-round train retains k vocab-table copies in
        // block-manager storage for the life of the session
        val prev = vocab
        vocab = vocab.withColumn("__sym", applyMerge(col("__sym"), x, y))
          .localCheckpoint()
        prev.unpersist()
        r += 1
      }
    }
    // the FINAL round's checkpoint has no further consumer either —
    // free it deterministically rather than waiting on ContextCleaner
    vocab.unpersist()
    out.result()
  }

  /** The trained merges as a DataFrame — q197's row surface. */
  def trainReport(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    learnMerges(docs, textCol, k)
      .map(m => (m.rank.toLong, s"${m.x} ${m.y}", m.cnt))
      .toDF("rank", "pair", "cnt")
  }

  /** Encode a word-type dictionary: apply the merges in rank order as
    * one chained-replace projection, emit (…, bpe_syms, n_sym).
    */
  def encodeVocab(words: DataFrame, wordCol: String, merges: Seq[Merge]): DataFrame = {
    val symN = merges.sortBy(_.rank).foldLeft(wrapChars(col(wordCol))) {
      (s, m) => applyMerge(s, m.x, m.y)
    }
    words.withColumn("bpe_syms", symsOf(symN))
      .withColumn("n_sym", size(col("bpe_syms")).cast("long"))
  }

  /** Per-document BPE token counts: explode corpus tokens once, join
    * against the encoded word dictionary (vocabulary-sized — the
    * broadcastable side at any corpus scale), sum symbol counts.
    */
  def encodeCounts(
      docs: DataFrame, idCol: String, textCol: String, merges: Seq[Merge]): DataFrame = {
    val toks = docs.select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("w"))
    val dict = encodeVocab(toks.select("w").distinct(), "w", merges)
      .select(col("w"), col("n_sym"))
    toks.join(dict, Seq("w"))
      .groupBy(idCol)
      .agg(sum(col("n_sym")).as("n_bpe"), count(lit(1)).as("n_words"))
  }

  /** Persist a trained tokenizer: merges/ (rank, x, y, cnt) + params/.
    * The merge list IS the model (the HuggingFace merges.txt shape) —
    * train once on the reference corpus snapshot, encode every later
    * batch against the FROZEN ranks: retraining on grown data would
    * silently shift token boundaries and break every downstream
    * token-count contract, the same reason q193 freezes its PQ
    * codebook.
    */
  def writeModel(
      merges: Seq[Merge], spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    import spark.implicits._
    merges.map(m => (m.rank, m.x, m.y, m.cnt)).toDF("rank", "x", "y", "cnt")
      .coalesce(1).write.mode("overwrite").parquet(path + "/merges")
    Seq(merges.length).toDF("k")
      .coalesce(1).write.mode("overwrite").parquet(path + "/params")
  }

  /** Load a stored model — k rows to the driver: this is the MODEL
    * (bounded by the merge budget), not data.
    */
  def readModel(spark: org.apache.spark.sql.SparkSession, path: String): Seq[Merge] =
    spark.read.parquet(path + "/merges").collect()
      .map(r => Merge(r.getAs[Int]("rank"), r.getAs[String]("x"),
        r.getAs[String]("y"), r.getAs[Long]("cnt")))
      .sortBy(_.rank).toSeq
}
