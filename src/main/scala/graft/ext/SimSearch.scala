package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.CosineSimilarity

/** Similarity search over an embedding column (array<float>).
  *
  * Numeric convention for cross-engine determinism: every elementwise
  * product is taken in DOUBLE (float->double is exact) and summed with a
  * sequential left-to-right fold (`aggregate`), which any engine
  * reproduces bit-for-bit — a parallel/SIMD sum would have
  * order-dependent rounding. cosine = dot / sqrt(na*nb) with exactly
  * this operand shape on both sides.
  *
  * Scale paths:
  *  - `bruteForceTopK`: query batch (small, broadcast) × corpus — one
  *    pass over the corpus, no shuffle of the corpus side, O(|Q|·n·d)
  *    work. Right when |Q| is a bounded batch.
  *  - `lshTopK`: random-hyperplane signature buckets; each corpus row
  *    lands in its bucket (one narrow column), queries probe only their
  *    own bucket — candidate set shrinks ~2^bits-fold at some recall
  *    cost. Right for n×n self-search or huge query sets. (IVF with
  *    k-means centroids is the next step up; the bucket-join plumbing
  *    is identical.)
  */
object SimSearch {

  /** Sequential-fold dot product of two float-array columns, in double. */
  def dotD(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column = dotD(a, a)

  /** Cosine via the canonical portable shape dot / sqrt(na*nb); operands
    * `na`, `nb` should be precomputed norm2 columns. This is the
    * reference formulation the SQL oracle mirrors; the operators below
    * use the fused codegen'd CosineSimilarity expression, which is
    * bit-identical (PlansSpec) and one array traversal instead of three.
    */
  def cosine(dot: Column, na: Column, nb: Column): Column =
    dot / sqrt(na * nb)

  /** Native one-pass cosine (graft.plans.CosineSimilarity). */
  def cosineSim(spark: SparkSession, a: Column, b: Column): Column = {
    CosineSimilarity.register(spark)
    call_function(CosineSimilarity.fnName, a, b)
  }

  /** Exact top-k nearest (cosine) corpus rows for each query row.
    * `queries` must be a bounded batch — it is broadcast. Ties broken by
    * ascending corpus id for determinism. Self-matches excluded.
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {

    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))

    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosineSim(corpus.sparkSession, col("__qv"), col("__cv")))

    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** All pairs with cosine >= threshold — embedding-space near-dup
    * detection. Exact (shuffle join on id inequality): the oracle-
    * matched baseline. The LSH-bucketed path (join on `hyperplaneSig`
    * equality instead, as in `lshTopK`) is the 100-TB variant, at
    * recall < 1 for thresholds this low.
    */
  def nearDupPairsCosine(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val n = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    n.as("a").join(n.as("b"), col("a.__id") < col("b.__id"))
      .select(
        col("a.__id").as("vec_a"), col("b.__id").as("vec_b"),
        cosineSim(corpus.sparkSession, col("a.__v"), col("b.__v")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Random-hyperplane LSH signature: one sign bit per hyperplane,
    * packed to a long. Hyperplane components are deterministic from
    * `seed` (java.util.Random gaussians — JDK-specified algorithm).
    */
  def hyperplaneSig(vec: Column, dim: Int, bits: Int, seed: Long = 7L): Column = {
    val rnd = new java.util.Random(seed)
    val planes = Seq.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
    val bitCols = planes.map { p =>
      val dot = aggregate(
        zip_with(vec, typedLit(p.toSeq), (x, y) => x.cast("double") * y),
        lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, 1L).otherwise(0L)
    }
    bitCols.zipWithIndex.map { case (b, i) => b * (1L << i) }.reduce(_ + _)
  }

  /** Approximate top-k: candidates restricted to rows sharing a
    * hyperplane bucket with the query in at least one of `tables`
    * independent signatures (OR-amplification — the standard recall
    * lever: per-table bucket probability p gives overall 1-(1-p)^T).
    * Each row carries `tables` (table, sig) keys; the candidate join is
    * an equi-join on them — shuffle on narrow keys, never a cross
    * product. Tune `bits` down / `tables` up for recall, the reverse
    * for throughput.
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, dim: Int, bits: Int, tables: Int = 8): DataFrame = {

    def sigs(vec: Column): Column =
      array((0 until tables).map(t =>
        struct(lit(t).as("t"), hyperplaneSig(vec, dim, bits, seed = 7L + t).as("sig"))): _*)

    val c = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      explode(sigs(col(vecCol))).as("__s"))
    val q = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("__qv"),
      explode(sigs(col(vecCol))).as("__s"))

    val scored = c.join(q, Seq("__s"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cosine", cosineSim(corpus.sparkSession, col("__qv"), col("__cv")))

    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }
}
