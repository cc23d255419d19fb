package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate detection.
  *
  * 48-bit simhash over the distinct-shingle feature set, banded into
  * 4×12-bit chunks for candidate generation (docs sharing >=1 chunk),
  * then exact hamming distance over candidates. As with minhash-LSH the
  * work is per-row signature computation (no shuffle) + an equi-join on
  * chunk values — never all-pairs.
  *
  * The feature hash is built from md5 hex (engine-portable) rather than
  * an engine-internal hash so a SQL oracle can reproduce every bit:
  * h48(s) = fold over the first 12 hex chars of md5(s), base 16. 48 bits
  * keeps every intermediate (and 2^j scale factors) exactly representable
  * in both BIGINT and DOUBLE, with no signed-64 overflow in either
  * engine.
  */
object SimHash {

  val Bits = 48
  val Chunks = 4
  val ChunkBits = Bits / Chunks

  /** Array of per-feature 48-bit hashes from an array of md5 hex digests
    * (expression string: needs substring with a dynamic position, which
    * the SQL surface allows but the Scala functions API does not).
    */
  private val h48FromMd5: String =
    """transform(__md5s, h -> aggregate(sequence(1, 12), 0L, (acc, i) ->
      |  acc * 16 + CASE WHEN ascii(substring(h, i, 1)) <= 57
      |                  THEN ascii(substring(h, i, 1)) - 48
      |                  ELSE ascii(substring(h, i, 1)) - 87 END))""".stripMargin

  /** Adds `bitsCol` (array<bigint> of 48 bits, index j = bit j) and
    * `valueCol` (the assembled 48-bit simhash) for the feature-set
    * column `featCol`.
    */
  def withSimhash(df: DataFrame, featCol: String, bitsCol: String, valueCol: String): DataFrame =
    df.withColumn("__md5s", transform(col(featCol), f => md5(f)))
      .withColumn("__h48s", expr(h48FromMd5))
      .withColumn(bitsCol, expr(
        s"""transform(sequence(0, ${Bits - 1}), j ->
           |  CASE WHEN aggregate(__h48s, 0L, (acc, h) ->
           |    acc + 2 * ((h div cast(pow(2, j) as bigint)) % 2) - 1) > 0
           |  THEN 1L ELSE 0L END)""".stripMargin))
      .withColumn(valueCol, expr(
        s"""aggregate(sequence(0, ${Bits - 1}), 0L, (acc, j) ->
           |  acc + element_at($bitsCol, j + 1) * cast(pow(2, j) as bigint))""".stripMargin))
      .drop("__md5s", "__h48s")

  /** Near-dup pairs: simhash chunk-collision candidates with exact
    * hamming distance <= maxHamming. Returns (doc_a, doc_b, hamming).
    */
  def nearDupPairsSimhash(
      docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, maxHamming: Int = 8): DataFrame = {

    val base = withSimhash(
      docs.select(col(idCol).as("__id"),
          TextAnalysis.shingleSet(col(textCol), shingleK).as("__sh"))
        .filter(size(col("__sh")) > 0),
      "__sh", "__bits", "__v")

    val chunked = base.select(
      col("__id"), col("__bits"),
      // floor(x / 2^k) == integer division for the non-negative __v, and
      // the double division is exact for 48-bit values
      posexplode(transform(sequence(lit(0), lit(Chunks - 1)),
        c => pmod(floor(col("__v") / pow(lit(2), c * ChunkBits)).cast("bigint"), lit(1 << ChunkBits)))))
      .toDF("__id", "__bits", "chunk", "cv")

    val cands = chunked.as("x")
      .join(chunked.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.cv") === col("y.cv") &&
          col("x.__id") < col("y.__id"))
      .select(
        col("x.__id").as("doc_a"), col("y.__id").as("doc_b"),
        col("x.__bits").as("__ba"), col("y.__bits").as("__bb"))
      .dropDuplicates("doc_a", "doc_b")

    cands
      .withColumn("hamming",
        aggregate(zip_with(col("__ba"), col("__bb"),
          (x, y) => when(x === y, 0L).otherwise(1L)), lit(0L), (acc, v) => acc + v))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }
}
