package graft.operators

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Bloom-filter join pruning — the explicit form of the runtime filter a
  * 100-TB semi join needs: build a compact Bloom filter over the SMALL
  * side's join keys (one partial-aggregable pass, a few MB regardless of
  * big-side size), filter the BIG side with it BEFORE the shuffle, then
  * run the exact join on the survivors. False positives are removed by
  * the exact join; false negatives are impossible, so the result set is
  * IDENTICAL to the plain semi join — what changes is shuffle volume:
  * only keys that plausibly match ever leave the big side's map tasks.
  *
  * Spark has this machinery built in (`InjectRuntimeFilter` rewrites
  * eligible shuffle joins to exactly this shape), but it is heuristic —
  * it requires a selective filter on the creation side and bails on many
  * plans. This operator is the deterministic user-facing form, built on
  * Spark's own `BloomFilterAggregate` / `BloomFilterMightContain`
  * expressions (codegen'd, partial-aggregable). They are registered in
  * Spark's INTERNAL function registry only, so we register them under
  * graft names; `might_contain` demands its filter argument be a scalar
  * subquery (or literal), which is how the built filter reaches every
  * big-side task without a shuffle — Spark evaluates the subquery once
  * and ships the serialized filter with the task binary.
  *
  * Reference scope: the reference engine has no runtime-filter surface;
  * this is part of the 100-TB extension family (SURVEY.md north star).
  */
object BloomJoin {
  private val viewSeq = new AtomicLong(0)

  /** Register Spark's internal Bloom expressions under graft names
    * (idempotent per session).
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("graft_bloom_agg"))) {
      reg.registerFunction(
        FunctionIdentifier("graft_bloom_agg"),
        new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
        (children: Seq[Expression]) => children match {
          case Seq(c)       => new BloomFilterAggregate(c)
          case Seq(c, n)    => new BloomFilterAggregate(c, n)
          case Seq(c, n, b) => new BloomFilterAggregate(c, n, b)
          case _ => throw new IllegalArgumentException(
            "graft_bloom_agg expects (child[, estimatedItems[, numBits]])")
        })
    }
    if (!reg.functionExists(FunctionIdentifier("graft_might_contain"))) {
      reg.registerFunction(
        FunctionIdentifier("graft_might_contain"),
        new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_might_contain"),
        (children: Seq[Expression]) => children match {
          case Seq(bf, v) => BloomFilterMightContain(bf, v)
          case _ => throw new IllegalArgumentException(
            "graft_might_contain expects (bloomFilter, value)")
        })
    }
  }

  /** Semi-join `big` against `small` on `bigKey = smallKey` with a
    * Bloom-filter pre-filter on the big side. Result is exactly the
    * plain left-semi join (the exact join removes Bloom false
    * positives); the Bloom filter prunes non-matching big-side rows
    * before the join's shuffle. Keys are hashed with xxhash64 (the same
    * hash family Spark's own runtime filter uses).
    *
    * `expectedItems`/`numBits` size the filter: ~9.6 bits/item gives
    * ~1% false positives; both must stay under
    * spark.sql.optimizer.runtime.bloomFilter.maxNumItems/maxNumBits.
    */
  def bloomSemiJoin(
      big: DataFrame, bigKey: String,
      small: DataFrame, smallKey: String,
      expectedItems: Long = 1000000L,
      numBits: Long = 8388608L): DataFrame = {
    val spark = big.sparkSession
    // both views are registered on big's session — a frame from another
    // session would resolve confusingly or not at all
    require(small.sparkSession eq spark,
      "bloomSemiJoin: big and small must come from the same SparkSession")
    register(spark)
    val id = viewSeq.incrementAndGet()
    val bigView = s"graft_bloom_big_$id"
    val smallView = s"graft_bloom_small_$id"
    // backtick-quote the key identifiers: column names with spaces,
    // dots, hyphens, or reserved words must not break (or silently
    // re-resolve) inside the generated SQL
    def q(ident: String): String = "`" + ident.replace("`", "``") + "`"
    val bk = q(bigKey)
    val sk = q(smallKey)
    big.createOrReplaceTempView(bigView)
    small.createOrReplaceTempView(smallView)
    try {
      // analysis is eager at sql(): the returned frame holds resolved
      // relations, so the views can be dropped immediately — otherwise
      // every call leaks a catalog entry into a long-lived session
      spark.sql(
        s"""SELECT b.* FROM $bigView b
           |WHERE graft_might_contain(
           |        (SELECT graft_bloom_agg(xxhash64(s.$sk), ${expectedItems}L, ${numBits}L)
           |         FROM $smallView s),
           |        xxhash64(b.$bk))
           |  AND b.$bk IN (SELECT s.$sk FROM $smallView s)
           |""".stripMargin)
    } finally {
      spark.catalog.dropTempView(bigView)
      spark.catalog.dropTempView(smallView)
    }
  }
}
