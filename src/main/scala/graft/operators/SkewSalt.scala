package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted two-phase aggregation for skewed group keys.
  *
  * A single groupBy on a skewed key sends the hot key's entire mass to
  * one reducer. Salting splits each group into `saltBuckets` sub-groups
  * keyed by a hash of a high-cardinality column (NOT rand() — a
  * deterministic salt keeps the plan replayable and the oracle
  * comparable), partially aggregates, then re-aggregates the partials:
  * two small shuffles instead of one unbounded one, and the hot key's
  * rows spread over `saltBuckets` reducers.
  *
  * AQE's skew-join handling covers joins; this is the aggregation-side
  * equivalent for algebraic aggregates (sum/count/min/max — anything
  * with a merge step).
  */
object SkewSalt {

  /** Sum `valueCol` grouped by `keys`, salted by `saltSource` (any
    * roughly-uniform column, e.g. an id).
    */
  def saltedSum(
      df: DataFrame, keys: Seq[String], valueCol: Column, outCol: String,
      saltSource: Column, saltBuckets: Int = 16): DataFrame = {
    val partial = df
      .withColumn("__salt", pmod(xxhash64(saltSource), lit(saltBuckets)))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(valueCol).as("__partial"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(outCol))
  }

  /** Salted equi JOIN for skewed probe keys — the join-side twin of
    * [[saltedSum]], for when AQE's skew split can't apply (e.g. the
    * skewed side feeds a co-grouped downstream op, or runtime stats
    * miss the skew because it's post-filter). Each big-side row gets a
    * deterministic salt from a hash of ALL its columns (NOT rand():
    * replayable plan, oracle-comparable result; identical rows sharing
    * a salt is harmless — they'd land together under any scheme), and
    * the small side is replicated once per salt bucket, so a hot key's
    * rows spread over `saltBuckets` reducers instead of one. Result is
    * exactly the unsalted inner join; cost is |small| × saltBuckets
    * build rows — keep the small side genuinely small.
    *
    * `small` must share ONLY `key` with `big`'s column names (the join
    * output carries both sides' columns un-prefixed).
    */
  def saltedJoin(
      big: DataFrame, small: DataFrame, key: String, saltBuckets: Int = 16): DataFrame = {
    require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
    require(small.columns.filter(_ != key).forall(!big.columns.contains(_)),
      "big and small may only share the join key column name")
    val b = big.withColumn(
      "__salt", pmod(xxhash64(big.columns.map(col): _*), lit(saltBuckets.toLong)))
    val s = small.withColumn(
      "__salt", explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }
}
