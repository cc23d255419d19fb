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
}
