package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join without a nested loop.
  *
  * Spark plans `pt >= lo AND pt < hi` as BroadcastNestedLoopJoin (or a
  * cartesian) — O(|points|·|intervals|) comparisons and a broadcast of a
  * potentially unbounded side. The scalable rewrite BUCKETIZES the range
  * dimension: each interval is exploded to the fixed-width buckets it
  * overlaps, each point belongs to exactly ONE bucket, and the join
  * becomes a narrow equi-join on the bucket id followed by the exact
  * range predicate. Shuffle volume is O(|points| + |intervals|·spans)
  * where spans = ceil(len/bucketWidth)+1 — pick bucketWidth near the
  * typical interval length so spans stays 1-2. No duplicate elimination
  * is needed: a (point, interval) match is emitted only from the point's
  * single bucket.
  *
  * Both sides shuffle-partition on the bucket id, so skew follows the
  * range-dimension distribution; a hot bucket (all intervals in one
  * window) degrades to the per-bucket product, which AQE's skew-join
  * splitting handles — or re-bucket with a smaller width.
  *
  * Reference scope: the reference engine has no range-join operator;
  * this is part of the 100-TB extension family (SURVEY.md north star).
  */
object RangeJoin {

  /** Join `points` (value `ptCol`, integral) against `intervals`
    * [`loCol`, `hiCol`) half-open, via a bucketed equi-join. Column
    * name sets must be disjoint (standard equi-join hygiene). Empty
    * intervals (hi <= lo) match nothing.
    */
  def pointInInterval(
      points: DataFrame, ptCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    def bucketOf(c: Column): Column = floor(c / lit(bucketWidth))
    val pt = points.withColumn("__bucket", bucketOf(col(ptCol)))
    val iv = intervals
      .filter(col(hiCol) > col(loCol))
      .withColumn("__bucket",
        explode(sequence(bucketOf(col(loCol)), bucketOf(col(hiCol) - 1))))
    pt.join(iv, Seq("__bucket"))
      .where(col(ptCol) >= col(loCol) && col(ptCol) < col(hiCol))
      .drop("__bucket")
  }
}
