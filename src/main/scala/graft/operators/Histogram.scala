package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Equi-width histogram — the distribution pass for range partitioning,
  * skew detection, and bucket sizing. Two passes over the data: a 1-row
  * (min, max) aggregate broadcast back (crossJoin of a single row — no
  * shuffle of the fact side), then a per-row bucket index and one
  * groupBy(bucket) count. The last bucket is closed ([lo, max]) via
  * least(…, buckets-1) so max lands in bucket n-1, matching the usual
  * equi-width convention. Degenerate case min == max ⇒ everything in
  * bucket 0.
  */
object Histogram {

  // NULLs are excluded from the histogram: floor(null) is null and
  // Spark's least() SKIPS nulls, so without the explicit isNotNull a
  // null value would silently land in the LAST bucket
  // (least(null, n-1) = n-1) — overcounting the top bucket on any
  // nullable column, and diverging from engines where least(NULL, x)
  // is NULL. min/max already ignore nulls, so dropping them keeps the
  // histogram consistent with its own bounds.
  def equiWidth(df: DataFrame, valueCol: Column, buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val mm = df.agg(
      min(valueCol.cast("double")).as("mn"), max(valueCol.cast("double")).as("mx"))
    df.select(valueCol.cast("double").as("v"))
      .filter(col("v").isNotNull)
      .crossJoin(broadcast(mm))
      .select(
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(
            floor((col("v") - col("mn")) / ((col("mx") - col("mn")) / buckets)),
            lit(buckets - 1L)).cast("long"))
          .as("bucket"),
        col("mn"), col("mx"))
      .groupBy("bucket", "mn", "mx")
      .agg(count(lit(1)).as("n"))
      .select(col("bucket"),
        (col("mn") + col("bucket") * ((col("mx") - col("mn")) / buckets)).as("bucket_lo"),
        col("n"))
  }
}
