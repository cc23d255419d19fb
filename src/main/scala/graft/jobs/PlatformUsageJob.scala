package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ColumnLib._

/** Monthly per-resource usage shares by country and by time zone
  * (reference `platform_usage.py`).
  *
  * The reference computes six groupBy+join-back pairs (~12 shuffles,
  * platform_usage.py:118-187) and a Python UDF for the percentage
  * (platform_usage.py:104-107). Here each report is ONE aggregate at
  * (month, dim, resource) grain + two window sums over it — the window
  * input is already collapsed to group grain, so the windows shuffle a
  * tiny frame, and the percentage is a codegen'd column expression (X9).
  * The per-event grain + O3 dedup the reference round-trips through is
  * provably equivalent to aggregating first (duration is summed within
  * exactly the keys the dedup keeps) — the spec suite asserts both
  * formulations match.
  */
object PlatformUsageJob {

  /** X3/X4: month key and fixed-layout offset slice (chars 20-25 of the
    * 25-char ISO form; Z-suffixed/fractional timestamps are out of
    * contract, as in the reference).
    */
  def cleanEvents(events: DataFrame): DataFrame =
    events
      .withColumn("month", substring(col("eventTime"), 1, 7))
      .withColumn("timeZone", substring(col("eventTime"), 20, 6))
      .select("month", "timeZone", "resourceId", "countryCode", "duration")

  /** One usage report at (month, dim, resourceId) grain. */
  private def usageBy(ev: DataFrame, dim: String, relName: String): DataFrame = {
    val g = ev.groupBy("month", dim, "resourceId")
      .agg(sum(col("duration")).as("totalDurationInSec"))
    val wMonth = Window.partitionBy("month")
    val wDim = Window.partitionBy("month", dim)
    g.withColumn("usagePercentTotal",
        sharePct(col("totalDurationInSec"), sum(col("totalDurationInSec")).over(wMonth)))
      .withColumn(relName,
        sharePct(col("totalDurationInSec"), sum(col("totalDurationInSec")).over(wDim)))
      .select(col("month"), col("resourceId"), col(dim),
        col("usagePercentTotal"), col(relName), col("totalDurationInSec"))
  }

  def byCountry(events: DataFrame): DataFrame =
    usageBy(cleanEvents(events), "countryCode", "usagePercentRelativeCountry")

  def byTimeZone(events: DataFrame): DataFrame =
    usageBy(cleanEvents(events), "timeZone", "usagePercentRelativeTz")

  /** K3 sink: parquet partitioned by month — the single-pass idiom for
    * the reference's per-month driver loop (platform_usage.py:199-239).
    */
  def write(report: DataFrame, path: String): Unit =
    report.write.partitionBy("month").mode("overwrite").parquet(path)
}
