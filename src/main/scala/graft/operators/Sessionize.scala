package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: consecutive events of the same user belong
  * to one session while the gap between them stays under `gapMinutes`.
  *
  * Shape: ONE shuffle. The break flags, the cumulative session id, and
  * the final (user, session) aggregate all cluster by the user key, so
  * the two window passes and the groupBy share a single
  * hashpartitioning(user) exchange (the aggregate's (user, sid)
  * clustering is satisfied by the user partitioning).
  *
  * Determinism with timestamp ties: tied rows have delta 0, so a tie
  * group carries at most one break flag (on whichever member sorts
  * first) and every member lands in the same session regardless of the
  * tie order — boundaries depend only on the multiset of timestamps.
  * Gap math is integer microseconds (unix_micros), exactly mirrorable
  * in a SQL oracle via epoch_us.
  */
object Sessionize {

  def sessions(
      events: DataFrame, userCol: String, tsCol: String, gapMinutes: Int,
      valueCol: Option[Column] = None): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy(userCol).orderBy(tsCol)
    val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flagged = events
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__brk",
        when(col("__us") - lag(col("__us"), 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("__sid", sum(col("__brk")).over(wc))
    val aggs = Seq(
      date_format(min(col(tsCol)), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
      date_format(max(col(tsCol)), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
      count(lit(1)).as("n_events")) ++
      valueCol.map(v => v.as("total_value")).toSeq
    flagged
      .groupBy(col(userCol), col("__sid"))
      .agg(aggs.head, aggs.tail: _*)
      .drop("__sid")
  }

  /** [[sessions]] at integer-microsecond grain: one row per session
    * with raw (start_us, end_us, n_events) — the span form downstream
    * interval math (Intervals.concurrency, duration stats) consumes
    * without re-parsing formatted timestamps. Same one-exchange shape
    * and tie semantics as [[sessions]].
    */
  def sessionSpansUs(
      events: DataFrame, userCol: String, tsCol: String,
      gapMinutes: Int): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy(userCol).orderBy(tsCol)
    val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__brk",
        when(col("__us") - lag(col("__us"), 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("__sid", sum(col("__brk")).over(wc))
      .groupBy(col(userCol), col("__sid"))
      .agg(min(col("__us")).as("start_us"), max(col("__us")).as("end_us"),
        count(lit(1)).as("n_events"))
      .drop("__sid")
  }
}
