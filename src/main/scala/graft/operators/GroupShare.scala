package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ColumnLib.sharePct

/** Share-of-total within a partition (reference J4/A2-A7: six
  * groupBy+join-back pairs, platform_usage.py:118-187, ~12 shuffles).
  *
  * Re-expressed as a window aggregate over an already-aggregated frame:
  * one shuffle for the groupBy, one exchange per distinct window
  * partitioning — the single biggest shuffle reduction available over
  * the reference design (SURVEY.md §4).
  */
object GroupShare {

  /** Adds `outCol` = valueCol / sum(valueCol) over partitionCols * 100.
    * `valueCol` should be an exact decimal; the ratio is taken in double
    * only at the end (deterministic across engines).
    */
  def withSharePct(df: DataFrame, partitionCols: Seq[String], valueCol: String, outCol: String): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*)
    df.withColumn(outCol, sharePct(col(valueCol), sum(col(valueCol)).over(w)))
  }

  /** The reference's literal join-back formulation (groupBy + left join
    * on the group keys), kept as a tested-equivalent fallback proving
    * the rewrite (SURVEY.md §7.2 step 3).
    */
  def withSharePctJoinBack(df: DataFrame, partitionCols: Seq[String], valueCol: String, outCol: String): DataFrame = {
    val totals = df.groupBy(partitionCols.map(col): _*)
      .agg(sum(col(valueCol)).as("__total"))
    df.join(totals, partitionCols, "left")
      .withColumn(outCol, sharePct(col(valueCol), col("__total")))
      .drop("__total")
  }
}
