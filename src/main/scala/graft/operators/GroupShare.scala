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

  /** Percent-of-parent at EVERY level of a hierarchy (region ▸ nation,
    * domain ▸ host, dataset ▸ shard): aggregate to the leaf grain, then
    * one window sum per ancestor level, and the share of each level
    * within its parent as an INTEGER ppm (v_child · 1e6 div v_parent —
    * engine-exact; the q118 ppm discipline). Output: one row per leaf
    * with `value`, each ancestor sum `sum_l<i>` (l0 = grand total),
    * and `ppm_l<i>_of_l<i-1>` for every consecutive pair, where
    * l<levels.size> is the leaf itself.
    *
    * Shape: ONE hash aggregate does the corpus-scale work; the windows
    * run over the aggregated frame (leaf-cardinality rows). The grand-
    * total window is an empty partition spec — a SinglePartition pass
    * over that SMALL frame, not the data. `value` must be integral.
    *
    * Overflow bound: the ppm multiply needs sum·1e6 < 2^63, i.e.
    * parent totals below ~9.2e12 units. Above that (possible at
    * 100 TB with cent-grain money), route the multiply through
    * DECIMAL(38,0) on BOTH engines — do not mix, the truncation
    * points differ.
    */
  def rollupShares(df: DataFrame, levels: Seq[String], value: Column): DataFrame = {
    require(levels.nonEmpty, "need at least one level column")
    val k = levels.size
    var out = df.groupBy(levels.map(col): _*)
      .agg(sum(value.cast("long")).as(s"sum_l$k"))
    (0 until k).foreach { i =>
      val w = Window.partitionBy(levels.take(i).map(col): _*)
      out = out.withColumn(s"sum_l$i", sum(col(s"sum_l$k")).over(w))
    }
    (1 to k).foreach { i =>
      out = out.withColumn(s"ppm_l${i}_of_l${i - 1}",
        expr(s"(sum_l$i * 1000000) div sum_l${i - 1}"))
    }
    out
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
