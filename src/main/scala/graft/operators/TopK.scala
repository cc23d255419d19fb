package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-K-per-group (reference W1+F1: top10.py:247-253).
  *
  * `dense_rank` semantics on purpose: ties share a position and more than
  * K rows can survive when values tie at the boundary — that is the
  * reference's observable behavior and what the oracle reproduces.
  *
  * Scale: one shuffle on `partitionCols`; rank+filter happen per
  * partition with no further exchange. At 100 TB the win over a global
  * sort-limit is that each group is ranked independently; skewed groups
  * are handled by AQE. `position` is BIGINT to match ANSI engines.
  */
object TopK {
  def denseTopK(df: DataFrame, partitionCols: Seq[String], order: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(order)
    df.withColumn("position", dense_rank().over(w).cast("bigint"))
      .filter(col("position") <= k)
  }

  /** Top-N-with-OTHER rollup — the reporting shape behind every pie
    * chart and "top domains" table: keep the `n` heaviest labels of a
    * pre-aggregated (label, weight) frame, collapse the tail into one
    * `otherLabel` row carrying the remaining weight and its label
    * count. Rank order is (weight desc, label) — total, so the cut is
    * engine-exact (the q94 tie discipline).
    *
    * The rank window runs over the AGGREGATED frame (label
    * cardinality), never the data; the corpus-scale work is whatever
    * produced `counts` upstream. Output: (label, weight, n_labels)
    * where n_labels > 1 only on the OTHER row.
    */
  def topNWithOther(
      counts: DataFrame, labelCol: String, weightCol: String, n: Int,
      otherLabel: String = "OTHER"): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    // asc_nulls_last pinned explicitly: Spark's asc default is NULLS
    // FIRST, ANSI/DuckDB's is NULLS LAST — a null label tying on
    // weight at the n boundary would otherwise be cut differently per
    // engine (desc sides already agree on NULLS LAST)
    val w = Window.orderBy(col(weightCol).desc, col(labelCol).asc_nulls_last)
    counts
      .withColumn("__rk", row_number().over(w))
      .select(
        when(col("__rk") <= n, col(labelCol)).otherwise(lit(otherLabel))
          .as(labelCol),
        col(weightCol))
      .groupBy(labelCol)
      .agg(sum(col(weightCol).cast("long")).as(weightCol),
        count(lit(1)).as("n_labels"))
  }
}
