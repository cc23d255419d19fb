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
}
