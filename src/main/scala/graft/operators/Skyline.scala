package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier): the rows no other row beats on both
  * axes — "best price for every quantity", "fastest model at every
  * size". p dominates q iff p ≥ q on both dims and p > q on at least
  * one; the frontier is the non-dominated set.
  *
  * The textbook formulation is a quadratic NOT EXISTS self-join (the
  * DuckDB oracle runs exactly that as independent truth). Here it is a
  * SORT-BASED rewrite: collapse to one row per distinct x (max y —
  * hash agg, partial-agg, corpus-scale work ends here), then one
  * running-max window in x-descending order — a point survives iff its
  * y strictly exceeds the best y among all strictly-greater x (ties on
  * x already collapsed, ties on y across x lose to the larger x).
  * O(d log d) on d = distinct x, never O(n²) on the corpus.
  *
  * The window's global sort runs on the per-x AGGREGATE, not the data
  * — fine for discrete/bucketed x (quantize continuous x upstream, the
  * Histogram/Layout bucketing); the frontier itself is at most d rows.
  */
object Skyline {

  /** Frontier of (x, y) maximizing both; null coordinates excluded
    * (null is not comparable, so it can neither dominate nor survive).
    * Output: one row per frontier x with its undominated y.
    */
  def frontier2d(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val g = df.select(xCol.as("x"), yCol.as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .groupBy("x").agg(max(col("y")).as("y"))
    val w = Window.orderBy(col("x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("__m", max(col("y")).over(w))
      .filter(col("__m").isNull || col("y") > col("__m"))
      .drop("__m")
  }
}
