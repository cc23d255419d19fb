package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-profiling surface (the ANALYZE-style pass a 100-TB ingest runs
  * before anything else): per-column row/null/distinct counts and
  * lexicographic min/max, computed in ONE aggregate over one scan —
  * never one job per column. Multiple count_distincts expand via
  * Catalyst's Expand (one shuffle, |cols| row replicas), which is the
  * standard multi-distinct plan; for wider tables swap the exact
  * distinct for approx_count_distinct and the expand disappears.
  * The wide 1-row result is then unpivoted driver-free into one row
  * per column.
  */
object Profile {

  /** One row per profiled column: (column, n_rows, n_null, n_distinct,
    * min_val, max_val) with min/max rendered as strings so mixed-type
    * tables profile into one frame.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"${c}__rows"),
        (count(lit(1)) - count(col(c))).as(s"${c}__nulls"),
        count_distinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    unpivot(wide, cols)
  }

  /** Approximate profile: same shape with HLL distinct counts
    * (rsd ~2.3%) — no multi-distinct Expand, so the aggregate stays a
    * single narrow pass; the right default when the profile feeds
    * sizing heuristics rather than exact reporting (see q67's
    * BASELINE note: the exact form's Expand is ~2× the suite cost).
    */
  def profileApprox(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"${c}__rows"),
        (count(lit(1)) - count(col(c))).as(s"${c}__nulls"),
        approx_count_distinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    unpivot(df.agg(aggs.head, aggs.tail: _*), cols)
  }

  private def unpivot(wide: DataFrame, cols: Seq[String]): DataFrame =
    // inline(array(struct…)) with uniform field names, not stack():
    // stack derives struct field names from its argument columns, and
    // Spark 4 rejects the per-column name differences as a type mismatch
    wide.select(inline(array(cols.map { c =>
      struct(
        lit(c).as("column_name"),
        col(s"${c}__rows").as("n_rows"),
        col(s"${c}__nulls").as("n_null"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_val"),
        col(s"${c}__max").as("max_val"))
    }: _*)))
}
