package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality rules — the expectation-suite pass a
  * 100-TB ingest runs before publishing a snapshot: each rule is a
  * boolean Column predicate, and the report is (rule, n_pass, n_rows,
  * pass_ppm, ok) with an integer parts-per-million pass rate (no FP —
  * engine-exact) judged against a per-report threshold.
  *
  * Shape: ONE aggregate over ONE scan regardless of rule count — every
  * rule becomes a conditional sum in the same Aggregate node (the
  * Profile.profile discipline: never one job per check), and the wide
  * 1-row result unpivots via inline(array(struct…)) without touching
  * the driver. Null predicate results count as FAILURES (a rule that
  * cannot evaluate did not pass — the conservative read).
  */
object Quality {

  /** `rules` are (name, predicate); names must be distinct and are
    * emitted verbatim. A row passes a rule iff the predicate is TRUE
    * (null → fail). `minPassPpm` sets the ok threshold: ok iff
    * pass_ppm >= minPassPpm.
    */
  def ruleReport(
      df: DataFrame, rules: Seq[(String, Column)], minPassPpm: Long): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    require(rules.map(_._1).distinct.size == rules.size, "rule names must be distinct")
    require(minPassPpm >= 0 && minPassPpm <= 1000000L,
      s"minPassPpm in [0, 1e6], got $minPassPpm")
    val aggs = count(lit(1)).as("__total") +:
      rules.zipWithIndex.map { case ((_, p), i) =>
        sum(when(p, 1L).otherwise(0L)).as(s"__r$i")
      }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    wide.select(inline(array(rules.zipWithIndex.map { case ((name, _), i) =>
        struct(lit(name).as("rule"), col(s"__r$i").as("n_pass"),
          col("__total").as("n_rows"),
          expr(s"__r$i * 1000000 div __total").as("pass_ppm"))
      }: _*)))
      .withColumn("ok", col("pass_ppm") >= minPassPpm)
  }
}
