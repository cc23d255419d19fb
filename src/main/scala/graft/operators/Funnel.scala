package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered funnel analysis — "how far through view → click → signup →
  * purchase did each user get, IN ORDER" — the sequential-pattern query
  * that distinguishes an events engine from a counter: a purchase
  * before any view must NOT count as a completed funnel.
  *
  * Semantics: walk the user's funnel events in (time, stage-code)
  * order; the stage advances exactly when the next event is the next
  * stage in the declared sequence. One deterministic fold — no
  * "within N days" windowing, no re-entry; ties at the same timestamp
  * resolve by stage order (a view and a click at the same instant
  * advance through both).
  *
  * Shape: non-funnel events are dropped at the scan (the filter on the
  * stage code pushes down), then ONE user-keyed shuffle collects each
  * user's funnel events, and the walk itself is a codegen'd
  * higher-order `aggregate` over the sorted array — one scan, one
  * exchange, no iteration. The alternative 4-pass conditional-
  * aggregate formulation shuffles per-user partials four times and
  * rescans the corpus four times; the fold's cost is the per-user
  * event list, which the scan-side filter keeps to funnel events only
  * (bounded per user in practice — monitor skew like any collect).
  */
object Funnel {

  /** One row per reached stage: (stage, n_users), stage 0 = users with
    * funnel events but no in-order prefix (e.g. clicks with no prior
    * view). Users with NO events from `stages` do not appear. `stages`
    * is the ordered funnel (2-9 steps).
    */
  def funnelStages(
      df: DataFrame, userCol: String, tsCol: String, typeCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.size >= 2 && stages.size <= 9,
      s"funnel needs 2-9 ordered stages, got ${stages.size}")
    require(stages.distinct.size == stages.size, "stages must be distinct")
    val code = stages.zipWithIndex.foldLeft(lit(0)) {
      case (acc, (s, i)) => when(col(typeCol) === s, lit(i + 1)).otherwise(acc)
    }
    df.filter(col(userCol).isNotNull)
      .select(col(userCol).as("user"),
        struct(col(tsCol).as("t"), code.as("c")).as("ev"))
      .filter(col("ev.c") > 0)
      .groupBy("user").agg(sort_array(collect_list(col("ev"))).as("evs"))
      .withColumn("stage",
        aggregate(transform(col("evs"), e => e("c")), lit(0),
          (acc, e) => acc + when(e === acc + lit(1), lit(1)).otherwise(lit(0))))
      .groupBy("stage").agg(count(lit(1)).as("n_users"))
  }
}
