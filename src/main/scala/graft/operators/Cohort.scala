package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohort retention — the "of the users first seen in period P, how
  * many came back in period P+k" matrix every product/engagement
  * pipeline computes, and a standard benchmark shape for an analytics
  * engine (two keyed aggregates + one join, all on the user key).
  *
  * The period is an INTEGER index (epoch-day, epoch-week, year·12+month
  * — caller's choice), so the offset is plain integer subtraction:
  * engine-exact, grain-agnostic, and never subject to date-arithmetic
  * or timezone drift between engines.
  *
  * Shape at 100 TB: the event stream collapses to DISTINCT
  * (user, period) first — one corpus-scale shuffle on the user key,
  * map-side combinable. The cohort assignment (min period per user)
  * groups on the SAME key, so it reuses the exchange, and the
  * join-back is user-keyed against an already-co-partitioned side —
  * Catalyst plans no third shuffle beyond the small final
  * (cohort, offset) aggregate, which runs on |users × active periods|
  * rows, already tiny relative to the raw events.
  */
object Cohort {

  /** One row per (cohort, period_offset): cohort = the user's first
    * active period index, offset = periods since it (0 = the cohort
    * period itself), n_users = distinct users from that cohort active
    * at that offset. `periodIdx` must be an integral column.
    */
  def retention(df: DataFrame, userCol: String, periodIdx: Column): DataFrame = {
    val act = df
      .select(col(userCol).as("user"), periodIdx.cast("long").as("period"))
      .filter(col("user").isNotNull && col("period").isNotNull)
      .distinct()
    val cohorts = act.groupBy("user").agg(min(col("period")).as("cohort"))
    act.join(cohorts, "user")
      .groupBy(col("cohort"), (col("period") - col("cohort")).as("period_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
