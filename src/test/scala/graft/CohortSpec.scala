package graft

import org.apache.spark.sql.functions._
import graft.operators.Cohort

class CohortSpec extends SparkSpec {
  import spark.implicits._

  test("retention: cohort = first period, offsets count users, duplicates collapse") {
    val events = Seq(
      (1L, 10L), (1L, 10L), (1L, 11L), (1L, 22L), // dup activity collapses
      (2L, 10L),
      (3L, 11L)).toDF("user_id", "p")
    val got = Cohort.retention(events, "user_id", col("p"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set(
      (10L, 0L, 2L), // u1, u2 in the cohort period
      (10L, 1L, 1L), // u1 back next period
      (10L, 12L, 1L), // u1 back 12 periods later
      (11L, 0L, 1L))) // u3's own cohort
  }

  test("retention join-back reuses the user-keyed exchange (≤ 3 shuffles, none global)") {
    val events = (0L until 5000L)
      .map(i => (i % 300, i % 12)).toDF("user_id", "p")
    val qe = Cohort.retention(events, "user_id", col("p")).queryExecution
    val plan = qe.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"global exchange:\n$plan")
    val nShuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(nShuffles <= 3, s"expected <= 3 hash exchanges, got $nShuffles:\n$plan")
  }
}
