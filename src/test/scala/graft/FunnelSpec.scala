package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Funnel

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("funnel advances only in order; out-of-order events don't count") {
    val events = Seq(
      // u1 completes the whole funnel in order
      (1L, ts(0), "view"), (1L, ts(1), "click"), (1L, ts(2), "signup"), (1L, ts(3), "purchase"),
      // u2: purchase BEFORE the view — reaches only stage 2 (view, click)
      (2L, ts(0), "purchase"), (2L, ts(1), "view"), (2L, ts(2), "click"),
      // u3: clicks only, no view first → stage 0
      (3L, ts(0), "click"), (3L, ts(1), "click"),
      // u4: non-funnel events only → excluded entirely
      (4L, ts(0), "error")).toDF("user_id", "ts", "event_type")
    val got = Funnel.funnelStages(events, "user_id", "ts", "event_type",
        Seq("view", "click", "signup", "purchase"))
      .as[(Int, Long)].collect().toMap
    assert(got == Map(4 -> 1L, 2 -> 1L, 0 -> 1L))
  }

  test("same-instant ties resolve by stage order; repeats don't double-advance") {
    val events = Seq(
      // view and click at the SAME instant: sort (t, code) walks view first → both advance
      (1L, ts(0), "click"), (1L, ts(0), "view"),
      // u2: repeated views then one click
      (2L, ts(0), "view"), (2L, ts(1), "view"), (2L, ts(2), "click"))
      .toDF("user_id", "ts", "event_type")
    val got = Funnel.funnelStages(events, "user_id", "ts", "event_type",
        Seq("view", "click", "signup", "purchase"))
      .as[(Int, Long)].collect().toMap
    assert(got == Map(2 -> 2L))
  }

  test("one user-keyed exchange; non-funnel events filtered before the collect") {
    val dir = java.nio.file.Files.createTempDirectory("funnel_spec").toString
    (0L until 4000L).map(i =>
        (i % 100, ts(i.toInt), Seq("view", "click", "error", "noise")(i.toInt % 4)))
      .toDF("user_id", "ts", "event_type")
      .write.mode("overwrite").parquet(dir)
    val qe = Funnel.funnelStages(spark.read.parquet(dir), "user_id", "ts", "event_type",
      Seq("view", "click")).queryExecution
    val plan = qe.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"global exchange:\n$plan")
    // the stage-code filter must run below the collect aggregate, at the scan
    val optimized = qe.optimizedPlan.toString
    val filterAt = optimized.indexOf("Filter")
    val aggAt = optimized.indexOf("Aggregate")
    assert(filterAt > aggAt && filterAt > -1, s"expected scan-side filter:\n$optimized")
  }
}
