package graft

import org.apache.spark.sql.functions._

import graft.model.Event
import graft.operators.TypedAgg.MoneySum
import graft.sources.Sources

class TypedAggSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events =
    Sources.events(spark, s"${SparkEntry.FixturesDir}/events_json").as[Event]

  test("typed MoneySum == untyped exact-decimal sum, to the cent") {
    val typed = events.select(MoneySum.toColumn).head()
    val untyped = events.toDF()
      .agg(sum(col("itemPrice").cast("decimal(12,2)")).as("t")).head()
      .getDecimal(0).toPlainString
    assert(typed == untyped, s"typed $typed vs untyped $untyped")
  }

  test("grouped typed aggregation keeps per-key exactness") {
    val typed = events.groupByKey(_.resourceId).agg(MoneySum.toColumn)
      .collect().toMap
    val untyped = events.toDF().groupBy("resourceId")
      .agg(sum(col("itemPrice").cast("decimal(12,2)")).as("t"))
      .collect().map(r => r.getString(0) -> r.getDecimal(1).toPlainString).toMap
    assert(typed == untyped)
  }

  test("typed aggregation plan keeps map-side partial aggregation") {
    val plan = events.groupByKey(_.resourceId).agg(MoneySum.toColumn)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial"), s"no partial aggregation:\n$plan")
  }
}
