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

  test("MisraGries: exact when distinct items fit; guarantees under pressure + any partitioning") {
    import org.apache.spark.sql.functions._
    val mg8 = udaf(new graft.operators.TypedAgg.MisraGries(8),
      org.apache.spark.sql.Encoders.STRING)
    // 5 distinct items, k=8: no decrement ever fires — counts exact
    val small = (0 until 100).map(i => s"i${i % 5}").toDF("k")
    val exactOut = small.agg(mg8(col("k")).as("sk"))
      .select(explode(col("sk"))).select("col.item", "col.cnt")
      .as[(String, Long)].collect().toMap
    assert(exactOut == (0 until 5).map(i => s"i$i" -> 20L).toMap)

    // adversarial: 2 planted heavy items (30% + 20%) over 200 noise items, k=8
    val n = 10000
    val stream = (0 until n).map { i =>
      if (i % 10 < 3) "A" else if (i % 10 < 5) "B" else s"z${i % 200}"
    }
    val freq = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    for (parts <- Seq(1, 7, 32)) {
      val sk = stream.toDF("k").repartition(parts)
        .agg(mg8(col("k")).as("sk"))
        .select(explode(col("sk"))).select("col.item", "col.cnt")
        .as[(String, Long)].collect().toMap
      assert(sk.contains("A") && sk.contains("B"),
        s"true heavy hitters missing at $parts partitions: ${sk.keys}")
      sk.foreach { case (item, est) =>
        assert(est <= freq(item), s"overcount at $parts parts: $item $est > ${freq(item)}")
        assert(freq(item) - est <= n / 9,
          s"undercount bound broken at $parts parts: $item ${freq(item) - est}")
      }
    }
  }
}
