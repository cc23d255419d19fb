package graft

import org.apache.spark.sql.functions._

import graft.model.Event
import graft.sources.Sources
import graft.streaming.StreamingReports

/** Streaming pipeline == batch results on the bounded fixture stream. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  val dir = s"${SparkEntry.FixturesDir}/events_json"

  test("streaming daily counts == batch groupBy on the same files") {
    val q = StreamingReports.dailyCounts(StreamingReports.eventStream(spark, dir))
      .writeStream.format("memory").queryName("daily_counts")
      .outputMode("complete").start()
    try { q.processAllAvailable() } finally { q.stop() }

    val streamed = spark.table("daily_counts")
      .select("date", "resourceId", "count").as[(String, String, Long)].collect().toSet
    val batch = Sources.events(spark, dir)
      .select(substring($"processTime", 1, 10).as("date"), $"resourceId")
      .groupBy("date", "resourceId").count()
      .as[(String, String, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("foreachBatch top10 stream writes the K1 report equal to the batch job") {
    val out = java.nio.file.Files.createTempDirectory("stream-top10").toString
    val res = Sources.resources(spark, s"${SparkEntry.FixturesDir}/resources.json")
    val cats = Sources.categories(spark, s"${SparkEntry.FixturesDir}/categories.json")
    val q = StreamingReports.top10Stream(spark, dir, res, cats, out)
    try { q.processAllAvailable() } finally { q.stop() }

    val streamed = spark.read.option("header", "true").option("sep", "|").csv(out)
    val batch = graft.jobs.Top10Job.transform(Sources.events(spark, dir), res, cats)
    assert(streamed.count() == batch.count())
    assert(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(out, "date=2024-04-01")))
  }

  test("mapGroupsWithState running totals converge to batch counts") {
    val q = StreamingReports.runningTotals(
      StreamingReports.eventStream(spark, dir).as[Event])
      .toDF("resourceId", "total")
      .writeStream.format("memory").queryName("running_totals")
      .outputMode("update").start()
    try { q.processAllAvailable() } finally { q.stop() }

    // update mode emits one row per state change; the final value per key
    // must equal the batch count
    val finals = spark.table("running_totals")
      .groupBy("resourceId").agg(max($"total").as("total"))
      .as[(String, Long)].collect().toMap
    val batch = Sources.events(spark, dir)
      .groupBy("resourceId").count().as[(String, Long)].collect().toMap
    assert(finals == batch)
  }
}
