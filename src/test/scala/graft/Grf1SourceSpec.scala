package graft

import org.apache.spark.sql.functions._

/** DataSource V2 media-metadata source: header-only reads, pruning. */
class Grf1SourceSpec extends SparkSpec {
  import spark.implicits._

  private def grf = spark.read
    .format("graft.sources.grf.Grf1DataSource")
    .load(s"${SparkEntry.FixturesDir}/media")

  test("DSv2: one row per file with typed header metadata") {
    assert(grf.count() == 5)
    val byName = grf
      .withColumn("name", regexp_extract($"path", "[^/]+$", 0))
      .select("name", "kind", "width", "height", "channels", "frames", "payloadBytes")
      .collect().map(r => r.getString(0) -> r).toMap
    val img = byName("img_8x8x3.grf")
    assert(img.getInt(1) == 0 && img.getInt(2) == 8 && img.getInt(3) == 8 && img.getInt(4) == 3)
    assert(img.getLong(6) == 8 * 8 * 3)
    val vid = byName("video_6f_8x8.grf")
    assert(vid.getInt(1) == 2 && vid.getInt(5) == 6 && vid.getInt(2) == 8)
    val aud = byName("audio_8k_256.grf")
    assert(aud.getInt(1) == 1 && aud.getInt(5) == 256)
  }

  test("DSv2: column pruning reaches the reader (pruned scan schema)") {
    val pruned = grf.select("kind")
    // DSv2 plans print the scan's pruned output as BatchScan ...[kind#N]
    assert("BatchScan[^\\[]*\\[kind#\\d+\\]".r
      .findFirstIn(pruned.queryExecution.executedPlan.toString).isDefined)
    assert(pruned.distinct().as[Int].collect().sorted.toSeq == Seq(0, 1, 2))
  }

  test("DSv2: kind predicate is pushed into the reader — no residual Filter node, rows pruned at source") {
    val imgs = grf.filter($"kind" === 0)
    val plan = imgs.queryExecution.executedPlan
    // the ScanBuilder claimed the predicate (returned no residual), so
    // Spark must NOT plan a Filter on top — correctness of the result
    // then PROVES the reader enforced it
    assert(plan.collect { case f: org.apache.spark.sql.execution.FilterExec => f }.isEmpty,
      s"kind filter was not fully pushed:\n$plan")
    assert(plan.toString.contains("PushedFilters=[EqualTo(kind,0)]"))
    val names = imgs.withColumn("name", regexp_extract($"path", "[^/]+$", 0))
      .select("name").as[String].collect().toSet
    assert(names == Set("img_4x4x1.grf", "img_8x8x3.grf", "img_16x8x3.grf"))
  }

  test("DSv2: kind IN (...) pushes; unsupported predicates stay residual") {
    val av = grf.filter($"kind".isin(1, 2))
    assert(av.queryExecution.executedPlan
      .collect { case f: org.apache.spark.sql.execution.FilterExec => f }.isEmpty)
    assert(av.count() == 2)
    // a width predicate is NOT pushable: it must survive as a Filter
    // node and still evaluate correctly
    val wide = grf.filter($"width" > 10)
    assert(wide.queryExecution.executedPlan
      .collect { case f: org.apache.spark.sql.execution.FilterExec => f }.nonEmpty)
    assert(wide.count() == 1) // img_16x8x3 only
  }

  test("DSv2: aggregations over metadata never touch payloads") {
    val stats = grf.groupBy("kind").agg(sum($"payloadBytes").as("bytes"), count(lit(1)).as("n"))
      .as[(Int, Long, Long)].collect().map { case (k, b, n) => k -> (b, n) }.toMap
    assert(stats(0) == (192L + 384L + 16L, 3L)) // three images
    assert(stats(1)._2 == 1L && stats(2)._2 == 1L)
  }
}
