package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Schemas

/** Storage-layout behaviors the 100-TB posture depends on: partition
  * pruning at the scan, and malformed-input capture at ingest.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("partitionBy write + partition filter prunes directories at the scan") {
    val out = Files.createTempDirectory("graft-layout").toString
    val df = (0 until 1000)
      .map(i => (i.toLong, s"2024-${"%02d".format(i % 12 + 1)}", i * 1.5))
      .toDF("id", "month", "v")
    df.write.partitionBy("month").mode("overwrite").parquet(out)

    val read = spark.read.parquet(out).filter(col("month") === "2024-03")
    assert(read.count() == 1000 / 12 + (if (3 <= 1000 % 12) 1 else 0))

    val plan = read.queryExecution.executedPlan.toString
    // the month predicate must land in PartitionFilters (directory
    // pruning), NOT PushedFilters (row-group skipping) or a residual
    // Filter node — at 100 TB this is the difference between listing
    // one directory and scanning every file
    assert(plan.contains("PartitionFilters"), s"no PartitionFilters in:\n$plan")
    val pf = plan.split("\n").find(_.contains("PartitionFilters")).get
    assert(pf.contains("month"), s"month not in partition filters: $pf")
  }

  test("compaction collapses a small-files mess into few files, data intact") {
    import graft.operators.Layout
    val src = Files.createTempDirectory("graft-smallfiles").toString + "/data"
    val dest = Files.createTempDirectory("graft-compacted").toString + "/data"
    // 64 tiny files
    (0L until 10000L).toDF("id").repartition(64)
      .write.parquet(src)
    assert(spark.read.parquet(src).inputFiles.length == 64)

    val written = Layout.compactParquet(spark, src, dest,
      targetBytes = Layout.inputBytes(spark.read.parquet(src)) / 4)
    assert(written <= 8, s"still $written files")
    // content identical
    val a = spark.read.parquet(src).as[Long].collect().sorted
    val b = spark.read.parquet(dest).as[Long].collect().sorted
    assert(a.sameElements(b))
    // write-audit-publish: refuses to clobber an existing destination
    intercept[Exception] {
      Layout.compactParquet(spark, src, dest)
    }
  }

  test("malformed ingest rows are captured, not silently dropped or fatal") {
    val dir = Files.createTempDirectory("graft-corrupt")
    Files.writeString(dir.resolve("good.json"),
      """{"eventId": "e1", "eventTime": "2024-03-30T21:15:00+02:00", "processTime": "2024-04-01T08:00:00+00:00", "resourceId": "r1", "userId": "u1", "countryCode": "US", "duration": 10, "itemPrice": "1.00"}""")
    Files.writeString(dir.resolve("bad.json"),
      """{"eventId": "e2", "eventTime": BROKEN JSON HERE""")

    val schema = StructType(Schemas.event.fields :+ StructField("_corrupt_record", StringType))
    val rows = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir.toString)
      .cache() // required to reference _corrupt_record alongside data columns
    assert(rows.count() == 2)
    assert(rows.filter(col("_corrupt_record").isNull)
      .select("eventId").as[String].collect().toSeq == Seq("e1"))
    val bad = rows.filter(col("_corrupt_record").isNotNull)
    assert(bad.count() == 1)
    assert(bad.select("_corrupt_record").as[String].head().contains("BROKEN"))
    rows.unpersist()
  }
}
