package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Schemas
import graft.operators.Layout

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

  test("z-order layout keeps BOTH columns' per-file ranges narrow (2-D skipping)") {
    // two independent uniform dims — the adversarial case for 1-D sort
    val data = (0L until 40000L).toDF("id")
      .withColumn("a", (col("id") * 48271) % 65536)       // pseudo-random dim A
      .withColumn("b", (col("id") * 69621) % 65536)       // pseudo-random dim B
    val zDir = Files.createTempDirectory("graft-zorder").resolve("z").toString
    val aDir = Files.createTempDirectory("graft-zorder").resolve("a").toString
    Layout.writeZOrdered(data, "a", "b", zDir, nFiles = 64)
    data.repartitionByRange(64, col("a")).sortWithinPartitions("a")
      .write.parquet(aDir) // the 1-D strawman

    // per-FILE min/max of each dim — what parquet footer stats give a
    // scan planner; a predicate can skip a file iff its range misses it
    def fileRanges(dir: String, c: String): Seq[(Long, Long)] =
      spark.read.parquet(dir)
        .groupBy(input_file_name()).agg(min(col(c)).as("lo"), max(col(c)).as("hi"))
        .select("lo", "hi").as[(Long, Long)].collect().toSeq
    def hitFraction(ranges: Seq[(Long, Long)], lo: Long, hi: Long): Double =
      ranges.count { case (l, h) => h >= lo && l <= hi }.toDouble / ranges.size

    // a narrow predicate on EACH dim (1/16 of the domain)
    val (plo, phi) = (30000L, 34095L)
    val zHitsA = hitFraction(fileRanges(zDir, "a"), plo, phi)
    val zHitsB = hitFraction(fileRanges(zDir, "b"), plo, phi)
    val aHitsA = hitFraction(fileRanges(aDir, "a"), plo, phi)
    val aHitsB = hitFraction(fileRanges(aDir, "b"), plo, phi)
    // 1-D sort: perfect on its own dim, useless on the other
    assert(aHitsA <= 0.15, s"a-sorted files should skip a-predicates: $aHitsA")
    assert(aHitsB > 0.9, s"a-sorted layout cannot skip b-predicates: $aHitsB")
    // z-order: BOTH dims skip files (range-partition boundaries that
    // straddle z-cells widen some files' ranges — full alignment would
    // need quadrant-aware splits — so the bound is "most", not "all")
    assert(zHitsA <= 0.6, s"z-order should skip files on dim a: $zHitsA")
    assert(zHitsB <= 0.6, s"z-order should skip files on dim b: $zHitsB")
    // and 2-D total beats the 1-D layout's total decisively
    assert(zHitsA + zHitsB < (aHitsA + aHitsB) * 0.8,
      s"z ($zHitsA + $zHitsB) vs 1-D ($aHitsA + $aHitsB)")
    // and the data survives the round trip
    assert(spark.read.parquet(zDir).count() == 40000L)
  }

  test("mortonInterleave places bits on the expected curve") {
    val r = Seq((3L, 5L)).toDF("a", "b")
      .select(Layout.mortonInterleave(col("a"), col("b"), 4).as("z"))
      .as[Long].head()
    // a=0011, b=0101 → z = a1 b1 interleaved: bits (a<<odd)|(b<<even)
    // a bits: 1→pos3? compute: i=0: a&1=1→pos1; b&1=1→pos0. i=1: a=1→pos3; b=0. i=2: a=0; b=1→pos4.
    assert(r == ((1L << 1) | (1L << 0) | (1L << 3) | (1L << 4)), s"z=$r")
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

  test("compactionPlan packs shards contiguously by running offset, per partition") {
    val shards = Seq(
      ("p1", "s1", 60L), ("p1", "s2", 60L), ("p1", "s3", 60L), ("p1", "s4", 60L),
      ("p2", "s1", 250L), ("p2", "s2", 10L)).toDF("part", "shard", "bytes")
    val got = graft.operators.Layout
      .compactionPlan(shards, "part", "shard", "bytes", targetBytes = 100L)
      .select("part", "bin", "n_shards", "bin_bytes", "first_shard", "last_shard")
      .as[(String, Long, Long, Long, String, String)].collect().toSet
    assert(got == Set(
      // offsets 0,60,120,180 → bins 0,0,1,1 (a bin closes once its offset passes target)
      ("p1", 0L, 2L, 120L, "s1", "s2"), ("p1", 1L, 2L, 120L, "s3", "s4"),
      // an oversized shard occupies its own bins; next shard starts at off 250 → bin 2
      ("p2", 0L, 1L, 250L, "s1", "s1"), ("p2", 2L, 1L, 10L, "s2", "s2")))
  }

  test("compactionPlan is partition-stable and windows per partition directory") {
    val shards = (0L until 2000L)
      .map(i => (s"p${i % 8}", f"s$i%05d", 10L + i % 7)).toDF("part", "shard", "bytes")
    val plan = graft.operators.Layout
      .compactionPlan(shards, "part", "shard", "bytes", 100L)
    assert(!plan.queryExecution.executedPlan.toString.contains("SinglePartition"))
    val a = plan.agg(sum("bin"), sum("bin_bytes"), count(lit(1))).head.toSeq
    val b = graft.operators.Layout
      .compactionPlan(shards.repartition(13), "part", "shard", "bytes", 100L)
      .agg(sum("bin"), sum("bin_bytes"), count(lit(1))).head.toSeq
    assert(a == b, "partitioning changed the plan")
  }

  test("ORC sink: partition pruning and predicate pushdown reach the scan on read-back") {
    val dir = Files.createTempDirectory("graft-orc").resolve("t").toString
    (0L until 1000L).map(i => (i, s"d${i % 4}", if (i % 5 == 0) "p" else "v"))
      .toDF("id", "day", "kind")
      .write.partitionBy("day").orc(dir)
    val q = spark.read.orc(dir).filter(col("day") === "d1" && col("kind") === "p")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("d1"),
      s"day not pruned at the directory level:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("kind"),
      s"kind predicate not pushed to the ORC reader:\n$plan")
    assert(q.count() == 50)
  }

  test("zTileSummary: hand-computed Morton z-values, degenerate dim, null exclusion") {
    // domain [0,3] on both dims, bits=2 (scale 3): bucket == the value.
    // morton(a,b): a-bits at odd positions, b at even.
    // (0,0)→0, (1,1)→3, (2,1)→9, (3,3)→15, (0,3)→5
    val df = Seq(
      (Some(0L), Some(0L)), (Some(1L), Some(1L)), (Some(2L), Some(1L)),
      (Some(3L), Some(3L)), (Some(0L), Some(3L)),
      (None, Some(2L)), (Some(2L), None)). // null rows excluded
      toDF("a", "b")
    val got = Layout.zTileSummary(df, "a", "b", bits = 2, tileShift = 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    // tiles of width 4: z 0,3 → tile 0; 5 → 1; 9 → 2; 15 → 3
    assert(got == Set((0L, 2L, 0L, 3L), (1L, 1L, 5L, 5L),
      (2L, 1L, 9L, 9L), (3L, 1L, 15L, 15L)))
    // degenerate dim (max == min) buckets everything to 0 on that axis
    val deg = Seq((1L, 7L), (2L, 7L), (3L, 7L)).toDF("a", "b")
    val z = Layout.zTileSummary(deg, "a", "b", bits = 2, tileShift = 0)
      .select("z_min").as[Long].collect().toSet
    // b always 0 ⇒ z has only odd-position bits: morton(a,0)
    assert(z.subsetOf(Set(0L, 2L, 8L, 10L)), s"unexpected z values: $z")
  }

  test("fileSkipPlan: partition pruning precedes zone checks; inclusive query bounds") {
    import spark.implicits._
    val m = Seq(
      // (file, part, min, max, rows)
      ("a", "p0", 0L, 9L, 10L),      // below range -> skip
      ("b", "p0", 90L, 100L, 10L),   // touches lo (max == lo) -> scan
      ("c", "p0", 100L, 150L, 10L),  // contained -> full
      ("d", "p0", 100L, 200L, 10L),  // exactly the range -> full
      ("e", "p0", 150L, 250L, 10L),  // crosses hi -> scan
      ("f", "p0", 201L, 300L, 10L),  // min > hi -> skip
      ("g", "p9", 100L, 150L, 10L),  // overlapping zone, wrong partition
      ("h", "p1", 200L, 200L, 10L),  // point file at hi -> full
      // NULL partition with a contained zone: NULL is not in the
      // queried set, so it prunes — it must never classify 'full'
      (("i", null.asInstanceOf[String], 100L, 150L, 10L)))
      .toDF("file", "part", "min_v", "max_v", "rows")
    val got = Layout.fileSkipPlan(m, "file", "part", "min_v", "max_v",
        "rows", Seq("p0", "p1"), 100L, 200L)
      .select("file", "decision").as[(String, String)].collect().toMap
    assert(got == Map("a" -> "skip", "b" -> "scan", "c" -> "full",
      "d" -> "full", "e" -> "scan", "f" -> "skip",
      "g" -> "partition_pruned", "h" -> "full",
      "i" -> "partition_pruned"), s"$got")
  }
}
