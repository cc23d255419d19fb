package graft

import org.apache.spark.sql.functions._

/** The approximate-aggregate scale menu: sketch-based variants of the
  * exact operators the oracle pins (q35's COUNT DISTINCT). Sketches
  * are engine-specific, so the contract here is error bounds vs the
  * exact answer, not hash parity.
  */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = spark.read.parquet(s"$sf0001/events.parquet")

  test("approx_count_distinct within its rsd bound of the exact count") {
    val exact = events.select(countDistinct($"user_id")).as[Long].head().toDouble
    val approx = events.select(approx_count_distinct($"user_id", 0.05)).as[Long].head().toDouble
    assert(math.abs(approx - exact) / exact < 0.15,
      s"approx $approx too far from exact $exact")
  }

  test("percentile_approx brackets the exact median") {
    val exact = events.stat.approxQuantile("value", Array(0.5), 0.0).head
    val approx = events
      .select(percentile_approx($"value", lit(0.5), lit(100))).as[Double].head()
    val spread = events.select(max($"value") - min($"value")).as[Double].head()
    assert(math.abs(approx - exact) <= spread * 0.1)
  }

  test("embeddingDriftReport: hand-computed quantized arithmetic, " +
      "flag threshold, and state-merge equivalence") {
    import graft.ext.SimSearch
    val a = Seq(Tuple1(Seq(1.0f, -0.5f))).toDF("embedding")
    val b = Seq(Tuple1(Seq(1.0f, 0.5f)), Tuple1(Seq(1.0f, 1.5f)))
      .toDF("embedding")
    val got = SimSearch.embeddingDriftReport(a, b, "embedding",
        flagQUnits = 131072L)
      .orderBy("dim")
      .as[(Long, Long, Long, Long, Long, Long, String)].collect().toSeq
    // dim0: means 1.0 vs 1.0 -> diff 0, stable
    // dim1: means -0.5 vs 1.0 -> diff 1.5 = 1572864 q-units, drifted
    assert(got == Seq(
      (0L, 1L, 2L, 1048576L, 2097152L, 0L, "stable"),
      (1L, 1L, 2L, -524288L, 2097152L, 1572864L, "drifted")))
    // merging a split of b's rows reproduces the identical report
    val merged = SimSearch.driftFromStates(
      SimSearch.driftState(a, "embedding"),
      SimSearch.mergeDriftStates(
        SimSearch.driftState(
          b.filter(element_at(col("embedding"), 2) < 1.0f), "embedding"),
        SimSearch.driftState(
          b.filter(element_at(col("embedding"), 2) >= 1.0f), "embedding")),
      flagQUnits = 131072L)
      .orderBy("dim")
      .as[(Long, Long, Long, Long, Long, Long, String)].collect().toSeq
    assert(merged == got)
  }

  test("driftFromStates: cross-multiplication is exact past the Long " +
      "wrap point (round-17 review fix)") {
    import graft.ext.SimSearch
    // 4e9 rows per side at full quant range: sum_q·n ≈ 1.7e25 — far
    // past 2⁶³, where the old Long math silently wrapped and could
    // flip the verdict. Decimal(38,0) keeps it exact.
    val a = Seq((0L, 4000000000L, 4194304000000000L))
      .toDF("dim", "__n", "__sq") // mean = 1048576 q-units (1.0)
    val b = Seq((0L, 4000000000L, 0L)).toDF("dim", "__n", "__sq")
    val r = SimSearch.driftFromStates(a, b, flagQUnits = 131072L)
      .select("mean_diff_q", "verdict").as[(Long, String)].head()
    assert(r == ((1048576L, "drifted")), s"exact mean diff expected: $r")
  }
}
