package graft

import org.apache.spark.sql.functions._
import graft.operators.Calibration

/** PR-curve calibration: hand-computed confusion counts, tie
  * aggregation, degenerate inputs, and partition invariance (the
  * globalRunningSum contract: the curve depends only on the score
  * order, never on partition boundaries).
  */
class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (10L, true), (10L, false), (20L, true), (30L, false))

  test("hand-computed curve: thresholds, confusion counts, ppm exact") {
    val got = Calibration.prCurve(rows.toDF("score", "label"),
      "score", "label")
      .orderBy(desc("threshold"))
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // threshold, pred_pos, tp, fp, fn, precision_ppm, recall_ppm
    assert(got == Seq(
      (30L, 1L, 0L, 1L, 2L, 0L, 0L),
      (20L, 2L, 1L, 1L, 1L, 500000L, 500000L),
      (10L, 4L, 2L, 2L, 0L, 500000L, 1000000L)))
  }

  test("fractional score columns are REFUSED, not silently truncated " +
      "(one row per DISTINCT score — round-17 review fix)") {
    val frac = Seq((0.4, true), (0.6, false)).toDF("score", "label")
    val ex = intercept[IllegalArgumentException] {
      Calibration.prCurve(frac, "score", "label")
    }
    assert(ex.getMessage.contains("integral"),
      s"must name the contract: ${ex.getMessage}")
  }

  test("partition invariance: a hostile repartition changes nothing") {
    val base = rows.toDF("score", "label")
    val a = Calibration.prCurve(base, "score", "label")
      .orderBy(desc("threshold")).collect().toSeq
    val b = Calibration.prCurve(base.repartition(13, col("label")),
      "score", "label")
      .orderBy(desc("threshold")).collect().toSeq
    assert(a == b)
  }

  test("mergeable state: merged disjoint batches == one-shot curve, " +
      "shared thresholds re-aggregate") {
    val df = rows.toDF("score", "label")
    // split so score 10 lands in BOTH batches — the merge must
    // re-aggregate, not just concatenate
    val a = Seq((10L, true), (20L, true)).toDF("score", "label")
    val b = Seq((10L, false), (30L, false)).toDF("score", "label")
    val merged = Calibration.curveFromState(Calibration.mergeStates(
        Calibration.curveState(a, "score", "label"),
        Calibration.curveState(b, "score", "label")))
      .orderBy(desc("threshold")).collect().toSeq
    val oneShot = Calibration.prCurve(df, "score", "label")
      .orderBy(desc("threshold")).collect().toSeq
    assert(merged == oneShot)
  }

  test("degenerate inputs: all-negative labels keep recall at 0; " +
      "a single score yields a one-row curve") {
    val neg = Calibration.prCurve(
      Seq((5L, false), (7L, false)).toDF("score", "label"),
      "score", "label").collect()
    assert(neg.length == 2)
    assert(neg.forall(r => r.getLong(2) == 0L && r.getLong(6) == 0L))
    val one = Calibration.prCurve(
      Seq((5L, true), (5L, false)).toDF("score", "label"),
      "score", "label")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(one == Seq((5L, 2L, 1L, 1L, 0L, 500000L, 1000000L)))
  }
}
