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
}
