package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.ColumnLib._

/** X1 regex edges, X4 offset slicing, decimal rounding pins (SURVEY §5). */
class ColumnLibSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String): String =
    Seq(s).toDF("v").select(normalizeDottedId($"v")).as[String].head()

  test("X1: dot before digit gets zero-padded") {
    assert(norm("3.1") == "3.01")
  }
  test("X1: already-padded ids are padded again (reference behavior)") {
    assert(norm("2.02") == "2.002")
  }
  test("X1: no dot unchanged; trailing dot unchanged") {
    assert(norm("7") == "7")
    assert(norm("3.") == "3.")
  }
  test("X1: multi-dot pads every dot-digit boundary") {
    assert(norm("1.2.3") == "1.02.03")
  }
  test("X1: dot before non-digit unchanged") {
    assert(norm("a.b") == "a.b")
  }

  test("X4: offset slice of the fixed 25-char layout, both signs") {
    val df = Seq("2024-03-30T21:15:00+02:00", "2024-04-01T03:00:00-08:00").toDF("ts")
    val off = df.select(tzOffset($"ts")).as[String].collect()
    assert(off.sameElements(Array("+02:00", "-08:00")))
  }
  test("X4: out-of-contract short string yields its (garbage) suffix, as in the reference") {
    val df = Seq("2024-03-30T21:15:00Z").toDF("ts")
    assert(df.select(tzOffset($"ts")).as[String].head() == "Z")
  }

  test("X2/X3: day and month keys from timestamps") {
    val df = Seq("2024-03-30 21:15:00").toDF("s")
      .select(to_timestamp($"s").as("ts"))
    assert(df.select(dayKey($"ts")).as[String].head() == "2024-03-30")
    assert(df.select(monthKey($"ts")).as[String].head() == "2024-03")
  }

  test("rounding pin: round() on decimals is half-up at .xx50 ties") {
    val df = Seq("1234.5650", "1234.5750", "-1.005").toDF("v")
      .select(round($"v".cast(DecimalType(12, 4)), 2).cast("string").as("r"))
    assert(df.as[String].collect().toSeq == Seq("1234.57", "1234.58", "-1.01"))
  }

  test("royaltyBase: promo rows earn exactly zero, non-promo exact decimal math") {
    val df = Seq(("100.00", "0.10", 20, false), ("100.00", "0.10", 20, true))
      .toDF("price", "disc", "pct", "promo")
    val out = df.select(
      royaltyBase($"price", $"disc", $"pct", $"promo").cast("string").as("r")).as[String].collect()
    // 100.00 * 0.90 * 20 = 1800 exact
    assert(out(0) == "1800.0000")
    assert(out(1) == "0.0000")
  }

  test("X6: format_number groups thousands on an exact scale-2 decimal") {
    val df = Seq("1234567.50").toDF("v")
      .select(format_number($"v".cast(DecimalType(12, 2)), 2).as("f"))
    assert(df.as[String].head() == "1,234,567.50")
  }
}
