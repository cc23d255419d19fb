package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the bench driver contract (no Spark session needed).
  *
  * The driver keeps a ~2000-char tail of the bench stdout and parses the
  * JSON on the LAST line. These tests pin the three ways that contract has
  * broken or could break: line overflow as queries are added, locale-
  * dependent number formatting, and value/queries inconsistency.
  */
class BenchFormatSpec extends AnyFunSuite {

  private def fakeMedians(n: Int): Seq[(String, Double)] =
    (1 to n).map(i => (s"q${i}_some_longish_query_name", i * 0.137))

  test("the frozen tracked set fits the budget at sub-second precision") {
    // the policy invariant: the REAL tracked map (frozen round-6 set)
    // must fit without degrading to integer seconds — if this fails,
    // a query was added to SparkEntry without a DetailOnlyQueries entry
    val tracked = (SparkEntry.queries.keySet -- Bench.DetailOnlyQueries).toSeq.sorted
    assert(tracked.size == 89, s"tracked set changed size: ${tracked.size}")
    val meds = tracked.zipWithIndex.map { case (k, i) => (k, i * 0.137) }
    val line = Bench.contractLine(meds, Map.empty, "/root/testdata/sf0.1",
      nDetailOnly = Bench.DetailOnlyQueries.size, la = "0.42 1.07 2.31")
    assert(line.length <= Bench.LineBudget, s"line is ${line.length} chars")
    assert(line.startsWith("{\"metric\":\"total\""))
    assert(line.contains(".1") || line.contains(".4"),
      s"tracked map degraded to integer seconds: $line")
    // round-19: the loadavg self-documentation field must survive at
    // whatever precision rung the real tracked map lands on
    assert(line.contains("\"la\":\"0.42 1.07 2.31\""),
      s"la field missing from the contract line: $line")
  }

  test("la field degrades away at the integer rungs, never overflows") {
    val line = Bench.contractLine(fakeMedians(300), Map.empty,
      "/root/testdata/sf0.1", la = "9.99 9.99 9.99")
    assert(!line.contains("\"la\""), "integer rung must drop la")
    assert(line.endsWith("}"))
    // loadAvg() itself: parseable three-field form on Linux, never throws
    val la = Bench.loadAvg()
    assert(la.isEmpty || la.split(" ").length == 3, la)
  }

  test("contract line degrades rather than overflows at absurd query counts") {
    val line = Bench.contractLine(fakeMedians(300), Map.empty, "/root/testdata/sf0.1")
    // 300 × ~30-char names can't fit any budget; it must still be valid JSON
    // shape and must have dropped the sf field first.
    assert(!line.contains("\"sf\""))
    assert(line.endsWith("}"))
  }

  test("mixed rung keeps sub-second precision and stays self-consistent") {
    // Calibrated so the uniform-1-decimal line is JUST over budget while
    // the mixed rung (≥0.95 s values print as integers) fits: 93 names
    // of 14 chars ⇒ 1-decimal ≈ 2000 chars, mixed saves 2 chars on each
    // of the 31 multi-second values. The sub-second medians must KEEP
    // their decimal — that is the rung's whole point.
    val meds = (1 to 93).map { i =>
      (f"q${i}%02d_abcdefghij", if (i % 3 == 0) 2.4 else 0.3)
    }
    val line = Bench.contractLine(meds, Map.empty, "/root/testdata/sf0.1")
    assert(line.length <= Bench.LineBudget, s"line is ${line.length} chars")
    assert(line.contains(":0.3"), s"sub-second medians must keep their decimal: $line")
    assert(line.contains(":2,") || line.contains(":2}"),
      s"multi-second values should print as integers on the mixed rung: $line")
    val printed = "\"q[0-9]+_[a-z]+\":([0-9.]+)".r
      .findAllMatchIn(line).map(m => BigDecimal(m.group(1))).toSeq
    assert(printed.size == 93)
    val value = "\"value\":([0-9.]+)".r.findFirstMatchIn(line).get.group(1)
    assert(BigDecimal(value) == printed.sum, s"value=$value sum=${printed.sum}")
  }

  test("detail-only queries exist, are excluded from the map, and are counted visibly") {
    val real = SparkEntry.queries.keys.toSet
    assert(Bench.DetailOnlyQueries.subsetOf(real),
      s"stale DetailOnlyQueries entries: ${Bench.DetailOnlyQueries -- real}")
    // realistic value mix: about a third of the suite runs multi-second
    // at sf0.1 (r06 medians) — the mixed rung's savings come from them
    val tracked = (real -- Bench.DetailOnlyQueries).toSeq.sorted.zipWithIndex
      .map { case (k, i) => (k, if (i % 3 == 0) 2.4 else 0.4) }
    val line = Bench.contractLine(tracked, Map.empty, "sf",
      nDetailOnly = Bench.DetailOnlyQueries.size)
    assert(line.length <= Bench.LineBudget, s"line is ${line.length} chars")
    assert(line.contains(s""""detail_only":${Bench.DetailOnlyQueries.size}"""),
      "exclusion must be visible, never silent")
    Bench.DetailOnlyQueries.foreach(q => assert(!line.contains(q)))
    // and the REAL tracked set must still fit at sub-second precision
    // (1-decimal or mixed rung — the whole point of the exclusion)
    assert(line.contains(":0.4"), s"tracked queries lost sub-second precision: $line")
  }

  test("value equals the sum of the printed per-query medians exactly") {
    val meds = Seq(("q1", 0.375), ("q2", 0.265), ("q3", 1.005))
    val line = Bench.contractLine(meds, Map.empty, "sf")
    val value = "\"value\":([0-9.]+)".r.findFirstMatchIn(line).get.group(1)
    val printed = "\"q[0-9]\":([0-9.]+)".r.findAllMatchIn(line).map(_.group(1).toDouble).toSeq
    assert(printed.size == 3)
    // sum in centiseconds (the printed precision) — must match value exactly
    val sumCenti = printed.map(v => math.round(v * 100)).sum
    assert(math.round(value.toDouble * 100) == sumCenti, s"value=$value queries=$printed")
  }

  test("formatting is locale-independent (comma-decimal default locale)") {
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      val line = Bench.contractLine(Seq(("q1", 1234.567)), Map.empty, "sf")
      assert(line.contains("\"q1\":1234.57"), line)
      assert(!line.contains("1234,57"), s"locale leaked into JSON: $line")
    } finally java.util.Locale.setDefault(prev)
  }

  test("median of no successful runs is -1 (never a green-looking 0)") {
    assert(Bench.median(Seq.empty) == -1.0)
    assert(Bench.median(Seq(2.0, 1.0, 3.0)) == 2.0)
    assert(Bench.median(Seq(1.0, 2.0)) == 1.5)
  }

  test("error messages are escaped into valid JSON") {
    val line = Bench.contractLine(Seq(("q1", 0.1)), Map("q1" -> "boom \"quoted\"\nline2"), "sf")
    assert(line.contains("\\\"quoted\\\""))
    assert(line.contains("\\n"))
    assert(!line.contains("\nline2"))
  }

  test("a failed query's -1 sentinel never makes the total read faster") {
    val line = Bench.contractLine(Seq(("q1", 2.0), ("q2", -1.0)), Map("q2" -> "boom"), "sf")
    assert(line.contains("\"value\":2.00"), s"failed query leaked into value: $line")
    assert(line.contains("\"q2\":-1.00"), "sentinel must stay visible in the map")
  }

  test("a burst of long error messages still fits the budget (errors degrade before overflow)") {
    // mirror Bench.main exactly: tracked set + detail_only count
    val tracked = (SparkEntry.queries.keySet -- Bench.DetailOnlyQueries).toSeq.sorted
    val meds = tracked.zipWithIndex.map { case (k, i) => (k, i * 0.137) }
    val errors = tracked.take(6).map(k => k -> ("x" * 200)).toMap
    val line = Bench.contractLine(meds, errors, "/root/testdata/sf0.1",
      nDetailOnly = Bench.DetailOnlyQueries.size)
    assert(line.length <= Bench.LineBudget, s"line is ${line.length} chars")
    // failures must remain visible in SOME form on the contract line
    assert(line.contains("\"errors\"") || line.contains("\"n_errors\""), line)
  }

  test("detail file carries every query, name-sorted, as parseable JSON") {
    val meds = Seq(("q2_b", 1.23456), ("q1_a", 0.1), ("q10_c", -1.0))
    val json = Bench.detailFileJson(meds, Map("q10_c" -> "boom \"x\""), "sfdir",
      laStart = "0.1 0.2 0.3", laEnd = "1.1 1.2 1.3",
      utc = "2026-08-16T00:00:00Z")
    // round-19: load/wall-clock self-documentation fields
    assert(json.contains("\"loadavg_start\": \"0.1 0.2 0.3\""))
    assert(json.contains("\"loadavg_end\": \"1.1 1.2 1.3\""))
    assert(json.contains("\"utc\": \"2026-08-16T00:00:00Z\""))
    // every query present at 3 decimals, names in sorted order
    assert(json.contains("\"q1_a\": 0.100"))
    assert(json.contains("\"q2_b\": 1.235"))
    assert(json.contains("\"q10_c\": -1.000"))
    assert(json.indexOf("q10_c") < json.indexOf("q1_a"))
    assert(json.indexOf("q1_a") < json.indexOf("q2_b"))
    assert(json.contains("\"n_queries\": 3"))
    // structurally valid JSON: balanced braces, escaped error text
    assert(json.count(_ == '{') == json.count(_ == '}'))
    assert(json.contains("boom \\\"x\\\""))
    // one median per line — the git-diffability contract
    val medianLines = json.linesIterator.count(_.trim.startsWith("\"q"))
    assert(medianLines == 4, s"expected 3 median + 1 error lines, got $medianLines")
  }
}
