package graft

import org.apache.spark.sql.functions._
import graft.operators.BloomJoin

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bloomSemiJoin == plain left-semi join (false positives removed)") {
    // tiny filter (64 bits for 50 items) forces a high false-positive
    // rate, so the exact-join cleanup is actually exercised
    val small = (0L until 50L).map(_ * 3).toDF("k")
    val big = (0L until 1000L).toDF("j")
    val got = BloomJoin.bloomSemiJoin(big, "j", small, "k",
      expectedItems = 50L, numBits = 64L)
      .as[Long].collect().sorted
    val want = big.join(small, big("j") === small("k"), "left_semi")
      .as[Long].collect().sorted
    assert(got.sameElements(want))
    assert(got.length == 50)
  }

  test("null and negative keys survive the hash path unharmed") {
    val small = Seq(Some(-5L), Some(7L), None).toDF("k")
    val big = Seq(Some(-5L), Some(7L), Some(8L), None).toDF("j")
    val got = BloomJoin.bloomSemiJoin(big, "j", small, "k")
      .as[Option[Long]].collect().flatten.sorted
    // semi-join semantics: NULL never matches IN
    assert(got.sameElements(Array(-5L, 7L)))
  }

  test("key columns needing quoting (spaces, dots, reserved words) work") {
    val small = (0L until 10L).toDF("select")                 // reserved word
    val big = (0L until 100L).toDF("the key.col")             // space + dot
    val got = BloomJoin.bloomSemiJoin(big, "the key.col", small, "select")
      .as[Long].collect().sorted
    assert(got.sameElements(0L until 10L))
  }

  test("ngramContaminatedBloom == ngramContaminated with a tiny filter " +
      "(false positives provably removed by the exact confirm)") {
    import graft.ext.Dedup
    val leak = "alpha bravo charlie delta echo foxtrot golf hotel"
    val docs = Seq(
      (1L, s"intro $leak trailing words here beyond the gram"),
      (2L, "completely different content with no overlap at all whatsoever"),
      (3L, s"$leak and then some more unique text after it"),
      (100L, s"eval doc containing $leak verbatim in the middle"),
      (101L, "another eval doc with its own words only nothing shared"))
      .toDF("doc_id", "text")
    val train = docs.filter($"doc_id" < 100L)
    val ev = docs.filter($"doc_id" >= 100L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long)].collect().toSet
    val exact = rows(Dedup.ngramContaminated(train, ev, "doc_id", "text", 8))
    // 64 bits for dozens of distinct grams: the bloom filter is
    // saturated, so the exact-confirm leg does real work
    val bloom = rows(Dedup.ngramContaminatedBloom(train, ev,
      "doc_id", "text", 8, expectedItems = 16L, numBits = 64L))
    assert(bloom == exact)
    assert(exact.map(_._1) == Set(1L, 3L)) // non-vacuous: the leak flags
  }

  test("physical plan carries the bloom might_contain pre-filter") {
    val small = (0L until 10L).toDF("k")
    val big = (0L until 100L).toDF("j")
    val plan = BloomJoin.bloomSemiJoin(big, "j", small, "k")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom filter in plan:\n$plan")
  }
}
