package graft

import graft.ext.FuzzyJoin

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(strings: String*): Set[(String, String, Int)] =
    FuzzyJoin.editDistance1Pairs(strings.toDF("s"), "s")
      .as[(String, String, Int)].collect().toSet

  test("finds substitution, insertion, and deletion pairs") {
    val got = pairs("kitten", "mitten", "kitte", "kittten", "unrelated")
    // substitution, deletion, insertion; "kitte"/"kittten" is distance 2
    assert(got == Set(
      ("kitten", "mitten", 1),
      ("kitte", "kitten", 1),
      ("kitten", "kittten", 1)))
  }

  test("deletion-key collisions at distance 2 are verified away") {
    // del1("abc") ∩ del1("bac") = {"ac","bc"} but levenshtein = 2
    val got = pairs("abc", "bac")
    assert(got.isEmpty)
  }

  test("duplicate strings produce no self-pairs; output is deduplicated") {
    val df = Seq("aaa", "aaa", "aab").toDF("s")
    val got = FuzzyJoin.editDistance1Pairs(df, "s")
      .as[(String, String, Int)].collect().toSeq
    // "aaa"/"aab" share keys "aa" (×2 collisions) — exactly one output row
    assert(got == Seq(("aaa", "aab", 1)))
  }

  test("single-char and empty-adjacent strings") {
    val got = pairs("a", "b", "ab")
    // "a"~"b" substitution; "a"~"ab", "ab"~"b" insertion ("ab" < "b")
    assert(got.map(p => (p._1, p._2)) == Set(("a", "b"), ("a", "ab"), ("ab", "b")))
  }

  test("plan is an equi-join on deletion keys — no cartesian") {
    val df = (0 until 200).map(i => f"name$i%04d").toDF("s")
    val plan = FuzzyJoin.editDistance1Pairs(df, "s")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"cartesian in plan:\n$plan")
  }
}
