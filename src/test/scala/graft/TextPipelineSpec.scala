package graft

import org.apache.spark.sql.functions._
import graft.ext.TextAnalysis

class TextPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("tfIdf ranks a document's distinctive term above corpus-wide terms") {
    val docs = Seq(
      (1L, "common common common zebra zebra"),
      (2L, "common common words here"),
      (3L, "common words everywhere too")).toDF("doc_id", "text")
    val top = TextAnalysis.tfIdf(docs, "doc_id", "text", topN = 1)
      .select("doc_id", "token").as[(Long, String)].collect().toMap
    // doc 1: 'common' tf 3 × idf 1 = 3; 'zebra' tf 2 × idf 3 = 6
    assert(top(1L) == "zebra")
    // tf*idf: doc 2 'here'/'words' both tf1; df(here)=1 < df(words)=3 → 'here'
    assert(top(2L) == "here")
  }

  test("tfIdf rank is contiguous per doc and respects topN") {
    val docs = Seq((1L, "a b c d e"), (2L, "a b")).toDF("doc_id", "text")
    val out = TextAnalysis.tfIdf(docs, "doc_id", "text", topN = 3)
      .groupBy("doc_id").agg(collect_list("rank").as("ranks"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(out(1L).sorted == Seq(1, 2, 3))
    assert(out(2L).sorted == Seq(1, 2)) // fewer tokens than topN
  }

  test("redactPii replaces emails, phones, card runs; counts match") {
    val df = Seq(
      "mail bob.smith+x@sub.example.org now",
      "call +44-201-5554 or +1-555-0199",
      "card 4111111111111111 pin 12345",
      "clean text, nothing here").toDF("raw")
    val got = df.select(TextAnalysis.redactPii(col("raw")).as("c"))
      .as[String].collect()
    assert(got(0) == "mail [EMAIL] now")
    assert(got(1) == "call [PHONE] or [PHONE]")
    assert(got(2) == "card [NUM] pin 12345") // 5 digits is not card-like
    assert(got(3) == "clean text, nothing here")
    val (ne, np) = TextAnalysis.piiCounts(col("raw"))
    val counts = df.select(ne.as("e"), np.as("p")).as[(Int, Int)].collect()
    assert(counts.map(_._1).toSeq == Seq(1, 0, 0, 0))
    assert(counts.map(_._2).toSeq == Seq(0, 2, 0, 0))
  }

  test("packSequences: offsets are exclusive running sums, chunks honor budget") {
    val docs = Seq(
      ("s1", 1L, 100L), ("s1", 2L, 100L), ("s1", 3L, 100L), ("s1", 4L, 50L),
      ("s2", 1L, 300L)).toDF("src", "id", "nt")
    val out = TextAnalysis.packSequences(docs, "src", "id", col("nt"), budget = 250L)
      .select("src", "id", "tok_offset", "chunk")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out == Set(
      ("s1", 1L, 0L, 0L), ("s1", 2L, 100L, 0L), ("s1", 3L, 200L, 0L),
      ("s1", 4L, 300L, 1L), // crosses the 250 boundary → chunk 1
      ("s2", 1L, 0L, 0L))) // partitions pack independently
  }

  test("packSequences windows stay partition-bounded (no global sort)") {
    val docs = (0L until 1000L).map(i => (s"s${i % 4}", i, 10L)).toDF("src", "id", "nt")
    val plan = TextAnalysis.packSequences(docs, "src", "id", col("nt"), budget = 100L)
      .queryExecution.executedPlan.toString
    // a global window would show an Exchange SinglePartition before the Window
    assert(!plan.contains("SinglePartition"), s"global window detected:\n$plan")
  }
}
