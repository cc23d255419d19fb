package graft

import org.apache.spark.sql.functions._

import graft.ext.Bpe

/** Real BPE train/apply: merge-rule semantics (leftmost-greedy,
  * non-overlapping), deterministic tie-breaks, and the encode
  * invariants the q197/q198 oracles rest on.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("wrap/extract round-trip and merge semantics on overlapping runs") {
    val df = Seq("aaa").toDF("w")
      .withColumn("sym", Bpe.wrapChars($"w"))
    assert(df.select("sym").as[String].head() == ".a..a..a.")
    // one (a,a) merge: leftmost pair merges, the trailing 'a' survives —
    // the classic non-overlapping apply rule
    val merged = Bpe.encodeVocab(Seq("aaa", "aaaa", "a").toDF("w"), "w",
        Seq(Bpe.Merge(1, "a", "a", 0L)))
      .select($"w", array_join($"bpe_syms", "|").as("s"))
      .as[(String, String)].collect().toMap
    assert(merged("aaa") == "aa|a")
    assert(merged("aaaa") == "aa|aa")
    assert(merged("a") == "a")
  }

  test("learnMerges: weighted argmax with lexicographic tie-break; merges compose") {
    // 'abab' x2 and 'cd' x3: pair counts ab=4 (2 per word x 2), ba=2,
    // cd=3 -> rank1 = (a,b). After merging, 'ab ab' yields (ab,ab)=2,
    // cd=3 -> rank2 = (c,d); rank3 = (ab,ab).
    val docs = Seq("abab abab cd cd cd").toDF("text")
    val ms = Bpe.learnMerges(docs, "text", 3)
    assert(ms.map(m => (m.rank, m.x, m.y, m.cnt)) ==
      Seq((1, "a", "b", 4L), (2, "c", "d", 3L), (3, "ab", "ab", 2L)))
    // exact tie in counts -> lexicographically smaller pair wins
    val tied = Bpe.learnMerges(Seq("xy qr").toDF("text"), "text", 1)
    assert(tied.head.x == "q" && tied.head.y == "r" && tied.head.cnt == 1L)
  }

  test("encodeCounts: zero merges count chars; counts shrink monotonically with k") {
    val docs = Seq((1L, "the cat sat"), (2L, "a bb ccc")).toDF("doc_id", "text")
    val zero = Bpe.encodeCounts(docs, "doc_id", "text", Seq.empty)
      .select($"doc_id", $"n_bpe").as[(Long, Long)].collect().toMap
    assert(zero(1L) == 9L && zero(2L) == 6L) // char counts
    val docsBig = spark.read.parquet(s"$sf0001/documents.parquet")
    val m2 = Bpe.learnMerges(docsBig, "text", 2)
    val m4 = Bpe.learnMerges(docsBig, "text", 4)
    assert(m2 == Bpe.learnMerges(docsBig, "text", 4).take(2),
      "a longer train must extend, not change, the earlier ranks")
    def total(ms: Seq[Bpe.Merge]): Long =
      Bpe.encodeCounts(docsBig, "doc_id", "text", ms)
        .agg(sum($"n_bpe")).as[Long].head()
    val (t0, t2, t4) = (total(Seq.empty), total(m2), total(m4))
    assert(t0 > t2 && t2 > t4,
      s"every applied merge must reduce the corpus token count: $t0, $t2, $t4")
  }

  test("stored model round-trips byte-for-byte and encodes identically") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val ms = Bpe.learnMerges(docs, "text", 4)
    val work = java.nio.file.Files.createTempDirectory("graft-bpe-model").toString
    Bpe.writeModel(ms, spark, work)
    assert(Bpe.readModel(spark, work) == ms)
    val a = Bpe.encodeCounts(docs, "doc_id", "text", ms)
    val b = Bpe.encodeCounts(docs, "doc_id", "text", Bpe.readModel(spark, work))
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }
}
