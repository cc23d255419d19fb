package graft

import org.apache.spark.sql.functions._
import graft.operators.Batching

/** Length-bucketed batching: hand-computed batches, tie totality,
  * partition invariance, and the sorted-beats-shuffled padding claim
  * the operator exists to serve.
  */
class BatchingSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed batches: cut points, aggregates, padding exact") {
    val df = Seq((1L, 10L), (2L, 8L), (3L, 8L), (4L, 1L))
      .toDF("id", "len")
    val got = Batching.lengthBatches(df, "id", "len", batchSize = 2)
      .orderBy("batch_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // (batch_id, n_items, max_len, sum_tokens, padding_tokens)
    assert(got == Seq((0L, 2L, 10L, 18L, 2L), (1L, 2L, 8L, 9L, 7L)))
  }

  test("ragged tail: the last batch is short and still exact") {
    val df = Seq((1L, 5L), (2L, 4L), (3L, 3L)).toDF("id", "len")
    val got = Batching.lengthBatches(df, "id", "len", batchSize = 2)
      .orderBy("batch_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 2L, 5L, 9L, 1L), (1L, 1L, 3L, 3L, 0L)))
  }

  test("partition invariance: hostile repartition changes nothing") {
    val df = (1L to 100L).map(i => (i, (i * 37) % 50 + 1)).toDF("id", "len")
    val a = Batching.lengthBatches(df, "id", "len", 8)
      .orderBy("batch_id").collect().toSeq
    val b = Batching.lengthBatches(df.repartition(13, col("len")),
      "id", "len", 8).orderBy("batch_id").collect().toSeq
    assert(a == b)
  }

  test("the operator's reason to exist: length-sorted batching pads " +
      "less than id-ordered batching on a spread corpus") {
    val df = (1L to 256L).map(i => (i, (i * 97) % 200 + 1)).toDF("id", "len")
    def totalPad(batched: org.apache.spark.sql.DataFrame) =
      batched.agg(sum("padding_tokens")).head().getLong(0)
    val sorted = totalPad(Batching.lengthBatches(df, "id", "len", 16))
    // the id-ordered strawman: batch by id blocks, same aggregates
    val naive = df.withColumn("batch_id", expr("CAST((id - 1) DIV 16 AS BIGINT)"))
      .groupBy("batch_id")
      .agg(count(lit(1)).as("n"), max("len").as("m"), sum("len").as("s"))
      .agg(sum(col("m") * col("n") - col("s"))).head().getLong(0)
    assert(sorted < naive / 4,
      s"sorted padding $sorted should be far under naive $naive")
  }
}
