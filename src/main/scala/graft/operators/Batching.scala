package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Length-bucketed batch assembly — the inference/eval twin of the
  * training-side sequence packing ([[graft.ext.Dedup]] pack family):
  * a batch pads every sequence to its longest member, so random
  * batching wastes compute proportional to length variance, while
  * sorting by length first makes neighbors similar and the padding
  * collapse. This operator makes that concrete and MEASURED: items
  * are totally ordered by (length DESC, id), cut into fixed-size
  * batches, and each batch reports its padding waste exactly.
  *
  * Determinism contract: the order is total (id breaks ties), and
  * the sequence rides [[Layout.globalDenseSeq]] — range partition +
  * broadcast prefix offsets, never a single-partition global window —
  * so batch ids are reproducible across cluster configs and AQE
  * decisions (the property a resumable inference sweep needs).
  *
  * All integer: padding_tokens = max_len·n_items − sum_tokens per
  * batch. Returns one row per batch:
  * (batch_id, n_items, max_len, sum_tokens, padding_tokens).
  */
object Batching {

  def lengthBatches(
      df: DataFrame, idCol: String, lenCol: String,
      batchSize: Int): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val seqd = Layout.globalDenseSeq(
      df.select(col(idCol).as("__id"), col(lenCol).cast("long").as("__len")),
      Seq(col("__len").desc, col("__id")), "__seq")
    seqd
      .withColumn("batch_id",
        ((col("__seq") - 1L) - pmod(col("__seq") - 1L, lit(batchSize.toLong)))
          / batchSize.toLong)
      .withColumn("batch_id", col("batch_id").cast("long"))
      .groupBy("batch_id")
      .agg(count(lit(1)).as("n_items"),
        max(col("__len")).as("max_len"),
        sum(col("__len")).as("sum_tokens"))
      .select(col("batch_id"), col("n_items"), col("max_len"),
        col("sum_tokens"),
        (col("max_len") * col("n_items") - col("sum_tokens"))
          .as("padding_tokens"))
  }
}
