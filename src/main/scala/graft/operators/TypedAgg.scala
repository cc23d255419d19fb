package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import graft.model.Event

/** Typed aggregation surface: a custom `Aggregator` usable from the
  * `Dataset[T]` API (`ds.select(MoneySum.toColumn)` /
  * `groupByKey(...).agg(...)`), mirroring the engine's exact-money
  * discipline in typed code. The buffer is integer CENTS (one long —
  * partial-aggregable, merge is addition, overflow at $9.2e16 which a
  * per-group money sum never reaches), and `finish` renders the 2-dp
  * string the reference's money surface uses. A typed Aggregator gets
  * the same map-side partial combine as a built-in declarative
  * aggregate — unlike a UDAF-over-rows detour, nothing here gives up
  * Tungsten.
  */
object TypedAgg {

  /** Exact sum of Event.itemPrice (a 2-dp money string; blank/null
    * prices count as zero), emitted as a 2-dp string.
    */
  object MoneySum extends Aggregator[Event, Long, String] {
    private def cents(price: String): Long =
      Option(price).filter(_.nonEmpty)
        .map(p => (BigDecimal(p) * 100).setScale(0, BigDecimal.RoundingMode.HALF_EVEN).toLongExact)
        .getOrElse(0L)

    override def zero: Long = 0L
    override def reduce(b: Long, e: Event): Long = b + cents(e.itemPrice)
    override def merge(a: Long, b: Long): Long = a + b
    override def finish(r: Long): String =
      (BigDecimal(r) / 100).setScale(2).toString
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** One (id, score) candidate for [[TopKByScore]]. */
  final case class Scored(id: Long, score: Double)

  /** BOUNDED-MEMORY top-k per group — the aggregation answer to the
    * window-rank top-k (operators/TopK.scala). A rank window must
    * shuffle and sort EVERY row of every group before the filter throws
    * away all but k of them; this Aggregator's buffer never exceeds k
    * rows, `reduce` rejects non-contenders on the map side, and `merge`
    * keeps partial combine — so the shuffle carries at most k rows per
    * (partition, group) instead of the group's whole mass. At 100 TB
    * with millions of rows per hot group that is the difference between
    * a sort of everything and a near-map-only pass; the window form
    * stays preferable when you need EVERY row's rank, not the top k.
    *
    * Order: score descending, ties to the smaller id (the q2/q54 tie
    * discipline — total, so the result is deterministic and
    * oracle-comparable). Insertion keeps the buffer sorted best-first;
    * O(k) per accepted row, and k is small by the operator's nature.
    */
  final class TopKByScore(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    require(k >= 1, s"k must be >= 1, got $k")
    private def beats(a: Scored, b: Scored): Boolean =
      a.score > b.score || (a.score == b.score && a.id < b.id)

    override def zero: Seq[Scored] = Seq.empty
    override def reduce(buf: Seq[Scored], e: Scored): Seq[Scored] =
      if (buf.size >= k && beats(buf.last, e)) buf // map-side reject, no alloc
      else ((buf :+ e).sortWith(beats)).take(k)
    override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
      (a ++ b).sortWith(beats).take(k)
    override def finish(r: Seq[Scored]): Seq[Scored] = r
    override def bufferEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** One Misra-Gries counter. `cnt` is a LOWER BOUND on the item's true
    * frequency (the sketch only ever undercounts).
    */
  final case class MgEntry(item: String, cnt: Long)

  /** MERGEABLE Misra-Gries heavy-hitters sketch with k counters — the
    * frequent-items companion to the HLL distinct sketch (q62): bounded
    * memory (k entries per partition-group), map-side partial combine,
    * and the classic guarantees regardless of partitioning or merge
    * order:
    *
    *  - every item with true frequency > n/(k+1) is IN the sketch;
    *  - estimates only undercount, by at most n/(k+1).
    *
    * reduce: present → +1; room → insert 1; full → decrement all, drop
    * zeros (the new item is not inserted — standard MG). merge
    * (Agarwal et al., "Mergeable Summaries"): sum counts by item, and
    * if over k entries subtract the (k+1)-th largest count from all,
    * keeping positives — which preserves both guarantees
    * compositionally.
    *
    * The COUNTS depend on merge order (only the guarantees are
    * deterministic), so this sketch is certified by a CONTRACT query
    * (the q46/q62 pattern) and spec properties, never by hashing the
    * raw counters.
    */
  final class MisraGries(k: Int) extends Aggregator[String, Seq[MgEntry], Seq[MgEntry]] {
    require(k >= 1, s"k must be >= 1, got $k")

    override def zero: Seq[MgEntry] = Seq.empty
    override def reduce(buf: Seq[MgEntry], item: String): Seq[MgEntry] = {
      val i = buf.indexWhere(_.item == item)
      if (i >= 0) buf.updated(i, MgEntry(item, buf(i).cnt + 1))
      else if (buf.size < k) buf :+ MgEntry(item, 1L)
      else buf.map(e => MgEntry(e.item, e.cnt - 1)).filter(_.cnt > 0)
    }
    override def merge(a: Seq[MgEntry], b: Seq[MgEntry]): Seq[MgEntry] = {
      val summed = (a ++ b).groupBy(_.item)
        .map { case (it, es) => MgEntry(it, es.map(_.cnt).sum) }.toSeq
      if (summed.size <= k) summed
      else {
        val cut = summed.map(_.cnt).sorted(Ordering[Long].reverse)(k)
        summed.map(e => MgEntry(e.item, e.cnt - cut)).filter(_.cnt > 0)
      }
    }
    override def finish(r: Seq[MgEntry]): Seq[MgEntry] =
      r.sortBy(e => (-e.cnt, e.item))
    override def bufferEncoder: Encoder[Seq[MgEntry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[MgEntry]]()
    override def outputEncoder: Encoder[Seq[MgEntry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[MgEntry]]()
  }
}
