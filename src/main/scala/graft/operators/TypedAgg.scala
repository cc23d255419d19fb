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
}
