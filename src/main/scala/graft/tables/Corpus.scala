package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, TimestampNTZType, TimestampType}

/** Loader for the driver-generated parquet corpus (TESTDATA.md).
  *
  * One parquet directory per scale factor; tables are TPC-H-ish plus an
  * `events` stream table and `documents`/`embeddings` for the
  * training-data extension operators.
  *
  * Design note (100 TB posture): this reads parquet directly with
  * `spark.read.parquet` — no driver-side materialization (the reference
  * downloads one JSON blob per event onto the driver,
  * top10.py:149-153; that pattern is deliberately NOT reproduced).
  */
object Corpus {
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Tables that are genuinely bounded (constant cardinality regardless
    * of scale factor) and therefore always safe to broadcast. `part`,
    * `customer`, `supplier` grow linearly with scale — broadcasting them
    * is an executor OOM at the 100-TB posture, so they are deliberately
    * NOT here; AQE picks broadcast-vs-shuffled-hash for them by measured
    * size at runtime.
    */
  val broadcastableDims: Set[String] = Set("region", "nation")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    normalize(spark.read.parquet(s"$dir/$name.parquet"))

  /** Register every table as a temp view (for the spark.sql surface). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    tableNames.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Normalize generator-era timestamp encodings to plain TimestampType:
    *
    *  - INT64(TIMESTAMP(NANOS)) surfaced as LongType under
    *    `spark.sql.legacy.parquet.nanosAsLong` (the pre-round-10 corpus;
    *    Spark 4 has no native nanos type). `div` is integral division — a
    *    double-precision `/` would lose precision at ~1.7e18 ns epoch
    *    values (> 2^53).
    *  - TIMESTAMP_NTZ (the round-10 regenerated corpus writes
    *    timestamp[us] without isAdjustedToUTC). Functions like
    *    unix_micros() accept only TimestampType; under the fixed UTC
    *    session the cast reinterprets the same wall-clock instant, so
    *    every downstream value (epoch math, date keys, month strings) is
    *    identical to the nanos-era certified results. Applied to EVERY
    *    NTZ column (ts, l_shipdate, o_orderdate) so the whole surface
    *    keeps one timestamp type.
    */
  private def normalize(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) {
      case (d, StructField(name, LongType, _, _)) if name == "ts" =>
        d.withColumn(name, expr(s"timestamp_micros($name div 1000)"))
      case (d, StructField(name, TimestampNTZType, _, _)) =>
        d.withColumn(name, col(name).cast(TimestampType))
      case (d, _) => d
    }
}
