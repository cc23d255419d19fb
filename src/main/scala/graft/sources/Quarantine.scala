package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dead-letter ingestion: line-delimited JSON where malformed lines are
  * ROUTED, not dropped and not fatal.
  *
  * At 100 TB a landing zone always contains garbage — truncated
  * uploads, half-written lines, the odd XML heartbeat a vendor ships by
  * mistake. The two failure modes this operator exists to rule out:
  * `FAILFAST` (one bad line kills a 1000-executor scan) and silent
  * `DROPMALFORMED` (data loss with no audit trail). Instead the scan
  * runs PERMISSIVE with `columnNameOfCorruptRecord`: well-formed lines
  * parse against the DECLARED schema (no inference pass over 100 TB),
  * malformed lines surface as rows whose raw text is preserved
  * byte-for-byte in the corrupt column — so the quarantine channel can
  * be counted, fingerprinted, persisted, and replayed after the
  * upstream fix. Classification happens per-line inside the scan
  * (codegen'd `when`), no second pass, no driver involvement.
  *
  * Reference contrast: the reference's ingest trusts its webhook blobs
  * completely (process.py:38-47 writes whatever arrived; top10.py:147-
  * 166 loads driver-side with no malformed-input path at all) — this is
  * the operator a Spark-first redesign adds because scale makes bad
  * input a certainty, not an anomaly.
  */
object Quarantine {

  val CorruptCol = "_corrupt"

  /** The event-line schema plus the corrupt-record channel. A JSON null
    * field (e.g. `"resourceId": null`) is a VALID row with a null
    * column — only lines that fail to parse land in quarantine.
    *
    * Shape: `text` scan + `from_json`, NOT `spark.read.json` with a
    * corrupt column. The raw-JSON reader refuses any query whose
    * referenced columns reduce to only the corrupt column
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — and
    * "count the quarantine channel" is exactly such a query after
    * column pruning. `from_json` over a text scan has no such
    * restriction, parses once per line inside codegen, and makes the
    * raw line a first-class column the whole way down.
    */
  def readEventLines(spark: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("eventId", StringType), StructField("resourceId", StringType),
      StructField("userId", StringType), StructField("duration", LongType),
      StructField("itemPrice", StringType),
      StructField(CorruptCol, StringType)))
    spark.read.text(dir)
      .select(from_json(col("value"), schema,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> CorruptCol)).as("j"))
      .select("j.*")
  }

  /** One row per input line, tagged `ok`/`corrupt`: typed columns for
    * parsed rows, an md5 fingerprint of the PRESERVED raw text for
    * quarantined ones (the audit handle a dead-letter sink would key
    * on). This is the frame a pipeline splits into its main and
    * quarantine branches with two filters on `kind`.
    */
  def triage(spark: SparkSession, dir: String): DataFrame =
    triageParsed(readEventLines(spark, dir))

  /** Triage over an already-read lines frame (`value`: one raw line per
    * row) — the seam ScaleProbe feeds synthetic corpora through.
    */
  def triageLines(lines: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("eventId", StringType), StructField("resourceId", StringType),
      StructField("userId", StringType), StructField("duration", LongType),
      StructField("itemPrice", StringType),
      StructField(CorruptCol, StringType)))
    triageParsed(lines
      .select(from_json(col("value"), schema,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> CorruptCol)).as("j"))
      .select("j.*"))
  }

  private def triageParsed(parsed: DataFrame): DataFrame =
    parsed.select(
      when(col(CorruptCol).isNull, lit("ok")).otherwise(lit("corrupt")).as("kind"),
      col("eventId").as("event_id"),
      col("resourceId").as("resource_id"),
      col("userId").as("user_id"),
      col("duration"),
      col("itemPrice").as("item_price"),
      md5(col(CorruptCol)).as("line_fp"))
}
