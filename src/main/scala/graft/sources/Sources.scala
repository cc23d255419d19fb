package graft.sources

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import java.nio.file.{Files, Paths}

import graft.model.{Category, Event, Resource, Schemas}

/** Ingestion tier (SURVEY.md §2.1, S1-S5) re-expressed Spark-first.
  *
  * The reference downloads one JSON blob per event serially onto the
  * driver (top10.py:137-168) — that pattern is deliberately replaced by
  * Spark's native multi-file scan, which parallelizes listing + parsing
  * across executors and is the only shape that survives 100 TB of
  * landing files. Only the genuinely tiny payloads (a categories HTTP
  * body, a rates map) touch the driver, and each is bounded by contract.
  */
object Sources {

  /** S3 — multi-file JSON event scan with the declared schema (replaces
    * the reference's driver download loop). Explicit schema: no
    * inference pass over 100 TB, and missing fields (e.g. userId) become
    * proper nulls.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(Schemas.event).json(dir)

  /** S2 — dimension load with *inferred* schema (the reference's
    * Firestore-resources path infers, top10.py:97-114). Inference is
    * fine for dims: bounded data, one small pass.
    */
  def resources(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** S1 — HTTP-JSON dim (categories): the reference GETs a url and
    * builds a DataFrame from the payload's `content` array with an
    * explicit schema (top10.py:35-59). Same mechanism here: a
    * driver-side fetch of a tiny payload (fixture-backed — zero-egress
    * environment), parsed on the driver, then `createDataFrame` with
    * the declared schema.
    */
  def categories(spark: SparkSession, path: String): DataFrame = {
    val payload = Files.readString(Paths.get(path))
    val rows = parseCategoryContent(payload).map { m =>
      Row(m.get("tenant").orNull, m.get("id").orNull,
        m.get("name").orNull, m.get("percent").orNull)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), Schemas.category)
  }

  /** Typed Dataset views (SURVEY.md §1.3: DataFrame at the edges,
    * Dataset[T] where type safety helps downstream logic).
    */
  def eventsDs(spark: SparkSession, dir: String): Dataset[Event] = {
    import spark.implicits._
    events(spark, dir).as[Event]
  }

  def resourcesDs(spark: SparkSession, path: String): Dataset[Resource] = {
    import spark.implicits._
    resources(spark, path).select("id", "name", "categoryId", "providerId", "promotion").as[Resource]
  }

  def categoriesDs(spark: SparkSession, path: String): Dataset[Category] = {
    import spark.implicits._
    categories(spark, path).as[Category]
  }

  /** S4 — CSV with header + inferSchema (countries, royalties.py:66-68). */
  def countries(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** S5 — scalar rates lookup: tiny JSON object fetched driver-side,
    * exposed both as a broadcast Map (closure lookups, J6) and as a
    * one-row-per-code DataFrame (broadcast-join conversion, the
    * Catalyst-friendly form).
    */
  def exchangeRates(path: String): Map[String, Double] =
    parseRates(Files.readString(Paths.get(path)))

  def broadcastRates(spark: SparkSession, path: String): Broadcast[Map[String, Double]] =
    spark.sparkContext.broadcast(exchangeRates(path))

  def ratesDf(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    exchangeRates(path).toSeq.toDF("Code", "rate")
  }

  // ── tiny driver-side JSON parsing (bounded payloads only) ──────────
  // Hand-rolled flat-object parser: the build has no JSON library on
  // the compile classpath beyond Spark's shaded ones, and these two
  // payload shapes are fixed by the reference's API contract.

  /** Extracts the array of flat string-valued objects under "content". */
  private[sources] def parseCategoryContent(json: String): Seq[Map[String, String]] = {
    val content = json.substring(json.indexOf("\"content\""))
    val arr = content.substring(content.indexOf('[') + 1, matchingBracket(content, content.indexOf('[')))
    objectSpans(arr).map(parseFlatObject)
  }

  /** Extracts the string->double map under "exchange_rate". */
  private[sources] def parseRates(json: String): Map[String, Double] = {
    val body = json.substring(json.indexOf("\"exchange_rate\""))
    val obj = body.substring(body.indexOf('{') + 1, matchingBrace(body, body.indexOf('{')))
    pairRegex.findAllMatchIn(obj).map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  private val pairRegex = """"([^"]+)"\s*:\s*([0-9.Ee+-]+)""".r
  private val stringPairRegex = """"([^"]+)"\s*:\s*"([^"]*)"""".r

  private def parseFlatObject(s: String): Map[String, String] =
    stringPairRegex.findAllMatchIn(s).map(m => m.group(1) -> m.group(2)).toMap

  private def objectSpans(arr: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < arr.length) {
      if (arr(i) == '{') {
        val end = matchingBrace(arr, i)
        out += arr.substring(i, end + 1)
        i = end + 1
      } else i += 1
    }
    out.result()
  }

  private def matchingBrace(s: String, open: Int): Int = matching(s, open, '{', '}')
  private def matchingBracket(s: String, open: Int): Int = matching(s, open, '[', ']')

  private def matching(s: String, open: Int, oc: Char, cc: Char): Int = {
    var depth = 0
    var i = open
    while (i < s.length) {
      if (s(i) == oc) depth += 1
      else if (s(i) == cc) { depth -= 1; if (depth == 0) return i }
      i += 1
    }
    s.length - 1
  }
}
