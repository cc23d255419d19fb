package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTTP response-record parsing — the stage between fetch and
  * everything else in a crawl pipeline (the analytics-visible half of
  * WARC response processing): split the status line / header block /
  * body at the first blank line, extract status code, Content-Type
  * and charset, and route every record through a total decision table
  * — `malformed` (no HTTP status line or no header/body separator),
  * `bad_status` (non-200), `bad_type` (not text/html) or `ok` — so
  * only parseable 200 text/html bodies reach the extraction tier
  * (q226) and everything else lands in quarantine with a reason, the
  * same posture as [[UrlCanon.urlDecisions]].
  *
  * Native RE2-safe regex expressions only (non-greedy `.*?` to the
  * FIRST `\r\n\r\n`, no lookahead, no backreferences), so DuckDB
  * mirrors the chain verbatim and the stage is oracle-certifiable
  * (q236). Headers are matched INSIDE the header block only — a
  * `Content-Type:` string in the body can never win — and header
  * names are case-insensitive per RFC 9110.
  *
  * 100-TB shape: a pure per-row projection (codegen'd regex splits,
  * no shuffle, nothing collected). Derived-column consumers filter
  * behind a Generate barrier as usual (the q215/q222 re-inlining
  * class).
  */
object HttpRecord {

  /** The header block: status line + headers, up to the FIRST blank
    * line; '' when the record has no `\r\n\r\n` separator.
    */
  private def headBlock(raw: Column): Column =
    regexp_extract(raw, "(?s)^(.*?)\r\n\r\n", 1)

  /** Numeric status code from the status line, or NULL when the
    * record does not start with `HTTP/<ver> <code>`.
    */
  def status(raw: Column): Column = {
    val s = regexp_extract(raw, "^HTTP/[0-9.]+ ([0-9]{3})", 1)
    when(s === "", lit(null).cast("int")).otherwise(s.cast("int"))
  }

  /** Case-insensitive header value from the header block (first
    * occurrence), '' when absent. `name` must be a literal header
    * name ([A-Za-z-]+ — it is interpolated into the pattern).
    */
  def header(raw: Column, name: String): Column = {
    require(name.matches("[A-Za-z-]+"), s"bad header name: $name")
    regexp_extract(headBlock(raw), s"(?i)\r\n$name:[ \t]*([^\r\n]*)", 1)
  }

  /** Everything after the first blank line ('' when no separator). */
  def body(raw: Column): Column =
    regexp_extract(raw, "(?s)^.*?\r\n\r\n(.*)", 1)

  /** Parse a raw-response column into the typed record + decision
    * table: (idCol, status, content_type, charset, decision,
    * body_chars). Media type is the Content-Type value up to the
    * first ';', trimmed and lowercased; charset likewise from the
    * `charset=` parameter.
    */
  def parse(df: DataFrame, idCol: String, rawCol: String): DataFrame = {
    val raw = col(rawCol)
    val st = status(raw)
    val ct = header(raw, "Content-Type")
    val mediaType = lower(trim(regexp_extract(ct, "^([^;]*)", 1)))
    val charset = lower(regexp_extract(ct, "(?i)charset=([A-Za-z0-9_-]+)", 1))
    val hasSep = raw.contains("\r\n\r\n")
    df.select(col(idCol), st.as("status"),
        mediaType.as("content_type"), charset.as("charset"),
        when(st.isNull || !hasSep, lit("malformed"))
          .when(st =!= 200, lit("bad_status"))
          .when(mediaType =!= "text/html", lit("bad_type"))
          .otherwise(lit("ok")).as("decision"),
        when(hasSep, length(body(raw)).cast("long")).otherwise(lit(0L))
          .as("body_chars"))
  }
}
