package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WARC container splitting — the step BEFORE [[HttpRecord]] in a real
  * crawl-archive pipeline (Common Crawl ships WARC: concatenated
  * records, each `WARC/1.0\r\n<headers>\r\n\r\n<payload>\r\n\r\n` with
  * the payload length declared in a Content-Length header): split one
  * archive blob into its records, surfacing WARC-Type /
  * WARC-Target-URI / payload per record plus a blob-level framing
  * status, so each payload can flow on to HTTP parsing (q236) and
  * extraction (q226).
  *
  * Framing is walked as a BOUNDED fold (the [[HttpRecord.decodeChunked]]
  * idiom): each step checks the `WARC/1.0\r\n` magic at the cursor,
  * splits the header block at the first `\r\n\r\n`, reads the
  * case-insensitive Content-Length, slices exactly that many chars of
  * payload, and requires the closing `\r\n\r\n`. Any violation stops
  * the walk with a terminal status — `bad_magic`, `bad_header` (no
  * separator or no Content-Length), `bad_length` (payload overruns the
  * blob / missing closing separator), `too_many` (no end within
  * `maxRecords`) — and the records parsed BEFORE the violation are
  * still emitted, each carrying the blob status so a consumer can
  * quarantine the tail without losing the head.
  *
  * CONTRACT divergence from the WARC spec, by design: Content-Length
  * counts CHARACTERS of the string-typed blob column, not octets —
  * identical for the ASCII payloads the pipeline certifies; corpora
  * with multi-byte payloads need a binary-typed variant. (Real WARC
  * also gzips members; decompression is upstream of this operator.)
  *
  * 100-TB shape: a pure per-row projection — the fold is a fixed
  * `maxRecords`-step loop of substring/instr/regex work, linear in
  * blob size; posexplode_outer fans records out behind a Generate
  * barrier (derived-regex predicates never re-inline into the scan —
  * the q215 class); no shuffle, nothing collected. Every input blob
  * yields at least one row (zero-record blobs emit a null record row
  * with their status — the classify-every-input posture).
  */
object WarcRecord {

  /** Blobs with more records than this are out of contract (`too_many`
    * — never a silently truncated archive). One WARC member holds few
    * records at typical archive granularity; raise per corpus.
    */
  val MaxRecords = 32

  private val RecType =
    "array<struct<warc_type:string,target_uri:string,payload:string>>"

  def splitRecords(
      df: DataFrame, idCol: String, blobCol: String,
      maxRecords: Int = MaxRecords): DataFrame = {
    require(maxRecords >= 1, s"maxRecords must be positive: $maxRecords")
    val blob = coalesce(col(blobCol), lit(""))
    def state(p: Column, r: Column, s: Column) =
      struct(p.as("pos"), r.as("recs"), s.as("status"))
    val res = aggregate(
      sequence(lit(1), lit(maxRecords + 1)),
      state(lit(1), array().cast(RecType), lit("")),
      (st, _) => {
        val pos = st.getField("pos")
        val recs = st.getField("recs")
        val magicOk = blob.substr(pos, lit(10)) === "WARC/1.0\r\n"
        // locate(needle, str, pos) searches IN PLACE from the cursor:
        // the earlier instr-over-substr(pos, …) form copied the whole
        // remaining blob once per fold step — O(maxRecords·|blob|)
        // character churn per row (review finding). `sep` is the
        // ABSOLUTE 1-based index of the header/payload separator
        // (0 = not found).
        val sep = call_function("locate", lit("\r\n\r\n"), blob, pos)
        val hdr = blob.substr(pos, sep - pos)
        // the value match is ANCHORED to the line end (\r\n or header
        // end): an unanchored [0-9]{1,9} would silently TRUNCATE a
        // 10-digit declared length to its first nine digits and
        // mis-slice the payload instead of routing bad_header
        // (self-review finding)
        val clS = regexp_extract(hdr,
          "(?i)\r\nContent-Length:[ \t]*([0-9]{1,9})(?:\r\n|$)", 1)
        val cl = clS.cast("int")
        val dataStart = sep + 4
        val closeOk = blob.substr(dataStart + cl, lit(4)) === "\r\n\r\n"
        val rec = struct(
          regexp_extract(hdr, "(?i)\r\nWARC-Type:[ \t]*([^\r\n]*)", 1)
            .as("warc_type"),
          regexp_extract(hdr, "(?i)\r\nWARC-Target-URI:[ \t]*([^\r\n]*)", 1)
            .as("target_uri"),
          blob.substr(dataStart, cl).as("payload"))
        when(st.getField("status") =!= "", st)
          .when(pos > length(blob), state(pos, recs, lit("ok")))
          .when(!magicOk, state(pos, recs, lit("bad_magic")))
          .when(sep === 0 || clS === "", state(pos, recs, lit("bad_header")))
          .when(!closeOk, state(pos, recs, lit("bad_length")))
          .when(size(recs) >= maxRecords, state(pos, recs, lit("too_many")))
          .otherwise(state(dataStart + cl + 4, array_append(recs, rec),
            lit("")))
      })
    val status = when(res.getField("status") === "", lit("too_many"))
      .otherwise(res.getField("status"))
    df.select(col(idCol), status.as("warc_status"),
        res.getField("recs").as("__recs"))
      .select(col(idCol), col("warc_status"),
        posexplode_outer(col("__recs")).as(Seq("rec_idx", "__r")))
      .select(col(idCol), col("warc_status"),
        col("rec_idx").cast("long").as("rec_idx"),
        col("__r.warc_type").as("warc_type"),
        col("__r.target_uri").as("target_uri"),
        col("__r.payload").as("payload"))
  }
}
