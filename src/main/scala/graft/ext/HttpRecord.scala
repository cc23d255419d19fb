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

  /** Media type: the Content-Type value up to the first ';', trimmed
    * and lowercased. Shared by [[parse]] and
    * [[FetchDecode.decodeResponses]] (round-15 review: the two had
    * byte-identical private copies — the drift class the shared-
    * builder discipline exists to prevent).
    */
  def mediaType(raw: Column): Column =
    lower(trim(regexp_extract(header(raw, "Content-Type"), "^([^;]*)", 1)))

  /** The `charset=` parameter regex: RFC 9110 allows the
    * quoted-string form (`charset="utf-8"`), so an optional double
    * quote is consumed before the token (round-15 review fix — the
    * bare-token form silently dropped quoted declarations onto the
    * fallback decode leg). Single quotes are NOT consumed: they are
    * not legal in Content-Type parameters (unlike HTML meta
    * attributes — [[FetchDecode]]'s meta sniff accepts both). The
    * match is LEFT-ANCHORED to a parameter boundary (value start,
    * ';', or whitespace — round-16 review fix): without it the regex
    * fired inside a longer parameter NAME (`xcharset=foo` — the
    * round-17 pinned adversarial arm) or mid-token inside another
    * parameter's quoted value. SCOPE: full quoted-string SKIPPING is
    * deliberately out of contract — a `charset=` preceded by a space
    * INSIDE another parameter's quotes still matches (pinned in
    * HttpRecordSpec); that shape only arises from an
    * attacker-controlled Content-Type, where the header is untrusted
    * anyway. The oracle mirrors this regex with the double quote
    * written plainly inside its single-quoted SQL literal.
    */
  private[graft] val CharsetParamRe =
    "(?i)(?:^|[;\\s])charset=\"?([A-Za-z0-9_-]+)"

  /** The charset parameter value, lowercased ('' when absent). */
  def charsetParam(raw: Column): Column =
    lower(regexp_extract(header(raw, "Content-Type"), CharsetParamRe, 1))

  /** The framing-decision PREFIX shared by [[parse]] and
    * [[FetchDecode.decodeResponses]]: `malformed` (no status line /
    * no header-body separator) > `bad_status` (non-200) >
    * `bad_encoding` (a Transfer-Encoding outside the caller's
    * support). Returned as an UNTERMINATED when-chain — NULL when no
    * rung fires — so each caller appends its own rungs and
    * `otherwise`; one definition, routes cannot drift.
    *
    * `allowChunked`: [[parse]] (q236) keeps the strict posture —
    * chunked bodies must be de-chunked before re-parsing, so
    * `chunked` fires the rung; [[FetchDecode.decodeResponses]]
    * de-chunks IN-LINE (round 16) and passes true, so only TE values
    * outside identity/chunked fire here (a chunked body whose chunk
    * FRAMING is bad still routes `bad_encoding`, via the caller's
    * own rung on [[decodeChunked]]'s NULL).
    */
  def decisionPrefix(raw: Column, allowChunked: Boolean = false): Column = {
    val st = status(raw)
    val te = lower(trim(header(raw, "Transfer-Encoding")))
    val teOk = if (allowChunked) te === "" || te === "identity" || te === "chunked"
      else te === "" || te === "identity"
    when(st.isNull || !raw.contains("\r\n\r\n"), lit("malformed"))
      .when(st =!= 200, lit("bad_status"))
      .when(!teOk, lit("bad_encoding"))
  }

  /** Parse a raw-response column into the typed record + decision
    * table: (idCol, status, content_type, charset, transfer_encoding,
    * decision, body_chars). Media type is the Content-Type value up
    * to the first ';', trimmed and lowercased; charset likewise from
    * the `charset=` parameter. A `Transfer-Encoding` other than
    * `identity` routes to `bad_encoding` (the raw body is NOT the
    * payload — its chunk-length framing would corrupt extraction
    * downstream); route such records through [[decodeChunked]] before
    * re-parsing, or quarantine them.
    */
  def parse(df: DataFrame, idCol: String, rawCol: String): DataFrame = {
    val raw = col(rawCol)
    val mt = mediaType(raw)
    val hasSep = raw.contains("\r\n\r\n")
    df.select(col(idCol), status(raw).as("status"),
        mt.as("content_type"), charsetParam(raw).as("charset"),
        lower(trim(header(raw, "Transfer-Encoding"))).as("transfer_encoding"),
        decisionPrefix(raw)
          .when(mt =!= "text/html", lit("bad_type"))
          .otherwise(lit("ok")).as("decision"),
        when(hasSep, length(body(raw)).cast("long")).otherwise(lit(0L))
          .as("body_chars"))
  }

  /** Chunked bodies longer than this many chunks are out of contract
    * (the fold returns NULL — the quarantine route, never a silently
    * truncated payload). 64 covers bodies far past the fixture scale;
    * raise it if a corpus carries more.
    */
  val MaxChunks = 64

  /** RFC 9112 §7.1 chunked transfer-decoding as a BOUNDED fold — the
    * missing step between a `Transfer-Encoding: chunked` fetch and
    * the extraction tier: each step reads `<hex-size>\r\n<data>\r\n`
    * at the cursor; the `0\r\n` chunk terminates (trailers ignored).
    * Returns the reassembled payload, or NULL for anything malformed
    * — a missing CRLF, a non-hex size line (chunk extensions are out
    * of the syntactic contract), a body that does not terminate
    * within [[MaxChunks]] — so bad framing quarantines rather than
    * keying garbage.
    *
    * 100-TB shape: a pure per-row projection. `aggregate` over a
    * constant [[MaxChunks]]-element sequence is a fixed-cost loop of
    * substring/instr steps (higher-order functions evaluate
    * interpreted, not codegen'd, but stay linear in body size); no
    * shuffle, nothing collected. DuckDB mirrors the fold verbatim via
    * list_reduce with a prepended init struct (the q48 discipline).
    */
  /** Chunked-frame a text column (the INVERSE of [[decodeChunked]] —
    * fixture/probe helper, one definition so the q241 fixture and the
    * scale probe cannot drift): `size`-byte chunks with lowercase hex
    * length lines and the terminal `0` chunk.
    */
  def chunkedFrame(text: Column, size: Int): Column = {
    require(size >= 1, s"chunk size must be positive: $size")
    val n = length(text)
    val k = ((n + lit(size - 1)) / lit(size)).cast("int")
    val chunks = transform(sequence(lit(0), k - 1), i => {
      val clen = least(lit(size), n - i * size)
      concat(lower(hex(clen.cast("long"))), lit("\r\n"),
        text.substr(i * size + 1, clen), lit("\r\n"))
    })
    when(n === 0, lit("0\r\n\r\n"))
      .otherwise(concat(array_join(chunks, ""), lit("0\r\n\r\n")))
  }

  def decodeChunked(bodyCol: Column): Column = {
    val res = aggregate(
      sequence(lit(1), lit(MaxChunks)),
      struct(lit(1).as("pos"), lit("").as("acc"),
        lit(false).as("done"), lit(false).as("bad")),
      (st, _) => {
        val pos = st.getField("pos")
        val acc = st.getField("acc")
        val rel = instr(bodyCol.substr(pos, length(bodyCol)), "\r\n")
        val hexs = bodyCol.substr(pos, rel - 1)
        val okHex = rel > 0 && hexs.rlike("^[0-9a-fA-F]{1,6}$")
        val len = conv(hexs, 16, 10).cast("int")
        val dataStart = pos + rel + 1
        val crlfOk = bodyCol.substr(dataStart + len, lit(2)) === "\r\n"
        def state(p: Column, a: Column, done: Boolean, bad: Boolean) =
          struct(p.as("pos"), a.as("acc"),
            lit(done).as("done"), lit(bad).as("bad"))
        when(st.getField("done") || st.getField("bad"), st)
          .when(!okHex, state(pos, acc, done = false, bad = true))
          .when(len === 0, state(pos, acc, done = true, bad = false))
          .when(!crlfOk, state(pos, acc, done = false, bad = true))
          .otherwise(state(dataStart + len + 2,
            concat(acc, bodyCol.substr(dataStart, len)),
            done = false, bad = false))
      })
    when(res.getField("done") && !res.getField("bad"), res.getField("acc"))
      .otherwise(lit(null).cast("string"))
  }
  /** CONDITIONAL-fetch planning (RFC 9110 revalidation) — after
    * recrawl scheduling decides WHO to refetch, this decides HOW:
    * from each URL's LATEST stored response, a stored `ETag` plans
    * `revalidate_etag` (an If-None-Match refetch — a 304 costs
    * headers, not the body), else a stored `Last-Modified` plans
    * `revalidate_modified` (If-Modified-Since), else `full`. Output
    * one row per url: (url, last_status, mode, validator). Earlier
    * rounds' validators are decoys by construction — only the latest
    * response counts.
    *
    * Latest-response selection is a primitive `max(round)` aggregate
    * plus ONE keyed join back — HashAggregate both sides, no window
    * sort (the robotsDecide lesson: max_by/struct buffers fall off
    * the hash aggregate). CONTRACT: (urlCol, roundCol) is unique in
    * the response log (a duplicate max-round row would emit twice).
    * The header reads are pure header-block-scoped projections.
    */
  def conditionalFetchPlan(
      responses: DataFrame, urlCol: String, roundCol: String,
      rawCol: String): DataFrame = {
    val latestRound = responses.groupBy(col(urlCol))
      .agg(max(col(roundCol)).as(roundCol))
    val latest = responses.join(latestRound, Seq(urlCol, roundCol))
    val et = trim(header(col(rawCol), "ETag"))
    val lm = trim(header(col(rawCol), "Last-Modified"))
    latest.select(col(urlCol).as("url"),
      status(col(rawCol)).as("last_status"),
      when(et =!= "", lit("revalidate_etag"))
        .when(lm =!= "", lit("revalidate_modified"))
        .otherwise(lit("full")).as("mode"),
      when(et =!= "", et).when(lm =!= "", lm).otherwise(lit(""))
        .as("validator"))
  }

  /** IMF-fixdate (RFC 9110 `Date`/`Expires`/`Last-Modified`) to epoch
    * seconds, NULL on anything unparseable. The day name is stripped
    * by regex BEFORE the parse — robust HTTP clients ignore it, and
    * skipping it sidesteps strict day-of-week/date consistency
    * resolution. `try_to_timestamp` (not `to_timestamp`) so a garbled
    * date degrades to NULL instead of an ANSI parse error killing the
    * whole scan. Instant-exact under the fixed UTC session.
    */
  private def imfFixdateEpoch(v: Column): Column =
    unix_timestamp(try_to_timestamp(
      regexp_extract(trim(v),
        "^[A-Za-z]{3}, ([0-9]{2} [A-Za-z]{3} [0-9]{4} [0-9]{2}:[0-9]{2}:[0-9]{2}) GMT$", 1),
      lit("dd MMM yyyy HH:mm:ss")))

  /** CACHE-FRESHNESS planning (RFC 9111): how long each stored
    * response stays fresh — the TTL feed for recrawl scheduling
    * ([[UrlCanon.recrawlStats]] estimates how often a page CHANGES;
    * this is how long the server ASKS us to keep it). Decision table,
    * every response classified once, precedence per the RFC:
    * `no_store` > `no_cache` (always revalidate) > `max_age`
    * (Cache-Control: max-age=N) > `expires` (Expires − Date, clamped
    * at 0 — a past Expires is stale on arrival) > `heuristic` (10% of
    * Date − Last-Modified, the RFC 9111 §4.2.2 heuristic) > `none`.
    * Output: (idCol, status, mode, ttl_s).
    *
    * Cache-Control directives are matched inside the header value
    * with list-aware boundaries (`(^|[,\s])name([,\s]|$)`) — a
    * `no-store` inside some other token can't trigger. Date math is
    * integer epoch seconds; the heuristic divide is exact-integer
    * (the subtract-pmod form — `DIV` is not available on Columns).
    * Pure per-row projection: header-block-scoped reads, no shuffle.
    */
  def cachePlan(df: DataFrame, idCol: String, rawCol: String): DataFrame = {
    val raw = col(rawCol)
    val cc = header(raw, "Cache-Control")
    val noStore = cc.rlike("(?i)(^|[,\\s])no-store([,\\s]|$)")
    val noCache = cc.rlike("(?i)(^|[,\\s])no-cache([,\\s]|$)")
    val maxAge = regexp_extract(cc, "(?i)(^|[,\\s])max-age=([0-9]+)", 2)
    val date = imfFixdateEpoch(header(raw, "Date"))
    val expires = imfFixdateEpoch(header(raw, "Expires"))
    val lastMod = imfFixdateEpoch(header(raw, "Last-Modified"))
    val expTtl = greatest(expires - date, lit(0L))
    val age = greatest(date - lastMod, lit(0L))
    val heurTtl = ((age - pmod(age, lit(10L))) / lit(10L)).cast("long")
    df.select(col(idCol), status(raw).as("status"),
      when(noStore, lit("no_store"))
        .when(noCache, lit("no_cache"))
        .when(maxAge =!= "", lit("max_age"))
        .when(expires.isNotNull && date.isNotNull, lit("expires"))
        .when(lastMod.isNotNull && date.isNotNull, lit("heuristic"))
        .otherwise(lit("none")).as("mode"),
      when(noStore || noCache, lit(0L))
        .when(maxAge =!= "", maxAge.cast("long"))
        .when(expires.isNotNull && date.isNotNull, expTtl)
        .when(lastMod.isNotNull && date.isNotNull, heurTtl)
        .otherwise(lit(0L)).as("ttl_s"))
  }

  /** PER-HOST retry/backoff planning — the failure half of politeness
    * (the crawl-delay tier spaces SUCCESSFUL fetches; this spaces
    * retries after failures): from a per-host attempt log, the
    * consecutive TRAILING failure streak decides the host's state and
    * next-fetch delay. A retryable latest response carrying
    * `Retry-After: N` (delta-seconds form) honors the server's ask;
    * otherwise exponential backoff `baseDelayS * 2^min(streak-1,
    * maxExp)`; a streak of `giveUpAt`+ abandons the host (delay −1);
    * a successful latest fetch clears the backoff (state `ok`, delay
    * 0). Failure = status NULL (malformed) or >= 400.
    *
    * Streak arithmetic is aggregate-only — `max(attempt) −
    * max(attempt where success)` — and the latest row's headers come
    * back via the [[conditionalFetchPlan]] max-round keyed join (no
    * window sort; HashAggregate both sides). CONTRACT: (hostCol,
    * attemptCol) unique. An earlier attempt's Retry-After is a decoy
    * by construction — only the latest response's header is read.
    * Output: (host, n_attempts, last_status, consec_failures, state,
    * next_delay_s).
    */
  def retryBackoff(
      df: DataFrame, hostCol: String, attemptCol: String, rawCol: String,
      baseDelayS: Long = 5L, maxExp: Int = 6, giveUpAt: Long = 8L): DataFrame = {
    require(baseDelayS > 0 && maxExp >= 0 && giveUpAt > 0,
      s"bad backoff params: base=$baseDelayS maxExp=$maxExp giveUp=$giveUpAt")
    val st = status(col(rawCol))
    val ok = st.isNotNull && st < 400
    val agg = df.groupBy(col(hostCol))
      .agg(max(col(attemptCol)).as("__last"),
        count(lit(1)).as("n_attempts"),
        max(when(ok, col(attemptCol))).as("__lastOk"))
      .withColumn("consec_failures",
        (col("__last") - coalesce(col("__lastOk"), lit(0L))).cast("long"))
    val latest = df
      .join(agg.select(col(hostCol), col("__last").as(attemptCol)),
        Seq(hostCol, attemptCol))
      .select(col(hostCol), status(col(rawCol)).as("last_status"),
        trim(header(col(rawCol), "Retry-After")).as("__ra"))
    // 2^k via pow: exact in double far past maxExp's cap, cast lossless
    val expDelay = (lit(baseDelayS) * pow(lit(2.0),
      least(col("consec_failures") - 1, lit(maxExp.toLong)).cast("double")))
      .cast("long")
    agg.join(latest, Seq(hostCol))
      .select(col(hostCol).as("host"), col("n_attempts"), col("last_status"),
        col("consec_failures"),
        when(col("consec_failures") === 0, lit("ok"))
          .when(col("consec_failures") >= giveUpAt, lit("gave_up"))
          .otherwise(lit("backoff")).as("state"),
        when(col("consec_failures") === 0, lit(0L))
          .when(col("consec_failures") >= giveUpAt, lit(-1L))
          .when(col("__ra").rlike("^[0-9]+$"), col("__ra").cast("long"))
          .otherwise(expDelay).as("next_delay_s"))
  }
}
