package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.{Inflate, Transcode}

/** The full fetch-side decode: raw HTTP response BYTES → extracted
  * UTF-8 text, in one total decision table — the composition of the
  * family's pieces ([[HttpRecord]] framing, [[Inflate]]
  * Content-Encoding, [[Transcode]] charsets) that a real crawl
  * pipeline runs between the WARC payload and the tokenizer. Until
  * this operator, each piece was certified alone and the
  * bytes-to-text path existed only implicitly.
  *
  * BINARY PLUMBING: the record is bridged bytes→chars through
  * ISO-8859-1 (`decode(raw, 'ISO-8859-1')`) — a LOSSLESS 1:1 mapping
  * for every byte value, invertible via `encode` — so the status
  * line / header block / separator split runs on Spark's native
  * string machinery (the [[HttpRecord]] regexes) and only the BODY
  * round-trips back to bytes for inflate + charset decode. Headers
  * are ASCII by RFC 9112, so the bridge is exact where it is read.
  *
  * CHARSET RESOLUTION (WHATWG-ordered, each leg certified by a
  * fixture arm):
  *   1. a BOM on the decoded payload wins over everything (and is
  *      stripped) — UTF-8 (EF BB BF), UTF-32LE (FF FE 00 00),
  *      UTF-32BE (00 00 FE FF), UTF-16LE (FF FE), or UTF-16BE
  *      (FE FF), the 4-byte pair checked BEFORE the 2-byte prefix it
  *      shadows (round 16 — a UTF-32 extension beyond the WHATWG
  *      prescan, which drops UTF-32; the residual FF FE 00 00
  *      ambiguity resolves toward UTF-32 since real text never leads
  *      with NUL). A lying `charset=` header cannot override bytes.
  *      The sniff fires on the raw prefix BYTES regardless of
  *      content: a legacy single-byte page that genuinely starts
  *      with FF FE / FE FF (e.g. cp1252 "ÿþ…") is forced onto the
  *      UTF-16/32 leg and garbles — accepted prescan behavior
  *      (browsers make the same call);
  *   2. the Content-Type `charset=` parameter;
  *   3. a `<meta … charset=…>` sniff in the first [[MetaSniffBytes]]
  *      bytes of the payload (covers both the HTML5 attribute and
  *      the legacy http-equiv form — the fallback
  *      [[HtmlExtract]] disclaims);
  *   4. no declaration: strict UTF-8 attempt (most of the modern
  *      web; a clean parse is authoritative);
  *   5. windows-1252 LENIENT fallback (the browser legacy default —
  *      total: every byte decodes, undefined points become U+FFFD).
  * A DECLARED charset decodes LENIENTLY (browser rule): a wrong
  * declaration yields U+FFFD damage for the mojibake gate
  * ([[TextAnalysis.encodingDamage]]) to catch downstream, not a
  * silent kill — but a declared charset OUTSIDE the [[Transcode]]
  * allowlist routes `bad_charset` (nothing sound can be decoded).
  *
  * DECISION TABLE (first match wins; every record classified once):
  * `malformed` (no status line / no header-body separator) >
  * `bad_status` (non-200) > `bad_encoding` (a Transfer-Encoding
  * outside identity/chunked, a CHUNKED body whose chunk framing is
  * bad — `chunked` itself de-chunks in-line via
  * [[HttpRecord.decodeChunked]], round 16 — or a Content-Encoding
  * outside identity/gzip/x-gzip/deflate/zstd) > `bad_type` (media
  * type outside the caller's allowlist — default html-only,
  * [[HtmlMediaTypes]]) > `bad_inflate` (corrupt/truncated/bomb gzip, deflate
  * or zstd payload — the [[Inflate]] NULL routes) > `bad_charset`
  * (declared-but-unsupported charset) > `ok`. Per RFC 9112 TE wraps
  * CE on the wire, so de-chunking precedes the inflate stage. Non-ok rows carry NULL text and ''
  * charset/cs_source, so the table is total and hash-certifiable.
  *
  * 100-TB shape: a pure per-row projection — regex splits, one
  * bounded inflate, one charset decode per row; no shuffle, nothing
  * collected. The two Generate barriers (`explode_outer(array(…))`)
  * pin the inflate and the three decode legs to ONE evaluation each
  * (the q215 re-inlining class: conditional branches defeat codegen
  * subexpression elimination, and a pushed-down predicate would
  * re-inline the whole inflate into the scan).
  */
object FetchDecode {

  /** Meta-charset sniff window (bytes of payload prefix), matching
    * the WHATWG prescan bound.
    */
  val MetaSniffBytes = 1024

  /** Content-Encoding values the pipeline decodes in-line. zstd
    * (RFC 8878) joined in round 16 — see [[Inflate.ZstdFmt]] for the
    * strictness contract. `br` (RFC 7932 brotli) remains
    * `bad_encoding` — a DOCUMENTED dependency boundary, not an
    * oversight: no brotli decoder exists in this build's dependency
    * surface (Spark bundles zstd-jni, the JDK ships zlib; brotli4j
    * does not resolve offline), and a from-scratch implementation
    * (context modeling + the 122 KB static dictionary) is not a
    * certifiable fixture-scale artifact. The route is deterministic
    * and certified (q308 arm 8, FetchDecodeSpec); a production build
    * adds brotli4j and one `Inflate.unbrotli` when-rung — the
    * decision table's shape does not change.
    */
  val SupportedEncodings: Seq[String] =
    Seq("", "identity", "gzip", "x-gzip", "deflate", "zstd")

  private val Latin1 = "ISO-8859-1"

  /** (idCol, status, content_type, charset, cs_source, decision,
    * text) — contract above.
    */
  /** Media types admitted past the `bad_type` rung. The default is
    * html-only (every certified oracle predates the round-16
    * parameter and stays byte-stable); a text corpus intake passes
    * `TextMediaTypes` — real crawls carry plain-text documents
    * (robots.txt bodies, READMEs, .txt mirrors) that the charset
    * machinery decodes identically (the meta-sniff leg simply never
    * fires on them, q352's certified arm).
    */
  val HtmlMediaTypes: Seq[String] = Seq("text/html")
  val TextMediaTypes: Seq[String] = Seq("text/html", "text/plain")

  def decodeResponses(
      df: DataFrame, idCol: String, rawCol: String,
      maxBytes: Int = Inflate.DefaultMaxBytes,
      mediaTypes: Seq[String] = HtmlMediaTypes): DataFrame = {
    require(mediaTypes.nonEmpty, "mediaTypes allowlist must be non-empty")
    // ── stage 1: the latin-1 bridge + framing scalars, all through
    // the SHARED HttpRecord definitions (media type, charset param
    // incl. the RFC 9110 quoted form, and the malformed/bad_status/
    // TE decision prefix — one definition each, q236 and this table
    // cannot drift) ──
    val raw = decode(col(rawCol), Latin1)
    // chunked Transfer-Encoding de-chunks IN-LINE (round 16): on the
    // latin-1 bridge chars ARE octets, so the hex chunk lengths slice
    // exactly even through compressed payload bytes (the q312
    // argument — and per RFC 9112 TE wraps CE on the wire, so
    // de-chunking happens BEFORE the inflate stage). Bad chunk
    // framing NULLs the body and routes `bad_encoding` below, keeping
    // the pre-round-16 route for non-chunk-framed bodies byte-stable.
    val te = lower(trim(HttpRecord.header(raw, "Transfer-Encoding")))
    val bodyStr = HttpRecord.body(raw)
    val effBody = when(te === "chunked", HttpRecord.decodeChunked(bodyStr))
      .otherwise(bodyStr)
    val s1 = df.select(col(idCol),
      explode_outer(array(struct(
        HttpRecord.status(raw).as("status"),
        HttpRecord.mediaType(raw).as("content_type"),
        HttpRecord.charsetParam(raw).as("header_cs"),
        lower(trim(HttpRecord.header(raw, "Content-Encoding"))).as("ce"),
        HttpRecord.decisionPrefix(raw, allowChunked = true).as("base_route"),
        (te === "chunked" && effBody.isNull).as("chunk_bad"),
        encode(effBody, Latin1).as("body")))).as("h"))
      .select(col(idCol), col("h.*"))

    // ── stage 2: ONE bounded inflate per row, behind a barrier ──
    val ce = col("ce")
    val inflated =
      when(ce === "" || ce === "identity", col("body"))
        .when(ce === "gzip" || ce === "x-gzip",
          Inflate.gunzip(col("body"), maxBytes))
        .when(ce === "deflate", Inflate.inflateDeflate(col("body"), maxBytes))
        .when(ce === "zstd", Inflate.unzstd(col("body"), maxBytes))
        .otherwise(lit(null).cast("binary"))
    val s2 = s1.select(col(idCol), col("status"), col("content_type"),
        col("header_cs"), col("ce"), col("base_route"), col("chunk_bad"),
        explode_outer(array(inflated)).as("payload"))

    // ── stage 3: charset resolution + the three decode legs ──
    val pay = col("payload")
    def bomIs(hex: String, n: Int) = length(pay) >= n &&
      substring(pay, 1, n) === to_binary(lit(hex), lit("hex"))
    // the five BOMs, LONGEST FIRST: the UTF-32LE BOM (FF FE 00 00)
    // starts with the UTF-16LE BOM (FF FE), so the 4-byte checks run
    // before the 2-byte prefixes they shadow (round 16 — previously
    // a UTF-32LE body mis-rode the utf-16le leg, the documented
    // caveat). The residual ambiguity — a genuine UTF-16LE page
    // whose FIRST character is U+0000 also starts FF FE 00 00 — is
    // resolved toward UTF-32 deliberately: real text never leads
    // with NUL, a UTF-32 page always has one there. This is a
    // deliberate extension beyond the WHATWG prescan (which drops
    // UTF-32 entirely); EF BB BF / 00 00 FE FF / FE FF are pairwise
    // disjoint with the rest.
    val bom8 = bomIs("efbbbf", 3)
    val bom32le = bomIs("fffe0000", 4)
    val bom32be = bomIs("0000feff", 4)
    val bom16le = !bom32le && bomIs("fffe", 2)
    val bom16be = bomIs("feff", 2)
    val hasBom = bom8 || bom32le || bom32be || bom16le || bom16be
    val stripped =
      when(bom8, pay.substr(lit(4), length(pay) - 3))
        .when(bom32le || bom32be, pay.substr(lit(5), length(pay) - 4))
        .when(bom16le || bom16be, pay.substr(lit(3), length(pay) - 2))
        .otherwise(pay)
    val metaCs = lower(regexp_extract(
      decode(substring(pay, 1, MetaSniffBytes), Latin1),
      "(?i)<meta[^>]*charset\\s*=\\s*[\"']?([A-Za-z0-9_-]+)", 1))
    val csToken =
      when(bom8, lit("utf-8"))
        .when(bom32le, lit("utf-32le"))
        .when(bom32be, lit("utf-32be"))
        .when(bom16le, lit("utf-16le"))
        .when(bom16be, lit("utf-16be"))
        .when(col("header_cs") =!= "", col("header_cs"))
        .otherwise(metaCs)
    val csSource =
      when(hasBom, lit("bom"))
        .when(col("header_cs") =!= "", lit("header"))
        .when(metaCs =!= "", lit("meta"))
        .otherwise(lit(""))
    val s3 = s2.select(col(idCol), col("status"), col("content_type"),
        col("ce"), col("base_route"), col("chunk_bad"),
        pay.isNull.as("inflate_null"),
        csSource.as("cs_source_raw"), csToken.as("cs_token"),
        explode_outer(array(struct(
          Transcode.toUtf8Lenient(stripped, csToken).as("declared"),
          Transcode.toUtf8(stripped, lit("utf-8")).as("utf8_strict"),
          Transcode.toUtf8Lenient(stripped, lit("windows-1252"))
            .as("cp1252")))).as("d"))
      .select(col("*"), col("d.*")).drop("d")

    // ── stage 4: the total decision table ──
    val csKnown = col("cs_token").isin(Transcode.Charsets.keys.toSeq: _*)
    val decision =
      when(col("base_route").isNotNull, col("base_route"))
        .when(col("chunk_bad"), lit("bad_encoding"))
        .when(!col("ce").isin(SupportedEncodings: _*),
          lit("bad_encoding"))
        .when(!col("content_type").isin(mediaTypes: _*), lit("bad_type"))
        .when(col("inflate_null"), lit("bad_inflate"))
        .when(col("cs_source_raw") =!= "" && !csKnown, lit("bad_charset"))
        .otherwise(lit("ok"))
    val text =
      when(col("cs_source_raw") =!= "", col("declared"))
        .when(col("utf8_strict").isNotNull, col("utf8_strict"))
        .otherwise(col("cp1252"))
    val source =
      when(col("cs_source_raw") =!= "", col("cs_source_raw"))
        .when(col("utf8_strict").isNotNull, lit("utf8"))
        .otherwise(lit("cp1252_fallback"))
    val charset =
      when(col("cs_source_raw") =!= "", col("cs_token"))
        .when(col("utf8_strict").isNotNull, lit("utf-8"))
        .otherwise(lit("windows-1252"))
    s3.select(col(idCol), col("status"), col("content_type"),
      when(decision === "ok", charset).otherwise(lit("")).as("charset"),
      when(decision === "ok", source).otherwise(lit("")).as("cs_source"),
      decision.as("decision"),
      when(decision === "ok", text).otherwise(lit(null).cast("string"))
        .as("text"))
  }

  /** Fixture/probe helper — author a raw response record IN-PLAN
    * (ASCII head + body bytes), one definition so specs and the
    * certified query cannot drift (the chunkedFrame rule).
    */
  def responseRecord(headAscii: Column, bodyBytes: Column): Column =
    concat(encode(headAscii, Latin1), bodyBytes)
}
