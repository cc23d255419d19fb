package graft

import org.apache.spark.sql.functions._
import graft.ext.HttpRecord

class HttpRecordSpec extends SparkSpec {
  import spark.implicits._

  private def parse(raws: (Long, String)*) =
    HttpRecord.parse(raws.toSeq.toDF("id", "raw"), "id", "raw")
      .as[(Long, Option[Int], String, String, String, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._6, r._7))).toMap

  test("status/headers/body split at the FIRST blank line; decisions total") {
    val got = parse(
      (1L, "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\n\r\n<p>hi</p>"),
      (2L, "HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\ngone"),
      (3L, "HTTP/1.1 200 OK\r\nContent-Type: application/pdf\r\n\r\n%PDF"),
      (4L, "HTTP/1.0 200 OK\r\nServer: x\n\nno real separator"),
      (5L, "not http at all\r\n\r\nbody"))
    assert(got(1L) == ((Some(200), "text/html", "utf-8", "ok", 9L)))
    assert(got(2L) == ((Some(404), "text/html", "", "bad_status", 4L)))
    assert(got(3L) == ((Some(200), "application/pdf", "", "bad_type", 4L)))
    assert(got(4L)._4 == "malformed", "LF-only separator is malformed")
    assert(got(5L)._4 == "malformed", "no status line is malformed")
  }

  test("charset= parameter is boundary-anchored: a longer parameter " +
      "name or a quoted-value decoy must not mint a charset") {
    val got = parse(
      // ADVERSARIAL (round-16 anchor, round-17 pinned arm): xcharset
      // is a DIFFERENT parameter whose name merely ends in "charset" —
      // the left anchor (value start / ';' / whitespace) must reject it
      (1L, "HTTP/1.1 200 OK\r\nContent-Type: text/html; xcharset=foo\r\n\r\nb"),
      // charset= inside ANOTHER parameter's quoted value
      (2L, "HTTP/1.1 200 OK\r\nContent-Type: text/html; " +
        "title=\"see charset=evil here\"; charset=utf-8\r\n\r\nb"),
      // the three legal boundaries still match: value start, ';', space
      (3L, "HTTP/1.1 200 OK\r\nContent-Type: text/html;charset=utf-8\r\n\r\nb"),
      (4L, "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=\"utf-8\"\r\n\r\nb"))
    assert(got(1L)._3 == "", s"xcharset=foo must not parse: ${got(1L)}")
    // the quoted decoy is preceded by a space — RFC-legal parsing
    // would skip it as a quoted string; the regex takes the FIRST
    // space-bounded token, which here is the decoy. Pinned as the
    // documented approximation: a decoy can only arise from an
    // attacker-controlled Content-Type, where the header is already
    // untrusted. The anchored regex's contract is "never fire inside
    // a longer parameter NAME"; quoted-string skipping is out of
    // scope (documented in HttpRecord.CharsetParamRe's scaladoc).
    assert(got(2L)._3 == "evil", s"quoted-value decoy route: ${got(2L)}")
    assert(got(3L)._3 == "utf-8" && got(4L)._3 == "utf-8")
  }

  test("header lookup is case-insensitive and header-block-scoped") {
    val got = parse(
      // mixed-case header name; body contains a DECOY Content-Type
      (1L, "HTTP/1.1 200 OK\r\ncontent-type: Text/HTML\r\n\r\n" +
        "Content-Type: application/evil\r\nbody"),
      // body text mentions the header but headers lack it
      (2L, "HTTP/1.1 200 OK\r\nServer: x\r\n\r\nContent-Type: text/html"))
    assert(got(1L)._2 == "text/html" && got(1L)._4 == "ok",
      s"decoy in body must not win: ${got(1L)}")
    assert(got(2L)._2 == "" && got(2L)._4 == "bad_type",
      "missing Content-Type header is not text/html, whatever the body says")
    // body after the FIRST blank line, later blank lines are body text
    val b = parse((3L, "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\na\r\n\r\nb"))
    assert(b(3L)._5 == 6L, s"body must span past later blank lines: ${b(3L)}")
  }

  test("Transfer-Encoding routes bad_encoding; identity and absent do not") {
    val got = parse(
      (1L, "HTTP/1.1 200 OK\r\nTransfer-Encoding: Chunked\r\n" +
        "Content-Type: text/html\r\n\r\n5\r\nhello\r\n0\r\n\r\n"),
      (2L, "HTTP/1.1 200 OK\r\ntransfer-encoding: identity\r\n" +
        "Content-Type: text/html\r\n\r\nplain"),
      // a TE decoy in the BODY must not trigger the route
      (3L, "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
        "Transfer-Encoding: chunked"))
    assert(got(1L)._4 == "bad_encoding", s"chunked must route: ${got(1L)}")
    assert(got(2L)._4 == "ok", "identity is not an encoding")
    assert(got(3L)._4 == "ok", "body decoy must not win")
  }

  test("decodeChunked inverts framing; malformed bodies come back NULL") {
    def dec(bodies: String*): Seq[Option[String]] =
      bodies.toSeq.zipWithIndex.map { case (b, i) => (i.toLong, b) }
        .toDF("id", "body")
        .select(HttpRecord.decodeChunked(col("body")).as("d"))
        .as[Option[String]].collect().toSeq
    assert(dec("5\r\nhello\r\n0\r\n\r\n") == Seq(Some("hello")))
    // multi-chunk, hex sizes incl. letters + uppercase, CRLF in data
    assert(dec("a\r\n0123456789\r\n3\r\nabc\r\n0\r\n\r\n")
      == Seq(Some("0123456789abc")))
    assert(dec("1A\r\nabcdefghijklmnopqrstuvwxyz\r\n0\r\n\r\n")
      == Seq(Some("abcdefghijklmnopqrstuvwxyz")))
    // data may CONTAIN a line that looks like a size: length governs
    assert(dec("7\r\nab\r\n3\r\n\r\n0\r\n\r\n") == Seq(Some("ab\r\n3\r\n")))
    // trailers after the 0 chunk are ignored
    assert(dec("2\r\nhi\r\n0\r\nX-Sum: 1\r\n\r\n") == Seq(Some("hi")))
    // malformed: non-hex size, bad CRLF after data, missing terminal
    // chunk, size line with extension (out of contract), empty body
    assert(dec("ZZ\r\nbroken\r\n0\r\n\r\n", "3\r\nabcd\r\n0\r\n\r\n",
      "5\r\nhello\r\n", "5;ext=1\r\nhello\r\n0\r\n\r\n", "")
      == Seq(None, None, None, None, None))
    // unterminated within MaxChunks (runaway framing) is NULL
    val runaway = "1\r\nx\r\n" * (HttpRecord.MaxChunks + 1) + "0\r\n\r\n"
    assert(dec(runaway) == Seq(None))
    // exactly-at-cap terminates fine (the 0 chunk is step MaxChunks)
    val atCap = "1\r\nx\r\n" * (HttpRecord.MaxChunks - 1) + "0\r\n\r\n"
    assert(dec(atCap) == Seq(Some("x" * (HttpRecord.MaxChunks - 1))))
  }
  test("conditionalFetchPlan: latest round wins, ETag beats Last-Modified, totals") {
    val hist = Seq(
      // decoy earlier rounds: stale validators that must NOT surface
      ("u/etag", 1L, "HTTP/1.1 200 OK\r\nETag: \"stale\"\r\n\r\nx"),
      ("u/etag", 2L, "HTTP/1.1 200 OK\r\nETag: \"v7\"\r\n\r\nx"),
      ("u/lm", 1L, "HTTP/1.1 200 OK\r\nETag: \"stale\"\r\n\r\nx"),
      ("u/lm", 2L,
        "HTTP/1.1 200 OK\r\nLast-Modified: Mon, 12 Jan 2026 03:00:00 GMT\r\n\r\nx"),
      // BOTH validators present: the ETag plan wins
      ("u/both", 1L, "HTTP/1.1 200 OK\r\nETag: \"e9\"\r\n" +
        "Last-Modified: Mon, 12 Jan 2026 03:00:00 GMT\r\n\r\nx"),
      // neither: a full fetch; 304 status carries through
      ("u/full", 1L, "HTTP/1.1 304 Not Modified\r\nServer: g\r\n\r\n"),
      // no separator: header block is empty, nothing validates
      ("u/raw", 1L, "HTTP/1.1 200 OK\r\nETag: \"e\"")
    ).toDF("url", "r", "raw")
    val got = HttpRecord.conditionalFetchPlan(hist, "url", "r", "raw")
      .as[(String, Option[Int], String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.size == 5, s"one row per url: $got")
    assert(got("u/etag") == ((Some(200), "revalidate_etag", "\"v7\"")),
      s"latest round's ETag, not the stale one: ${got("u/etag")}")
    assert(got("u/lm") ==
      ((Some(200), "revalidate_modified", "Mon, 12 Jan 2026 03:00:00 GMT")))
    assert(got("u/both")._2 == "revalidate_etag" && got("u/both")._3 == "\"e9\"",
      s"ETag must beat Last-Modified: ${got("u/both")}")
    assert(got("u/full") == ((Some(304), "full", "")))
    assert(got("u/raw") == ((Some(200), "full", "")),
      s"no separator -> empty header block -> full: ${got("u/raw")}")
  }

  test("cachePlan: RFC 9111 precedence, clamps, heuristic, junk dates degrade") {
    def plan(raws: (Long, String)*) =
      HttpRecord.cachePlan(raws.toSeq.toDF("id", "raw"), "id", "raw")
        .as[(Long, Option[Int], String, Long)].collect()
        .map(r => r._1 -> ((r._3, r._4))).toMap
    val date = "Date: Mon, 12 Jan 2026 00:00:00 GMT"
    def raw(hdrs: String) =
      s"HTTP/1.1 200 OK\r\n$date\r\n$hdrs\r\nContent-Type: text/html\r\n\r\nok"
    val got = plan(
      (1L, raw("Cache-Control: public, max-age=3600")),
      // no-store beats a max-age in the SAME header value
      (2L, raw("Cache-Control: max-age=600, no-store")),
      (3L, raw("Cache-Control: no-cache")),
      (4L, raw("Expires: Mon, 12 Jan 2026 02:30:00 GMT")),
      // past Expires clamps to 0, mode still expires
      (5L, raw("Expires: Sun, 11 Jan 2026 23:00:00 GMT")),
      // heuristic: 10% of (Date - Last-Modified) = 86400/10
      (6L, raw("Last-Modified: Sun, 11 Jan 2026 00:00:00 GMT")),
      // garbled Expires degrades to the heuristic tier, never throws
      (7L, raw("Expires: 0\r\nLast-Modified: Sun, 11 Jan 2026 12:00:00 GMT")),
      (8L, raw("Server: g")),
      // a max-age TOKEN inside another directive name must not match
      (9L, raw("Cache-Control: x-max-age=99")))
    assert(got(1L) == (("max_age", 3600L)))
    assert(got(2L) == (("no_store", 0L)), s"precedence: ${got(2L)}")
    assert(got(3L) == (("no_cache", 0L)))
    assert(got(4L) == (("expires", 9000L)), s"2h30m = 9000s: ${got(4L)}")
    assert(got(5L) == (("expires", 0L)), s"past Expires clamps: ${got(5L)}")
    assert(got(6L) == (("heuristic", 8640L)))
    assert(got(7L) == (("heuristic", 4320L)), s"junk date: ${got(7L)}")
    assert(got(8L) == (("none", 0L)))
    assert(got(9L) == (("none", 0L)), s"boundary match: ${got(9L)}")
  }

  test("retryBackoff: trailing streaks, latest-only Retry-After, give-up") {
    def h(host: String, rs: (Long, String)*) =
      rs.map { case (a, raw) => (host, a, raw) }
    val ok200 = "HTTP/1.1 200 OK\r\n\r\nx"
    val f503 = "HTTP/1.1 503 Service Unavailable\r\n\r\nx"
    val log = (
      h("clean", 1L -> ok200, 2L -> ok200) ++
      // early failures fully recovered: streak 0
      h("recovered", 1L -> f503, 2L -> f503, 3L -> ok200) ++
      // latest carries Retry-After (honored); an EARLIER decoy ignored
      h("asked", 1L -> ok200, 2L -> f503,
        3L -> "HTTP/1.1 503 Service Unavailable\r\nRetry-After: 77\r\n\r\nx") ++
      h("decoy", 1L -> "HTTP/1.1 503 X\r\nRetry-After: 999\r\n\r\nx",
        2L -> f503) ++
      // malformed (no status) counts as failure
      h("garbled", 1L -> ok200, 2L -> "not http") ++
      h("dead", (1L to 8L).map(a => a -> f503): _*)
    ).toDF("host", "attempt", "raw")
    val got = graft.ext.HttpRecord.retryBackoff(log, "host", "attempt", "raw")
      .as[(String, Long, Option[Int], Long, String, Long)].collect()
      .map(r => r._1 -> ((r._4, r._5, r._6))).toMap
    assert(got("clean") == ((0L, "ok", 0L)))
    assert(got("recovered") == ((0L, "ok", 0L)), s"${got("recovered")}")
    assert(got("asked") == ((2L, "backoff", 77L)), s"${got("asked")}")
    // decoy host: streak 2, no Retry-After on latest -> 5 * 2^1 = 10
    assert(got("decoy") == ((2L, "backoff", 10L)), s"${got("decoy")}")
    assert(got("garbled") == ((1L, "backoff", 5L)), s"base 5*2^0: ${got("garbled")}")
    assert(got("dead") == ((8L, "gave_up", -1L)), s"${got("dead")}")
  }

  test("WarcRecord.splitRecords: framing walk, partial-head emission, every status route, null/empty blobs") {
    import graft.ext.WarcRecord
    def rec(typ: String, uri: String, payload: String,
        clOff: Int = 0, omitCl: Boolean = false): String = {
      val cl = if (omitCl) ""
        else s"Content-Length: ${payload.length + clOff}\r\n"
      s"WARC/1.0\r\nWARC-Type: $typ\r\nWARC-Target-URI: $uri\r\n$cl\r\n$payload\r\n\r\n"
    }
    val r1 = rec("response", "http://a/1", "hello world")
    val r2 = rec("request", "http://a/2", "bye")
    val blobs = Seq(
      (1L, r1 + r2),                                     // two records, ok
      (2L, "NOTWARC" + r1),                              // bad magic at 0
      (3L, r1 + "GARBAGE"),                              // head kept, junk tail
      (4L, r1 + rec("response", "http://a/3", "xyz", clOff = 2)), // overrun
      (5L, r1 + rec("response", "http://a/4", "xyz", omitCl = true)),
      (6L, ""),                                          // empty archive: ok
      (7L, null.asInstanceOf[String]),
      // lowercase headers + an extra header line still parse
      (8L, "WARC/1.0\r\nwarc-type: response\r\nX-Extra: v\r\nwarc-target-uri: u\r\ncontent-length: 2\r\n\r\nok\r\n\r\n"))
      .toDF("id", "blob")
    val got = WarcRecord.splitRecords(blobs, "id", "blob")
      .select(col("id"), col("warc_status"), col("rec_idx"),
        col("warc_type"), col("target_uri"), col("payload"))
      .as[(Long, String, Option[Long], String, String, String)].collect()
    val byId = got.groupBy(_._1)
    assert(byId(1L).map(_._2).toSet == Set("ok"))
    assert(byId(1L).sortBy(_._3).map(r => (r._3, r._4, r._5, r._6)).toSeq ==
      Seq((Some(0L), "response", "http://a/1", "hello world"),
        (Some(1L), "request", "http://a/2", "bye")))
    assert(byId(2L).toSeq == Seq((2L, "bad_magic", None, null, null, null)),
      s"zero-record blob: ${byId(2L).toSeq}")
    assert(byId(3L).map(r => (r._2, r._6)).toSeq == Seq(("bad_magic", "hello world")),
      "records before the junk tail survive")
    assert(byId(4L).map(r => (r._2, r._6)).toSeq == Seq(("bad_length", "hello world")))
    assert(byId(5L).map(r => (r._2, r._6)).toSeq == Seq(("bad_header", "hello world")))
    assert(byId(6L).toSeq == Seq((6L, "ok", None, null, null, null)),
      "empty archive is vacuously ok")
    assert(byId(7L).toSeq == Seq((7L, "ok", None, null, null, null)))
    assert(byId(8L).map(r => (r._2, r._4, r._5, r._6)).toSeq ==
      Seq(("ok", "response", "u", "ok")), s"case-insens: ${byId(8L).toSeq}")
    // an absurd 10-digit Content-Length must route bad_header, never
    // silently truncate to its first nine digits and mis-slice
    val huge = WarcRecord.splitRecords(
      Seq((10L, r1 +
        "WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: u\r\nContent-Length: 1234567890\r\n\r\npayload\r\n\r\n"))
        .toDF("id", "blob"), "id", "blob")
      .select(col("warc_status"), col("payload"))
      .as[(String, String)].collect()
    assert(huge.map(_._1).toSet == Set("bad_header") &&
      huge.map(_._2).toSeq == Seq("hello world"),
      s"10-digit CL: ${huge.toSeq}")
    // bounded walk: 3 records under maxRecords=2 routes too_many, head kept
    val over = WarcRecord.splitRecords(
      Seq((9L, r1 + r2 + r1)).toDF("id", "blob"), "id", "blob",
      maxRecords = 2)
      .select(col("warc_status"), col("rec_idx"))
      .as[(String, Option[Long])].collect()
    assert(over.map(_._1).toSet == Set("too_many") &&
      over.flatMap(_._2).sorted.toSeq == Seq(0L, 1L), s"${over.toSeq}")
  }
}
