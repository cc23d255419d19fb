package graft

import org.apache.spark.sql.functions._
import graft.ext.UrlCanon

class UrlCanonSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[Option[String]] =
    urls.toSeq.toDF("url")
      .select(UrlCanon.canonicalUrl(col("url")).as("c"))
      .as[Option[String]].collect().toSeq

  test("canonicalUrl: case, default ports, userinfo, fragment, slash, query order") {
    assert(canon("HTTP://User:pw@WWW.Example.COM:80/a/b/?b=2&a=1#frag")
      == Seq(Some("http://www.example.com/a/b?a=1&b=2")))
    // https default port stripped; non-default kept
    assert(canon("HTTPS://Host.com:443/x", "https://host.com:8443/x")
      == Seq(Some("https://host.com/x"), Some("https://host.com:8443/x")))
    // http on 443 is NOT a default — port survives
    assert(canon("http://h.com:443/") == Seq(Some("http://h.com:443/")))
    // empty path canonicalizes to '/', duplicate trailing slashes collapse
    assert(canon("http://h.com", "http://h.com/", "http://h.com///")
      == Seq.fill(3)(Some("http://h.com/")))
    // path stays case-sensitive; query without reorder unchanged
    assert(canon("http://H.com/CaseSensitive?z=1")
      == Seq(Some("http://h.com/CaseSensitive?z=1")))
    // fragment-only difference merges
    assert(canon("http://h.com/p#a").head == canon("http://h.com/p#b").head)
    // a '?' INSIDE the fragment is fragment text, not a query — it
    // must not leak into the canonical key (SPA-route shape)
    assert(canon("http://h.com/p#a?b=1") == Seq(Some("http://h.com/p")))
    assert(canon("http://h.com/app#/route?tab=2")
      == Seq(Some("http://h.com/app")))
    // a literal '?' inside the query survives (only the FIRST '?'
    // starts the query)
    assert(canon("http://h.com/p?a=1?x#f") == Seq(Some("http://h.com/p?a=1?x")))
    // non-URLs -> NULL (quarantine route), never a garbage key
    assert(canon("not a url", "", "host.com/path", "://x")
      == Seq(None, None, None, None))
    // bracketed IPv6 authorities are OUTSIDE the syntactic subset:
    // the port-split regex would truncate '[2001:db8::1]' at the first
    // ':' and collapse DISTINCT addresses onto the key '[2001' — they
    // must quarantine (NULL), never silently merge as dup_url
    assert(canon("http://[2001:db8::1]/x", "http://[2001:db8::2]/x",
      "https://user@[::1]:8443/p") == Seq(None, None, None))
    // EMPTY authorities quarantine too: a host-less URL is
    // unfetchable and would otherwise key on host ''
    assert(canon("https:///admin", "http://?q=1", "http://#f")
      == Seq(None, None, None))
  }

  test("canonicalHost strips userinfo and port; decisions classify every fetch once") {
    val hosts = Seq("http://a@B.com:8080/x", "https://c.COM/")
      .toDF("url").select(UrlCanon.canonicalHost(col("url")).as("h"))
      .as[String].collect().toSeq
    assert(hosts == Seq("b.com", "c.com"))
    val fixture = Seq(
      (1L, "http://A.com/x", 10L), (2L, "HTTP://a.com:80/x", 20L),
      (3L, "http://a.com/x/", 30L), (4L, "junk", 5L),
      (5L, "http://b.com/y?q=2&p=1", 7L), (6L, "http://b.com/y?p=1&q=2", 9L))
      .toDF("id", "url", "bytes")
    val dec = UrlCanon.urlDecisions(fixture, "url", "id")
      .select("id", "decision").as[(Long, String)].collect().toMap
    assert(dec == Map(1L -> "kept", 2L -> "dup_url", 3L -> "dup_url",
      4L -> "bad_url", 5L -> "kept", 6L -> "dup_url"))
    // host rollup: variants roll into the kept doc's bytes
    val roll = UrlCanon.hostRollup(fixture, "url", "id", "bytes")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(roll("a.com") == ((1L, 3L, 10L)), s"got ${roll("a.com")}")
    assert(roll("b.com") == ((1L, 2L, 7L)))
  }

  test("robotsDecide: longest prefix wins, allow-override beats deny, no-rule defaults allow") {
    val fetches = Seq(
      (1L, "http://a.com/private/x"),     // deny /private
      (2L, "http://a.com/private/ok/y"),  // allow-override /private/ok
      (3L, "http://a.com/public"),        // only '/' matches -> allow
      (4L, "http://B.com:80/anything"))   // host has no rules -> default allow
      .toDF("id", "url")
    val rules = Seq(
      ("a.com", "/", true),
      ("a.com", "/private", false),
      ("a.com", "/private/ok", true))
      .toDF("host", "prefix", "allow")
    val got = UrlCanon.robotsDecide(fetches, "id", "url", rules)
      .select("id", "rule_prefix", "decision")
      .as[(Long, Option[String], String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((Some("/private"), "deny")))
    assert(got(2L) == ((Some("/private/ok"), "allow")),
      "the deeper allow must override the /private deny")
    assert(got(3L) == ((Some("/"), "allow")))
    assert(got(4L) == ((None, "allow")), "unruled host defaults to allow")
    assert(got.size == 4, "exactly one decision per fetch")
    // Allow/Disallow on the SAME path — the robots tie rule: allow
    // wins, deterministically (not a partition-order coin flip)
    val tied = Seq(("c.com", "/x", true), ("c.com", "/x", false))
      .toDF("host", "prefix", "allow")
    val tie = UrlCanon.robotsDecide(
        Seq((9L, "http://c.com/x/page")).toDF("id", "url"), "id", "url", tied)
      .select("decision").as[String].collect().toSeq
    assert(tie == Seq("allow"), s"same-path tie must resolve allow, got $tie")
  }

  test("robotsDecide: non-canonicalizable URLs are bad_url, never default-allow") {
    val rules = Seq(("a.com", "/", true)).toDF("host", "prefix", "allow")
    val got = UrlCanon.robotsDecide(
        Seq((1L, "not a url"), (2L, "http://[2001:db8::1]/x"),
          (3L, "http://a.com/ok"), (4L, "https:///admin")).toDF("id", "url"),
        "id", "url", rules)
      .select("id", "decision").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "bad_url", 2L -> "bad_url", 3L -> "allow",
      4L -> "bad_url"),
      s"a compliance operator must quarantine garbage, got $got")
  }

  test("globalDenseSeq: dense 1..n by total order, invariant to input partitioning") {
    import graft.operators.Layout
    val rows = (1L to 97L).map(i => (i, f"k${(i * 37) % 97}%03d"))
    val base = rows.toDF("id", "key")
    def seqOf(df: org.apache.spark.sql.DataFrame): Seq[(String, Long)] =
      Layout.globalDenseSeq(df, Seq(col("key")), "seq")
        .select("key", "seq").as[(String, Long)].collect().sortBy(_._1).toSeq
    val want = rows.map(_._2).sorted.zipWithIndex
      .map { case (k, i) => (k, i + 1L) }.sortBy(_._1)
    val got1 = seqOf(base.repartition(7))
    val got13 = seqOf(base.repartition(13, col("id")))
    assert(got1 == want, "seq must equal rank in the total order")
    assert(got13 == got1, "seq must not depend on input partitioning")
  }

  test("politenessSchedule: strict round-robin — every host once before any host twice") {
    val fetches = Seq(
      (1L, "a.com"), (2L, "a.com"), (3L, "a.com"),
      (4L, "b.com"), (5L, "b.com"), (6L, "c.com"))
      .toDF("id", "host")
    val got = UrlCanon.politenessSchedule(fetches, "host", "id")
      .select("fetch_seq", "host", "host_rank")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) == (1L to 6L), s"dense schedule expected: $got")
    // schedule order is (host_rank, host): rank never decreases, and
    // within a rank hosts are strictly increasing
    assert(got.map(_._3) == got.map(_._3).sorted, s"rank order broken: $got")
    got.groupBy(_._3).foreach { case (_, g) =>
      val hosts = g.sortBy(_._1).map(_._2)
      assert(hosts == hosts.sorted && hosts.distinct == hosts,
        s"within-rank host order broken: $got")
    }
    // round 1 covers EVERY host before any second fetch
    assert(got.take(3).map(_._2).toSet == Set("a.com", "b.com", "c.com"),
      s"first round must hit each host once: $got")
    // deterministic replay
    val again = UrlCanon.politenessSchedule(fetches, "host", "id")
      .select("fetch_seq", "host", "host_rank")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(again == got, "schedule must replay identically")
  }

  test("registrableDomain: cc-SLD 3-label rule, 2-label default, IP/single-label verbatim") {
    def rd(hosts: String*): Seq[Option[String]] =
      hosts.toSeq.toDF("h")
        .select(UrlCanon.registrableDomain(col("h")).as("d"))
        .as[Option[String]].collect().toSeq
    // cc-SLD suffixes take THREE labels, however deep the subdomain
    assert(rd("a.shop.example.co.uk", "www.example.co.uk", "example.co.uk")
      == Seq.fill(3)(Some("example.co.uk")))
    assert(rd("x.y.z.site.com.au") == Seq(Some("site.com.au")))
    // plain TLDs take two
    assert(rd("a.b.example.com", "example.com", "deep.sub.example.org")
      == Seq(Some("example.com"), Some("example.com"), Some("example.org")))
    // IPv4 literals budget as the whole address
    assert(rd("10.0.3.7", "192.168.0.1") == Seq(Some("10.0.3.7"),
      Some("192.168.0.1")))
    // single-label intranet hosts come back verbatim
    assert(rd("localhost", "intra7") == Seq(Some("localhost"), Some("intra7")))
    // a BARE public suffix is out of contract but deterministic
    assert(rd("co.uk") == Seq(Some("co.uk")))
    // '.co.ukx' must NOT match the co.uk rule (anchored suffix)
    assert(rd("a.example.co.ukx") == Seq(Some("co.ukx")))
    // NULL host stays NULL
    assert(Seq((1L, null: String)).toDF("i", "h")
      .select(UrlCanon.registrableDomain(col("h")).as("d"))
      .as[Option[String]].collect().toSeq == Seq(None))
  }

  test("recrawlStats: change counts over per-url history, ppm buckets, cold singles") {
    // histories handed over SHUFFLED in round order — the per-url
    // window must sort them itself
    val fetches = Seq(
      ("u/alt", 3L, "a"), ("u/alt", 1L, "a"), ("u/alt", 4L, "b"),
      ("u/alt", 2L, "b"), // a,b,a,b → 3 changes / 3 intervals = hot
      ("u/half", 1L, "x"), ("u/half", 2L, "x"), ("u/half", 3L, "y"),
      ("u/half", 4L, "y"), ("u/half", 5L, "z"), // 2/4 = 500000 = hot edge
      ("u/warm", 1L, "p"), ("u/warm", 2L, "p"), ("u/warm", 3L, "p"),
      ("u/warm", 4L, "q"), // 1/3 = 333333 warm
      ("u/static", 1L, "s"), ("u/static", 2L, "s"), ("u/static", 3L, "s"),
      ("u/once", 1L, "o") // no interval → cold, ppm 0
    ).toDF("url", "r", "fp")
    val got = UrlCanon.recrawlStats(fetches, "url", "r", "fp")
      .as[(String, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("u/alt") == ((4L, 3L, 1000000L, "hot")), s"alt: $got")
    assert(got("u/half") == ((5L, 2L, 500000L, "hot")),
      s"exactly half the intervals changed must be hot (>= rule): $got")
    assert(got("u/warm") == ((4L, 1L, 333333L, "warm")), s"warm: $got")
    assert(got("u/static") == ((3L, 0L, 0L, "cold")), s"static: $got")
    assert(got("u/once") == ((1L, 0L, 0L, "cold")),
      s"single-fetch url has no interval and must be cold: $got")
    // a REVERT (a→b→a) is two changes — fingerprints compare to the
    // previous fetch, not the first
    val revert = Seq(("u", 1L, "a"), ("u", 2L, "b"), ("u", 3L, "a"))
      .toDF("url", "r", "fp")
    val rv = UrlCanon.recrawlStats(revert, "url", "r", "fp")
      .as[(String, Long, Long, Long, String)].collect().head
    assert(rv == (("u", 3L, 2L, 1000000L, "hot")), s"revert: $rv")
  }

  test("robotsDecide plans as a hash argmax — no Sort before the decision aggregate") {
    val fetches = Seq((1L, "http://a.com/private/x"), (2L, "http://a.com/p"))
      .toDF("id", "url")
    val rules = Seq(("a.com", "/", true), ("a.com", "/private", false))
      .toDF("host", "prefix", "allow")
    val plan = UrlCanon.robotsDecide(fetches, "id", "url", rules)
      .queryExecution.executedPlan.toString
    val sortRe = "Sort \\[".r
    assert(sortRe.findFirstIn(plan).isEmpty && !plan.contains("SortAggregate"),
      s"decision path must not sort:\n$plan")
    assert(plan.contains("HashAggregate"), s"expected a hash aggregate:\n$plan")
    // positive probe: the detector DOES fire on the old window shape
    val windowed = fetches.withColumn("rk",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("id").orderBy("url")))
      .queryExecution.executedPlan.toString
    assert(sortRe.findFirstIn(windowed).isDefined,
      "sort detector is vacuous — it missed a row_number window plan")
  }

  private def resolve(base: String, hrefs: String*): Seq[Option[String]] =
    hrefs.toSeq.map((base, _)).toDF("base", "href")
      .select(UrlCanon.resolveUrl(col("base"), col("href")).as("r"))
      .as[Option[String]].collect().toSeq

  test("resolveUrl: every RFC 3986 reference class") {
    val base = "http://h.com/a/b/c?q=1#frag"
    // absolute (verbatim, incl. non-hierarchical schemes)
    assert(resolve(base, "https://x.com/p?z=2", "mailto:a@b", "javascript:void(0)")
      == Seq(Some("https://x.com/p?z=2"), Some("mailto:a@b"),
        Some("javascript:void(0)")))
    // network-path: base scheme attaches
    assert(resolve(base, "//X.com/p") == Seq(Some("http://X.com/p")))
    assert(resolve("HTTPS://h.com/", "//x.com/p") == Seq(Some("https://x.com/p")))
    // absolute-path: authority (raw spelling) kept, path replaced
    assert(resolve(base, "/d/e?y=2") == Seq(Some("http://h.com/d/e?y=2")))
    // query-only: base path kept
    assert(resolve(base, "?z=9") == Seq(Some("http://h.com/a/b/c?z=9")))
    // empty and fragment-only: the base itself, fragment dropped
    assert(resolve(base, "", "#sec")
      == Seq.fill(2)(Some("http://h.com/a/b/c?q=1")))
    // relative-path: merged onto the base directory
    assert(resolve(base, "d", "./d", "../d", "../../d", "../../../d")
      == Seq(Some("http://h.com/a/b/d"), Some("http://h.com/a/b/d"),
        Some("http://h.com/a/d"), Some("http://h.com/d"),
        Some("http://h.com/d"))) // above-root .. drops (RFC)
    // ref query/fragment carried; base query never leaks into rel refs
    assert(resolve(base, "d?x=2#s") == Seq(Some("http://h.com/a/b/d?x=2")))
    // base with trailing-slash dir vs file dir
    assert(resolve("http://h.com/a/b/", "c", "../c")
      == Seq(Some("http://h.com/a/b/c"), Some("http://h.com/a/c")))
    // base with NO path: directory is '/'
    assert(resolve("http://h.com", "d", "../d")
      == Seq(Some("http://h.com/d"), Some("http://h.com/d")))
    // mixed dot segments, dots inside segment names survive
    assert(resolve(base, "./x/./y/../z", "..//d", "a.html", "..a/b", "...")
      == Seq(Some("http://h.com/a/b/x/z"), Some("http://h.com/a//d"),
        Some("http://h.com/a/b/a.html"), Some("http://h.com/a/b/..a/b"),
        Some("http://h.com/a/b/...")))
    // whitespace-padded hrefs strip before classification (URL-spec
    // parse step): " /foo" is the absolute-path class, not a
    // space-leading relative path
    assert(resolve(base, " /d ", "\t../d\n", "  http://x.com/p", " ")
      == Seq(Some("http://h.com/d"), Some("http://h.com/a/d"),
        Some("http://x.com/p"), Some("http://h.com/a/b/c?q=1")))
    // unparseable base: relative refs quarantine, absolute still resolve
    assert(resolve("not a url", "d", "/d", "//x.com/d", "http://x.com/d")
      == Seq(None, None, None, Some("http://x.com/d")))
    // composes with canonicalUrl: junk stays junk, messy targets key
    val chain = Seq(("HTTP://H.com:80/a/?x=1", "../b/../c?b=2&a=1"))
      .toDF("base", "href")
      .select(UrlCanon.canonicalUrl(
        UrlCanon.resolveUrl(col("base"), col("href"))).as("c"))
      .as[Option[String]].collect().toSeq
    assert(chain == Seq(Some("http://h.com/c?a=1&b=2")))
  }

  test("parseRobots: groups, agent selection, no-op lines, CRLF") {
    val body =
      "# intro comment\n" +
        "Disallow: /orphan\n" + // before any group: invalid, drops
        "User-Agent: SpecialBot\nDisallow: /s\nAllow: /s/ok\n\n" +
        "User-agent: *\nUser-agent: backup\n" +
        "Allow: /\nDisallow: /tmp  # comment on rule\nDisallow:\n" +
        "Crawl-delay: 7\nSitemap: http://a.com/s.xml\n\n" +
        "User-agent: other\nDisallow: /\n"
    def parse(agent: String, b: String = body): Set[(String, String, Boolean)] =
      UrlCanon.parseRobots(Seq(("a.com", b)).toDF("host", "body"),
          "host", "body", agent)
        .as[(String, String, Boolean)].collect().toSet
    // '*' group applies when the agent is not named; 'other' never wins
    assert(parse("graftbot") ==
      Set(("a.com", "/", true), ("a.com", "/tmp", false)))
    // specific group beats '*' (case-insensitive UA match), not merged
    assert(parse("specialbot") ==
      Set(("a.com", "/s", false), ("a.com", "/s/ok", true)))
    // second UA of a multi-UA run selects the same group
    assert(parse("backup") ==
      Set(("a.com", "/", true), ("a.com", "/tmp", false)))
    // the 'other' agent gets ITS group
    assert(parse("other") == Set(("a.com", "/", false)))
    // CRLF file parses identically
    assert(parse("specialbot", body.replace("\n", "\r\n")) ==
      Set(("a.com", "/s", false), ("a.com", "/s/ok", true)))
    // a host with no matching group and no '*' yields nothing
    assert(parse("nobody", "User-agent: x\nDisallow: /\n").isEmpty)
  }

  test("resolveRedirects: chains, relative Locations, loops, junk, depth cap") {
    val fetches = Seq(
      (1L, "http://a.com/start", "/mid"), // relative Location
      (2L, "http://a.com/mid", "http://B.com/end"), // absolute, messy case
      (3L, "http://b.com/end", ""), // terminal
      (4L, "http://a.com/self", "/self"), // self-loop
      (5L, "http://a.com/c1", "/c2"),
      (6L, "http://a.com/c2", "/c1"), // 2-cycle
      (7L, "http://a.com/junk", "javascript:void(0)"),
      (8L, "not a url", "/x"), // bad fetch URL
      (9L, "http://a.com/ext", "http://x.com/away"), // external terminal
      // a DIRECT (200) fetch of a URL that redirected on fetch 2:
      // the first hop keys on the fetch's OWN Location, so this row
      // must stay 'direct' (round-13 review finding)
      (10L, "http://a.com/mid", "")
    ).toDF("id", "url", "loc")
    val got = UrlCanon.resolveRedirects(fetches, "id", "url", "loc")
      .as[(Long, String, Option[String], Long, String)].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5))).toMap
    assert(got(1L) == ((Some("http://b.com/end"), 2L, "redirected")))
    assert(got(2L) == ((Some("http://b.com/end"), 1L, "redirected")))
    assert(got(3L) == ((Some("http://b.com/end"), 0L, "direct")))
    assert(got(4L)._3 == "loop" && got(4L)._2 == 0L)
    assert(got(5L)._3 == "loop" && got(5L)._2 == 1L)
    assert(got(6L)._3 == "loop" && got(6L)._2 == 1L)
    assert(got(7L)._3 == "bad_location" && got(7L)._2 == 0L)
    assert(got(8L)._3 == "bad_url")
    assert(got(9L) == ((Some("http://x.com/away"), 1L, "redirected")))
    assert(got(10L) == ((Some("http://a.com/mid"), 0L, "direct")),
      s"a 200 fetch of a URL that 301'd elsewhere must stay direct: ${got(10L)}")
    // depth cap: a 7-link chain under maxHops=3 gives up, recording
    // how far it got
    val chain = (0 to 7).map(i =>
      (100L + i, s"http://c.com/p$i", if (i < 7) s"/p${i + 1}" else ""))
      .toDF("id", "url", "loc")
    val capped = UrlCanon
      .resolveRedirects(chain, "id", "url", "loc", maxHops = 3)
      .filter(col("id") === 100L)
      .as[(Long, String, Option[String], Long, String)].collect().head
    assert(capped._5 == "too_deep" && capped._4 == 3L &&
      capped._3 == Some("http://c.com/p3"), s"7-deep chain must cap: $capped")
  }

  test("removeDotSegments: bounded-fold RFC collapse on hostile paths") {
    def rds(ps: String*): Seq[String] =
      ps.toSeq.toDF("p").select(UrlCanon.removeDotSegments(col("p")).as("r"))
        .as[String].collect().toSeq
    assert(rds("/a/b/c", "/./x", "/././x", "/a/./b/./c", "/a/.")
      == Seq("/a/b/c", "/x", "/x", "/a/b/c", "/a/"))
    assert(rds("/a/../b", "/a/b/../../c", "/a/../../b", "/..", "/../x")
      == Seq("/b", "/c", "/b", "/", "/x"))
    // trailing '..' leaves the directory (RFC: output ends with '/')
    assert(rds("/a/b/..", "/a/b/../..") == Seq("/a/", "/"))
    // segments that merely CONTAIN dots are not dot-segments
    assert(rds("/a.b/c", "/..x/y", "/.hidden/z", "/a/.../b")
      == Seq("/a.b/c", "/..x/y", "/.hidden/z", "/a/.../b"))
  }

  test("crawlTrapStats: family grain, distinct urls, param keys, trap rule") {
    val urls = (
      // deep calendar family: 3 distinct urls (one duplicated), depth 5
      Seq("http://t.com/cal/2026/01/02/x", "http://t.com/cal/2026/01/02/x",
        "http://t.com/cal/2026/01/03/y", "http://t.com/cal/2026/02/01/z") ++
      // param family: 4 urls, 4 distinct KEYS (values churn, keys repeat)
      Seq("http://t.com/s?a=1&b=2", "http://t.com/s?a=9&c=2",
        "http://t.com/s?d=1", "http://t.com/s?a=3&b=5") ++
      // flat family: many urls, shallow, no params
      (1 to 5).map(i => s"http://t.com/docs/$i") ++
      // other host, same family name: separate grain
      Seq("http://u.com/docs/1") ++
      // unparseable: dropped
      Seq("not a url")
    ).toDF("url")
    val got = graft.ext.UrlCanon
      .crawlTrapStats(urls, "url", minUrls = 3L, deepAt = 5L, paramAt = 4L)
      .as[(String, String, Long, Long, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._7))).toMap
    assert(got.size == 4, s"4 families: ${got.keySet}")
    assert(got(("t.com", "cal")) == ((3L, 5L, 0L, true)),
      s"dup url collapses, trap by depth: ${got(("t.com", "cal"))}")
    assert(got(("t.com", "s")) == ((4L, 1L, 4L, true)),
      s"4 distinct keys a/b/c/d, trap by params: ${got(("t.com", "s"))}")
    assert(got(("t.com", "docs")) == ((5L, 2L, 0L, false)),
      "n_urls passes but neither signal fires: the AND must hold")
    assert(got(("u.com", "docs"))._1 == 1L, "host splits the family grain")
    // avg_len is the integer mean over distinct urls
    val lens = graft.ext.UrlCanon
      .crawlTrapStats(urls, "url", minUrls = 3L, deepAt = 5L, paramAt = 4L)
      .filter(col("family") === "cal").select("avg_len").as[Long].collect()
    assert(lens.toSeq == Seq(29L), s"cal avg_len (all three are 29 chars): ${lens.toSeq}")
  }

  test("priorityFrontierSchedule: slot invariant, authority order, host tie-break, cold host last") {
    val frontier = Seq(
      ("a", "http://a/1"), ("a", "http://a/2"),
      ("b", "http://b/1"), ("c", "http://c/1"))
      .toDF("host", "url")
    val ranks = Seq(("a", 10L), ("b", 10L)).toDF("host", "rank") // c absent
    val got = UrlCanon.priorityFrontierSchedule(
        frontier, "host", "url", ranks, "rank")
      .select(col("fetch_seq"), col("host"), col("url"), col("slot"),
        col("authority"))
      .as[(Long, String, String, Long, Long)].collect().sortBy(_._1)
    // slot 1 first (every host once before any host twice); within
    // the slot authority desc with host-asc tie-break; cold host c
    // takes authority 0 and goes last in its slot
    assert(got.map(r => (r._1, r._2, r._4, r._5)).toSeq == Seq(
      (1L, "a", 1L, 10L), (2L, "b", 1L, 10L), (3L, "c", 1L, 0L),
      (4L, "a", 2L, 10L)), s"${got.toSeq}")
  }
}
