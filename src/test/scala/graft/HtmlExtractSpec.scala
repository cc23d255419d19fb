package graft

import org.apache.spark.sql.functions._
import graft.ext.HtmlExtract

class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def extract(htmls: String*): Seq[String] =
    htmls.toSeq.toDF("html")
      .select(HtmlExtract.mainText(col("html")).as("t"))
      .as[String].collect().toSeq

  test("tags strip, whitespace collapses, title text is content") {
    assert(extract(
      "<!DOCTYPE html><html><head><title>T</title></head>" +
        "<body><div class=\"c\"><p>Hello   world</p></div></body></html>")
      == Seq("T Hello world"))
    // plain text passes through (modulo collapse)
    assert(extract("no  markup\there") == Seq("no markup here"))
  }

  test("script/style bodies vanish wholesale, including '<' '>' and quotes inside") {
    assert(extract(
      "<p>a</p><script type=\"x\">if (1<2 && x>\"</div>\") { y=\"&amp;\" }</script><p>b</p>")
      == Seq("a b"))
    assert(extract("<style>p > a { content: \"<q>\"; }</style>text")
      == Seq("text"))
    // <scripty> is a TAG, not a script open (\b boundary)
    assert(extract("<scripty>visible</scripty>") == Seq("visible"))
    // </script > with space before '>' still closes
    assert(extract("<script>x<y</script ><b>ok</b>") == Seq("ok"))
  }

  test("unclosed script/style/comment swallows to end-of-doc (browser behavior)") {
    assert(extract("<p>keep</p><script>var x=1; <a href=\"gone\">never</a>")
      == Seq("keep"))
    assert(extract("<p>keep</p><style>p{") == Seq("keep"))
    assert(extract("<p>keep</p><!-- truncated comment <b>gone</b>")
      == Seq("keep"))
  }

  test("comments and declarations drop even with tags inside") {
    assert(extract("a<!-- <p>hidden</p> -->b") == Seq("a b"))
    assert(extract("<!DOCTYPE html><p>x</p>") == Seq("x"))
  }

  test("entities decode after tag-strip, &amp; last; stray '<' text survives") {
    // &lt;b&gt; is literal text '<b>', never re-parsed as a tag
    assert(extract("<p>&lt;b&gt; &amp; Co.&nbsp;&quot;q&#39;</p>")
      == Seq("<b> & Co. \"q'"))
    // double-escaped: &amp;lt; renders as the literal text '&lt;'
    assert(extract("x &amp;lt; y") == Seq("x &lt; y"))
    // '<' followed by space is TEXT (HTML5 tokenizer rule)
    assert(extract("a < b and c > d") == Seq("a < b and c > d"))
  }

  test("numeric character references: decimal, hex case-insensitive, amp-last") {
    // the round-12 verdict's smart-quote class: decimal and hex forms
    assert(extract("it&#8217;s &#x2019;fine&#x2019;")
      == Seq("it’s ’fine’"))
    assert(extract("&#8220;q&#8221; &#8211; r &#8212; s&#8230;")
      == Seq("“q” – r — s…"))
    // hex X/letter case both decode; named additions too
    assert(extract("&#x201C;a&#X201D; &ndash; &hellip; &lsquo;b&rsquo;")
      == Seq("“a” – … ‘b’"))
    // numeric amp decodes LAST: &#38;lt; is literal '&lt;', never '<';
    // &#60;/&#x3E; decode as literal angle TEXT, never re-parsed tags
    assert(extract("&#38;lt; &#60;b&#x3E; &#38;&#160;x")
      == Seq("&lt; <b> & x"))
    // out-of-set and leading-zero refs survive verbatim (contract)
    assert(extract("&#1234; &#039; &#xZZ;") == Seq("&#1234; &#039; &#xZZ;"))
  }

  test("trailing unclosed tag (truncated fetch) is dropped, not leaked") {
    assert(extract("<p>kept</p><a href=\"htt") == Seq("kept"))
    assert(extract("<p>kept</p><div class=") == Seq("kept"))
    // nested unclosed block tags still strip as tags
    assert(extract("<div><p>deep") == Seq("deep"))
    // truncated DECLARATION at EOS drops too (round-12 review finding)
    assert(extract("<p>kept</p><!DOCTYPE htm") == Seq("kept"))
  }

  test("constructs resolve in document order: <script> inside a comment or style body is text") {
    // round-12 review finding: separate per-construct passes let the
    // unclosed-script fallback fire on a '<script>' INSIDE a comment
    // and swallow the rest of the document
    assert(extract("a<!-- <script> -->b") == Seq("a b"))
    assert(extract("<style>.a{content:\"<script>\"}</style><p>visible</p>")
      == Seq("visible"))
    // and the converse: a comment open inside a script body is script
    // text, consumed with the script
    assert(extract("<script>x<!--y</script><p>seen</p>") == Seq("seen"))
    // earliest unclosed construct wins the swallow
    assert(extract("t<!-- open <script>s") == Seq("t"))
  }

  test("paragraphs: block tags split, inline tags don't, empties drop, order holds") {
    val got = Seq(
      "<div>nav</div><p>one <b>bold</b> two</p><p></p><div>footer</div>",
      "no blocks at all",
      "<ul><li>a</li><li>b</li></ul>")
      .toDF("html")
      .select(graft.ext.HtmlExtract.paragraphs(col("html")).as("p"))
      .as[Seq[String]].collect().toSeq
    assert(got(0) == Seq("nav", "one bold two", "footer"),
      s"inline <b> must not split: ${got(0)}")
    assert(got(1) == Seq("no blocks at all"))
    assert(got(2) == Seq("a", "b"))
  }

  test("dropBoilerplateParagraphs: host-repeated paragraphs die, unique body survives in order") {
    val pages = Seq(
      (1L, "h1", "<div>nav</div><p>alpha body</p><p>beta body</p><div>nav</div>"),
      (2L, "h1", "<div>nav</div><p>gamma body</p><div>nav</div>"),
      (3L, "h1", "<div>nav</div><p>delta body</p><div>nav</div>"),
      (4L, "h2", "<div>nav</div><p>epsilon</p>"))
      .toDF("id", "host", "html")
    val got = graft.ext.HtmlExtract
      .dropBoilerplateParagraphs(pages, "id", "host", "html", minPages = 3)
      .as[(Long, String, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5))).toMap
    // 'nav' repeats on all 3 h1 pages -> boiler there; h2's single page
    // can never reach minPages, so its nav SURVIVES (per-host scope)
    assert(got(1L) == ((4L, 2L, "alpha body beta body")), s"got ${got(1L)}")
    assert(got(2L) == ((3L, 2L, "gamma body")))
    assert(got(3L) == ((3L, 2L, "delta body")))
    assert(got(4L) == ((2L, 0L, "nav epsilon")),
      "another host's nav must not leak into h2's frequency")
  }

  test("vertical tab collapses like other whitespace (explicit class - RE2 \\s lacks x0B)") {
    assert(extract("ab  c") == Seq("a b c"))
  }
  test("dropLinkFarmParagraphs: density rule - farms die, inline links survive, every page emits") {
    val pages = Seq(
      // the case page-frequency can't catch: a SINGLE page whose nav
      // is pure anchor text; the body and its inline citation survive
      (1L, "<div><a href=\"/\">Home</a> <a href=\"/a\">About</a></div>" +
        "<p>see <a href=\"/m\">details here</a> for the full story</p>"),
      // exact-threshold: 5 anchor chars / 10 visible = 500000 ppm -
      // the >= rule drops it
      (2L, "<p><a href=\"/e\">abcde</a> fghi</p><p>plain body text</p>"),
      // zero-paragraph page still emits a row (the classify-every-
      // input posture - the OPPOSITE of dropBoilerplateParagraphs)
      (3L, "<div></div><script>x</script>"),
      // an anchor left unterminated by a block break inside it
      // contributes ZERO anchor chars (sentinel pair never closes)
      (4L, "<p><a href=\"/x\">one<div>two</div></a> tail</p>"),
      // entity + inline markup in a kept paragraph: clean_text must
      // equal paragraphs()' rendering
      (5L, "<p>see <b>bold</b> &amp; <a href='/m'>more info</a> today</p>"))
      .toDF("id", "html")
    val got = graft.ext.HtmlExtract
      .dropLinkFarmParagraphs(pages, "id", "html")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // page 1: nav "Home About" is all-anchor (1000000 ppm, dropped);
    // the mixed para is 12/35 anchor chars (342857 ppm, kept)
    assert(got(1L) == ((2L, 1L, 1000000L,
      "see details here for the full story")), s"got ${got(1L)}")
    assert(got(2L) == ((2L, 1L, 500000L, "plain body text")),
      s"exactly-at-threshold must drop (>= rule): ${got(2L)}")
    assert(got(3L) == ((0L, 0L, 0L, "")),
      s"zero-para page must still emit a row: ${got(3L)}")
    // page 4 paragraphs: the block break inside the anchor splits it
    // into "one" (unclosed open sentinel), "two", and "tail" (dangling
    // close sentinel) - no pair ever closes, so 0 anchor chars each,
    // all three kept, deterministically
    assert(got(4L) == ((3L, 0L, 0L, "one two tail")), s"got ${got(4L)}")
    assert(got(5L)._4 == "see bold & more info today",
      s"kept text must match paragraphs() rendering: ${got(5L)}")
  }

  test("robotsMeta: directive semantics, case/quote/order variants, " +
      "bot-specific metas ignored, multi-meta union") {
    def rm(html: String): (Boolean, Boolean) = {
      val r = spark.range(1)
        .select(HtmlExtract.robotsMeta(lit(html)).as("m"))
        .select("m.noindex", "m.nofollow").collect()(0)
      (r.getBoolean(0), r.getBoolean(1))
    }
    assert(rm("<html><head></head></html>") == ((false, false)))
    assert(rm("<meta name=\"robots\" content=\"noindex\">") == ((true, false)))
    assert(rm("<meta name=\"robots\" content=\"nofollow\">") == ((false, true)))
    assert(rm("<meta name=\"robots\" content=\"noindex, nofollow\">")
      == ((true, true)))
    assert(rm("<meta name=\"robots\" content=\"none\">") == ((true, true)))
    // permissive tokens are no-ops
    assert(rm("<meta name=\"robots\" content=\"index, follow\">")
      == ((false, false)))
    assert(rm("<meta name=\"robots\" content=\"all\">") == ((false, false)))
    // case-insensitive, single quotes, unquoted name, spaced commas
    assert(rm("<META NAME='ROBOTS' CONTENT='NOINDEX'>") == ((true, false)))
    assert(rm("<meta name=robots content=\"noindex ,  NOFOLLOW\">")
      == ((true, true)))
    // attribute order free
    assert(rm("<meta content=\"nofollow\" name=\"robots\">") == ((false, true)))
    // bot-specific metas target that bot alone -- ignored here
    assert(rm("<meta name=\"googlebot\" content=\"noindex\">")
      == ((false, false)))
    // multiple robots metas UNION their restrictions
    assert(rm("<meta name=\"robots\" content=\"noindex\">" +
      "<meta name=\"robots\" content=\"nofollow\">") == ((true, true)))
    // a noindex token inside ANOTHER meta's content must not leak
    assert(rm("<meta name=\"description\" content=\"how noindex works\">")
      == ((false, false)))
    // round-17 review fix: a name that merely STARTS with "robots" is
    // a different name — must not parse as a robots meta (the right
    // anchor is load-bearing in BOTH attribute orders)
    assert(rm("<meta name=\"robotsxyz\" content=\"noindex\">")
      == ((false, false)))
    assert(rm("<meta name=robotsxyz content=\"noindex\">")
      == ((false, false)))
    assert(rm("<meta content=\"noindex\" name=\"robotsxyz\">")
      == ((false, false)))
    // ...while the anchored forms still parse (tag-end and self-close
    // right boundaries after an unquoted name)
    assert(rm("<meta content=\"noindex\" name=robots>") == ((true, false)))
    assert(rm("<meta content=\"nofollow\" name=robots/>") == ((false, true)))
    // the anchor must be NON-CONSUMING (second round-17 fix): a
    // consuming class ate the tag-closing '>' of a content-less
    // `<meta name=robots>` and attributed the NEXT tag's content= to
    // robots — the match may never escape its tag
    assert(rm("<meta name=robots><meta name=description " +
      "content=\"noindex, how to block pages\">") == ((false, false)))
    assert(rm("<meta name=robots><meta name=\"robots\" " +
      "content=\"nofollow\">") == ((false, true)))
  }

  test("robotsHeader: value semantics, bot-scope rule, null-permissive") {
    def rh(v: Any): (Boolean, Boolean) = {
      val c = v match {
        case null => lit(null).cast("string")
        case s: String => lit(s)
      }
      val r = spark.range(1)
        .select(HtmlExtract.robotsHeader(c).as("h"))
        .select("h.noindex", "h.nofollow").collect()(0)
      (r.getBoolean(0), r.getBoolean(1))
    }
    assert(rh("noindex") == ((true, false)))
    assert(rh("nofollow") == ((false, true)))
    assert(rh("none") == ((true, true)))
    assert(rh("noindex, nofollow") == ((true, true)))
    assert(rh(" NOINDEX ,  Nofollow") == ((true, true)))
    assert(rh("all") == ((false, false)))
    assert(rh("") == ((false, false)))
    assert(rh(null) == ((false, false)))
    // a bot-scoped value is ignored wholesale by a generic crawler
    assert(rh("googlebot: noindex") == ((false, false)))
    // the dated form routes through the bot-scope rule (documented
    // out of contract -- the permissive default)
    assert(rh("unavailable_after: 25 Jun 2030 15:00:00 PST")
      == ((false, false)))
  }
}
