package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML main-content extraction — the stage every real crawl pipeline
  * runs between fetch and text analysis, and the one the q213–q219
  * crawl family was missing: strip `<script>`/`<style>` blocks and
  * comments, drop tags, decode the common entities, collapse
  * whitespace. The output is the text a training-data pipeline would
  * shingle/score, so it feeds directly into the minhash content-dedup
  * tier (q227 runs the full chain: canonicalize → URL dedup → EXTRACT
  * → content near-dup).
  *
  * Everything is native `regexp_replace`/`replace` column expressions
  * (no UDF, codegen'd) over RE2-SAFE patterns — no lookahead, no
  * backreferences — so DuckDB reproduces the chain verbatim and the
  * stage is oracle-certifiable (q226). Scope is deliberately the
  * high-mass syntactic subset (the [[UrlCanon]] philosophy): named
  * entities plus the common NUMERIC character references (decimal and
  * hex — see [[EntityDecodes]]), no charset sniffing, no boilerplate
  * classification — those need codec tables or models; what is here
  * is what browsers do structurally.
  *
  * Hostile-input posture (all spec'd, all mirrored by the oracle):
  *  - script/style bodies may contain `<`, `>`, quotes — removed
  *    wholesale BEFORE tag-stripping, so raw JS comparisons never leak
  *    into text;
  *  - script/style/comment constructs resolve in DOCUMENT ORDER (one
  *    leftmost-first alternation = sequential tokenization): a
  *    `<script>` token inside a comment or a style body is that
  *    construct's text, it never re-arms script state;
  *  - an UNCLOSED `<script>`/`<style>`/`<!--` swallows to end-of-doc
  *    (what browsers do: the parser stays in script state);
  *  - only `<` followed by a letter or `/`+letter opens a tag (the
  *    HTML5 tokenizer rule), so stray `a < b` text survives;
  *  - a trailing unclosed tag or declaration (`<a href="trunc`,
  *    `<!DOCTYPE htm` at EOS — truncated fetches) is dropped, not
  *    leaked;
  *  - entities decode AFTER tag-stripping (browser order), so
  *    `&lt;b&gt;` renders as literal `<b>` text and is never
  *    re-parsed as a tag; `&amp;` decodes LAST so `&amp;lt;` yields
  *    the literal text `&lt;`.
  *
  * 100-TB shape: a pure per-row projection — a fixed chain of
  * codegen'd string passes, no shuffle, no UDF, nothing collected.
  * Each pass is one linear scan of the (post-shrink) page, and the
  * script/style/comment passes run first so the later passes scan the
  * smaller stripped text. Derived-column consumers must barrier the
  * output before filtering on it (the q215/q222 re-inlining class —
  * use `explode_outer(array(…))`).
  */
object HtmlExtract {

  /** ASCII whitespace, spelled as an explicit class: Java's `\s`
    * includes U+000B but RE2's does not, so a bare `\s` would make the
    * Spark chain and its DuckDB mirror diverge on vertical-tab input
    * (latent until the corpus grows a control char). Both engines
    * parse `\x0B`.
    */
  private val Ws = "[ \\t\\n\\x0B\\f\\r]"

  /** Block-level tags whose boundaries delimit paragraphs. */
  private val BlockTagRe =
    "(?i)</?(?:p|div|br|li|ul|ol|h[1-6]|table|tr|td|section|article|header|footer)\\b[^>]*>"

  /** ONE shared structural pipeline feeds both [[mainText]] and
    * [[paragraphs]] — they may differ only in how the U+0001 block
    * break renders (collapse-as-space vs split), which PropertyExtSpec
    * pins as `array_join(paragraphs(x), " ") == mainText(x)` on
    * arbitrary hostile input. The first cut gave each chain its own
    * pass order and the property caught them diverging: an unclosed
    * mid-document tag followed by a block tag closed on the block
    * tag's '>' in one chain but swallowed to end-of-doc in the other
    * (the block pass had already consumed that '>').
    */
  private def structuralStrip(html: Column): Column = {
    // 1) PAIRED script/style blocks and comments in ONE leftmost-first
    //    alternation: at each position at most one alternative can
    //    start (distinct literal prefixes), so the EARLIEST construct
    //    wins and consumes through its own closer — sequential
    //    tokenization, exactly what a browser does. Separate passes
    //    would let a '<script>' token INSIDE a comment or style body
    //    swallow the rest of the document (round-12 review finding).
    //    Bodies may contain '<'/'>' freely; \b keeps <scripty> a
    //    plain tag.
    val noPaired = regexp_replace(html,
      s"(?is)<script\\b[^>]*>.*?</script$Ws*>" +
        s"|<style\\b[^>]*>.*?</style$Ws*>|<!--.*?-->", " ")
    // 2) UNCLOSED opens swallow to end-of-doc (browser behavior on
    //    truncated pages) — again one alternation, earliest wins
    val noOpenBlock = regexp_replace(noPaired,
      "(?is)<script\\b[^>]*>.*|<style\\b[^>]*>.*|<!--.*", " ")
    // 3) declarations (<!DOCTYPE …>); BLOCK-tag boundaries become
    //    U+0001 breaks BEFORE the remaining tags strip; then tags:
    //    only '<'+letter (or '</'+letter) opens one — the HTML5
    //    tokenizer rule — so 'a < b' survives as text; a trailing
    //    unclosed tag OR declaration at end-of-text is dropped (\z,
    //    RE2-safe)
    val noDecl = regexp_replace(noOpenBlock, "<![^>]*>", " ")
    val withBreaks = regexp_replace(noDecl, BlockTagRe, "\u0001")
    val noTags = regexp_replace(withBreaks, "</?[A-Za-z][^>]*>", " ")
    val noOpen = regexp_replace(noTags, "(?s)(?:</?[A-Za-z][^>]*|<![^>]*)\\z", " ")
    // 4) entities: named + NUMERIC character references (decimal and
    //    case-insensitive hex), one alternation pass per TARGET char;
    //    the '&' class LAST (browser order — '&amp;lt;'/'&#38;lt;' is
    //    the literal text '&lt;', never '<')
    EntityDecodes.foldLeft(noOpen) { case (c, (pat, ch)) =>
      regexp_replace(c, pat, ch)
    }
  }

  /** Entity-decode table: one RE2-safe alternation (named | decimal
    * ref | case-insensitive hex ref) per target character, applied in
    * order — the `&`-producing class MUST stay last. Covers the
    * high-mass set real pages carry (round-12 verdict: `&#8217;`/
    * `&#x2019;` smart quotes are ubiquitous and were poisoning
    * shingles/LM scores as literal text). Leading-zero refs
    * (`&#039;`) and refs outside this set are out of the syntactic
    * contract and survive verbatim — deterministic and mirrored.
    * PUBLIC so the oracle-SQL generator derives its DuckDB chain from
    * THIS table (the two engines cannot drift).
    */
  val EntityDecodes: Seq[(String, String)] = Seq(
    "&lt;|&#60;|(?i:&#x3c;)" -> "<",
    "&gt;|&#62;|(?i:&#x3e;)" -> ">",
    "&quot;|&#34;|(?i:&#x22;)" -> "\"",
    "&apos;|&#39;|(?i:&#x27;)" -> "'",
    "&nbsp;|&#160;|(?i:&#xa0;)" -> " ",
    "&ndash;|&#8211;|(?i:&#x2013;)" -> "–",
    "&mdash;|&#8212;|(?i:&#x2014;)" -> "—",
    "&lsquo;|&#8216;|(?i:&#x2018;)" -> "‘",
    "&rsquo;|&#8217;|(?i:&#x2019;)" -> "’",
    "&ldquo;|&#8220;|(?i:&#x201c;)" -> "“",
    "&rdquo;|&#8221;|(?i:&#x201d;)" -> "”",
    "&hellip;|&#8230;|(?i:&#x2026;)" -> "…",
    "&amp;|&#38;|(?i:&#x26;)" -> "&")

  /** The visible text of an HTML page: structural strip + entity
    * decode + whitespace collapse (block breaks collapse like
    * whitespace — explicit class, not \s, see [[Ws]]).
    */
  def mainText(html: Column): Column =
    trim(regexp_replace(structuralStrip(html),
      "[ \\t\\n\\x0B\\f\\r\\x01]+", " "))

  /** `<meta name=robots>` directive parse — the PAGE-level robots
    * protocol ([[UrlCanon]]'s robots.txt is the SITE level; real
    * crawlers honor both): returns struct(noindex, nofollow) where
    * `noindex` means the page content must not enter the corpus and
    * `nofollow` means its links must not enter the link graph.
    * Rules (the Google/Bing-documented semantics):
    *   - only `name=robots` applies (a bot-specific meta like
    *     `name=googlebot` targets that bot alone and is ignored by a
    *     generic crawler);
    *   - names/directives are CASE-INSENSITIVE; content is a
    *     comma-separated token list with optional whitespace;
    *   - `none` ≡ `noindex, nofollow`; `all`/`index`/`follow` are
    *     no-ops (permissive is the default);
    *   - attribute order is free (`content=` may precede `name=`) —
    *     both orders matched;
    *   - multiple robots metas UNION their restrictions (the
    *     conservative reading crawlers apply);
    *   - QUOTED content values only (double or single) — the
    *     unquoted `content=noindex` spelling is out of contract,
    *     documented like the charset= parameter's original scope.
    * Pure per-row column expression — no UDF, no shuffle.
    */
  def robotsMeta(html: Column): Column = {
    // `robots` must END the name token (round-17 review fix): both
    // quotes are optional for the unquoted-attribute form, so without
    // a right anchor `name=robotsxyz` — a DIFFERENT name that merely
    // starts with "robots" — parsed as a robots meta and minted false
    // restrictions. The anchor is a LOOKAHEAD, not a consuming class
    // (second round-17 fix): a consuming [\s"'/>] class ATE the
    // tag-closing '>' when an unquoted `name=robots` sat at tag end,
    // letting [^>]* escape into the NEXT tag and attribute its
    // content= to robots. The lookahead asserts the boundary without
    // crossing it, so the match can never leave the tag. (Java regex
    // lookahead — fine here; the no-lookahead rule binds oracle SQL,
    // and the robots oracles are closed-form CASE arms.)
    val nameFirst = regexp_extract_all(html,
      lit("(?i)<meta[^>]*name\\s*=\\s*[\"']?robots(?=[\"'\\s/>])[^>]*" +
        "content\\s*=\\s*[\"']([^\"'>]*)"), lit(1))
    val contentFirst = regexp_extract_all(html,
      lit("(?i)<meta[^>]*content\\s*=\\s*[\"']([^\"'>]*)[\"']" +
        "[^>]*name\\s*=\\s*[\"']?robots(?=[\"'\\s/>])"), lit(1))
    directivesOf(transform(
      flatten(transform(concat(nameFirst, contentFirst),
        c => split(lower(c), ","))),
      t => trim(t)))
  }

  /** The shared directive-token fold: `none` ≡ both restrictions;
    * permissive tokens (`all`/`index`/`follow`) and unknown tokens
    * are no-ops. ONE definition so the meta and header levels cannot
    * drift on the semantics.
    */
  private def directivesOf(toks: Column): Column =
    struct(
      exists(toks, t => t === "noindex" || t === "none").as("noindex"),
      exists(toks, t => t === "nofollow" || t === "none").as("nofollow"))

  /** `X-Robots-Tag` HTTP-header directive parse — the RESPONSE level
    * of the robots protocol (robots.txt gates the SITE, this header
    * the response, [[robotsMeta]] the page; a real crawler honors all
    * three and UNIONS the restrictions). Takes the header VALUE
    * ([[HttpRecord.header]] extracts it) and returns the same
    * struct(noindex, nofollow):
    *   - an optional leading `botname:` prefix scopes the directives
    *     to that bot — a generic crawler ignores the whole value
    *     (directive keywords themselves are never followed by `:`,
    *     so any `token:` prefix is a bot scope);
    *   - otherwise: the comma-separated token list under
    *     [[directivesOf]]'s semantics, case-insensitive;
    *   - the dated `unavailable_after: <date>` form is out of
    *     contract (its value contains colons; it routes through the
    *     bot-scope rule and is ignored — the permissive default, and
    *     the conservative reading would need a clock anyway);
    *   - a NULL/absent header is permissive.
    */
  def robotsHeader(value: Column): Column = {
    val v = coalesce(value, lit(""))
    val botScoped = regexp_extract(v, "^\\s*([A-Za-z0-9_-]+)\\s*:", 1) =!= ""
    val eff = when(botScoped, lit("")).otherwise(v)
    directivesOf(transform(split(lower(eff), ","), t => trim(t)))
  }

  /** The page text as PARAGRAPHS (array<string>): the same structural
    * pipeline, split at the block-tag breaks instead of collapsing
    * them. Inline markup (`<b>`, `<a …>`) does not split; empty
    * paragraphs (adjacent block tags) drop; each paragraph is
    * entity-decoded and whitespace-collapsed like mainText. Raw input
    * containing U+0001 (the break char) is out of contract.
    */
  def paragraphs(html: Column): Column =
    filter(
      transform(split(structuralStrip(html), "\u0001"),
        p => trim(regexp_replace(p, s"$Ws+", " "))),
      p => p =!= "")

  /** Per-host BOILERPLATE-paragraph removal — the CCNet/RefinedWeb
    * stage after extraction: nav bars, footers, cookie banners repeat
    * on (nearly) every page of a host, so a paragraph whose
    * fingerprint appears on ≥ `minPages` distinct pages of its host
    * is boilerplate and is dropped; body text is page-unique and
    * survives. Emits per page: paragraph counts and the cleaned text
    * (kept paragraphs re-joined in document order).
    *
    * CONTRACT: pages whose HTML extracts to ZERO paragraphs (empty
    * body, pure-markup page) emit NO output row — the posexplode
    * yields no paragraph rows and the join back is inner. Callers
    * needing the repo's usual classify-every-input-once posture
    * (urlDecisions, HttpRecord.parse) should left-join the result
    * back to the page table and read an absent row as
    * n_paras=0/clean_text=''.
    *
    * Shape: one posexplode (paragraph grain), one (host, fingerprint)
    * count-distinct aggregate — bounded by distinct paragraphs, never
    * pages² — one keyed join back, one page-grain fold. The ordered
    * re-join is a per-page `array_sort(collect_list(...))`, bounded by
    * a page's paragraph count, never a corpus window. At 100 TB every
    * stage is a keyed shuffle on (host, fp) or the page id; nothing
    * broadcasts, nothing is quadratic.
    */
  def dropBoilerplateParagraphs(
      pages: DataFrame, idCol: String, hostCol: String, htmlCol: String,
      minPages: Int = 3): DataFrame = {
    require(minPages >= 2, s"minPages must be >= 2, got $minPages")
    val paras = pages.select(col(idCol), col(hostCol),
        posexplode(paragraphs(col(htmlCol))).as(Seq("__pos", "__para")))
      .withColumn("__fp", md5(col("__para")))
    val freq = paras.groupBy(col(hostCol), col("__fp"))
      .agg(count_distinct(col(idCol)).as("__n_pages"))
    paras.join(freq, Seq(hostCol, "__fp"))
      .withColumn("__boiler", col("__n_pages") >= minPages)
      .groupBy(col(idCol), col(hostCol))
      .agg(count(lit(1)).cast("long").as("n_paras"),
        sum(when(col("__boiler"), 1L).otherwise(0L)).as("n_boiler"),
        array_join(transform(
          array_sort(collect_list(when(!col("__boiler"),
            struct(col("__pos"), col("__para"))))),
          x => x.getField("__para")), " ").as("clean_text"))
  }

  /** [[structuralStrip]] twin that preserves ANCHOR boundaries:
    * complete `<a …>` / `</a>` tags become the sentinels U+0002 /
    * U+0003 (instead of the space every other inline tag becomes) so
    * paragraph grain can still measure how much of its visible text
    * sits inside links. Same pass order as structuralStrip — shared
    * prefix through the declaration strip, block breaks, then the
    * anchor pass BEFORE the generic tag strip (which would otherwise
    * eat the anchors). Raw input containing U+0002/U+0003 is out of
    * contract (same rule as U+0001 in [[paragraphs]]).
    */
  private def anchorSentinelStrip(html: Column): Column = {
    val noPaired = regexp_replace(html,
      s"(?is)<script\\b[^>]*>.*?</script$Ws*>" +
        s"|<style\\b[^>]*>.*?</style$Ws*>|<!--.*?-->", " ")
    val noOpenBlock = regexp_replace(noPaired,
      "(?is)<script\\b[^>]*>.*|<style\\b[^>]*>.*|<!--.*", " ")
    val noDecl = regexp_replace(noOpenBlock, "<![^>]*>", " ")
    val withBreaks = regexp_replace(noDecl, BlockTagRe, "\u0001")
    val withAnchors = regexp_replace(
      regexp_replace(withBreaks, "(?i)<a\\b[^>]*>", "\u0002"),
      s"(?i)</a$Ws*>", "\u0003")
    val noTags = regexp_replace(withAnchors, "</?[A-Za-z][^>]*>", " ")
    val noOpen = regexp_replace(noTags, "(?s)(?:</?[A-Za-z][^>]*|<![^>]*)\\z", " ")
    EntityDecodes.foldLeft(noOpen) { case (c, (pat, ch)) =>
      regexp_replace(c, pat, ch)
    }
  }

  /** LINK-DENSITY boilerplate classifier — the per-paragraph signal
    * (Kohlschütter's boilerplate feature, integer form) complementing
    * [[dropBoilerplateParagraphs]]'s page-frequency rule: a nav bar on
    * a host with only TWO crawled pages never reaches `minPages >= 3`,
    * but its paragraph is still ~all anchor text. Per paragraph:
    * `density_ppm = anchor_chars * 1e6 DIV visible_chars` (anchor
    * chars = the text between U+0002/U+0003 sentinel pairs, space-
    * joined then whitespace-collapsed; visible chars = the paragraph
    * with sentinels read as spaces, collapsed — so a kept paragraph's
    * text is byte-identical to [[paragraphs]]'s). A paragraph with
    * `density_ppm >= maxDensityPpm` is a link farm and is dropped.
    *
    * CONTRACT: every input page emits exactly one row — a page whose
    * HTML extracts to zero paragraphs comes back with n_paras=0 and
    * clean_text '' (the classify-every-input-once posture;
    * dropBoilerplateParagraphs documents the opposite). An anchor
    * left unterminated by a block break inside it contributes zero
    * anchor chars to its paragraph (the sentinel pair never closes) —
    * deterministic, spec'd.
    *
    * Shape: a PURE per-row projection — the paragraph split, the
    * density fold and the re-join all happen inside one row via
    * higher-order functions; no explode, no shuffle, nothing keyed.
    * At 100 TB this is embarrassingly parallel scan work. The HOF
    * lambdas run interpreted, so CPU-bound local corpora want a
    * repartition first (the q241 discipline).
    */
  def dropLinkFarmParagraphs(
      pages: DataFrame, idCol: String, htmlCol: String,
      maxDensityPpm: Long = 500000L): DataFrame = {
    require(maxDensityPpm > 0, s"maxDensityPpm must be > 0, got $maxDensityPpm")
    def vis(p: Column): Column =
      trim(regexp_replace(regexp_replace(p, "[\u0002\u0003]", " "), s"$Ws+", " "))
    def anchorText(p: Column): Column =
      trim(regexp_replace(array_join(
        regexp_extract_all(p, lit("\u0002([^\u0002\u0003]*)\u0003"), lit(1)),
        " "), s"$Ws+", " "))
    val paras = filter(
      transform(split(anchorSentinelStrip(col(htmlCol)), "\u0001"),
        p => trim(regexp_replace(p, s"$Ws+", " "))),
      p => vis(p) =!= "")
    // integer DIV spelled lambda-safely (no expr() around a lambda
    // var): x - x%v is exactly divisible, so the double division is
    // exact (x <= ~1e11 << 2^53) and the cast is lossless
    def divPpm(a: Column, v: Column): Column = {
      val x = a.cast("long") * lit(1000000L)
      ((x - pmod(x, v.cast("long"))) / v.cast("long")).cast("long")
    }
    val scored = transform(paras, p => struct(
      vis(p).as("vis"),
      divPpm(length(anchorText(p)), length(vis(p))).as("ppm")))
    pages.select(col(idCol),
      size(scored).cast("long").as("n_paras"),
      size(filter(scored, s => s.getField("ppm") >= maxDensityPpm))
        .cast("long").as("n_linkfarm"),
      coalesce(array_max(transform(scored, s => s.getField("ppm"))), lit(0L))
        .as("max_density_ppm"),
      array_join(transform(
        filter(scored, s => s.getField("ppm") < maxDensityPpm),
        s => s.getField("vis")), " ").as("clean_text"))
  }
}
