package graft.ext

import org.apache.spark.sql.Column
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
  * high-mass syntactic subset (the [[UrlCanon]] philosophy): no
  * numeric character references beyond `&#39;`, no charset sniffing,
  * no boilerplate classification — those need codec tables or models;
  * what is here is what browsers do structurally.
  *
  * Hostile-input posture (all spec'd, all mirrored by the oracle):
  *  - script/style bodies may contain `<`, `>`, quotes — removed
  *    wholesale BEFORE tag-stripping, so raw JS comparisons never leak
  *    into text;
  *  - an UNCLOSED `<script>`/`<style>`/`<!--` swallows to end-of-doc
  *    (what browsers do: the parser stays in script state);
  *  - only `<` followed by a letter or `/`+letter opens a tag (the
  *    HTML5 tokenizer rule), so stray `a < b` text survives;
  *  - a trailing unclosed tag (`<a href="trunc` at EOS — truncated
  *    fetches) is dropped, not leaked;
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

  /** The visible text of an HTML page: structural strip + entity
    * decode + whitespace collapse, as one composed column expression.
    */
  def mainText(html: Column): Column = {
    // 1) paired script/style blocks (bodies may contain '<' freely),
    //    then UNCLOSED opens swallow to end-of-doc (browser behavior
    //    on truncated pages); \b keeps <scripty> a plain tag
    val noScript = regexp_replace(
      regexp_replace(html, "(?is)<script\\b[^>]*>.*?</script\\s*>", " "),
      "(?is)<script\\b[^>]*>.*", " ")
    val noStyle = regexp_replace(
      regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style\\s*>", " "),
      "(?is)<style\\b[^>]*>.*", " ")
    // 2) comments (may contain tags), closed then unclosed; then
    //    declarations (<!DOCTYPE …>)
    val noComment = regexp_replace(
      regexp_replace(noStyle, "(?s)<!--.*?-->", " "), "(?s)<!--.*", " ")
    val noDecl = regexp_replace(noComment, "<![^>]*>", " ")
    // 3) tags: only '<'+letter (or '</'+letter) opens one — the HTML5
    //    tokenizer rule — so 'a < b' survives as text; a trailing
    //    unclosed tag at end-of-text is dropped (\z, RE2-safe)
    val noTags = regexp_replace(noDecl, "</?[A-Za-z][^>]*>", " ")
    val noOpen = regexp_replace(noTags, "(?s)</?[A-Za-z][^>]*\\z", " ")
    // 4) entities: the common named set; '&amp;' LAST (browser order —
    //    '&amp;lt;' is the literal text '&lt;', never '<')
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noOpen) { case (c, (ent, ch)) => replace(c, lit(ent), lit(ch)) }
    // 5) collapse whitespace runs; trim the seams the strips left
    trim(regexp_replace(decoded, "\\s+", " "))
  }
}
