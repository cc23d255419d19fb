package graft

import org.apache.spark.sql.functions._
import graft.ext.TextAnalysis

class TextPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("tokens is Unicode-aware: CJK per-char, marks keep words whole, runs for spaced scripts (round 14)") {
    val df = Seq(
      "Héllo Wörld",
      "北京大学123",                 // Han glued to digits
      "Abc北京、大学です。B2B",       // mixed ASCII + Han + kana + CJK punct
      "мир-труд Ελλάδα مرحبا",
      "नमस्ते",                      // Devanagari with virama (Mn mark)
      "한국어 테스트",               // Hangul: spaced script → run tokens
      "ｱｲｳ"                          // halfwidth katakana → per-char
    ).toDF("t")
    val got = df.select(TextAnalysis.tokens(col("t")).as("k"))
      .as[Seq[String]].collect()
    assert(got(0) == Seq("héllo", "wörld"), got(0).toString)
    assert(got(1) == Seq("北", "京", "大", "学", "123"), got(1).toString)
    assert(got(2) == Seq("abc", "北", "京", "大", "学", "で", "す", "b2b"))
    assert(got(3) == Seq("мир", "труд", "ελλάδα", "مرحبا"))
    assert(got(4) == Seq("नमस्ते"), "combining marks must not split the word")
    assert(got(5) == Seq("한국어", "테스트"))
    assert(got(6) == Seq("ｱ", "ｲ", "ｳ"))
  }

  test("lowerU folds the four JVM≠DuckDB case mappings and final sigma") {
    val df = Seq("İIÇŞ", "ΣΙΣΥΦΟΣ ΟΔΟΣ", "ΕΛΛΆΔΑ", "Ꟈx").toDF("t")
    val got = df.select(TextAnalysis.lowerU(col("t")).as("l"))
      .as[String].collect()
    // İ pre-folds to I (DuckDB's plain-i mapping), NOT i+U+0307
    assert(got(0) == "iiçş", got(0).map(_.toInt.toHexString).mkString(","))
    // word-final Σ post-folds ς→σ so both engines agree
    assert(got(1) == "σισυφοσ οδοσ")
    assert(got(2) == "ελλάδα")
    // U+A7C7 pre-folds to U+A7C8 (DuckDB's table lacks the mapping)
    assert(got(3) == "ꟈx")
  }

  test("tokens ≡ tokensAscii on pure-ASCII text (pre-round-14 certifications unchanged)") {
    val df = Seq(
      "The Quick-Brown_Fox 42 jumps!  over 7 lazy dogs...",
      "a1b2c3 {json: \"x\"} don't",
      "", "   \t\n  ", null).toDF("t")
    val both = df.select(
        TextAnalysis.tokens(col("t")).as("u"),
        TextAnalysis.tokensAscii(col("t")).as("a"))
      .as[(Seq[String], Seq[String])].collect()
    both.foreach { case (u, a) => assert(u == a, s"$u vs $a") }
  }

  test("normalizeForDedupU collapses case/digit/punct variants across scripts") {
    val df = Seq(
      ("早上好，北京！2024年", "早上好。北京？1999年"),   // CJK punct + digit variants
      ("Προσοχή: ΟΔΟΣ 12.", "προσοχη-less ΟΔΟΣ 99")      // near, but not equal
    ).toDF("a", "b")
    val got = df.select(
        TextAnalysis.normalizeForDedupU(col("a")).as("na"),
        TextAnalysis.normalizeForDedupU(col("b")).as("nb"))
      .as[(String, String)].collect()
    assert(got(0)._1 == got(0)._2, s"${got(0)}")
    // punctuation strips to '' (the Latin variant's rule): no-space
    // CJK glues back together, which is exactly the right dedup key
    assert(got(0)._1 == "早上好北京0000年")
    assert(got(1)._1 != got(1)._2)
    // final-sigma fold: ΟΔΟΣ normalizes with σ in both arms
    assert(got(1)._1 == "προσοχή οδοσ 00" && got(1)._2 == "προσοχηless οδοσ 00")
  }

  test("invisible chars: count, strip, and token-evasion semantics") {
    val df = Seq(
      "al\u200Bpha beta",          // ZWSP inside a word → splits token
      "alpha \u202Ebeta\u202C x", // bidi wrap at boundaries → no split
      "clean text", null,
      "al\u200Epha beta"           // LRM splice (round-14 review gap)
    ).toDF("t")
    val got = df.select(
        TextAnalysis.invisibleCount(col("t")).as("n"),
        TextAnalysis.stripInvisible(col("t")).as("c"),
        (TextAnalysis.tokens(col("t")) =!=
          TextAnalysis.tokens(TextAnalysis.stripInvisible(col("t"))))
          .as("ev"))
      .as[(Long, String, Boolean)].collect()
    assert(got(0) == ((1L, "alpha beta", true)), got(0).toString)
    assert(got(1) == ((2L, "alpha beta x", false)))
    assert(got(2) == ((0L, "clean text", false)))
    assert(got(3) == ((0L, "", false)), "null-total contract")
    assert(got(4) == ((1L, "alpha beta", true)), "LRM must count and evade")
  }

  test("confusableSkeleton folds the homoglyph core onto latin") {
    // е/а are CYRILLIC (U+0435/U+0430) — the skeleton makes the spoof
    // byte-identical to its clean twin
    val got = Seq(("buy ch\u0435ap w\u0430tches", "Buy Cheap Watches"))
      .toDF("spoof", "clean")
      .select(TextAnalysis.confusableSkeleton(col("spoof")).as("s"),
        TextAnalysis.confusableSkeleton(col("clean")).as("c"))
      .as[(String, String)].head()
    assert(got._1 == "buy cheap watches" && got._1 == got._2, got.toString)
  }

  test("sentencesU segments on fullwidth terminals; ASCII sentences() sees one CJK blob") {
    val zh = "你好世界。第二句！第三句？尾巴"
    val df = Seq(zh, "One. Two! ", "").toDF("t")
    val got = df.select(
        TextAnalysis.sentencesU(col("t")).as("u"),
        TextAnalysis.sentences(col("t")).as("a"))
      .as[(Seq[String], Seq[String])].collect()
    assert(got(0)._1 == Seq("你好世界。", "第二句！", "第三句？", "尾巴"),
      got(0)._1.toString)
    assert(got(0)._2 == Seq(zh), "ASCII segmenter must see ONE blob")
    // ASCII terminals behave identically in both segmenters
    assert(got(1)._1 == Seq("One.", "Two!") && got(1)._2 == got(1)._1)
    assert(got(2)._1 == Seq.empty && got(2)._2 == Seq.empty)
  }

  test("gopherQualityFlags cjkAware counts CJK chars as words and generalizes the alpha rule") {
    // 14 ideographs + fullwidth 。per repeat; the isolated 。stands
    // alone between the spaces its neighbors inserted, so it counts
    // as a (non-alpha) word too → 75 per-char words
    val zh = ("这是一个足够长的中文测试文档。" * 5)
    val df = Seq((1L, zh)).toDF("doc_id", "text")
    // default (cjkAware=false): whole doc is ONE whitespace word → word_count
    val off = TextAnalysis.gopherQualityFlags(df, "doc_id", "text")
      .select("verdict").as[String].head()
    assert(off == "word_count")
    // cjkAware with CJK-calibrated thresholds (per-char words → mean
    // len 100, no Latin stopwords → minStopHits 0)
    val on = TextAnalysis.gopherQualityFlags(df, "doc_id", "text",
        minWords = 50L, minLenC100 = 100L, minStopHits = 0L,
        cjkAware = true)
      .select(col("n_words"), col("verdict")).as[(Long, String)].head()
    assert(on == ((75L, "keep")), on.toString)
  }

  test("tfIdf ranks a document's distinctive term above corpus-wide terms") {
    val docs = Seq(
      (1L, "common common common zebra zebra"),
      (2L, "common common words here"),
      (3L, "common words everywhere too")).toDF("doc_id", "text")
    val top = TextAnalysis.tfIdf(docs, "doc_id", "text", topN = 1)
      .select("doc_id", "token").as[(Long, String)].collect().toMap
    // doc 1: 'common' tf 3 × idf 1 = 3; 'zebra' tf 2 × idf 3 = 6
    assert(top(1L) == "zebra")
    // tf*idf: doc 2 'here'/'words' both tf1; df(here)=1 < df(words)=3 → 'here'
    assert(top(2L) == "here")
  }

  test("tfIdf rank is contiguous per doc and respects topN") {
    val docs = Seq((1L, "a b c d e"), (2L, "a b")).toDF("doc_id", "text")
    val out = TextAnalysis.tfIdf(docs, "doc_id", "text", topN = 3)
      .groupBy("doc_id").agg(collect_list("rank").as("ranks"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(out(1L).sorted == Seq(1, 2, 3))
    assert(out(2L).sorted == Seq(1, 2)) // fewer tokens than topN
  }

  test("redactPii replaces emails, phones, card runs; counts match") {
    val df = Seq(
      "mail bob.smith+x@sub.example.org now",
      "call +44-201-5554 or +1-555-0199",
      "card 4111111111111111 pin 12345",
      "clean text, nothing here").toDF("raw")
    val got = df.select(TextAnalysis.redactPii(col("raw")).as("c"))
      .as[String].collect()
    assert(got(0) == "mail [EMAIL] now")
    assert(got(1) == "call [PHONE] or [PHONE]")
    assert(got(2) == "card [NUM] pin 12345") // 5 digits is not card-like
    assert(got(3) == "clean text, nothing here")
    val (ne, np) = TextAnalysis.piiCounts(col("raw"))
    val counts = df.select(ne.as("e"), np.as("p")).as[(Int, Int)].collect()
    assert(counts.map(_._1).toSeq == Seq(1, 0, 0, 0))
    assert(counts.map(_._2).toSeq == Seq(0, 2, 0, 0))
  }

  test("chunkTokens: 50% overlap, tail truncation, full coverage") {
    val docs = Seq((1L, (1 to 40).map(i => s"w$i").mkString(" ")), (2L, "only three words"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.chunkTokens(docs, "doc_id", "text", chunkSize = 16, stride = 8)
      .select("doc_id", "chunk_id", "chunk_start", "chunk_len", "chunk_text")
      .as[(Long, Long, Long, Int, String)].collect()
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    // 40 tokens, stride 8 → starts 0,8,16,24,32
    assert(d1.map(_._3).toSeq == Seq(0L, 8L, 16L, 24L, 32L))
    assert(d1.map(_._4).toSeq == Seq(16, 16, 16, 16, 8)) // tail truncates
    assert(d1(1)._5.startsWith("w9 w10")) // chunk at start 8 begins at token 9
    // consecutive chunks share the stride-sized overlap
    assert(d1(0)._5.split(" ").drop(8).toSeq == d1(1)._5.split(" ").take(8).toSeq)
    val d2 = out.filter(_._1 == 2L)
    assert(d2.length == 1 && d2.head._4 == 3)
  }

  test("chunkTokens drops empty docs, keeps single-token docs") {
    val docs = Seq((1L, ""), (2L, "  ,,  "), (3L, "word")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkTokens(docs, "doc_id", "text", chunkSize = 4, stride = 2)
      .select("doc_id").as[Long].collect().toSeq
    assert(out == Seq(3L))
  }

  test("repetitionRatio flags repeated bigrams, zero for clean text") {
    val docs = Seq(
      (1L, "spam spam spam spam"), // bigrams: 3x "spam spam" → 2/3 repeated
      (2L, "all fresh words here"), // 3 distinct bigrams
      (3L, "one"), (4L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionRatio(docs, "text", 2, "r")
      .select("doc_id", "r").as[(Long, Double)].collect().toMap
    assert(math.abs(got(1L) - 2.0 / 3.0) < 1e-15)
    assert(got(2L) == 0.0 && got(3L) == 0.0 && got(4L) == 0.0)
  }

  test("packSequences: offsets are exclusive running sums, chunks honor budget") {
    val docs = Seq(
      ("s1", 1L, 100L), ("s1", 2L, 100L), ("s1", 3L, 100L), ("s1", 4L, 50L),
      ("s2", 1L, 300L)).toDF("src", "id", "nt")
    val out = TextAnalysis.packSequences(docs, "src", "id", col("nt"), budget = 250L)
      .select("src", "id", "tok_offset", "chunk")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out == Set(
      ("s1", 1L, 0L, 0L), ("s1", 2L, 100L, 0L), ("s1", 3L, 200L, 0L),
      ("s1", 4L, 300L, 1L), // crosses the 250 boundary → chunk 1
      ("s2", 1L, 0L, 0L))) // partitions pack independently
  }

  test("packSequences windows stay partition-bounded (no global sort)") {
    val docs = (0L until 1000L).map(i => (s"s${i % 4}", i, 10L)).toDF("src", "id", "nt")
    val plan = TextAnalysis.packSequences(docs, "src", "id", col("nt"), budget = 100L)
      .queryExecution.executedPlan.toString
    // a global window would show an Exchange SinglePartition before the Window
    assert(!plan.contains("SinglePartition"), s"global window detected:\n$plan")
  }

  test("ngramHotspots: occurrence vs distinct-doc counts, deterministic cut") {
    val docs = Seq(
      (1L, "a b a b c"), // bigrams: "a b" ×2, "b a", "b c"
      (2L, "a b x")).toDF("doc_id", "text") // "a b", "b x"
    val got = TextAnalysis.ngramHotspots(docs, "doc_id", "text", n = 2, topK = 3)
      .as[(String, Long, Long)].collect().toSeq
    // n_occ desc, then ngram asc — the LIMIT cut is total-order stable
    assert(got == Seq(("a b", 3L, 2L), ("b a", 1L, 1L), ("b c", 1L, 1L)))
  }

  test("ngramHotspots plans TakeOrdered, not a global sort") {
    val docs = (0L until 500L).map(i => (i, s"w${i % 7} w${i % 5} w${i % 3}"))
      .toDF("doc_id", "text")
    val plan = TextAnalysis.ngramHotspots(docs, "doc_id", "text", n = 2, topK = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected TakeOrdered:\n$plan")
  }

  test("coocLift: vocabulary bound excludes rare tokens, lift is integer-exact") {
    val docs = Seq(
      (1L, "x y z"), (2L, "x y"), (3L, "x q"), (4L, "y q")).toDF("doc_id", "text")
    // df: x=3, y=3, q=2, z=1; vocabK=3 keeps {x, y, q} — z is out
    val got = TextAnalysis.coocLift(docs, "doc_id", "text", vocabK = 3, topK = 10)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("x", "y", 2L, 3L, 3L, 2L * 4 * 1000000 / 9), // 888888
      ("q", "x", 1L, 2L, 3L, 1L * 4 * 1000000 / 6), // 666666
      ("q", "y", 1L, 2L, 3L, 666666L)))
    assert(!got.exists(r => r._1 == "z" || r._2 == "z"), "rare token escaped the bound")
  }

  test("bpePairStats: pair frequencies weighted by word count; 1-char words skipped") {
    val docs = Seq((1L, "abc ab abc"), (2L, "a a a")).toDF("doc_id", "text")
    // wc: abc=2, ab=1, a=3; pairs: abc→{ab,bc}×2, ab→{ab}×1, a→none
    val got = TextAnalysis.bpePairStats(docs, "text", topK = 10)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("ab", 3L), ("bc", 2L)))
  }

  test("buildVocab: minCount threshold, frequency-ranked contiguous ids, token tiebreak") {
    val docs = Seq(
      (1L, "aa bb aa cc"), (2L, "aa bb dd"), (3L, "aa bb cc")).toDF("doc_id", "text")
    // counts: aa=4, bb=3, cc=2, dd=1
    val got = TextAnalysis.buildVocab(docs, "text", minCount = 2L)
      .select("token", "cnt", "token_id").as[(String, Long, Int)]
      .collect().sortBy(_._3).toSeq
    assert(got == Seq(("aa", 4L, 0), ("bb", 3L, 1), ("cc", 2L, 2)),
      "dd below minCount; ids contiguous from 0 in (cnt desc, token) order")
    // tie: equal counts rank by token
    val tied = Seq((1L, "xx yy"), (2L, "yy xx")).toDF("doc_id", "text")
    val ids = TextAnalysis.buildVocab(tied, "text", minCount = 1L)
      .select("token", "token_id").as[(String, Int)].collect().toMap
    assert(ids == Map("xx" -> 0, "yy" -> 1))
  }

  test("ngramNovelty: exact unseen counts, short-doc spine rows, occurrence grain") {
    val ref = Seq((10L, "a b c d")).toDF("doc_id", "text") // bigrams: ab bc cd
    val scored = Seq(
      (1L, "a b c"),     // ab bc -> 0 unseen
      (2L, "a b x y"),   // ab bx xy -> 2 unseen
      (3L, "x y x y"),   // xy yx xy -> 3 unseen (occurrence grain: xy twice)
      (4L, "z")          // < n tokens -> spine row with zeros
    ).toDF("doc_id", "text")
    val got = TextAnalysis.ngramNovelty(scored, ref, "doc_id", "text", n = 2)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(1L -> ((2L, 0L)), 2L -> ((3L, 2L)),
      3L -> ((3L, 3L)), 4L -> ((0L, 0L))))
  }

  test("invertedIndex: canonical postings, 0-based positions, df window") {
    val docs = Seq(
      (2L, "b a b"), (1L, "a c"), (3L, "c c")).toDF("doc_id", "text")
    // a: docs {1,2}; b: {2}; c: {1,3}
    val got = TextAnalysis.invertedIndex(docs.repartition(3), "doc_id", "text",
        minDf = 2L, maxDf = 2L)
      .as[(String, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet == Set("a", "c"), "df=1 token b is capped out")
    assert(got("a") == (("a", 2L, 2L, "1:0,2:1")))
    assert(got("c") == (("c", 2L, 3L, "1:1,3:0,3:1")))
  }

  test("lmQualityScore: add-one ppm arithmetic, OOV floor, short docs drop") {
    // ref "a b a b": c1(a)=2, c1(b)=2, V=2; c2(a,b)=2, c2(b,a)=1
    val ref = Seq("a b a b").toDF("text")
    val docs = Seq(
      (1L, "a b"),   // 1 pair (a,b): (2+1)*1e6 DIV (2+2) = 750000
      (2L, "b a"),   // 1 pair (b,a): (1+1)*1e6 DIV (2+2) = 500000
      (3L, "x y x"), // OOV: every pair at the floor 1e6 DIV (0+2)
      (4L, "a"),     // <2 tokens: no pairs, no row
      (5L, ""))      // empty: no row
      .toDF("doc_id", "text")
    val got = TextAnalysis
      .lmQualityScore(ref, docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got.keySet == Set(1L, 2L, 3L), "pairless docs must drop")
    assert(got(1L) == ((1L, 750000L, 0L, "ok")))
    assert(got(2L) == ((1L, 500000L, 0L, "ok")),
      "a SEEN low-probability bigram is in-domain, not OOV")
    assert(got(3L) == ((2L, 500000L, 1000000L, "low")),
      "fully-OOV text: smoothing floor 10^6/|V| and total unseen share")
  }

  test("lmQualityScore: model side never broadcasts (web-scale bigram table)") {
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    val ref = Seq("a b c a b", "b c a").toDF("text")
    val docs = Seq((1L, "a b c"), (2L, "c a b")).toDF("doc_id", "text")
    // the PageRankSpec probe convention: AQE + auto-broadcast off, so
    // the plan shows what the shape REQUIRES, not what a tiny test
    // relation legitimately earns
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = TextAnalysis.lmQualityScore(ref, docs, "doc_id", "text")
        .queryExecution.executedPlan
      val bcasts = plan.collect { case b: BroadcastExchangeExec => b }
      assert(bcasts.nonEmpty, "the 1-row vocab count should broadcast")
      bcasts.foreach { b =>
        assert(b.collect { case a: BaseAggregateExec => a }.nonEmpty,
          s"a broadcast subtree without an aggregate beneath it — the " +
            s"bigram model is being broadcast:\n$b")
      }
      // non-vacuity: broadcasting the raw model table fails the assert
      val badB = docs.crossJoin(broadcast(ref))
        .queryExecution.executedPlan
        .collect { case b: BroadcastExchangeExec => b }
      assert(badB.exists(_.collect { case a: BaseAggregateExec => a }.isEmpty),
        "probe shape: a raw-relation broadcast must be detectable")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("gopherQualityFlags: rule precedence, inclusive len bound, strict ppm bounds, degenerate text") {
    def v(rows: (Long, String)*) =
      TextAnalysis.gopherQualityFlags(
        rows.toSeq.toDF("id", "text"), "id", "text", minWords = 5L)
        .select(col("id"), col("verdict"))
        .as[(Long, String)].collect().toMap
    val fifty = Seq.fill(48)("word").mkString(" ") + " the and"
    val got = v(
      (1L, fifty),
      (2L, "too few the and"),
      // mean 15 chars/word
      (3L, Seq.fill(48)("abcdefghijklmno").mkString(" ") + " the and"),
      // '#' in >10% of words; mean len stays in range
      (4L, Seq.fill(24)("wordy #").mkString(" ") + " the and"),
      // 10 of 11 lines bulleted > 0.9
      (5L, ("intro line with the and words here okay fine" +:
        Seq.fill(10)("- item alpha beta")).mkString("\n")),
      // 9 of 10 bulleted == 0.9 exactly: strict >, stays keep
      (6L, ("intro line with the and words here okay fine" +:
        Seq.fill(9)("- item alpha beta")).mkString("\n")),
      // 2 of 5 lines end '...' > 0.3
      (7L, (Seq.fill(3)("plain words the and here") ++
        Seq.fill(2)("going on...")).mkString("\n")),
      // digits-only words: alpha fraction 2/26 < 0.8
      (8L, Seq.fill(24)("1234").mkString(" ") + " the and"),
      (9L, Seq.fill(24)("word").mkString(" ")),
      (10L, ""),
      (11L, null))
    assert(got(1L) == "keep", s"clean doc: ${got(1L)}")
    assert(got(2L) == "word_count")
    assert(got(3L) == "word_len")
    assert(got(4L) == "symbol", s"symbol beats alpha in precedence: ${got(4L)}")
    assert(got(5L) == "bullet")
    assert(got(6L) == "keep", s"bullet bound is strict: ${got(6L)}")
    assert(got(7L) == "ellipsis")
    assert(got(8L) == "alpha")
    assert(got(9L) == "stopword")
    assert(got(10L) == "word_count", "empty text routes word_count")
    assert(got(11L) == "word_count", "null text routes word_count")
    // exact mean bound: 5 two-char words -> 200 < 300 fails; 5
    // three-char words -> exactly 300 passes (inclusive)
    val bounds = v((20L, "ab ab ab ab ab"), (21L, "the and the and the"))
    assert(bounds(20L) == "word_len")
    assert(bounds(21L) == "keep", s"mean exactly 300 is in range: ${bounds(21L)}")
  }

  test("scriptProfile: declaration-order ties, none on zero letters, strict mixed bound, common chars count nowhere") {
    val rows = Seq(
      (1L, "plain latin words only"),
      (2L, "мира мира word"),            // cyr 8, lat 4: 333333 > 200000
      (3L, "мира мира мира мира word"),  // cyr 16, lat 4: exactly 200000
      (4L, "word мира"),                 // exact 4-4 tie -> latin wins
      (5L, "1234 #!%"),                  // no letters
      (6L, "漢字 ひら カタ"),             // all three cjk blocks
      (7L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val got = TextAnalysis.scriptProfile(rows, "id", "text")
      .select(col("id"), col("dominant"), col("second_ppm"), col("mixed"))
      .as[(Long, String, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == (("latin", 0L, false)))
    assert(got(2L) == (("cyrillic", 333333L, true)))
    assert(got(3L) == (("cyrillic", 200000L, false)),
      s"200000 exactly is NOT mixed (strict bound): ${got(3L)}")
    assert(got(4L) == (("latin", 500000L, true)),
      s"exact tie resolves in declaration order: ${got(4L)}")
    assert(got(5L) == (("none", 0L, false)))
    assert(got(6L)._1 == "cjk")
    assert(got(7L) == (("none", 0L, false)), "null text routes none")
    // digits/punct are script Common: n_letters counts none of them
    val counts = TextAnalysis.scriptProfile(
      Seq((1L, "ab12!?cd")).toDF("id", "text"), "id", "text")
      .select(col("latin"), col("n_letters"), col("other"))
      .as[(Long, Long, Long)].collect().head
    assert(counts == ((4L, 4L, 0L)), s"common chars counted: $counts")
    // script-scoped NON-letters (Cyrillic titlo U+0483 is Mn, not L):
    // class counts stay subsets of n_letters, `other` never negative
    val marks = TextAnalysis.scriptProfile(
      Seq((1L, "҃҃"), (2L, "ж҃")).toDF("id", "text"),
      "id", "text")
      .select(col("id"), col("cyrillic"), col("n_letters"), col("other"),
        col("dominant"))
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(marks(1L) == ((0L, 0L, 0L, "none")),
      s"marks-only text has no letters: ${marks(1L)}")
    assert(marks(2L) == ((1L, 1L, 0L, "cyrillic")),
      s"the mark must not double-count: ${marks(2L)}")
  }

  test("repetitionFlags: rule precedence, line-scoped grams, strict top-2gram bound, degenerate text") {
    def v(rows: (Long, String)*) =
      TextAnalysis.repetitionFlags(rows.toSeq.toDF("id", "text"),
        "id", "text")
        .select(col("id"), col("verdict"))
        .as[(Long, String)].collect().toMap
    val sharedMid = "w900 w901 w902 w903 w904 w905 w906 w907"
    val got = v(
      // 2 dup occurrences of 4 lines > 0.3
      (1L, "line one a\nline two b\nline one a\nline one a"),
      // 2 distinct 3-line paras + 3 copies of a 1-line para:
      // paras 2/5 = 400000 fires; lines 2/9 = 222222 passes the
      // dup_line gate AND the char gate never fires first because
      // dup_para precedes it in paper order
      (2L, Seq(
        "pa a1 b1 c1 d1\npa a2 b2 c2 d2\npa a3 b3 c3 d3",
        "pb a4 b4 c4 d4\npb a5 b5 c5 d5\npb a6 b6 c6 d6",
        "zz yy", "zz yy", "zz yy").mkString("\n\n")),
      // one line, (aa,bb) 3x: coverage 12 of 20 chars = 600000
      (3L, "aa bb x1 x2 aa bb x3 x4 aa bb"),
      // shared 8-word mid phrase, distinct ends: top2 = 2*8/80
      // = 200000 EXACTLY (strict bound passes) then 4 shared
      // 5-grams x2 of 12 = 666666 fires dup_5gram
      (4L, s"y000 $sharedMid y001\ny002 $sharedMid y003"),
      (5L, ""),
      (6L, null),
      (7L, "hello"),
      // same bigram twice but on DIFFERENT lines with nothing else
      // shared: grams are line-scoped so (qq,rr) counts 2: coverage
      // 2*4=8 of 12 chars = 666666 -> top_2gram (and NOT dup_line:
      // lines differ by the third word)
      (8L, "qq rr s1\nqq rr s2"))
    assert(got(1L) == "dup_line")
    assert(got(2L) == "dup_para", s"para precedence: ${got(2L)}")
    assert(got(3L) == "top_2gram")
    assert(got(4L) == "dup_5gram",
      s"top2 exactly 200000 is strict-pass: ${got(4L)}")
    assert(got(5L) == "keep", "empty text keeps (emptiness is q258's rule)")
    assert(got(6L) == "keep")
    assert(got(7L) == "keep", "no grams, no lines repeated")
    assert(got(8L) == "top_2gram", s"line-scoped bigram count: ${got(8L)}")
    // metric spot-check: doc 1 has 4 lines, 2 dup occurrences
    val m = TextAnalysis.repetitionFlags(
      Seq((1L, "line one a\nline two b\nline one a\nline one a"))
        .toDF("id", "text"), "id", "text")
      .select(col("n_lines"), col("dup_line_ppm"), col("dup_line_char_ppm"))
      .as[(Long, Long, Long)].collect().head
    assert(m == ((4L, 500000L, 500000L)), s"metrics: $m")
  }

  test("packMaskSpans: straddle spans, head/tail flags, coverage invariants") {
    val df = Seq(
      // part 0, budget 10: docs 7, 8, 4 -> offsets 0, 7, 15
      (1L, 0L, 7L), (2L, 0L, 8L), (3L, 0L, 4L),
      (4L, 1L, 25L)) // one doc spanning chunks 0..2 alone
      .toDF("id", "part", "n_tok")
    val got = TextAnalysis.packMaskSpans(df, "part", "id", col("n_tok"), 10L)
      .select(col("part"), col("id"), col("chunk"), col("span_start"),
        col("span_len"), col("is_head"), col("is_tail"))
      .as[(Long, Long, Long, Long, Long, Boolean, Boolean)].collect()
      .sortBy(r => (r._1, r._2, r._3))
    assert(got.toSeq == Seq(
      (0L, 1L, 0L, 0L, 7L, true, true),
      (0L, 2L, 0L, 7L, 3L, true, false),  // head half of the straddler
      (0L, 2L, 1L, 0L, 5L, false, true),  // tail half
      (0L, 3L, 1L, 5L, 4L, true, true),
      (1L, 4L, 0L, 0L, 10L, true, false),
      (1L, 4L, 1L, 0L, 10L, false, false), // interior chunk: neither flag
      (1L, 4L, 2L, 0L, 5L, false, true)), s"${got.toSeq}")
    // invariant: spans per doc sum to n_tok
    val perDoc = got.groupBy(_._2).view.mapValues(_.map(_._5).sum).toMap
    assert(perDoc == Map(1L -> 7L, 2L -> 8L, 3L -> 4L, 4L -> 25L))
  }

  test("c4Rules: line retention, trim, page precedence, classify-every-input") {
    val rows = Seq(
      // all three terminal puncts + a quoted line survive
      (1L, "one two three.\nfour five six!\nseven eight nine?\nsaid \"ten eleven twelve.\""),
      // CRLF + padded lines: trim before the punct rule; exactly 3 words kept
      (2L, "  one two three. \r\nfour five six!\r\nseven eight nine?"),
      // drops: no terminal punct / <3 words / javascript (case-insens)
      (3L, "one two three.\nno punct here\ntwo words.\nenable JavaScript support now.\nfour five six!\nseven eight nine?"),
      // page rules on RAW text: badword beats lorem beats brace
      (4L, "one two three.\nfour five six!\nseven eight nine?\nBadword1 lorem ipsum { x."),
      (5L, "one two three.\nfour five six!\nseven eight nine?\nlorem ipsum dolor { sit."),
      (6L, "one two three.\nfour five six!\nseven eight nine?\nvar x = { 1 };"),
      // too few kept lines
      (7L, "one two three.\nfour five six!"),
      (8L, ""),
      (9L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val got = TextAnalysis.c4Rules(rows, "id", "text")
      .select(col("id"), col("n_lines_in"), col("n_lines_kept"),
        col("clean_text"), col("verdict"))
      .as[(Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) == ((4L, 4L,
      "one two three.\nfour five six!\nseven eight nine?\nsaid \"ten eleven twelve.\"",
      "keep")), s"terminal puncts: ${got(1L)}")
    assert(got(2L) == ((3L, 3L,
      "one two three.\nfour five six!\nseven eight nine?", "keep")),
      s"CRLF trim: ${got(2L)}")
    assert(got(3L) == ((6L, 3L,
      "one two three.\nfour five six!\nseven eight nine?", "keep")),
      s"line drops: ${got(3L)}")
    assert(got(4L)._4 == "badword", s"badword first: ${got(4L)}")
    assert(got(5L)._4 == "lorem", s"lorem beats brace: ${got(5L)}")
    assert(got(6L)._4 == "brace")
    // page-rule pages still emit their would-be clean_text
    assert(got(6L)._2 == 3L && got(6L)._3.endsWith("nine?"), s"audit text: ${got(6L)}")
    assert(got(7L) == ((2L, 2L, "one two three.\nfour five six!",
      "few_lines")))
    assert(got(8L) == ((1L, 0L, "", "few_lines")), "empty text: 1 raw line, 0 kept")
    assert(got(9L) == ((1L, 0L, "", "few_lines")), "null text routes like empty")
    // every input classified exactly once
    assert(got.size == 9)
  }

  test("encodingDamage: verdict precedence, benign accents never fire, exact ppm") {
    import graft.ext.TextAnalysis
    val rows = Seq(
      (0L, "plain clean ascii text here"),
      (1L, "damaged caf\uFFFD here"),                       // 1 FFFD / 19 chars
      (2L, "caf\u00C3\u00A9 r\u00C3\u00A9sum\u00C3\u00A9"),  // 3 moji pairs
      (3L, "ctl x\u0080y\u0099z"),                          // 2 C1
      (4L, "caf\u00E9 r\u00E9sum\u00E9 \u00C3 ok"),         // benign: bare \u00C3 + space
      (5L, "caf\uFFFD and caf\u00C3\u00A9 caf\u00C3\u00A9")  // FFFD wins over pairs
    ).toDF("id", "text")
    val got = TextAnalysis.encodingDamage(rows, "id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getString(5)))).toMap
    assert(got(0L)._5 == "clean")
    assert(got(1L)._5 == "replacement_damage")
    // exact integer ppm: 1 FFFD over the arm's char count
    assert(got(1L)._2 == 1000000L / got(1L)._1)
    assert(got(2L) == ((14L, 0L, 3L, 0L, "double_encoded")))
    assert(got(3L)._5 == "c1_controls" && got(3L)._4 >= 1000L)
    assert(got(4L)._5 == "clean", s"benign accents fired: ${got(4L)}")
    assert(got(4L)._3 == 0L, "bare \u00C3 before space is not a pair")
    assert(got(5L)._5 == "replacement_damage", "FFFD precedence over pairs")
    // null text is total: 0 chars, clean
    val n = TextAnalysis.encodingDamage(
      Seq((9L, null: String)).toDF("id", "text"), "id", "text").collect()(0)
    assert(n.getLong(1) == 0L && n.getString(5) == "clean")
  }

  test("contentDefinedChunks: edit locality -- an insertion perturbs " +
      "only its chunk, while fixed-size chunking shifts every " +
      "downstream chunk") {
    import org.apache.spark.sql.DataFrame
    // ~400 distinct tokens -> several content-defined boundaries
    val words = (0 until 400).map(i => s"w$i")
    val orig = words.mkString(" ")
    val edited = (words.take(200) ++ Seq("inserted") ++ words.drop(200))
      .mkString(" ")
    def cdcFps(text: String): Seq[Long] =
      TextAnalysis.contentDefinedChunks(
          Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", 6)
        .orderBy("chunk_idx").select("chunk_fp").as[Long].collect().toSeq
    val a = cdcFps(orig)
    val b = cdcFps(edited)
    assert(a.length >= 3, s"need several chunks, got ${a.length}")
    // multiset symmetric difference: at most the edited chunk (and a
    // possible boundary split) on each side
    def bag(xs: Seq[Long]) = xs.groupBy(identity).view.mapValues(_.size).toMap
    val (ba, bb) = (bag(a), bag(b))
    val lost = ba.map { case (k, n) => math.max(0, n - bb.getOrElse(k, 0)) }.sum
    val gained = bb.map { case (k, n) => math.max(0, n - ba.getOrElse(k, 0)) }.sum
    assert(lost >= 1, "the edit must be visible in some chunk")
    assert(lost <= 2 && gained <= 2,
      s"CDC must localize the edit: lost=$lost gained=$gained of ${a.length}")
    // the fixed-size strawman on the same texts: position-based cuts
    // shift every chunk after the insertion point
    def fixedFps(text: String): Seq[Long] = {
      val df = Seq((1L, text)).toDF("doc_id", "text")
        .select(posexplode(TextAnalysis.tokens(col("text"))).as(Seq("p", "t")))
        .select(expr("CAST(p DIV 64 AS BIGINT)").as("c"), col("p"),
          conv(substring(md5(col("t")), 1, 12), 16, 10).cast("long").as("h"))
        .groupBy("c")
        .agg(aggregate(
          transform(array_sort(collect_list(struct(col("p"), col("h")))),
            x => x.getField("h")),
          lit(0L),
          (acc, h) => (acc * TextAnalysis.RollBase + h) % TextAnalysis.RollMod)
          .as("fp"))
      df.orderBy("c").select("fp").as[Long].collect().toSeq
    }
    val fa = fixedFps(orig)
    val fb = fixedFps(edited)
    val fixedShared = fa.intersect(fb).size
    val cdcShared = a.intersect(b).size
    assert(fixedShared < cdcShared,
      s"fixed-size must lose more chunks to the shift: " +
        s"fixed keeps $fixedShared of ${fa.length}, cdc keeps " +
        s"$cdcShared of ${a.length}")
  }
}
