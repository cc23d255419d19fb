package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.Transcode

/** Charset transcode: per-charset round trips, the strict-vs-lenient
  * policy split, the allowlist gate, and unmappable-character
  * routing. Non-ASCII is spelled in \uXXXX escapes (the repo rule \u2014
  * typed glyphs are editor-fragile).
  */
class TranscodeSpec extends SparkSpec {
  import spark.implicits._

  private def u(s: String) = UTF8String.fromString(s)
  private def rt(text: String, cs: String): String = {
    val b = Transcode.fromUtf8(u(text), u(cs))
    assert(b != null, s"encode failed for $cs")
    Transcode.toUtf8(b, u(cs), lenient = false).toString
  }

  test("round trips per charset, unit level") {
    val eAcute = "caf\u00E9 r\u00E9sum\u00E9"
    assert(rt(eAcute, "windows-1252") == eAcute)
    assert(rt(eAcute, "iso-8859-1") == eAcute)
    assert(rt(eAcute, "latin1") == eAcute) // alias folding
    // \u20AC is 0x80 in cp1252 and UNMAPPABLE in latin-1
    assert(Transcode.fromUtf8(u("\u20AC5"), u("windows-1252")) != null)
    assert(Transcode.fromUtf8(u("\u20AC5"), u("iso-8859-1")) == null)
    val kana = "\u30AB\u30D5\u30A7\u3067\u4F1A\u3046" // \u30AB\u30D5\u30A7\u3067\u4F1A\u3046
    assert(rt(kana, "shift_jis") == kana)
    assert(rt(kana, "euc-jp") == kana)
    val ru = "\u043F\u0440\u0438\u0432\u0435\u0442" // \u043F\u0440\u0438\u0432\u0435\u0442
    assert(rt(ru, "windows-1251") == ru)
    assert(rt(ru, "koi8-r") == ru)
    assert(rt("\u4F60\u597D\u4E16\u754C", "gbk") == "\u4F60\u597D\u4E16\u754C")
    assert(rt("\u4F60\u597D", "big5") == "\u4F60\u597D")
    // round 16: the fixed-endian UTF-32 pair \u2014 BOM-less at this
    // layer (FetchDecode owns BOM stripping), astral chars exact
    val astral = "caf\u00E9 \uD83D\uDE00!" // \u00E9 + U+1F600
    assert(rt(astral, "utf-32le") == astral)
    assert(rt(astral, "utf-32be") == astral)
    // known byte layout: 'A' = 41 00 00 00 LE / 00 00 00 41 BE,
    // and the encoders write NO BOM
    assert(Transcode.fromUtf8(u("A"), u("utf-32le"))
      .sameElements(Array[Byte](0x41, 0, 0, 0)))
    assert(Transcode.fromUtf8(u("A"), u("utf-32be"))
      .sameElements(Array[Byte](0, 0, 0, 0x41)))
  }

  test("the known byte values, not just round trips") {
    // \u00E9 is 0xE9 in both latin-1 and cp1252; \u20AC is 0x80 in cp1252
    assert(Transcode.fromUtf8(u("\u00E9"), u("windows-1252"))
      .sameElements(Array(0xe9.toByte)))
    assert(Transcode.fromUtf8(u("\u20AC"), u("cp1252"))
      .sameElements(Array(0x80.toByte)))
    // and decoding 0x80 as latin-1 yields U+0080 (a C1 control), NOT \u20AC
    // \u2014 the cp1252-vs-latin1 distinction the mojibake gate feeds on
    assert(Transcode.toUtf8(Array(0x80.toByte), u("iso-8859-1"),
      lenient = false).toString == "\u0080")
  }

  test("strict routes NULL on malformed; lenient mints U+FFFD") {
    // a bare latin-1 \u00E9 is malformed UTF-8
    val bad = Array(0xe9.toByte, 0x20.toByte)
    assert(Transcode.toUtf8(bad, u("utf-8"), lenient = false) == null)
    assert(Transcode.toUtf8(bad, u("utf-8"), lenient = true)
      .toString == "\uFFFD ")
    // truncated Shift_JIS lead byte at end of input
    val sjBad = Array(0x83.toByte)
    assert(Transcode.toUtf8(sjBad, u("shift_jis"), lenient = false) == null)
  }

  test("allowlist gate: unknown charsets route NULL, never forName") {
    for (cs <- Seq("utf-7", "ebcdic", "x-evil-provider", "", "utf-8; q=1"))
      assert(Transcode.toUtf8("x".getBytes, u(cs), lenient = false) == null,
        cs)
    // case/whitespace folding does resolve
    assert(Transcode.toUtf8("x".getBytes, u("  UTF-8 "),
      lenient = false).toString == "x")
  }

  test("plan level: codegen'd round trip + null routes over the corpus") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"text")
    val planted = docs.select($"doc_id",
      concat($"text", lit(" caf\u00E9 \u00E9t\u00E9")).as("t"))
    val out = planted.select($"doc_id", $"t",
      Transcode.toUtf8(Transcode.encode($"t", lit("windows-1252")),
        lit("windows-1252")).as("rt_1252"),
      Transcode.toUtf8(Transcode.encode($"t", lit("nope")), lit("utf-8"))
        .as("bad_cs"))
    assert(out.filter($"rt_1252" =!= $"t").count() == 0)
    assert(out.filter($"bad_cs".isNotNull).count() == 0)
    assert(out.count() > 0)
  }
}
