package graft.plans

import java.nio.ByteBuffer
import java.nio.charset.{CharacterCodingException, Charset, CodingErrorAction}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Charset transcoding to UTF-8 — the step between Content-Encoding
  * inflate ([[Inflate]]) and the tokenizer: a large minority of the
  * web is not UTF-8 (windows-1252 at minimum; Shift_JIS/EUC-JP for
  * ja, windows-1251/KOI8-R for ru, GBK/Big5 for zh), and bytes fed
  * straight to a UTF-8 consumer garble into mojibake that no
  * downstream gate can undo. Spark's own `decode()` restricts the
  * charset argument to the UTF family + latin-1, so the legacy-web
  * set needs a custom expression.
  *
  * CONTRACT:
  *  - The charset name is resolved against a fixed ALLOWLIST of
  *    lowercase names/aliases ([[Transcode.Charsets]]) — never a raw
  *    `Charset.forName` on attacker-controlled tokens (no provider
  *    lookup surface, deterministic across JVMs). Unknown / absent
  *    names return NULL — the `bad_charset` quarantine route.
  *  - STRICT mode (`lenient = false`, the default): any malformed or
  *    unmappable byte sequence returns NULL (CodingErrorAction
  *    .REPORT) — a WRONG charset declaration routes rather than
  *    silently garbling (the inflate discipline: route, never
  *    damage).
  *  - LENIENT mode (`lenient = true`): malformed input decodes to
  *    U+FFFD REPLACEMENT CHARACTER (what browsers do) — the input
  *    the mojibake/encoding-damage gate downstream is designed to
  *    catch. The two modes are the mechanism/policy split: strict
  *    for declared charsets (trust but verify), lenient for the
  *    fallback leg where SOME text must come out.
  *
  * [[EncodeCharset]] is the fixture/probe-side inverse (the q241
  * inversion discipline — certified queries author non-UTF-8 bytes
  * in-plan from known text; the oracle only sees the round trip).
  * Unmappable characters return NULL (REPORT), so a fixture asking
  * for € in iso-8859-1 fails loudly instead of minting a '?'.
  *
  * 100-TB shape: pure per-row projections, codegen'd via the
  * reference-object pattern; no shuffle, nothing collected.
  */
object Transcode {

  /** The allowlist: lowercase token → JDK charset. WHATWG-style
    * label folding for the common aliases; shift_jis maps to
    * windows-31j (CP932) per the WHATWG encoding standard — the
    * superset real ja web content actually uses.
    */
  val Charsets: Map[String, Charset] = {
    def c(n: String) = Charset.forName(n)
    val utf8 = c("UTF-8")
    val l1 = c("ISO-8859-1")
    val w1252 = c("windows-1252")
    val sjis = c("windows-31j")
    Map(
      "utf-8" -> utf8, "utf8" -> utf8,
      "us-ascii" -> c("US-ASCII"), "ascii" -> c("US-ASCII"),
      "iso-8859-1" -> l1, "iso8859-1" -> l1, "latin-1" -> l1,
      "latin1" -> l1, "l1" -> l1,
      "windows-1252" -> w1252, "cp1252" -> w1252, "cp-1252" -> w1252,
      "x-cp1252" -> w1252,
      "iso-8859-2" -> c("ISO-8859-2"), "latin2" -> c("ISO-8859-2"),
      "iso-8859-15" -> c("ISO-8859-15"), "latin9" -> c("ISO-8859-15"),
      "windows-1251" -> c("windows-1251"), "cp1251" -> c("windows-1251"),
      "koi8-r" -> c("KOI8-R"), "koi8" -> c("KOI8-R"),
      "shift_jis" -> sjis, "shift-jis" -> sjis, "sjis" -> sjis,
      "ms_kanji" -> sjis, "windows-31j" -> sjis, "cp932" -> sjis,
      "euc-jp" -> c("EUC-JP"),
      "gbk" -> c("GBK"), "gb2312" -> c("GBK"), "cp936" -> c("GBK"),
      "big5" -> c("Big5"),
      "utf-16be" -> c("UTF-16BE"), "utf-16le" -> c("UTF-16LE"),
      // round 16: the fixed-endian UTF-32 pair (no BOM handling at
      // this layer — FetchDecode strips the 4-byte BOMs itself, and
      // the JDK's UTF-32LE/BE charsets neither expect nor emit one)
      "utf-32le" -> c("UTF-32LE"), "utf-32be" -> c("UTF-32BE"))
  }

  // Locale.ROOT, not the default locale: on a Turkish/Azeri JVM the
  // default fold turns every 'I' (ISO-8859-1, SHIFT_JIS, ASCII …)
  // into dotless ı and misses the allowlist (round-15 review fix —
  // the q236-era locale-portability discipline).
  private def resolve(name: UTF8String): Charset =
    if (name == null) null
    else Charsets.getOrElse(
      name.toString.trim.toLowerCase(java.util.Locale.ROOT), null)

  /** Decode `bytes` as `charsetName` into UTF-8; null per contract. */
  def toUtf8(bytes: Array[Byte], charsetName: UTF8String,
      lenient: Boolean): UTF8String = {
    val cs = resolve(charsetName)
    if (cs == null || bytes == null) return null
    val dec = cs.newDecoder()
    if (lenient) {
      dec.onMalformedInput(CodingErrorAction.REPLACE)
        .onUnmappableCharacter(CodingErrorAction.REPLACE)
    } else {
      dec.onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
    }
    try UTF8String.fromString(dec.decode(ByteBuffer.wrap(bytes)).toString)
    catch { case _: CharacterCodingException => null }
  }

  /** Encode UTF-8 `text` into `charsetName` bytes; null per contract
    * (fixture/probe side).
    */
  def fromUtf8(text: UTF8String, charsetName: UTF8String): Array[Byte] = {
    val cs = resolve(charsetName)
    if (cs == null || text == null) return null
    val enc = cs.newEncoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try {
      val bb = enc.encode(java.nio.CharBuffer.wrap(text.toString))
      val r = new Array[Byte](bb.remaining())
      bb.get(r)
      r
    } catch { case _: CharacterCodingException => null }
  }

  private def shimCol(e: Expression): Column =
    org.apache.spark.sql.graft.GraftSqlShim.column(e)
  private def shimExpr(c: Column): Expression =
    org.apache.spark.sql.graft.GraftSqlShim.expression(c)

  /** Strict decode: NULL on unknown charset / malformed bytes. */
  def toUtf8(bytes: Column, charset: Column): Column =
    shimCol(TranscodeUtf8(shimExpr(bytes), shimExpr(charset),
      lenient = false))

  /** Lenient decode: malformed bytes become U+FFFD (browser rule). */
  def toUtf8Lenient(bytes: Column, charset: Column): Column =
    shimCol(TranscodeUtf8(shimExpr(bytes), shimExpr(charset),
      lenient = true))

  /** Fixture/probe-side encoder. */
  def encode(text: Column, charset: Column): Column =
    shimCol(EncodeCharset(shimExpr(text), shimExpr(charset)))
}

/** Allowlisted charset decode to UTF-8 — contract in [[Transcode]].
  * Nullable BY DESIGN: NULL is the `bad_charset` route.
  */
case class TranscodeUtf8(left: Expression, right: Expression,
    lenient: Boolean) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, string), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "transcode_utf8"

  override protected def nullSafeEval(b: Any, cs: Any): Any =
    Transcode.toUtf8(b.asInstanceOf[Array[Byte]],
      cs.asInstanceOf[UTF8String], lenient)

  def doDecode(b: Array[Byte], cs: UTF8String): UTF8String =
    Transcode.toUtf8(b, cs, lenient)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tc", this, classOf[TranscodeUtf8].getName)
    nullSafeCodeGen(ctx, ev, (b, cs) =>
      s"""
         |${ev.value} = $ref.doDecode($b, $cs);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fixture/probe-side charset encoder — contract in [[Transcode]]. */
case class EncodeCharset(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "encode_charset"

  override protected def nullSafeEval(t: Any, cs: Any): Any =
    Transcode.fromUtf8(t.asInstanceOf[UTF8String],
      cs.asInstanceOf[UTF8String])

  def doEncode(t: UTF8String, cs: UTF8String): Array[Byte] =
    Transcode.fromUtf8(t, cs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("enc", this, classOf[EncodeCharset].getName)
    nullSafeCodeGen(ctx, ev, (t, cs) =>
      s"""
         |${ev.value} = $ref.doEncode($t, $cs);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
