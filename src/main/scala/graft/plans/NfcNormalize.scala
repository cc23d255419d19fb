package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (java.text.Normalizer) — the canonical-
  * composition pre-pass every dedup/fingerprint key needs on real web
  * text: "é" arrives both precomposed (U+00E9) and decomposed
  * (e+U+0301) from different editors/OSes, and exact/normalized
  * dedup silently misses the pair without it. Singleton compositions
  * fold too (U+2126 OHM SIGN → Ω, U+212B ANGSTROM SIGN → Å), and
  * conjoining Hangul jamo compose into syllables.
  *
  * ORACLE CONTRACT: JDK NFC == DuckDB `nfc_normalize` EXACTLY —
  * verified by exhaustive per-codepoint diff over planes 0-2 in both
  * singleton and base+mark pair contexts, ZERO divergences (Unicode's
  * normalization stability policy at work — unlike case mapping,
  * where the same diff found 71; see BASELINE.md round 14). The
  * oracle mirror is plain `nfc_normalize(x)`.
  *
  * Fast paths: full-ASCII bytes are NFC by construction (returned
  * as-is, no decode); otherwise `Normalizer.isNormalized` (the
  * NFC_QC quick-check) skips the rebuild for already-normalized text
  * — the overwhelmingly common case. Null input yields '' (the
  * coalesce posture of the text family), so the column is
  * non-nullable and total.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = NfcNormalize.fnName

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) NfcNormalize.Empty
    else NfcNormalize.nfc(v.asInstanceOf[UTF8String])
  }

  def doNfc(s: UTF8String): UTF8String = NfcNormalize.nfc(s)
  def empty(): UTF8String = NfcNormalize.Empty

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    val ref = ctx.addReferenceObj("nfc", this, classOf[NfcNormalize].getName)
    val resultCode =
      code"""
        ${childGen.code}
        org.apache.spark.unsafe.types.UTF8String ${ev.value} =
          ${childGen.isNull} ? $ref.empty() : $ref.doNfc(${childGen.value});
      """
    ev.copy(code = resultCode,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  val fnName = "nfc_normalize"

  val Empty: UTF8String = UTF8String.EMPTY_UTF8

  def nfc(s: UTF8String): UTF8String = {
    if (s.numBytes() == 0 || s.isFullAscii()) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Registry-free Column entry (the [[UnicodeTokens]] pattern). */
  def of(text: Column): Column =
    org.apache.spark.sql.graft.GraftSqlShim.column(
      NfcNormalize(org.apache.spark.sql.graft.GraftSqlShim.expression(text)))
}
