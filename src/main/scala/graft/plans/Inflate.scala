package graft.plans

import java.util.zip.{CRC32, DataFormatException, Deflater, Inflater}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Bounded Content-Encoding inflate (RFC 1952 gzip / RFC 1950 zlib /
  * RFC 1951 raw deflate) — the step the fetch-side family punted
  * upstream until now ([[graft.ext.WarcRecord]] declared
  * "decompression is upstream"; on real Common Crawl that upstream
  * does not exist — response payloads are overwhelmingly gzip).
  *
  * HOSTILE-INPUT CONTRACT (the q241 decodeChunked discipline — route,
  * never truncate): the expression returns NULL, not a prefix, for
  *  - framing violations: bad gzip magic/CM, a reserved FLG bit, a
  *    header field overrunning the input, a truncated deflate stream;
  *  - integrity violations: gzip CRC32 or ISIZE mismatch, corrupt
  *    deflate data ([[DataFormatException]]);
  *  - trailing garbage: bytes after the stream end that are not
  *    another well-formed gzip member (multi-member concatenation is
  *    legal per RFC 1952 §2.2 and is decoded; arbitrary tails are a
  *    framing violation — stricter than the JDK's GZIPInputStream,
  *    which silently ignores them);
  *  - decompression bombs: inflated size exceeding `maxBytes` stops
  *    the inflate loop at the cap and returns NULL — a 4 GB bomb
  *    costs one 8 KiB buffer round past the cap, never the bomb.
  * A NULL result is the `bad_encoding` quarantine route downstream
  * ([[graft.ext.FetchDecode]]); '' inflates to '' (empty is valid).
  *
  * The `deflate` format sniffs zlib vs raw per the de-facto HTTP
  * client rule (RFC 9110 §8.4.1.2 defines "deflate" as zlib, but a
  * long tail of servers ships raw deflate): first byte CMF with
  * CM==8, window ≤ 32K, and (CMF·256+FLG) ≡ 0 mod 31 → zlib, else
  * raw. The sniff cannot misfire on raw streams that happen to look
  * like zlib headers AND fail: a zlib parse error on a sniffed-zlib
  * stream returns NULL rather than retrying raw (one total decision
  * per input — decision tables, not fallback chains).
  *
  * [[DeflateCompress]] is the fixture/probe-side INVERSE — needed
  * because the certified queries author compressed arms in-plan (the
  * q241 chunkedFrame pattern: the oracle never sees the bytes, only
  * the round-trip against the original text). Deterministic by
  * construction: fixed Deflater level 6, default strategy, and a
  * hand-written 10-byte gzip header (MTIME=0, XFL=0, OS=255
  * "unknown" — RFC 1952 §2.3.1) so the bytes are identical across
  * runs and JVMs with the same zlib.
  *
  * 100-TB shape: pure per-row projections (codegen'd via the
  * reference-object call pattern, the [[NfcNormalize]] idiom); no
  * shuffle, nothing collected; memory bounded by `maxBytes` per row.
  */
object Inflate {
  /** Format tags (Int so the expression tree stays trivially
    * serializable and codegen embeds a constant).
    */
  val Gzip = 0
  val Zlib = 1
  val RawDeflate = 2
  /** HTTP `deflate`: zlib-vs-raw sniff, see scaladoc. */
  val DeflateSniff = 3
  /** RFC 8878 zstandard (`Content-Encoding: zstd`), via the zstd-jni
    * Spark itself bundles. Same hostile-input posture as gzip with
    * one zstd-specific caveat: frame CONCATENATION is legal (§3.1,
    * like gzip multi-member — decodes to the concatenation), trailing
    * garbage / truncation / bad magic all throw in libzstd and route
    * NULL, the inflate loop caps at `maxBytes` (bomb guard), but
    * INTEGRITY is only verified when a frame carries the optional
    * xxhash64 content checksum — a checksumless frame with flipped
    * payload bytes can decode to wrong bytes without error (zstd's
    * own design; gzip's CRC32 is mandatory). [[compress]] therefore
    * ALWAYS writes the checksum (4 bytes), so every fixture arm and
    * every archive this pipeline writes is integrity-checked on read.
    */
  val ZstdFmt = 4

  /** Default inflated-size cap: 64 MiB — far past any single web
    * document, small enough that one hostile row cannot destabilize
    * an executor. Callers size it per corpus.
    */
  val DefaultMaxBytes: Int = 64 * 1024 * 1024

  private val GzipHeader: Array[Byte] =
    Array(0x1f.toByte, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0xff.toByte)

  /** Deterministic compress (fixture/probe side). */
  def compress(data: Array[Byte], format: Int): Array[Byte] = {
    if (format == ZstdFmt) {
      // fixed level 3, content checksum ON (see [[ZstdFmt]]); byte-
      // deterministic for a fixed zstd-jni, like the gzip arm's fixed
      // Deflater level + hand-written header
      val ctx = new com.github.luben.zstd.ZstdCompressCtx()
      try {
        ctx.setLevel(3)
        ctx.setChecksum(true)
        return ctx.compress(data)
      } finally ctx.close()
    }
    val raw = format == Gzip || format == RawDeflate
    val d = new Deflater(6, raw)
    d.setInput(data)
    d.finish()
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 32)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    val body = out.toByteArray
    if (format != Gzip) body
    else {
      val crc = new CRC32
      crc.update(data)
      val r = new Array[Byte](10 + body.length + 8)
      System.arraycopy(GzipHeader, 0, r, 0, 10)
      System.arraycopy(body, 0, r, 10, body.length)
      val c = crc.getValue
      val n = data.length.toLong
      var i = 0
      while (i < 4) {
        r(10 + body.length + i) = ((c >>> (8 * i)) & 0xff).toByte
        r(14 + body.length + i) = ((n >>> (8 * i)) & 0xff).toByte
        i += 1
      }
      r
    }
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff

  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) |
      (u8(b, i + 3).toLong << 24)) & 0xffffffffL

  /** RFC 1952 §2.3 member header: returns the payload start offset,
    * or -1 for any violation (bad magic, CM != 8, a reserved FLG
    * bit, a field overrunning the input).
    */
  private def gzipHeaderEnd(b: Array[Byte], start: Int): Int = {
    if (start + 10 > b.length) return -1
    if (u8(b, start) != 0x1f || u8(b, start + 1) != 0x8b) return -1
    if (u8(b, start + 2) != 8) return -1
    val flg = u8(b, start + 3)
    if ((flg & 0xe0) != 0) return -1 // reserved bits must be zero
    var p = start + 10
    if ((flg & 4) != 0) { // FEXTRA: 2-byte LE length + payload
      if (p + 2 > b.length) return -1
      val xlen = u8(b, p) | (u8(b, p + 1) << 8)
      p += 2 + xlen
      if (p > b.length) return -1
    }
    if ((flg & 8) != 0) { // FNAME: NUL-terminated
      while (p < b.length && b(p) != 0) p += 1
      if (p >= b.length) return -1
      p += 1
    }
    if ((flg & 16) != 0) { // FCOMMENT: NUL-terminated
      while (p < b.length && b(p) != 0) p += 1
      if (p >= b.length) return -1
      p += 1
    }
    if ((flg & 2) != 0) { // FHCRC: 2-byte header CRC (not verified)
      p += 2
      if (p > b.length) return -1
    }
    p
  }

  /** One raw-deflate stream starting at `off`; appends to `out` up to
    * `maxBytes` TOTAL, updating `crc` (when non-null) with every
    * chunk AS IT IS WRITTEN — never by re-reading the output buffer
    * (a per-member `toByteArray` re-copy would make multi-member
    * inflate O(members × totalOutput): a ~1 MB input of one
    * near-cap member plus tens of thousands of empty members would
    * cost terabytes of memcpy — a CPU bomb the byte cap alone cannot
    * stop; round-15 review fix). Returns bytes of input consumed, or
    * -1 on corrupt/truncated data or cap overrun.
    */
  private def inflateRawInto(
      b: Array[Byte], off: Int, out: java.io.ByteArrayOutputStream,
      maxBytes: Int, zlibWrapped: Boolean, crc: CRC32 = null): Int = {
    val inf = new Inflater(!zlibWrapped)
    try {
      inf.setInput(b, off, b.length - off)
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        // zero output on an UNfinished stream with the input drained
        // (or a preset-dictionary ask): truncated / out of contract.
        // finished() must be checked first — a valid empty payload
        // finishes on the same call that returns n == 0.
        if (n == 0 && !inf.finished() &&
          (inf.needsInput() || inf.needsDictionary())) return -1
        out.write(buf, 0, n)
        if (crc != null) crc.update(buf, 0, n)
        if (out.size() > maxBytes) return -1
      }
      b.length - off - inf.getRemaining
    } catch {
      case _: DataFormatException => -1
    } finally inf.end()
  }

  /** The bounded inflate; NULL (Scala null) per the hostile-input
    * contract above.
    */
  def inflate(data: Array[Byte], format: Int, maxBytes: Int): Array[Byte] = {
    if (data == null) return null
    format match {
      case Gzip =>
        val out = new java.io.ByteArrayOutputStream(
          math.min(maxBytes.toLong, data.length * 3L + 64L).toInt)
        var p = 0
        var nMembers = 0
        while (p < data.length) { // multi-member loop (RFC 1952 §2.2)
          val payload = gzipHeaderEnd(data, p)
          if (payload < 0) return null
          val before = out.size()
          val crc = new CRC32 // updated in-stream, never by re-copy
          val used = inflateRawInto(data, payload, out, maxBytes,
            zlibWrapped = false, crc)
          if (used < 0) return null
          val trailer = payload + used
          if (trailer + 8 > data.length) return null
          if (le32(data, trailer) != crc.getValue) return null
          if (le32(data, trailer + 4) !=
            ((out.size() - before).toLong & 0xffffffffL)) return null
          p = trailer + 8
          nMembers += 1
        }
        if (nMembers == 0) null else out.toByteArray
      case Zlib | RawDeflate | DeflateSniff =>
        val zlib = format match {
          case Zlib => true
          case RawDeflate => false
          case _ => // the HTTP-deflate sniff (see scaladoc)
            data.length >= 2 && (u8(data, 0) & 0x0f) == 8 &&
              (u8(data, 0) >> 4) <= 7 &&
              (u8(data, 0) * 256 + u8(data, 1)) % 31 == 0
        }
        val out = new java.io.ByteArrayOutputStream(
          math.min(maxBytes.toLong, data.length * 3L + 64L).toInt)
        val used = inflateRawInto(data, 0, out, maxBytes, zlib)
        if (used < 0 || used != data.length) null // trailing garbage
        else out.toByteArray
      case ZstdFmt =>
        // no frame at all is a framing violation (mirrors gzip's
        // zero-member route); libzstd throws ZstdIOException for bad
        // magic, truncation, trailing garbage, and checksum mismatch
        if (data.length == 0) return null
        val z = new com.github.luben.zstd.ZstdInputStreamNoFinalizer(
          new java.io.ByteArrayInputStream(data))
        try {
          val out = new java.io.ByteArrayOutputStream(
            math.min(maxBytes.toLong, data.length * 3L + 64L).toInt)
          val buf = new Array[Byte](8192)
          var n = z.read(buf)
          while (n >= 0) {
            if (n > 0) {
              out.write(buf, 0, n)
              if (out.size() > maxBytes) return null // bomb cap
            }
            n = z.read(buf)
          }
          out.toByteArray
        } catch {
          case _: java.io.IOException => null
        } finally z.close()
      case other =>
        throw new IllegalArgumentException(s"bad inflate format: $other")
    }
  }

  private def shimCol(e: Expression): Column =
    org.apache.spark.sql.graft.GraftSqlShim.column(e)
  private def shimExpr(c: Column): Expression =
    org.apache.spark.sql.graft.GraftSqlShim.expression(c)

  /** Fixture/probe-side compressors (binary in, binary out). */
  def gzipCompress(data: Column): Column =
    shimCol(DeflateCompress(shimExpr(data), Gzip))
  def zlibCompress(data: Column): Column =
    shimCol(DeflateCompress(shimExpr(data), Zlib))
  def rawDeflateCompress(data: Column): Column =
    shimCol(DeflateCompress(shimExpr(data), RawDeflate))
  def zstdCompress(data: Column): Column =
    shimCol(DeflateCompress(shimExpr(data), ZstdFmt))

  /** The operators: strict gzip / HTTP-deflate (zlib-or-raw sniff) /
    * zstd (RFC 8878, see [[ZstdFmt]]).
    */
  def gunzip(data: Column, maxBytes: Int = DefaultMaxBytes): Column =
    shimCol(InflateBytes(shimExpr(data), Gzip, maxBytes))
  def inflateDeflate(data: Column, maxBytes: Int = DefaultMaxBytes): Column =
    shimCol(InflateBytes(shimExpr(data), DeflateSniff, maxBytes))
  def unzstd(data: Column, maxBytes: Int = DefaultMaxBytes): Column =
    shimCol(InflateBytes(shimExpr(data), ZstdFmt, maxBytes))
}

/** Deterministic compress (fixture/probe side) — see [[Inflate]]. */
case class DeflateCompress(child: Expression, format: Int)
    extends UnaryExpression {
  require(format == Inflate.Gzip || format == Inflate.Zlib ||
    format == Inflate.RawDeflate || format == Inflate.ZstdFmt,
    s"bad compress format: $format")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.simpleString}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "deflate_compress"

  override protected def nullSafeEval(v: Any): Any =
    Inflate.compress(v.asInstanceOf[Array[Byte]], format)

  def doCompress(v: Array[Byte]): Array[Byte] = Inflate.compress(v, format)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("comp", this, classOf[DeflateCompress].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.doCompress($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Bounded hostile-input-safe inflate — contract in [[Inflate]].
  * Nullable BY DESIGN even over non-null input: NULL is the
  * quarantine route for framing/integrity/bomb violations.
  */
case class InflateBytes(child: Expression, format: Int, maxBytes: Int)
    extends UnaryExpression {
  require(maxBytes > 0, s"maxBytes must be positive: $maxBytes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.simpleString}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "inflate_bytes"

  // one null idiom for result-nullable-on-non-null-input expressions:
  // nullSafeEval returning null + nullSafeCodeGen re-testing the
  // result (the TranscodeUtf8 pattern — round-15 review fix; the
  // hand-rolled eval/doGenCode pair was a second idiom for the same
  // contract)
  override protected def nullSafeEval(v: Any): Any =
    Inflate.inflate(v.asInstanceOf[Array[Byte]], format, maxBytes)

  def doInflate(v: Array[Byte]): Array[Byte] =
    Inflate.inflate(v, format, maxBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("infl", this, classOf[InflateBytes].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = $ref.doInflate($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
