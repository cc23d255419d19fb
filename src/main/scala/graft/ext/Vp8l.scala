package graft.ext

import org.apache.spark.sql.Dataset

import graft.ext.Multimodal.MediaFile

/** REAL-format WebP-LOSSLESS (VP8L) perceptual hash — the sixth
  * member of the image family (RFC 9649 §3, the public WebP lossless
  * bitstream spec): RIFF walk to the `VP8L` chunk (0x2F signature),
  * LSB-first bit reading, canonical prefix codes in the DEFLATE
  * convention (code bits most-significant-first) in BOTH forms —
  * SIMPLE (1-2 literal symbols) and NORMAL (code-length codes with
  * the 16/17/18 RLE over `kCodeLengthCodeOrder`) — then the pixel
  * stream: green symbol < 256 is a literal (g, r, b, a follow),
  * 256..279 an LZ77 backref (length prefix-coded; distance through
  * the 120-entry 2D neighbor map, then raw dist−120), ≥ 280 a
  * color-cache index (hash 0x1E35A7BD · argb >>> (32 − bits); the
  * cache updates on EVERY emitted pixel, copied ones included). The
  * SUBTRACT-GREEN transform is decoded (r+=g, b+=g mod 256). Luma =
  * r·299 + g·587 + b·114 (alpha ignored) through the shared
  * [[Multimodal.dHashOfGrid]] fold, so a VP8L re-encode of a
  * BMP/PNG/JPEG/GIF/TIFF sibling pairs at distance 0 (q370).
  * Mirrored independently by tools/gen_webp_fixtures.py.
  *
  * OUT OF CONTRACT (file SKIPPED, never thrown): lossy `VP8 ` and
  * extended `VP8X` forms, PREDICTOR / COLOR / COLOR-INDEXING
  * transforms, a meta prefix image (spatially varying code groups),
  * the max_symbol code-length form, cold color-cache hits, backrefs
  * out of range, truncated streams, sub-grid (w<9 or h<8), and the
  * [[Multimodal.PngMaxPixels]] bomb cap before any allocation.
  *
  * 100-TB shape: one mapPartitions pass, O(pixels) per file with an
  * ARGB line buffer bounded by the pixel cap; only the hash survives
  * downstream. Pair generation is the banded hamming join.
  */
object Vp8l {

  case class WebpHashRow(path: String, width: Int, height: Int,
      subtractGreen: Boolean, dhash: Long)

  def dHashWebp(files: Dataset[MediaFile]): Dataset[WebpHashRow] = {
    val spark = files.sparkSession
    import spark.implicits._
    files.mapPartitions(_.flatMap(f => parseVp8lDHash(f.path, f.content)))
  }

  private final class Malformed extends RuntimeException

  /** RFC 9649 §3.4.2.2 — the 2D distance-code neighbor map. An
    * exercised-entry transcription slip fails the cross-format
    * distance-0 certification, so the fixture encoder leans on both
    * the 2D and the raw forms.
    */
  private val Dist2d: Array[(Int, Int)] = Array(
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7))

  private val ClOrder: Array[Int] = Array(17, 18, 0, 1, 2, 3, 4, 5,
    16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** LSB-first bit reader over the VP8L payload. */
  private final class Lsb(d: Array[Byte], off: Int, end: Int) {
    private var pos = 0
    private val nBits = (end - off).toLong * 8
    def read(n: Int): Int = {
      if (pos + n > nBits) throw new Malformed
      var v = 0
      var i = 0
      while (i < n) {
        val p = pos + i
        v |= (((d(off + (p >> 3)) >> (p & 7)) & 1) << i)
        i += 1
      }
      pos += n
      v
    }
  }

  /** Canonical prefix decoder in ITU-F.16 array form (minCode /
    * maxCode / valPtr per length — one compare per bit, the JPEG
    * HuffTable shape generalized to length ≤ 15). A single-symbol
    * code reads ZERO bits (the spec's degenerate-tree rule).
    */
  private final class Code(lengths: Array[Int]) {
    private val MaxLen = 15
    val minCode = new Array[Int](MaxLen + 1)
    val maxCode = Array.fill(MaxLen + 1)(-1)
    val valPtr = new Array[Int](MaxLen + 1)
    val values: Array[Int] = {
      val used = lengths.zipWithIndex.filter(_._1 > 0)
      if (used.exists(_._1 > MaxLen)) throw new Malformed
      used.sortBy { case (ln, s) => (ln, s) }.map(_._2)
    }
    val single: Int =
      if (values.length == 1) values(0) else -1
    locally {
      if (values.isEmpty) throw new Malformed
      val counts = new Array[Int](MaxLen + 1)
      lengths.foreach(ln => if (ln > 0) counts(ln) += 1)
      var code = 0
      var vi = 0
      var ln = 1
      while (ln <= MaxLen) {
        if (counts(ln) == 0) { minCode(ln) = 0 }
        else {
          valPtr(ln) = vi
          minCode(ln) = code
          code += counts(ln)
          vi += counts(ln)
          maxCode(ln) = code - 1
        }
        code <<= 1
        ln += 1
      }
      // the canonical code must be exactly full (a short/oversubscribed
      // length set desynchronizes the stream): code == 1 << MaxLen
      if (values.length > 1 && code != (1 << (MaxLen + 1)))
        throw new Malformed
    }
    def read(br: Lsb): Int = {
      if (single >= 0) return single
      var code = 0
      var ln = 0
      while (ln < MaxLen) {
        code = (code << 1) | br.read(1)
        ln += 1
        if (maxCode(ln) >= 0 && code <= maxCode(ln))
          return values(valPtr(ln) + code - minCode(ln))
      }
      throw new Malformed
    }
  }

  /** Pure parser, package-visible for direct spec coverage. */
  private[graft] def parseVp8lDHash(
      path: String, b: Array[Byte]): Option[WebpHashRow] =
    try body(path, b)
    catch {
      case _: Malformed => None
      case _: IndexOutOfBoundsException => None
    }

  private def body(path: String, b: Array[Byte]): Option[WebpHashRow] = {
    if (b.length < 21) return None
    if (b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'E' || b(10) != 'B' || b(11) != 'P')
      return None
    // chunk walk to VP8L; VP8 (lossy) / VP8X (extended) are out
    var p = 12
    var payOff = -1
    var payEnd = -1
    while (payOff < 0 && p + 8 <= b.length) {
      val tag = new String(b, p, 4, "US-ASCII")
      val ln = ((b(p + 4) & 0xff)) | ((b(p + 5) & 0xff) << 8) |
        ((b(p + 6) & 0xff) << 16) | ((b(p + 7) & 0xff) << 24)
      if (ln < 0 || p + 8L + ln > b.length) return None
      if (tag == "VP8L") { payOff = p + 8; payEnd = p + 8 + ln }
      else if (tag == "VP8 " || tag == "VP8X") return None
      else p += 8 + ln + (ln & 1)
    }
    if (payOff < 0 || payEnd - payOff < 5) return None
    if ((b(payOff) & 0xff) != 0x2f) return None
    val br = new Lsb(b, payOff + 1, payEnd)
    val w = br.read(14) + 1
    val h = br.read(14) + 1
    br.read(1) // alpha-used hint
    if (br.read(3) != 0) return None // version
    if (w < 9 || h < 8) return None // sub-grid (shared rule)
    if (w.toLong * h > Multimodal.PngMaxPixels) return None // bomb cap
    var subtractGreen = false
    while (br.read(1) == 1) {
      if (br.read(2) != 2) return None // only SUBTRACT_GREEN in contract
      if (subtractGreen) return None // a transform may appear once
      subtractGreen = true
    }
    // color_cache_code_bits is 1..11 WHEN THE FLAG IS SET (RFC 9649
    // §5.2.3; libwebp rejects 0) — accepting 0 as "cache silently
    // disabled" would decode a file real decoders reject, breaking
    // the decode-exactly-or-skip posture (round-19 advice fix)
    val cacheBits = if (br.read(1) == 1) {
      val cb = br.read(4)
      if (cb < 1 || cb > 11) return None
      cb
    } else 0
    if (br.read(1) != 0) return None // meta prefix image: out

    def readPrefixCode(alphabet: Int): Code = {
      if (br.read(1) == 1) { // simple form
        val nsym = br.read(1) + 1
        val s0 = if (br.read(1) == 1) br.read(8) else br.read(1)
        val lengths = new Array[Int](alphabet)
        if (s0 >= alphabet) throw new Malformed
        if (nsym == 1) { lengths(s0) = 1; return new Code(lengths) }
        val s1 = br.read(8)
        if (s1 >= alphabet || s1 == s0) throw new Malformed
        lengths(s0) = 1; lengths(s1) = 1
        return new Code(lengths)
      }
      val num = 4 + br.read(4)
      if (num > 19) throw new Malformed
      val cl = new Array[Int](19)
      var i = 0
      while (i < num) { cl(ClOrder(i)) = br.read(3); i += 1 }
      if (br.read(1) != 0) throw new Malformed // max_symbol form: out
      val clCode = new Code(cl)
      val lengths = new Array[Int](alphabet)
      var prev = 8
      var s = 0
      while (s < alphabet) {
        val sym = clCode.read(br)
        if (sym < 16) {
          lengths(s) = sym
          if (sym > 0) prev = sym
          s += 1
        } else if (sym == 16) {
          var r = 3 + br.read(2)
          while (r > 0) {
            if (s >= alphabet) throw new Malformed
            lengths(s) = prev; s += 1; r -= 1
          }
        } else if (sym == 17) s += 3 + br.read(3)
        else s += 11 + br.read(7)
      }
      if (s != alphabet) throw new Malformed
      new Code(lengths)
    }

    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val green = readPrefixCode(256 + 24 + cacheSize)
    val red = readPrefixCode(256)
    val blue = readPrefixCode(256)
    val alpha = readPrefixCode(256)
    val distC = readPrefixCode(40)

    def prefixValue(code: Int): Int = {
      if (code >= 40) throw new Malformed
      if (code < 4) code + 1
      else {
        val extra = (code - 2) >> 1
        val offset = (2 + (code & 1)) << extra
        offset + br.read(extra) + 1
      }
    }

    val n = w * h
    val px = new Array[Int](n) // ARGB packed
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    val cacheSet =
      if (cacheSize > 0) new Array[Boolean](cacheSize) else null
    def cachePut(v: Int): Unit = if (cache != null) {
      val k = (v * 0x1e35a7bd) >>> (32 - cacheBits)
      cache(k) = v; cacheSet(k) = true
    }
    var i = 0
    while (i < n) {
      val g = green.read(br)
      if (g < 256) {
        val r = red.read(br)
        val bl = blue.read(br)
        val a = alpha.read(br)
        px(i) = (a << 24) | (r << 16) | (g << 8) | bl
        cachePut(px(i))
        i += 1
      } else if (g < 256 + 24) {
        val len = prefixValue(g - 256)
        val dcode = prefixValue(distC.read(br))
        val dist0 =
          if (dcode > 120) dcode - 120
          else {
            val (dx, dy) = Dist2d(dcode - 1)
            math.max(1, dy * w + dx)
          }
        if (dist0 > i || i + len > n) throw new Malformed
        var j = 0
        while (j < len) {
          px(i) = px(i - dist0)
          cachePut(px(i))
          i += 1
          j += 1
        }
      } else {
        if (cache == null) throw new Malformed
        val k = g - 256 - 24
        if (k >= cacheSize || !cacheSet(k)) throw new Malformed
        px(i) = cache(k)
        cachePut(px(i)) // idempotent, but mirrors the spec's rule
        i += 1
      }
    }
    // ── luma fold (subtract-green inverted per pixel) ──
    val hash = Multimodal.dHashOfLuma(w, h) { (x, y) =>
      val v = px(y * w + x)
      val g = (v >> 8) & 0xff
      var r = (v >> 16) & 0xff
      var bl = v & 0xff
      if (subtractGreen) { r = (r + g) & 0xff; bl = (bl + g) & 0xff }
      r * 299L + g * 587L + bl * 114L
    }
    Some(WebpHashRow(path, w, h, subtractGreen, hash))
  }
}
