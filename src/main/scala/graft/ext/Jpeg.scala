package graft.ext

import org.apache.spark.sql.Dataset

import graft.ext.Multimodal.MediaFile

/** REAL-format JPEG perceptual hash — baseline sequential DCT decode
  * (ITU-T T.81 / ISO 10918, the format most of a crawled image corpus
  * actually arrives in) feeding the SHARED 9×8 dHash grid fold, so a
  * JPEG re-encode of a BMP/PNG pairs through the same format-blind
  * banded hamming join (q360).
  *
  * SHARED DECODE SPEC (tools/gen_jpeg_fixtures.py implements it
  * independently in python — the two are the oracle pair):
  *   - Baseline sequential (SOF0), 8-bit precision, 1 component
  *     (grayscale) or 3 (YCbCr); sampling factors in {1, 2} and
  *     component 0 (Y) must carry the max factors; one scan covering
  *     all frame components (or the single component); DRI/RSTn
  *     honored (byte-align, reset DC predictions).
  *   - Entropy-decode EVERY component (the bitstream interleaves
  *     them) but IDCT ONLY Y — dHash needs luma alone; luma of a
  *     reconstructed Y sample g is g·1000 (the r=g=b case of the
  *     shared cell spec). Chroma bits advance the reader and are
  *     otherwise discarded.
  *   - INTEGER IDCT, bit-exact across implementations by
  *     construction: with the pinned 64-entry basis
  *     A(u)(x) = round(C(u)·cos((2x+1)uπ/16)/2 · 8192), C(0)=1/√2:
  *       S(x,y) = Σ_u Σ_v A(u)(x)·A(v)(y)·F(v,u)
  *       sample = clamp(((S + 2²⁵) >> 26) + 128, 0, 255)
  *     (arithmetic shift — floor — in both languages; |S| stays
  *     under 2⁵⁰ for any 8-bit-quantized stream, no overflow).
  *   - PROGRESSIVE (SOF2) decoded for real since round 18: spectral
  *     selection + successive approximation per T.81 annex G — see
  *     [[decodeProgressive]]; chroma AC scans are skipped wholesale
  *     (marker-delimited), DC scans decode every component.
  *   - OUT OF CONTRACT (file SKIPPED, never thrown — the bmpGeom
  *     hostile-input discipline): SOF1/SOF9+ (extended/arithmetic),
  *     12-bit precision, 16-bit DQT entries, factors outside {1,2},
  *     Y not at max factors, truncated or over-running entropy data,
  *     undefined Huffman codes, DRI under SOF2, DC+AC in one SOF2
  *     scan, sub-grid images (w<9 or h<8 — the shared rule).
  *     Post-scan COM/APPn segments before EOI are IN contract
  *     (T.81 misc segments — length-skipped; round-19 advice fix);
  *     any other marker between the scan and EOI stays out.
  *
  * 100-TB shape: one mapPartitions pass, O(coefficients) per file
  * with 64 longs of IDCT state per block and the 144-long grid;
  * only the hash survives downstream. Pair generation is the banded
  * hamming join — never all-pairs.
  */
object Jpeg {

  /** `width`/`height` are the UPRIGHT dims (post-EXIF-orientation);
    * `orientation` is EXIF tag 274 (1 when absent/corrupt/ignored).
    */
  case class JpegHashRow(path: String, width: Int, height: Int,
      components: Int, orientation: Int, dhash: Long)

  def dHashJpeg(files: Dataset[MediaFile]): Dataset[JpegHashRow] = {
    val spark = files.sparkSession
    import spark.implicits._
    files.mapPartitions(_.flatMap(f => parseJpegDHash(f.path, f.content)))
  }

  /** The pinned integer-IDCT basis (see the object scaladoc; the
    * python generator asserts these literals against the formula).
    */
  private val A: Array[Array[Long]] = Array(
    Array(2896, 2896, 2896, 2896, 2896, 2896, 2896, 2896),
    Array(4017, 3406, 2276, 799, -799, -2276, -3406, -4017),
    Array(3784, 1567, -1567, -3784, -3784, -1567, 1567, 3784),
    Array(3406, -799, -4017, -2276, 2276, 4017, 799, -3406),
    Array(2896, -2896, -2896, 2896, 2896, -2896, -2896, 2896),
    Array(2276, -4017, 799, 3406, -3406, -799, 4017, -2276),
    Array(1567, -3784, 3784, -1567, -1567, 3784, -3784, 1567),
    Array(799, -2276, 3406, -4017, 4017, -3406, 2276, -799))

  /** Zigzag scan order: natural index of the k-th coefficient
    * (generated algorithmically by the python side and pinned here).
    */
  private val ZZ: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Structural failure inside the entropy decode — caught at the
    * file boundary and turned into a skip (private control flow).
    */
  private final class Malformed extends RuntimeException

  private final class BitReader(d: Array[Byte], var p: Int) {
    private var acc = 0
    private var n = 0
    def bit(): Int = {
      if (n == 0) {
        if (p >= d.length) throw new Malformed
        val b = d(p) & 0xff
        p += 1
        if (b == 0xff) {
          if (p >= d.length) throw new Malformed
          if ((d(p) & 0xff) == 0x00) p += 1
          else throw new Malformed // marker inside entropy data
        }
        acc = b; n = 8
      }
      n -= 1
      (acc >> n) & 1
    }
    def bits(k: Int): Int = {
      var v = 0
      var i = 0
      while (i < k) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def alignToRst(): Unit = {
      n = 0
      if (p + 1 >= d.length || (d(p) & 0xff) != 0xff ||
          (d(p + 1) & 0xff) < 0xd0 || (d(p + 1) & 0xff) > 0xd7)
        throw new Malformed
      p += 2
    }
  }

  /** Canonical Huffman decode table in the ITU T.81 F.16 array form
    * (mincode/maxcode/valptr per length + the flat value list):
    * decoding is one array compare per bit and one indexed read at
    * the end — no per-bit boxing or hashing in the entropy hot loop
    * (round-17 review fix: the first cut did an immutable-Map lookup
    * per decoded bit).
    */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes of this length
    val valPtr = new Array[Int](17)
    val values: Array[Int] = vals
    locally {
      var code = 0
      var vi = 0
      var ln = 1
      while (ln <= 16) {
        if (bits(ln - 1) == 0) { minCode(ln) = 0; maxCode(ln) = -1 }
        else {
          valPtr(ln) = vi
          minCode(ln) = code
          code += bits(ln - 1)
          vi += bits(ln - 1)
          maxCode(ln) = code - 1
        }
        code <<= 1
        ln += 1
      }
    }
  }

  private def huffTable(bits: Array[Int], vals: Array[Int]): HuffTable =
    new HuffTable(bits, vals)

  private def readSym(br: BitReader, t: HuffTable): Int = {
    var code = 0
    var ln = 0
    while (ln < 16) {
      code = (code << 1) | br.bit()
      ln += 1
      // canonical property: reaching length ln without a match
      // implies code >= minCode(ln), so the <= maxCode test suffices
      // and the value index cannot go negative even on hostile input
      if (t.maxCode(ln) >= 0 && code <= t.maxCode(ln))
        return t.values(t.valPtr(ln) + code - t.minCode(ln))
    }
    throw new Malformed
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0 || v >= (1 << (t - 1))) v else v - (1 << t) + 1

  /** Pure parser, package-visible for direct spec coverage. Every
    * out-of-contract or hostile input returns None.
    */
  private[graft] def parseJpegDHash(
      path: String, b: Array[Byte]): Option[JpegHashRow] = {
    try decode(path, b)
    catch {
      // the entropy decoder signals structural damage by exception;
      // any residual indexing slip on hostile bytes lands here too —
      // a bad file must not kill a 100-TB scan
      case _: Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  /** EXIF Orientation (tag 274) from the FIRST APP1 "Exif\0\0"
    * segment before the scan — 1 everywhere else. Round 19 (verdict
    * item 1): real photo corpora carry capture-time rotation in EXIF,
    * and without it a rotated phone photo and its upright re-encode
    * hash as DIFFERENT images, so the dedup arc misses the pair.
    *
    * Hostile posture is per-TAG, not per-file (the advice-fix
    * boundary inverted: a wild orientation must not drop an otherwise
    * valid photo — it is metadata, not pixels): any anomaly — bad
    * TIFF magic, truncated IFD, out-of-file offsets, non-SHORT type,
    * count ≠ 1, value outside 1..8 — IGNORES the tag and decodes
    * upright. First APP1 wins; first tag-274 entry within it wins
    * (pinned by the exifdup fixture). IFD0 only — the orientation of
    * the EMBEDDED THUMBNAIL (IFD1) must never rotate the main image.
    */
  private[graft] def exifOrientation(b: Array[Byte]): Int = {
    var p = 2
    while (p + 3 < b.length && (b(p) & 0xff) == 0xff) {
      val m = b(p + 1) & 0xff
      if (m == 0xff) p += 1 // fill byte
      else if (m == 0xda || m == 0xd9) return 1 // scan/EOI: no EXIF
      else if (m >= 0xd0 && m <= 0xd7) p += 2 // bare RSTn (hostile)
      else {
        val len = ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
        if (len < 2 || p + 2 + len > b.length) return 1
        if (m == 0xe1 && len >= 8 &&
            b(p + 4) == 'E' && b(p + 5) == 'x' && b(p + 6) == 'i' &&
            b(p + 7) == 'f' && b(p + 8) == 0 && b(p + 9) == 0)
          return exifTiffOrientation(b, p + 10, p + 2 + len)
        p += 2 + len
      }
    }
    1
  }

  /** IFD0 walk over the TIFF structure at [off, end); any anomaly
    * reads as orientation 1 (skip the tag, never the file).
    */
  private def exifTiffOrientation(b: Array[Byte], off: Int, end: Int): Int = {
    val lim = math.min(end, b.length)
    if (off + 8 > lim) return 1
    val little =
      if (b(off) == 'I' && b(off + 1) == 'I') true
      else if (b(off) == 'M' && b(off + 1) == 'M') false
      else return 1
    def u16(o: Int): Int =
      if (o < off || o + 2 > lim) -1
      else if (little) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    def u32(o: Int): Long =
      if (o < off || o + 4 > lim) -1L
      else if (little)
        (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
          ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
      else
        ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
          ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    if (u16(off + 2) != 42) return 1
    val ifd = u32(off + 4)
    if (ifd < 8L || ifd > Int.MaxValue - 8) return 1
    val base = off + ifd.toInt
    val n = u16(base)
    if (n <= 0 || base + 2 + 12L * n > lim) return 1
    var i = 0
    while (i < n) {
      val o = base + 2 + 12 * i
      if (u16(o) == 274) {
        // SHORT, count 1, value inline — anything else is not the
        // orientation this scan trusts
        if (u16(o + 2) != 3 || u32(o + 4) != 1L) return 1
        val v = u16(o + 8)
        return if (v >= 1 && v <= 8) v else 1
      }
      i += 1
    }
    1
  }

  /** The tag-274 display transform: hash the UPRIGHT image by mapping
    * each upright (x, y) to its stored-grid source. Orientations 5-8
    * swap the hashed dims. The table (upright → stored, stored dims
    * w×h):
    *   1 (x,y)  2 (w-1-x,y)  3 (w-1-x,h-1-y)  4 (x,h-1-y)
    *   5 (y,x)  6 (y,h-1-x)  7 (w-1-y,h-1-x)  8 (w-1-y,x)
    * 6 and 8 are each other's inverses, so a direction slip cannot
    * hide (the exif6/exif8 fixtures differ); the rest are
    * involutions.
    */
  private def orientSx(o: Int, w: Int, x: Int, y: Int): Int = o match {
    case 2 | 3 => w - 1 - x
    case 5 | 6 => y
    case 7 | 8 => w - 1 - y
    case _ => x
  }

  private def orientSy(o: Int, h: Int, x: Int, y: Int): Int = o match {
    case 3 | 4 => h - 1 - y
    case 6 | 7 => h - 1 - x
    case 5 | 8 => x
    case _ => y
  }

  private def orientedHash(
      o: Int, w: Int, h: Int)(lumaAt: (Int, Int) => Int): Long = {
    val uw = if (o >= 5) h else w
    val uh = if (o >= 5) w else h
    Multimodal.dHashOfLuma(uw, uh) { (x, y) =>
      lumaAt(orientSx(o, w, x, y), orientSy(o, h, x, y)) * 1000L
    }
  }

  /** The baseline decode's product: stored dims, component count,
    * EXIF orientation, and the padded Y grid (row stride ybw·8).
    */
  private final case class YGrid(w: Int, h: Int, nf: Int, orient: Int,
      ybw: Int, ypix: Array[Byte])

  /** Control signal: the marker walk met SOF2 — route to
    * [[decodeProgressive]] (hash path) or drop (frame path: MJPEG is
    * baseline by definition).
    */
  private object ProgressiveRoute
      extends RuntimeException with scala.util.control.NoStackTrace

  private def decode(path: String, b: Array[Byte]): Option[JpegHashRow] =
    try baselineGrid(b).map { g =>
      // ── the shared grid fold over the UPRIGHT W×H (padding
      // discarded, EXIF orientation applied — round 19) ──
      JpegHashRow(path,
        if (g.orient >= 5) g.h else g.w,
        if (g.orient >= 5) g.w else g.h, g.nf, g.orient,
        orientedHash(g.orient, g.w, g.h) {
          (sx, sy) => g.ypix(sy * g.ybw * 8 + sx) & 0xff
        })
    }
    catch { case ProgressiveRoute => decodeProgressive(path, b) }

  /** Baseline decode to a tightly-packed UPRIGHT gray (Y) frame —
    * the MJPEG-in-AVI per-frame seam (round 19): [[graft.ext.Avi]]
    * feeds each 00dc payload through here and the result rides the
    * existing FrameRow → dHashFrames → videoNearDupPairs engine.
    * Progressive payloads return None (MJPEG is baseline by
    * definition); hostile bytes drop, never throw.
    */
  private[graft] def decodeGrayFrame(
      b: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    try baselineGrid(b).map { g =>
      val uw = if (g.orient >= 5) g.h else g.w
      val uh = if (g.orient >= 5) g.w else g.h
      val out = new Array[Byte](uw * uh)
      var y = 0
      while (y < uh) {
        var x = 0
        while (x < uw) {
          out(y * uw + x) = g.ypix(
            orientSy(g.orient, g.h, x, y) * g.ybw * 8 +
              orientSx(g.orient, g.w, x, y))
          x += 1
        }
        y += 1
      }
      (uw, uh, out)
    }
    catch {
      case ProgressiveRoute => None
      case _: Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
    }

  private def baselineGrid(b: Array[Byte]): Option[YGrid] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    def u16(off: Int): Int =
      if (off + 1 >= b.length) throw new Malformed
      else ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
    // ── marker walk up to SOS ──
    var p = 2
    val qt = new Array[Array[Int]](4)
    val dcTab = new Array[HuffTable](4)
    val acTab = new Array[HuffTable](4)
    var w = 0
    var h = 0
    var nf = 0
    // per component: id, hf, vf, tq
    var comps: Array[(Int, Int, Int, Int)] = null
    var dri = 0
    var scan: Array[(Int, Int, Int)] = null // (compIdx, td, ta)
    while (scan == null) {
      if (p + 3 >= b.length || (b(p) & 0xff) != 0xff) return None
      val m = b(p + 1) & 0xff
      if (m == 0xff) { p += 1 } else { // T.81 B.1.1.2 fill byte
      if (m == 0xd9) return None // EOI before any scan
      val len = u16(p + 2)
      if (len < 2 || p + 2 + len > b.length) return None
      val pay = p + 4
      val payLen = len - 2
      m match {
        case 0xdb => // DQT: one or more (PqTq, 64 bytes) entries
          var i = 0
          while (i < payLen) {
            if (i + 65 > payLen) return None
            val pq = (b(pay + i) & 0xff) >> 4
            val tq = b(pay + i) & 0x0f
            if (pq != 0 || tq > 3) return None // 16-bit tables: out
            val tab = new Array[Int](64)
            var k = 0
            while (k < 64) {
              tab(ZZ(k)) = b(pay + i + 1 + k) & 0xff
              k += 1
            }
            qt(tq) = tab
            i += 65
          }
        case 0xc0 => // SOF0 — the ONLY in-contract frame type
          if (payLen < 6) return None
          if ((b(pay) & 0xff) != 8) return None // 12-bit: out
          h = u16(pay + 1); w = u16(pay + 3)
          nf = b(pay + 5) & 0xff
          if (w <= 0 || h <= 0 || (nf != 1 && nf != 3)) return None
          if (payLen < 6 + 3 * nf) return None
          comps = (0 until nf).map { ci =>
            val o = pay + 6 + 3 * ci
            val hf = (b(o + 1) & 0xff) >> 4
            val vf = b(o + 1) & 0x0f
            (b(o) & 0xff, hf, vf, b(o + 2) & 0x0f)
          }.toArray
          if (comps.exists(c => c._2 < 1 || c._2 > 2 || c._3 < 1 || c._3 > 2))
            return None
          val hmax = comps.map(_._2).max
          val vmax = comps.map(_._3).max
          if (comps(0)._2 != hmax || comps(0)._3 != vmax) return None
        case 0xc4 => // DHT: one or more tables
          var i = 0
          while (i < payLen) {
            if (i + 17 > payLen) return None
            val tc = (b(pay + i) & 0xff) >> 4
            val th = b(pay + i) & 0x0f
            if (tc > 1 || th > 3) return None
            val bits = (0 until 16).map(k => b(pay + i + 1 + k) & 0xff).toArray
            val nv = bits.sum
            if (i + 17 + nv > payLen) return None
            val vals = (0 until nv).map(k => b(pay + i + 17 + k) & 0xff).toArray
            val t = huffTable(bits, vals)
            if (tc == 0) dcTab(th) = t else acTab(th) = t
            i += 17 + nv
          }
        case 0xdd =>
          if (payLen != 2) return None
          dri = u16(pay)
        case 0xda => // SOS
          if (comps == null) return None
          val ns = b(pay) & 0xff
          if (ns != nf) return None // multi-scan baseline: out
          if (payLen < 1 + 2 * ns + 3) return None
          scan = (0 until ns).map { i =>
            val cs = b(pay + 1 + 2 * i) & 0xff
            val ci = comps.indexWhere(_._1 == cs)
            if (ci < 0) throw new Malformed
            ((ci, (b(pay + 2 + 2 * i) & 0xff) >> 4,
              b(pay + 2 + 2 * i) & 0x0f))
          }.toArray
        case 0xc2 => // SOF2: the caller routes (hash) or drops (frame)
          throw ProgressiveRoute
        case mm if mm >= 0xc1 && mm <= 0xcf && mm != 0xc4 && mm != 0xc8 =>
          return None // SOF1/9/…: extended/arithmetic out
        case _ => // APPn / COM / others skipped
      }
      p += 2 + len
      }
    }
    // sub-grid skip (shared rule) — evaluated on the UPRIGHT dims:
    // an 8×64 stored image with orientation 6 is a 64×8 photo
    val orient = exifOrientation(b)
    if ((if (orient >= 5) h else w) < 9 ||
        (if (orient >= 5) w else h) < 8) return None
    if (w.toLong * h > Multimodal.PngMaxPixels) return None // bomb cap
    // every referenced table must exist
    if (scan.exists(s => dcTab(s._2) == null || acTab(s._3) == null))
      return None
    if (comps.exists(c => qt(c._4) == null)) return None

    val hmax = comps.map(_._2).max
    val vmax = comps.map(_._3).max
    val ybw = (w + 7) / 8
    val ybh = (h + 7) / 8
    val ypix = new Array[Byte](ybw * 8 * ybh * 8) // row-major, padded
    val br = new BitReader(b, p)
    val pred = new Array[Int](nf)
    val zz = new Array[Int](64)

    def decodeBlock(ci: Int, td: Int, ta: Int): Unit = {
      java.util.Arrays.fill(zz, 0)
      val s = readSym(br, dcTab(td))
      if (s > 11) throw new Malformed
      val diff = if (s == 0) 0 else extend(br.bits(s), s)
      pred(ci) += diff
      zz(0) = pred(ci)
      var k = 1
      while (k < 64) {
        val sym = readSym(br, acTab(ta))
        if (sym == 0x00) k = 64 // EOB
        else if (sym == 0xf0) k += 16 // ZRL
        else {
          val r = sym >> 4
          val sz = sym & 0x0f
          if (sz == 0 || sz > 10) throw new Malformed
          k += r
          if (k > 63) throw new Malformed
          zz(k) = extend(br.bits(sz), sz)
          k += 1
        }
      }
    }

    def placeY(bx: Int, by: Int, q: Array[Int]): Unit = {
      // dequantize + un-zigzag into natural order F(v)(u)
      val coef = new Array[Long](64)
      var k = 0
      while (k < 64) {
        coef(ZZ(k)) = zz(k).toLong * q(ZZ(k))
        k += 1
      }
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          var s = 0L
          var u = 0
          while (u < 8) {
            var v = 0
            while (v < 8) {
              s += A(u)(x) * A(v)(y) * coef(v * 8 + u)
              v += 1
            }
            u += 1
          }
          val px = ((s + (1L << 25)) >> 26) + 128
          val cl = if (px < 0) 0 else if (px > 255) 255 else px.toInt
          ypix((by * 8 + y) * ybw * 8 + bx * 8 + x) = cl.toByte
          x += 1
        }
        y += 1
      }
    }

    val yq = qt(comps(0)._4)
    var n = 0
    def restartIfDue(): Unit =
      if (dri > 0 && n > 0 && n % dri == 0) {
        br.alignToRst()
        java.util.Arrays.fill(pred, 0)
      }
    if (nf > 1) {
      val mcux = (w + 8 * hmax - 1) / (8 * hmax)
      val mcuy = (h + 8 * vmax - 1) / (8 * vmax)
      var my = 0
      while (my < mcuy) {
        var mx = 0
        while (mx < mcux) {
          restartIfDue(); n += 1
          scan.foreach { case (ci, td, ta) =>
            val hf = comps(ci)._2
            val vf = comps(ci)._3
            var v = 0
            while (v < vf) {
              var hh = 0
              while (hh < hf) {
                decodeBlock(ci, td, ta)
                if (ci == 0) {
                  val bx = mx * hf + hh
                  val by = my * vf + v
                  if (bx < ybw && by < ybh) placeY(bx, by, yq)
                }
                hh += 1
              }
              v += 1
            }
          }
          mx += 1
        }
        my += 1
      }
    } else {
      val (_, td, ta) = scan(0)
      var by = 0
      while (by < ybh) {
        var bx = 0
        while (bx < ybw) {
          restartIfDue(); n += 1
          decodeBlock(0, td, ta)
          placeY(bx, by, yq)
          bx += 1
        }
        by += 1
      }
    }

    // over-running entropy data is OUT of contract (scaladoc + the
    // python oracle only ever sees streams that end at the last MCU):
    // after the final block only the padding bits of the current byte
    // may remain — the next whole bytes must be a MARKER. A stream
    // with extra decodable entropy bytes previously hashed silently,
    // the same code-vs-doc split the round-17 PNG over-long-IDAT fix
    // closed (round-18 review fix). An UNREAD final padding byte of
    // all 1-bits arrives stuffed as FF 00 — one such pair may sit
    // before the marker (the encoder pads with 1s) — and T.81 B.1.1.2
    // allows any number of 0xFF FILL bytes before a marker (round-18
    // review fix: FF FF D9 is a legal ending). A legal baseline file
    // may also carry COM/APPn SEGMENTS between the scan and EOI
    // (T.81 allows misc segments anywhere between markers) — those
    // are length-skipped, and EOI must follow them (round-19 advice
    // fix; anything else after the scan stays out of contract).
    var eop = br.p
    if (eop + 1 < b.length && (b(eop) & 0xff) == 0xff &&
        (b(eop + 1) & 0xff) == 0x00) eop += 2
    var sawEoi = false
    while (!sawEoi) {
      while (eop + 1 < b.length && (b(eop) & 0xff) == 0xff &&
          (b(eop + 1) & 0xff) == 0xff) eop += 1
      if (eop + 1 >= b.length || (b(eop) & 0xff) != 0xff) return None
      val mk = b(eop + 1) & 0xff
      if (mk == 0xd9) sawEoi = true
      else if ((mk >= 0xe0 && mk <= 0xef) || mk == 0xfe) {
        if (eop + 4 > b.length) return None
        val len = ((b(eop + 2) & 0xff) << 8) | (b(eop + 3) & 0xff)
        if (len < 2 || eop + 2 + len > b.length) return None
        eop += 2 + len
      } else return None
    }

    Some(YGrid(w, h, nf, orient, ybw, ypix))
  }

  /** PROGRESSIVE (SOF2) decode — round 18: spectral selection +
    * successive approximation per ITU T.81 annex G (the libjpeg
    * formulation), reusing the certified Huffman/IDCT machinery.
    * The progression re-orders ENTROPY only, so a progressive
    * re-encode reconstructs the baseline coefficients EXACTLY and
    * hashes at distance 0 from its baseline sibling (fixture-
    * asserted, both sides).
    *
    * 100-TB discipline: only component 0 (Y) is accumulated — DC
    * scans (which may interleave components) decode every
    * component's cheap DC stream, but CHROMA AC SCANS ARE SKIPPED
    * WHOLESALE by seeking to the next marker (progressive scans are
    * marker-delimited, so the luma hash never pays for chroma
    * entropy — the decode-only-what-you-hash shape). Point
    * transforms: DC shifts arithmetically, AC shifts the magnitude;
    * refinement correction bits follow libjpeg's
    * decode_mcu_AC_refine exactly. Out of contract (SKIP): DRI under
    * SOF2, Ss==0 with Se!=0 (the flipped-marker hostile arm),
    * multi-component AC scans, refinement s>1, any scan over-running
    * its marker boundary.
    */
  private def decodeProgressive(
      path: String, b: Array[Byte]): Option[JpegHashRow] = {
    def u16(off: Int): Int =
      if (off + 1 >= b.length) throw new Malformed
      else ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
    var p = 2
    val orient = exifOrientation(b)
    val qt = new Array[Array[Int]](4)
    val dcTab = new Array[HuffTable](4)
    val acTab = new Array[HuffTable](4)
    var w = 0
    var h = 0
    var nf = 0
    var comps: Array[(Int, Int, Int, Int)] = null // id, hf, vf, tq
    var hmax = 1
    var vmax = 1
    var mcux = 0
    var mcuy = 0
    var ybw = 0
    var ybh = 0
    var coefY: Array[Int] = null // quantized coefficients, natural
    var scans = 0
    var eoi = false
    while (!eoi) {
      if (p + 1 >= b.length || (b(p) & 0xff) != 0xff) return None
      val m = b(p + 1) & 0xff
      if (m == 0xff) { p += 1 } // T.81 B.1.1.2 fill byte
      else if (m == 0xd9) { eoi = true }
      else {
        val len = u16(p + 2)
        if (len < 2 || p + 2 + len > b.length) return None
        val pay = p + 4
        val payLen = len - 2
        var nextP = p + 2 + len
        m match {
          case 0xdb =>
            var i = 0
            while (i < payLen) {
              if (i + 65 > payLen) return None
              val pq = (b(pay + i) & 0xff) >> 4
              val tq = b(pay + i) & 0x0f
              if (pq != 0 || tq > 3) return None
              val tab = new Array[Int](64)
              var k = 0
              while (k < 64) {
                tab(ZZ(k)) = b(pay + i + 1 + k) & 0xff
                k += 1
              }
              qt(tq) = tab
              i += 65
            }
          case 0xc2 =>
            if (comps != null || payLen < 6) return None
            if ((b(pay) & 0xff) != 8) return None // 12-bit: out
            h = u16(pay + 1); w = u16(pay + 3)
            nf = b(pay + 5) & 0xff
            if (w <= 0 || h <= 0 || (nf != 1 && nf != 3)) return None
            if (payLen < 6 + 3 * nf) return None
            comps = (0 until nf).map { ci =>
              val o = pay + 6 + 3 * ci
              ((b(o) & 0xff, (b(o + 1) & 0xff) >> 4,
                b(o + 1) & 0x0f, b(o + 2) & 0x0f))
            }.toArray
            if (comps.exists(c =>
                c._2 < 1 || c._2 > 2 || c._3 < 1 || c._3 > 2))
              return None
            hmax = comps.map(_._2).max
            vmax = comps.map(_._3).max
            if (comps(0)._2 != hmax || comps(0)._3 != vmax) return None
            // sub-grid (shared rule) on the UPRIGHT dims (round 19)
            if ((if (orient >= 5) h else w) < 9 ||
                (if (orient >= 5) w else h) < 8) return None
            if (w.toLong * h > Multimodal.PngMaxPixels) return None
            mcux = (w + 8 * hmax - 1) / (8 * hmax)
            mcuy = (h + 8 * vmax - 1) / (8 * vmax)
            ybw = (w + 7) / 8 // Y at max factors: its OWN grid
            ybh = (h + 7) / 8
            coefY = new Array[Int](ybw * ybh * 64)
          case 0xc4 =>
            var i = 0
            while (i < payLen) {
              if (i + 17 > payLen) return None
              val tc = (b(pay + i) & 0xff) >> 4
              val th = b(pay + i) & 0x0f
              if (tc > 1 || th > 3) return None
              val bits = (0 until 16).map(k =>
                b(pay + i + 1 + k) & 0xff).toArray
              val nv = bits.sum
              if (i + 17 + nv > payLen) return None
              val vals = (0 until nv).map(k =>
                b(pay + i + 17 + k) & 0xff).toArray
              val t = huffTable(bits, vals)
              if (tc == 0) dcTab(th) = t else acTab(th) = t
              i += 17 + nv
            }
          case 0xdd => return None // DRI under SOF2: out of contract
          case 0xda =>
            if (comps == null) return None
            nextP = decodeProgScan(b, pay, payLen, w, h, comps, hmax,
              vmax, mcux, mcuy, ybw, ybh, dcTab, acTab, coefY)
            scans += 1
          case mm if mm >= 0xc0 && mm <= 0xcf && mm != 0xc4 &&
              mm != 0xc8 =>
            return None // a second frame header of any kind
          case _ => // APPn / COM skipped
        }
        p = nextP
      }
    }
    if (comps == null || scans == 0) return None
    if (qt(comps(0)._4) == null) return None
    val yq = qt(comps(0)._4)
    // ── dequantize + IDCT each Y block, then the shared fold ──
    val ypix = new Array[Byte](ybw * 8 * ybh * 8)
    val coef = new Array[Long](64)
    var bi = 0
    while (bi < ybw * ybh) {
      var k = 0
      while (k < 64) {
        coef(k) = coefY(bi * 64 + k).toLong * yq(k)
        k += 1
      }
      val bx = bi % ybw
      val by = bi / ybw
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          var s = 0L
          var u = 0
          while (u < 8) {
            var v = 0
            while (v < 8) {
              s += A(u)(x) * A(v)(y) * coef(v * 8 + u)
              v += 1
            }
            u += 1
          }
          val px = ((s + (1L << 25)) >> 26) + 128
          val cl = if (px < 0) 0 else if (px > 255) 255 else px.toInt
          ypix((by * 8 + y) * ybw * 8 + bx * 8 + x) = cl.toByte
          x += 1
        }
        y += 1
      }
      bi += 1
    }
    Some(JpegHashRow(path,
      if (orient >= 5) h else w, if (orient >= 5) w else h, nf, orient,
      orientedHash(orient, w, h) {
        (sx, sy) => ypix(sy * ybw * 8 + sx) & 0xff
      }))
  }

  /** Decode one progressive scan; returns the byte offset of the
    * marker that ends it. Throws Malformed on any structural
    * violation. Chroma AC scans are skipped by marker-seeking.
    */
  private def decodeProgScan(
      b: Array[Byte], pay: Int, payLen: Int, w: Int, h: Int,
      comps: Array[(Int, Int, Int, Int)], hmax: Int, vmax: Int,
      mcux: Int, mcuy: Int, ybw: Int, ybh: Int,
      dcTab: Array[HuffTable], acTab: Array[HuffTable],
      coefY: Array[Int]): Int = {
    val ns = b(pay) & 0xff
    if (ns < 1 || payLen < 1 + 2 * ns + 3) throw new Malformed
    val scomp = (0 until ns).map { i =>
      val cs = b(pay + 1 + 2 * i) & 0xff
      val ci = comps.indexWhere(_._1 == cs)
      if (ci < 0) throw new Malformed
      ((ci, (b(pay + 2 + 2 * i) & 0xff) >> 4, b(pay + 2 + 2 * i) & 0x0f))
    }.toArray
    val ss = b(pay + 1 + 2 * ns) & 0xff
    val se = b(pay + 2 + 2 * ns) & 0xff
    val ahal = b(pay + 3 + 2 * ns) & 0xff
    val ah = ahal >> 4
    val al = ahal & 0x0f
    val entStart = pay + payLen
    // the scan's data runs to the next marker; locate it once (DRI is
    // out of contract, so no RSTn can appear inside)
    def scanEnd(from: Int): Int = {
      var q = from
      while (q + 1 < b.length &&
        !((b(q) & 0xff) == 0xff && (b(q + 1) & 0xff) != 0x00)) q += 1
      // advance over T.81 fill bytes to the LAST 0xFF of the run, so
      // the marker walk reads a real marker byte next
      while (q + 1 < b.length && (b(q + 1) & 0xff) == 0xff) q += 1
      if (q + 1 >= b.length) throw new Malformed
      q
    }
    if (ss == 0) {
      // ── DC scan (Se must be 0 in SOF2 — the flipped-marker arm) ──
      if (se != 0 || al > 13 || ah > 13) throw new Malformed
      val br = new BitReader(b, entStart)
      val pred = new Array[Int](comps.length)
      val dcOf = new Array[HuffTable](comps.length)
      scomp.foreach { case (ci, td, _) =>
        dcOf(ci) = dcTab(td)
        if (ah == 0 && dcOf(ci) == null) throw new Malformed
      }
      def block(ci: Int, bx: Int, by: Int): Unit = {
        if (ah == 0) {
          val s = readSym(br, dcOf(ci))
          if (s > 11) throw new Malformed
          val diff = if (s == 0) 0 else extend(br.bits(s), s)
          pred(ci) += diff
          if (ci == 0 && bx < ybw && by < ybh)
            coefY((by * ybw + bx) * 64) = pred(ci) << al
        } else {
          val bit = br.bit()
          if (ci == 0 && bx < ybw && by < ybh && bit != 0)
            coefY((by * ybw + bx) * 64) |= (1 << al)
        }
      }
      if (ns > 1) {
        var my = 0
        while (my < mcuy) {
          var mx = 0
          while (mx < mcux) {
            scomp.foreach { case (ci, _, _) =>
              val hf = comps(ci)._2
              val vf = comps(ci)._3
              var v = 0
              while (v < vf) {
                var hh = 0
                while (hh < hf) {
                  block(ci, mx * hf + hh, my * vf + v)
                  hh += 1
                }
                v += 1
              }
            }
            mx += 1
          }
          my += 1
        }
      } else {
        // single-component scan: the component's OWN grid (ceil of
        // its scaled dims over 8), NOT the MCU-padded one
        val ci = scomp(0)._1
        val hf = comps(ci)._2
        val vf = comps(ci)._3
        val cbw = ((w * hf + hmax - 1) / hmax + 7) / 8
        val cbh = ((h * vf + vmax - 1) / vmax + 7) / 8
        var by = 0
        while (by < cbh) {
          var bx = 0
          while (bx < cbw) {
            block(ci, bx, by)
            bx += 1
          }
          by += 1
        }
      }
      endOfScan(b, br)
    } else {
      // ── AC scan: single component (T.81 G.1.1.1) ──
      if (ns != 1 || se < ss || se > 63 || al > 13 || ah > 13)
        throw new Malformed
      val (ci, _, ta) = scomp(0)
      if (ci != 0) return {
        // chroma: skip the entropy data wholesale
        scanEnd(entStart)
      }
      val tab = acTab(ta)
      if (tab == null) throw new Malformed
      val br = new BitReader(b, entStart)
      var eobrun = 0
      val p1 = 1 << al
      val m1 = -(1 << al)
      var bi = 0
      val nBlocks = ybw * ybh
      while (bi < nBlocks) {
        val base = bi * 64
        if (ah == 0) {
          // ── first pass over this band ──
          if (eobrun > 0) eobrun -= 1
          else {
            var k = ss
            var done = false
            while (!done && k <= se) {
              val sym = readSym(br, tab)
              val r = sym >> 4
              val s = sym & 15
              if (s == 0) {
                if (r == 15) k += 16 // ZRL
                else {
                  eobrun = (1 << r) + (if (r > 0) br.bits(r) else 0) - 1
                  done = true
                }
              } else {
                if (s > 10) throw new Malformed
                k += r
                if (k > se) throw new Malformed
                coefY(base + ZZ(k)) = extend(br.bits(s), s) << al
                k += 1
              }
            }
          }
        } else {
          // ── refinement (libjpeg decode_mcu_AC_refine shape) ──
          var k = ss
          if (eobrun == 0) {
            var done = false
            while (!done && k <= se) {
              val sym = readSym(br, tab)
              val r0 = sym >> 4
              val s = sym & 15
              var r = r0
              var newval = 0
              if (s != 0) {
                if (s != 1) throw new Malformed
                newval = if (br.bit() != 0) p1 else m1
              } else if (r != 15) {
                eobrun = (1 << r) + (if (r > 0) br.bits(r) else 0)
                done = true
              }
              if (!done) {
                var placed = false
                while (!placed && k <= se) {
                  val c = coefY(base + ZZ(k))
                  if (c != 0) {
                    if (br.bit() != 0 && (c & p1) == 0)
                      coefY(base + ZZ(k)) = c + (if (c >= 0) p1 else m1)
                    k += 1
                  } else {
                    r -= 1
                    if (r < 0) placed = true else k += 1
                  }
                }
                if (newval != 0) {
                  if (k > se) throw new Malformed
                  coefY(base + ZZ(k)) = newval
                }
                k += 1
              }
            }
          }
          if (eobrun > 0) {
            while (k <= se) {
              val c = coefY(base + ZZ(k))
              if (c != 0 && br.bit() != 0 && (c & p1) == 0)
                coefY(base + ZZ(k)) = c + (if (c >= 0) p1 else m1)
              k += 1
            }
            eobrun -= 1
          }
        }
        bi += 1
      }
      endOfScan(b, br)
    }
  }

  /** A scan must end exactly at the next marker; an unread all-ones
    * padding byte arrives stuffed as FF 00 (one pair allowed), and
    * T.81 B.1.1.2 fill bytes (runs of 0xFF) may precede the marker.
    */
  private def endOfScan(b: Array[Byte], br: BitReader): Int = {
    var q = br.p
    if (q + 1 < b.length && (b(q) & 0xff) == 0xff &&
        (b(q + 1) & 0xff) == 0x00) q += 2
    while (q + 1 < b.length && (b(q) & 0xff) == 0xff &&
        (b(q + 1) & 0xff) == 0xff) q += 1
    if (q + 1 >= b.length || (b(q) & 0xff) != 0xff ||
        (b(q + 1) & 0xff) == 0x00) throw new Malformed
    q
  }
}
