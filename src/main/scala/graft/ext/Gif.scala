package graft.ext

import org.apache.spark.sql.Dataset

import graft.ext.Multimodal.MediaFile

/** REAL-format GIF perceptual hash — GIF87a/89a first-frame decode
  * (the fourth legacy image format next to BMP/PNG/JPEG; the animated
  * web still ships it) feeding the SHARED 9×8 dHash grid fold, so a
  * GIF re-encode pairs with its BMP/PNG/JPEG siblings through the
  * same format-blind banded hamming join (q362).
  *
  * SHARED DECODE SPEC (tools/gen_gif_fixtures.py implements it
  * independently — the oracle pair):
  *   - GIF87a/GIF89a; logical screen descriptor; extension blocks
  *     (0x21) skipped sub-block-wise; the FIRST image descriptor is
  *     decoded — an animation's hash is its POSTER FRAME's (dedup
  *     keys on what a viewer sees first);
  *   - the first frame must sit at (0,0) with the logical screen's
  *     full size (partial first frames are out of contract);
  *   - color table: local overrides global, none at all → skip;
  *     luma of palette entry (r,g,b) = r·299 + g·587 + b·114 (the
  *     shared weighting); GCE transparency is IGNORED — the indexed
  *     color is used as stored;
  *   - LZW: LSB-first bit packing across sub-blocks, CLEAR/EOI,
  *     dictionary to 4096 with the KwKwK case, width bump when the
  *     dictionary size reaches 2^width (max 12 — the canonical
  *     decoder rule every real GIF reader uses), deferred-clear
  *     tolerated (adds stop at 4096 until a CLEAR arrives); streams
  *     that end before w·h pixels → skip;
  *   - INTERLACED frames supported (the four-pass 8/8-4/8-2/4-1/2
  *     row order);
  *   - sub-grid (w<9 or h<8) skipped — the shared rule; hostile
  *     structure (lengths past EOF, codes out of range) skips, never
  *     throws.
  *
  * 100-TB shape: one mapPartitions pass, O(pixels) per file with the
  * LZW dictionary (≤4096 suffix-pointer entries) + 144 longs of grid
  * state; only the hash survives downstream.
  */
object Gif {

  case class GifHashRow(path: String, width: Int, height: Int,
      interlaced: Boolean, dhash: Long)

  def dHashGif(files: Dataset[MediaFile]): Dataset[GifHashRow] = {
    val spark = files.sparkSession
    import spark.implicits._
    files.mapPartitions(_.flatMap(f => parseGifDHash(f.path, f.content)))
  }

  private final class Malformed extends RuntimeException

  /** Pure parser, package-visible for direct spec coverage. */
  private[graft] def parseGifDHash(
      path: String, b: Array[Byte]): Option[GifHashRow] = {
    try decode(path, b)
    catch {
      case _: Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  private def decode(path: String, b: Array[Byte]): Option[GifHashRow] = {
    if (b.length < 14) return None
    val magic = new String(b, 0, 6, "US-ASCII")
    if (magic != "GIF87a" && magic != "GIF89a") return None
    def u16(off: Int): Int =
      if (off + 1 >= b.length) throw new Malformed
      else (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    val w = u16(6)
    val h = u16(8)
    if (w < 9 || h < 8) return None // sub-grid (shared rule)
    if (w.toLong * h > Multimodal.PngMaxPixels) return None // bomb cap
    val packed = b(10) & 0xff
    var p = 13
    var table: Array[Int] = null // packed luma per palette index
    def readTable(bits: Int): Array[Int] = {
      val n = 2 << bits
      if (p + 3 * n > b.length) throw new Malformed
      val t = new Array[Int](n)
      var i = 0
      while (i < n) {
        t(i) = (b(p + 3 * i) & 0xff) * 299 +
          (b(p + 3 * i + 1) & 0xff) * 587 + (b(p + 3 * i + 2) & 0xff) * 114
        i += 1
      }
      p += 3 * n
      t
    }
    if ((packed & 0x80) != 0) table = readTable(packed & 7)
    // block walk to the first image descriptor
    var found = false
    while (!found) {
      if (p >= b.length) return None
      (b(p) & 0xff) match {
        case 0x21 => // extension: label byte + sub-blocks
          p += 2
          while ({ if (p >= b.length) throw new Malformed; b(p) != 0 })
            p += 1 + (b(p) & 0xff)
          p += 1
        case 0x2c => found = true
        case _ => return None // trailer before any image, or junk
      }
    }
    val il = u16(p + 1); val it = u16(p + 3)
    val iw = u16(p + 5); val ih = u16(p + 7)
    val ipacked = b(p + 9) & 0xff
    p += 10
    if (il != 0 || it != 0 || iw != w || ih != h) return None // partial
    if ((ipacked & 0x80) != 0) table = readTable(ipacked & 7)
    if (table == null) return None // no color table anywhere
    val interlaced = (ipacked & 0x40) != 0
    if (p >= b.length) return None
    val mcs = b(p) & 0xff
    p += 1
    if (mcs < 2 || mcs > 11) return None
    // reassemble the LZW sub-blocks
    val data = new java.io.ByteArrayOutputStream()
    while ({ if (p >= b.length) throw new Malformed; b(p) != 0 }) {
      val n = b(p) & 0xff
      if (p + 1 + n > b.length) throw new Malformed
      data.write(b, p + 1, n)
      p += 1 + n
    }
    val d = data.toByteArray
    // ── LZW decode (the canonical decoder rule — spec above) ──
    val clear = 1 << mcs
    val eoi = clear + 1
    val base = eoi + 1
    // dictionary as suffix-pointer arrays: entry = (prefix idx, byte)
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val firstByte = new Array[Byte](4096)
    var i = 0
    while (i < clear) {
      prefix(i) = -1; suffix(i) = i.toByte; firstByte(i) = i.toByte
      i += 1
    }
    var dictLen = base
    var width = mcs + 1
    var bitPos = 0
    val nBits = d.length * 8
    def readCode(): Int = {
      if (bitPos + width > nBits) throw new Malformed
      var v = 0
      var k = 0
      while (k < width) {
        val bit = (d((bitPos >> 3)) >> (bitPos & 7)) & 1
        v |= bit << k
        bitPos += 1
        k += 1
      }
      v
    }
    def emitEntry(code: Int, out: Array[Byte], at: Int): Int = {
      // walk the suffix chain backwards; returns entry length
      var len = 0
      var c = code
      while (c >= 0) { len += 1; c = if (c < clear) -1 else prefix(c) }
      var pos = at + len - 1
      c = code
      while (c >= 0) {
        if (pos >= out.length) throw new Malformed
        out(pos) = suffix(c); pos -= 1
        c = if (c < clear) -1 else prefix(c)
      }
      len
    }
    val need = w * h
    val px = new Array[Byte](need)
    var got = 0
    var prev = -1
    var done = false
    while (got < need && !done) {
      val code = readCode()
      if (code == clear) {
        dictLen = base; width = mcs + 1; prev = -1
      } else if (code == eoi) {
        done = true
      } else {
        if (code > dictLen) throw new Malformed // beyond next-to-assign
        if (prev < 0) {
          // first code after a clear: must already exist, no add
          if (code >= dictLen) throw new Malformed
          got += emitEntry(code, px, got)
          prev = code
        } else {
          if (dictLen < 4096) {
            // new entry = dict(prev) + first byte of the entry being
            // emitted (firstByte(prev) in the KwKwK case — the entry
            // being defined IS the one referenced)
            prefix(dictLen) = prev
            suffix(dictLen) =
              if (code == dictLen) firstByte(prev) else firstByte(code)
            firstByte(dictLen) = firstByte(prev)
            dictLen += 1
            if (dictLen == (1 << width) && width < 12) width += 1
          } else if (code == dictLen) {
            throw new Malformed // deferred-clear state cannot KwKwK
          }
          // `code` now exists even in the KwKwK case
          if (code >= dictLen) throw new Malformed
          got += emitEntry(code, px, got)
          prev = code
        }
      }
    }
    if (got < need) return None // short stream
    // ── palette luma + interlace row order → the shared grid fold:
    // rowOf(y) maps a DISPLAY row back to its decode-order row ──
    val rowOf = new Array[Int](h)
    if (interlaced) {
      var ri = 0
      def pass(start: Int, step: Int): Unit = {
        var y = start
        while (y < h) { rowOf(y) = ri; ri += 1; y += step }
      }
      pass(0, 8); pass(4, 8); pass(2, 4); pass(1, 2)
    } else {
      var y = 0
      while (y < h) { rowOf(y) = y; y += 1 }
    }
    val hash = Multimodal.dHashOfLuma(w, h) { (x, y) =>
      val idx = px(rowOf(y) * w + x) & 0xff
      if (idx >= table.length) throw new Malformed
      table(idx).toLong
    }
    Some(GifHashRow(path, w, h, interlaced, hash))
  }
}
