package graft.ext

import org.apache.spark.sql.Dataset

import graft.ext.Multimodal.{MediaFile, WavHashRow}

/** REAL-format FLAC amplitude-envelope hash — the audio arc's
  * LOSSLESS-CODEC leg (the format audio corpora actually archive in),
  * decoding the free-lossless-audio-codec subset a 100-TB audio scan
  * needs: mono AND stereo 16-bit fixed-blocksize streams — stereo in
  * all four channel assignments (independent, left/side, side/right,
  * mid/side; the SIDE subframe one bit deeper, the floor-mid
  * reconstruction recovering the dropped sum bit from the side's
  * parity — the shape every real stereo FLAC uses; round 18) — with
  * CONSTANT / VERBATIM / FIXED(0-4) / LPC subframes, rice-coded
  * residuals with partitions and the 4-bit escape hatch, UTF-8-coded
  * frame numbers,
  * and BOTH CRCs VERIFIED (8-bit header poly 0x07, 16-bit frame poly
  * 0x8005 — a flipped sample byte is a DETECTED drop, not a silent
  * hash shift; the zstd-checksum posture on the audio arc). FLAC is
  * lossless, so the decoded samples equal the encoder's exactly and a
  * FLAC re-encode of a WAV/AIFF sibling joins its cluster at distance
  * 0 through the shared [[Multimodal.envelopeHash]] 65-window spec
  * (stereo hashes over the INTERLEAVED |samples| — the WAV decoder's
  * storage-order convention). Mirrored independently by
  * tools/gen_audio_formats.py (encoder + python decoder, the oracle
  * pair; provenance asserts decoded == formula samples).
  *
  * Rice methods 0 AND 1 (4- and 5-bit params — round 19; the m1.flac
  * fixture carries params ≥ 16 that method 0 cannot express, so the
  * 5-bit path is load-bearing, not a parse-and-ignore).
  *
  * OUT OF CONTRACT (file SKIPPED, never thrown): 3+-channel and
  * non-16-bit streams, variable-blocksize streams, wasted bits,
  * reserved residual methods 2/3, reserved subframe types, 0-bit
  * escape partitions (an all-zero partition written raw — our
  * encoder never emits it and an untestable accept path is a
  * liability), CRC mismatches, truncation, trailing bytes after the
  * last frame, sub-window payloads (<65 samples), and a
  * total-samples bomb cap before any allocation.
  *
  * MP3 BOUNDARY (the round-18 decision record, the brotli/ae1841c
  * pattern): MPEG-1 Layer III is NOT decodable at fixture scale — a
  * certifiable decoder needs the 32-band polyphase synthesis
  * filterbank with its 512-tap windowing vector, IMDCT with alias
  * reduction, the scalefactor band tables for every samplerate, and
  * the full set of Huffman tables from ISO/IEC 11172-3 Annex B —
  * hundreds of spec constants whose correct transcription cannot be
  * certified by a fixture round trip (a transcription error on BOTH
  * sides of the oracle pair passes; for lossy formats the pinned
  * tables ARE the contract, and libmad-scale table surface defeats
  * the discipline that made JPEG certifiable, where the ONE pinned
  * 64-entry IDCT basis is regenerated from its formula by both
  * sides). No MP3 decoder exists in the dependency surface either
  * (the JDK ships none; nothing resolves offline). MP3 files
  * therefore DROP at the container gate like any undecodable format;
  * a production build adds a JLayer-class dependency and one decode
  * rung — the envelope-hash contract does not change shape.
  */
object Flac {

  /** INTERLEAVED-samples bomb cap: 2^24 16-bit samples (~35 min of
    * mono at 8 kHz, a 64 MB working set) — a header claiming more is
    * a bomb or out of scope for a fixture-certified decoder.
    */
  val MaxSamples: Long = 1L << 24

  def aHashFlac(files: Dataset[MediaFile]): Dataset[WavHashRow] = {
    val spark = files.sparkSession
    import spark.implicits._
    files.mapPartitions(_.flatMap(f => parseFlacAHash(f.path, f.content)))
  }

  private final class Malformed extends RuntimeException

  private def crc8(d: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) {
      c ^= d(i) & 0xff
      var k = 0
      while (k < 8) {
        c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff
        else (c << 1) & 0xff
        k += 1
      }
      i += 1
    }
    c
  }

  private def crc16(d: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) {
      c ^= (d(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff
        else (c << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    c
  }

  /** MSB-first bit reader (FLAC convention). */
  private final class Msb(d: Array[Byte]) {
    var pos = 0
    private val nBits = d.length * 8
    def read(n: Int): Int = {
      if (pos + n > nBits) throw new Malformed
      var v = 0
      var i = 0
      while (i < n) {
        v = (v << 1) | ((d((pos >> 3)) >> (7 - (pos & 7))) & 1)
        pos += 1
        i += 1
      }
      v
    }
    def sread(n: Int): Int = {
      val v = read(n)
      if (v >= (1 << (n - 1))) v - (1 << n) else v
    }
    def unary(): Int = {
      var q = 0
      while (read(1) == 0) {
        q += 1
        if (q > (1 << 20)) throw new Malformed // runaway quotient
      }
      q
    }
  }

  /** Pure parser, package-visible for direct spec coverage. */
  private[graft] def parseFlacAHash(
      path: String, b: Array[Byte]): Option[WavHashRow] =
    try body(path, b)
    catch {
      case _: Malformed => None
      case _: IndexOutOfBoundsException => None
    }

  private def body(path: String, b: Array[Byte]): Option[WavHashRow] = {
    if (b.length < 42 || b(0) != 'f' || b(1) != 'L' || b(2) != 'a' ||
        b(3) != 'C') return None
    // ── metadata walk: STREAMINFO is mandatory-first; others skip ──
    var p = 4
    var rate = -1
    var total = -1L // inter-channel samples (frames)
    var nchG = 1
    var last = false
    var sawInfo = false
    while (!last) {
      if (p + 4 > b.length) return None
      last = (b(p) & 0x80) != 0
      val typ = b(p) & 0x7f
      val len = ((b(p + 1) & 0xff) << 16) | ((b(p + 2) & 0xff) << 8) |
        (b(p + 3) & 0xff)
      if (p + 4L + len > b.length) return None
      if (typ == 0) {
        if (sawInfo || len != 34) return None
        val o = p + 4
        rate = ((b(o + 10) & 0xff) << 12) | ((b(o + 11) & 0xff) << 4) |
          ((b(o + 12) & 0xff) >> 4)
        val nch = ((b(o + 12) >> 1) & 7) + 1
        val bits = (((b(o + 12) & 1) << 4) | ((b(o + 13) & 0xff) >> 4)) + 1
        total = ((b(o + 13) & 0x0fL) << 32) |
          ((b(o + 14) & 0xffL) << 24) | ((b(o + 15) & 0xffL) << 16) |
          ((b(o + 16) & 0xffL) << 8) | (b(o + 17) & 0xffL)
        if ((nch != 1 && nch != 2) || bits != 16)
          return None // mono/stereo 16-bit contract
        nchG = nch
        sawInfo = true
      }
      p += 4 + len
    }
    if (!sawInfo || rate <= 0) return None
    val nch = nchG
    if (total * nch < 65) return None // sub-window (shared rule)
    if (total * nch > MaxSamples) return None // bomb cap pre-alloc
    val out = new Array[Int]((total * nch).toInt)
    var got = 0
    var fidx = 0L
    val frames = java.util.Arrays.copyOfRange(b, p, b.length)
    val br = new Msb(frames)
    while (got < total) {
      val fStart = br.pos >> 3
      if (br.read(14) != 0x3ffe) throw new Malformed // sync
      if (br.read(1) != 0) throw new Malformed
      if (br.read(1) != 0) throw new Malformed // fixed-blocksize only
      val bsc = br.read(4)
      val src = br.read(4)
      val ca = br.read(4)
      // 0 = mono, 1 = independent stereo, 8/9/10 = left-side /
      // side-right / mid-side; 3..8-channel layouts are out
      val caOk = (ca == 0 && nch == 1) ||
        ((ca == 1 || ca == 8 || ca == 9 || ca == 10) && nch == 2)
      if (!caOk) throw new Malformed
      if (br.read(3) != 0x4) throw new Malformed // 16-bit
      if (br.read(1) != 0) throw new Malformed
      // UTF-8 coded frame number
      val lead = br.read(8)
      var num = lead.toLong
      if (lead >= 0xc0) {
        var extra = 0
        var t = lead
        while ((t & 0x40) != 0) { extra += 1; t = (t << 1) & 0xff }
        if (extra < 1 || extra > 6) throw new Malformed
        num = (lead & (0x3f >> extra)).toLong
        var e = 0
        while (e < extra) {
          val c = br.read(8)
          if ((c & 0xc0) != 0x80) throw new Malformed
          num = (num << 6) | (c & 0x3f)
          e += 1
        }
      } else if (lead >= 0x80) throw new Malformed
      if (num != fidx) throw new Malformed // frames arrive in order
      val bs = bsc match {
        case 0x6 => br.read(8) + 1
        case 0x7 => br.read(16) + 1
        case 0x1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case c if c >= 8 => 256 << (c - 8)
        case _ => throw new Malformed
      }
      // RFC 9639 sample-rate codes: 1-11 are TABLE rates (22.05/24/
      // 32 kHz are codes 6/7/8 — NO trailing bytes); the uncommon-
      // rate trailing forms are 12 (8-bit kHz) and 13/14 (16-bit
      // Hz / Hz×10). Round-18 review fix: a copy-paste of the
      // blocksize match above read 8-16 spurious bits at codes
      // 6/7/8, silently dropping every valid file at those three
      // common rates (the fixture round-trip pinned only code 4).
      src match {
        case 12 => br.read(8)
        case 13 | 14 => br.read(16)
        case c if c >= 1 && c <= 11 => // table-coded rate: fine
        case _ => throw new Malformed // 0 (from STREAMINFO) / 15 out
      }
      if (got + bs > total) throw new Malformed
      val hdrEnd = br.pos >> 3
      if ((br.pos & 7) != 0) throw new Malformed // header is byte-exact
      if (crc8(frames, fStart, hdrEnd) != br.read(8)) throw new Malformed
      // ── subframes: one per channel. STEREO DECORRELATION
      // (round 18): assignments 8/9/10 store left+side / side+right /
      // mid+side, the SIDE subframe one bit deeper (bps+1) — the
      // shape every real stereo FLAC actually uses. ──
      val sideIdx = ca match {
        case 8 => 1 // left/side
        case 9 => 0 // side/right
        case 10 => 1 // mid/side
        case _ => -1
      }
      val chans = new Array[Array[Int]](nch)
      var ci = 0
      while (ci < nch) {
        chans(ci) =
          decodeSubframe(br, bs, if (ci == sideIdx) 17 else 16)
        ci += 1
      }
      // reconstruct interleaved L/R (or pass mono through)
      if (nch == 1) {
        var i = 0
        while (i < bs) { out(got + i) = chans(0)(i); i += 1 }
      } else {
        val a = chans(0)
        val bb2 = chans(1)
        var i = 0
        while (i < bs) {
          var l = 0
          var r2 = 0
          ca match {
            case 1 => l = a(i); r2 = bb2(i)
            case 8 => l = a(i); r2 = a(i) - bb2(i) // side = L − R
            case 9 => r2 = bb2(i); l = bb2(i) + a(i)
            case _ => // mid/side: mid = (L+R)>>1 floor, side = L−R;
              // the dropped low bit of the sum is the side's parity
              val side = bb2(i)
              val mid2 = (a(i) << 1) | (side & 1)
              l = (mid2 + side) >> 1
              r2 = (mid2 - side) >> 1
          }
          if (l < -32768 || l > 32767 || r2 < -32768 || r2 > 32767)
            throw new Malformed
          out((got + i) * 2) = l
          out((got + i) * 2 + 1) = r2
          i += 1
        }
      }
      // footer: zero padding to a byte boundary, then CRC-16
      if ((br.pos & 7) != 0 && br.read(8 - (br.pos & 7)) != 0)
        throw new Malformed
      val fEnd = br.pos >> 3
      if (crc16(frames, fStart, fEnd) != br.read(16)) throw new Malformed
      got += bs
      fidx += 1
    }
    // the stream must end exactly at the last frame's CRC
    if (br.pos != frames.length * 8) return None
    val h = Multimodal.envelopeHash(total * nch) { i =>
      math.abs(out(i.toInt))
    }
    Some(WavHashRow(path, rate, total * nch, h))
  }

  /** Decode ONE subframe of `bs` samples at `bps` bits (17 for a
    * SIDE channel — stereo decorrelation stores L−R one bit deeper)
    * into a fresh per-channel array; prediction never crosses the
    * subframe boundary (warmups are its first `order` samples).
    */
  private def decodeSubframe(br: Msb, bs: Int, bps: Int): Array[Int] = {
    val out = new Array[Int](bs)
    if (br.read(1) != 0) throw new Malformed
    val typ = br.read(6)
    if (br.read(1) != 0) throw new Malformed // wasted bits: out
    if (typ == 0) {
      val v = br.sread(bps)
      var i = 0
      while (i < bs) { out(i) = v; i += 1 }
    } else if (typ == 1) {
      var i = 0
      while (i < bs) { out(i) = br.sread(bps); i += 1 }
    } else if ((typ >= 8 && typ <= 12) || typ >= 32) {
      val isLpc = typ >= 32
      val order = if (isLpc) typ - 32 + 1 else typ - 8
      if (order > bs) throw new Malformed
      var i = 0
      while (i < order) { out(i) = br.sread(bps); i += 1 }
      var shift = 0
      var coefs: Array[Int] = null
      if (isLpc) {
        val prec = br.read(4) + 1
        if (prec > 15) throw new Malformed
        shift = br.read(5)
        coefs = new Array[Int](order)
        var j = 0
        while (j < order) { coefs(j) = br.sread(prec); j += 1 }
      }
      // residuals: rice methods 0 (4-bit params) AND 1 (5-bit params,
      // round 19 — high-resolution streams emit it; the escape code
      // widens with the field to 0x1f); reserved methods 2/3 drop
      val method = br.read(2)
      if (method > 1) throw new Malformed
      val pbits = 4 + method
      val escape = (1 << pbits) - 1
      val porder = br.read(4)
      val nparts = 1 << porder
      if (bs % nparts != 0 || bs / nparts <= order) throw new Malformed
      var i2 = order
      var pi = 0
      while (pi < nparts) {
        val cnt = bs / nparts - (if (pi == 0) order else 0)
        val prm = br.read(pbits)
        var c = 0
        if (prm == escape) { // escape: raw residuals
          val raw = br.read(5)
          if (raw == 0) throw new Malformed
          while (c < cnt) {
            out(i2) = predictAdd(out, i2, order, isLpc, coefs, shift,
              br.sread(raw), bps)
            i2 += 1; c += 1
          }
        } else {
          while (c < cnt) {
            val q = br.unary()
            val u = (q.toLong << prm) |
              (if (prm > 0) br.read(prm) else 0)
            // a 17-bit-domain residual never approaches 2^26; a
            // larger u would truncate silently through .toInt and
            // HASH wrong samples instead of dropping (round-18
            // review fix — the decode-exactly-or-skip contract)
            if (u > (1L << 26)) throw new Malformed
            val r = ((u >> 1) ^ -(u & 1L)).toInt
            out(i2) = predictAdd(out, i2, order, isLpc, coefs, shift,
              r, bps)
            i2 += 1; c += 1
          }
        }
        pi += 1
      }
    } else throw new Malformed // reserved subframe types
    out
  }

  /** Reconstruct one sample: fixed/LPC prediction + residual, bounded
    * to the subframe's declared bit depth — a stream escaping it is
    * malformed, and the tight bound also keeps math.abs exact
    * (Int.MinValue would negate to itself — round-18 review fix).
    */
  private def predictAdd(out: Array[Int], i: Int, order: Int,
      isLpc: Boolean, coefs: Array[Int], shift: Int, r: Int,
      bps: Int): Int = {
    val pred: Long =
      if (isLpc) {
        var s = 0L
        var j = 0
        while (j < order) {
          s += coefs(j).toLong * out(i - 1 - j)
          j += 1
        }
        s >> shift
      } else order match {
        case 0 => 0L
        case 1 => out(i - 1).toLong
        case 2 => 2L * out(i - 1) - out(i - 2)
        case 3 => 3L * out(i - 1) - 3L * out(i - 2) + out(i - 3)
        case _ => 4L * out(i - 1) - 6L * out(i - 2) +
          4L * out(i - 3) - out(i - 4)
      }
    val v = pred + r
    if (v < -(1L << (bps - 1)) || v > (1L << (bps - 1)) - 1)
      throw new Malformed
    v.toInt
  }
}
