package graft

import org.apache.spark.sql.functions._

import graft.plans.Inflate

/** Bounded inflate: round-trip identity, every hostile-input route,
  * the bomb cap, multi-member gzip, and the deflate zlib/raw sniff.
  * Plan-level (through codegen) AND unit-level (the static methods),
  * so a codegen regression and a logic regression fail differently.
  */
class InflateSpec extends SparkSpec {
  import spark.implicits._

  private def rt(s: String, fmt: Int): Array[Byte] =
    Inflate.inflate(Inflate.compress(s.getBytes("UTF-8"), fmt), fmt,
      Inflate.DefaultMaxBytes)

  test("round-trip identity across formats, unit level") {
    for (fmt <- Seq(Inflate.Gzip, Inflate.Zlib, Inflate.RawDeflate)) {
      assert(new String(rt("hello inflate é世界", fmt),
        "UTF-8") == "hello inflate é世界")
      assert(rt("", fmt).length == 0) // '' is a valid member
    }
    // HTTP-deflate sniff: both zlib and raw bodies decode under DeflateSniff
    val z = Inflate.compress("zz body".getBytes("UTF-8"), Inflate.Zlib)
    val r = Inflate.compress("rr body".getBytes("UTF-8"), Inflate.RawDeflate)
    assert(new String(Inflate.inflate(z, Inflate.DeflateSniff, 1 << 20),
      "UTF-8") == "zz body")
    assert(new String(Inflate.inflate(r, Inflate.DeflateSniff, 1 << 20),
      "UTF-8") == "rr body")
  }

  test("multi-member gzip concatenation decodes to the concatenation") {
    val a = Inflate.compress("alpha ".getBytes("UTF-8"), Inflate.Gzip)
    val b = Inflate.compress("beta".getBytes("UTF-8"), Inflate.Gzip)
    assert(new String(
      Inflate.inflate(a ++ b, Inflate.Gzip, 1 << 20), "UTF-8") == "alpha beta")
  }

  test("hostile inputs route NULL, never a truncated prefix") {
    val good = Inflate.compress("the quick brown fox".getBytes("UTF-8"),
      Inflate.Gzip)
    def mut(i: Int, b: Byte): Array[Byte] = {
      val c = good.clone(); c(i) = b; c
    }
    assert(Inflate.inflate(Array[Byte](), Inflate.Gzip, 1024) == null)
    assert(Inflate.inflate(mut(0, 0x00), Inflate.Gzip, 1024) == null) // magic
    assert(Inflate.inflate(mut(2, 0x07), Inflate.Gzip, 1024) == null) // CM!=8
    assert(Inflate.inflate(mut(3, 0x20), Inflate.Gzip, 1024) == null) // rsvd FLG
    // corrupt deflate data mid-stream
    assert(Inflate.inflate(mut(12, 0x55), Inflate.Gzip, 1024) == null)
    // corrupt CRC32 trailer byte
    assert(Inflate.inflate(mut(good.length - 8, (good(good.length - 8) ^ 1)
      .toByte), Inflate.Gzip, 1024) == null)
    // corrupt ISIZE trailer byte
    assert(Inflate.inflate(mut(good.length - 1, (good(good.length - 1) ^ 1)
      .toByte), Inflate.Gzip, 1024) == null)
    // truncated: drop the last 3 bytes of the trailer
    assert(Inflate.inflate(good.dropRight(3), Inflate.Gzip, 1024) == null)
    // trailing garbage that is not another member (stricter than JDK)
    assert(Inflate.inflate(good ++ "junk".getBytes, Inflate.Gzip, 1024) == null)
    // deflate trailing garbage
    val z = Inflate.compress("x".getBytes, Inflate.Zlib)
    assert(Inflate.inflate(z ++ Array[Byte](1, 2), Inflate.DeflateSniff,
      1024) == null)
    // truncated raw-deflate stream
    val raw = Inflate.compress("truncate me please".getBytes,
      Inflate.RawDeflate)
    assert(Inflate.inflate(raw.dropRight(4), Inflate.RawDeflate, 1024) == null)
  }

  test("bomb cap: oversize output routes NULL at the cap, never OOM") {
    val big = ("A" * 100000).getBytes("UTF-8") // ~100 KB of trivially
    val gz = Inflate.compress(big, Inflate.Gzip) // compressible bytes
    assert(gz.length < 1000) // it IS a (small) bomb
    assert(Inflate.inflate(gz, Inflate.Gzip, 50000) == null) // cap < size
    assert(Inflate.inflate(gz, Inflate.Gzip, 100000) != null) // cap == size
  }

  test("plan level: codegen'd round-trip over the documents corpus") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"text")
    val out = docs.select($"doc_id", $"text",
      Inflate.gunzip(Inflate.gzipCompress(to_binary($"text", lit("utf-8"))))
        .cast("string").as("gz_rt"),
      Inflate.inflateDeflate(
        Inflate.zlibCompress(to_binary($"text", lit("utf-8"))))
        .cast("string").as("zlib_rt"))
    assert(out.filter($"gz_rt" =!= $"text" || $"zlib_rt" =!= $"text")
      .count() == 0)
    assert(out.count() > 0)
    // null propagates (compress of NULL is NULL, inflate of NULL is NULL)
    val n = docs.limit(1).select(
      Inflate.gunzip(Inflate.gzipCompress(lit(null).cast("binary"))).as("x"))
    assert(n.filter($"x".isNull).count() == 1)
  }

  test("zstd: round-trip, frame concatenation, every hostile route, the " +
      "checksum guarantee, and the bomb cap") {
    def z(s: String) = Inflate.compress(s.getBytes("UTF-8"), Inflate.ZstdFmt)
    // round-trip (unit) + determinism (the fixture-compressor contract)
    assert(new String(Inflate.inflate(z("hello zstd é世界"),
      Inflate.ZstdFmt, 1 << 20), "UTF-8") == "hello zstd é世界")
    assert(z("stable bytes").sameElements(z("stable bytes")))
    // frame concatenation is legal (RFC 8878 §3.1, the gzip
    // multi-member twin) and decodes to the concatenation
    assert(new String(Inflate.inflate(z("alpha ") ++ z("beta"),
      Inflate.ZstdFmt, 1 << 20), "UTF-8") == "alpha beta")
    // hostile routes: NULL, never a truncated prefix
    val good = z("the quick brown fox")
    assert(Inflate.inflate(Array[Byte](), Inflate.ZstdFmt, 1024) == null)
    assert(Inflate.inflate("junk".getBytes, Inflate.ZstdFmt, 1024) == null)
    assert(Inflate.inflate(good ++ "junk".getBytes,
      Inflate.ZstdFmt, 1024) == null) // trailing garbage
    assert(Inflate.inflate(good.dropRight(4),
      Inflate.ZstdFmt, 1024) == null) // truncated
    // the checksum guarantee: our compressor ALWAYS writes the
    // optional xxhash64 content checksum, so a flipped payload byte
    // is a detected integrity violation, not silent wrong bytes
    // (zstd frames WITHOUT the checksum decode such corruption
    // silently — the reason compress() pins it on)
    val corrupt = good.clone(); corrupt(10) = (corrupt(10) ^ 0xff).toByte
    assert(Inflate.inflate(corrupt, Inflate.ZstdFmt, 1024) == null)
    // bomb cap
    val bomb = Inflate.compress(("A" * 100000).getBytes, Inflate.ZstdFmt)
    assert(bomb.length < 1000)
    assert(Inflate.inflate(bomb, Inflate.ZstdFmt, 50000) == null)
    assert(Inflate.inflate(bomb, Inflate.ZstdFmt, 100000) != null)
    // plan level, through codegen
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"text")
    val out = docs.select($"text",
      Inflate.unzstd(Inflate.zstdCompress(to_binary($"text", lit("utf-8"))))
        .cast("string").as("rt"))
    assert(out.filter($"rt" =!= $"text").count() == 0)
    assert(out.count() > 0)
  }
}
