package graft

import org.apache.spark.sql.functions._

import graft.ext.ProductQuant

/** Product quantization: exact-codebook bit parity, the exhaustive-
  * shortlist escape, and code-shape invariants.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val clustered =
    spark.read.parquet("/root/repo/fixtures/embeddings_clustered.parquet")
  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("exact codebook: ADC top-k == brute-force inner-product top-k, row for row") {
    val qs = clustered.filter($"vec_id" % 97 === 0)
    val cb = ProductQuant.exactCodebook(clustered, "embedding", m = 8, dim = 64)
    val adc = ProductQuant.pqTopK(
      ProductQuant.encode(clustered, "vec_id", "embedding", cb),
      qs, "vec_id", "embedding", cb, k = 5)
    val truth = ProductQuant.bruteForceTopKDot(clustered, qs, "vec_id", "embedding", k = 5)
    assert(adc.count() > 0)
    assert(adc.exceptAll(truth).count() == 0 && truth.exceptAll(adc).count() == 0,
      "zero quantization error must reproduce exact scores AND exact ranks")
  }

  test("exhaustive shortlist: rerank equals brute force even with a LOSSY codebook") {
    // the q44-style escape: whatever the codes get wrong, a shortlist
    // covering the whole corpus means the exact rerank decides alone
    val qs = emb.filter($"vec_id" % 125 === 0)
    val cb = ProductQuant.trainCodebook(emb, "vec_id", "embedding",
      m = 8, dim = 64, k = 4, lloydIters = 1) // deliberately coarse
    val n = emb.count().toInt
    val got = ProductQuant.pqRerankTopK(
      ProductQuant.encode(emb, "vec_id", "embedding", cb),
      emb, qs, "vec_id", "embedding", cb, shortlist = n - 1, k = 5)
    val truth = ProductQuant.bruteForceTopKDot(emb, qs, "vec_id", "embedding", k = 5)
    assert(got.exceptAll(truth).count() == 0 && truth.exceptAll(got).count() == 0)
  }

  test("codes are dense per subspace and every vector encodes m codes") {
    val cb = ProductQuant.trainCodebook(emb, "vec_id", "embedding",
      m = 16, dim = 64, k = 8, lloydIters = 1)
    val perSub = cb.centroids.groupBy("sub")
      .agg(count(lit(1)).as("n"), min("code").as("lo"), max("code").as("hi"))
      .collect()
    assert(perSub.length == 16)
    perSub.foreach { r =>
      assert(r.getAs[Long]("n") == 8 && r.getAs[Int]("lo") == 0 && r.getAs[Int]("hi") == 7,
        s"codes must be dense 0..k-1 per subspace: $r")
    }
    val codes = ProductQuant.encode(emb, "vec_id", "embedding", cb)
    assert(codes.filter(size($"codes") =!= 16).count() == 0)
    assert(codes.count() == emb.count())
  }

  test("stored index round-trips; append encodes against the FROZEN codebook") {
    val work = java.nio.file.Files.createTempDirectory("graft-pq-idx").toString
    val base = emb.filter($"vec_id" % 5 =!= 0)
    val batch = emb.filter($"vec_id" % 5 === 0)
    val cb = ProductQuant.trainCodebook(base, "vec_id", "embedding",
      m = 16, dim = 64, k = 16, lloydIters = 1)
    val baseCodes = ProductQuant.encode(base, "vec_id", "embedding", cb)
    ProductQuant.writePqIndex(cb, baseCodes, work)
    ProductQuant.appendToPqIndex(batch, work, "vec_id", "embedding")
    val (cb2, codes2) = ProductQuant.readPqIndex(spark, work)
    assert(cb2.m == 16 && cb2.dim == 64)
    // codebook byte-stable across the round trip
    assert(cb.centroids.exceptAll(cb2.centroids).count() == 0 &&
      cb2.centroids.exceptAll(cb.centroids).count() == 0)
    // stored base codes untouched by the append; batch codes equal an
    // encode against the stored (frozen) codebook
    assert(codes2.count() == emb.count())
    val batchCodes = ProductQuant.encode(batch, "vec_id", "embedding", cb2)
    assert(codes2.join(batch.select($"vec_id".as("neighbor_id")), Seq("neighbor_id"), "left_semi")
      .exceptAll(batchCodes).count() == 0)
    assert(codes2.join(base.select($"vec_id".as("neighbor_id")), Seq("neighbor_id"), "left_semi")
      .exceptAll(baseCodes).count() == 0)
  }

  test("shortlist widening is monotone in recall on the trained config") {
    val qs = emb.filter($"vec_id" % 50 === 0)
    val truth = ProductQuant.bruteForceTopKDot(emb, qs, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id")
    val cb = ProductQuant.trainCodebook(emb, "vec_id", "embedding",
      m = 16, dim = 64, k = 16, lloydIters = 1)
    val codes = ProductQuant.encode(emb, "vec_id", "embedding", cb)
    def hits(r: Int): Long = truth.join(
      ProductQuant.pqRerankTopK(codes, emb, qs, "vec_id", "embedding", cb, r, 5)
        .select("query_id", "neighbor_id"),
      Seq("query_id", "neighbor_id"), "left_semi").count()
    val (h25, h100) = (hits(25), hits(100))
    assert(h25 <= h100, s"recall must not shrink as the shortlist widens: $h25 vs $h100")
    assert(h100 >= (truth.count() * 0.9).toLong,
      "the generous shortlist must clear the contract band")
  }
}
