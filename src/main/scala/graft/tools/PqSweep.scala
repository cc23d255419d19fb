package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.ProductQuant
object PqSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val qs = emb.filter(col("vec_id") % 50 === 0)
    val exact = ProductQuant.bruteForceTopKDot(emb, qs, "vec_id", "embedding", 5)
      .select("query_id","neighbor_id").cache()
    exact.count()
    for ((m,k,it,r) <- Seq((16,16,1,50),(16,16,1,100),(8,64,1,50),(8,64,1,100),(16,16,1,25),(8,16,1,100))) {
      val cb = ProductQuant.trainCodebook(emb, "vec_id", "embedding", m, 64, k, lloydIters = it)
      val codes = ProductQuant.encode(emb, "vec_id", "embedding", cb)
      val short = ProductQuant.pqTopK(codes, qs, "vec_id", "embedding", cb, r)
        .select("query_id","neighbor_id")
      val rer = short.join(emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("__cv")), Seq("neighbor_id"))
        .join(qs.select(col("vec_id").as("query_id"), col("embedding").as("__qv")), Seq("query_id"))
        .withColumn("score", graft.ext.SimSearch.dotD(col("__qv"), col("__cv")))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
      val top = rer.withColumn("rk", row_number().over(w)).filter(col("rk") <= 5).select("query_id","neighbor_id")
      val hit = exact.join(top, Seq("query_id","neighbor_id"), "left_semi").count()
      println(s"m=$m k=$k iters=$it R=$r  n_hit=$hit / 50")
    }
  }
}
