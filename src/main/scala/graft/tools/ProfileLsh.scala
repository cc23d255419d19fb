package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, SimHash}
import graft.tables.Corpus

/** Dev profiling harness for the LSH family (not part of the driver
  * contract; run with: sbt "runMain graft.tools.ProfileLsh").
  */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.maxFields", "260")
      .appName("profile-lsh").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def docs = Corpus.load(spark, dir, "documents")
    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROF $name%-40s ${ts.map(t => f"$t%7.2f").mkString(" ")}")
    }
    // warm-up
    docs.write.format("noop").mode("overwrite").save()

    time("minhash 128x32") {
      Dedup.nearDupPairsMinhash(docs, "doc_id", "text", 3, 128, 32, 0.8)
        .write.format("noop").mode("overwrite").save()
    }
    time("simhash") {
      SimHash.nearDupPairsSimhash(docs, "doc_id", "text", 3, 8)
        .write.format("noop").mode("overwrite").save()
    }
    time("jaccard uncapped") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5, None)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
