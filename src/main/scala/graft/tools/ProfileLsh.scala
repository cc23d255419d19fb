package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, SimHash, SimSearch}
import graft.tables.Corpus

/** Dev profiling harness for the LSH family (not part of the driver
  * contract; run with: sbt "runMain graft.tools.ProfileLsh").
  */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.maxFields", "260")
      .appName("profile-lsh").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROF $name%-40s ${ts.map(t => f"$t%7.2f").mkString(" ")}")
    }
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = Corpus.load(spark, sf, "embeddings")
      val exact = SimSearch.nearDupPairsCosine(emb, "vec_id", "embedding", 0.45)
        .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val viaLsh = SimSearch.nearDupPairsCosineLsh(emb, "vec_id", "embedding", 0.45, 64)
        .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"EQCHECK $sf exact=${exact.size} lsh=${viaLsh.size} equal=${exact == viaLsh} " +
        s"missed=${(exact -- viaLsh).take(5)}")
    }
    val emb01 = Corpus.load(spark, "/root/testdata/sf0.1", "embeddings")
    time("embed_neardup all-pairs (old q32)") {
      SimSearch.nearDupPairsCosine(emb01, "vec_id", "embedding", 0.45)
        .write.format("noop").mode("overwrite").save()
    }
    time("embed_neardup LSH (new q32)") {
      SimSearch.nearDupPairsCosineLsh(emb01, "vec_id", "embedding", 0.45, 64)
        .write.format("noop").mode("overwrite").save()
    }
    // stage breakdown (current shape)
    locally {
      val n = emb01.select(col("vec_id").as("__id"), col("embedding").as("__v"))
        .repartition(col("__id"))
      val sigArr = array((0 until 48).map(t =>
        SimSearch.hyperplaneSig(col("__v"), 64, 4, 7L + t)): _*)
      val keyed = n.select(col("__id"), col("__v"),
          explode(transform(sigArr, (s, i) => s * 48 + i)).as("__k"))
        .repartition(col("__k"))
      time("LSH stage: keyed sigs only") {
        keyed.write.format("noop").mode("overwrite").save()
      }
      time("LSH stage: join ids only") {
        keyed.as("a").join(keyed.as("b"),
            col("a.__k") === col("b.__k") && col("a.__id") < col("b.__id"))
          .select(col("a.__id"), col("b.__id"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
