package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object UtokDiff {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("utok-diff").config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false).getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val rows = (0x20 to 0x2FFFF)
      .filterNot(cp => cp >= 0xD800 && cp <= 0xDFFF)
      .map { cp =>
        val c = new String(Character.toChars(cp))
        (cp, s"a${c}b $c$c 9${c}中${c}x")
      }
    val df = rows.toDF("cp", "s").repartition(32)
    val badDf = df
      .withColumn("e", graft.ext.TextAnalysis.tokens(col("s")))
      .withColumn("c", graft.ext.TextAnalysis.tokensComposed(col("s")))
      .filter(not(col("e") <=> col("c")))
      .select("cp", "e", "c")
    println(s"COUNT1: ${badDf.count()}")
    val bad = badDf.collect()
    println(s"MISMATCHES: ${bad.length}")
    println(s"COUNT2: ${badDf.count()}")
    bad.take(20).foreach { r =>
      def esc(xs: Seq[String]) = xs.map(_.flatMap(ch => if (ch < 128) ch.toString else f"\\u${ch.toInt}%04x")).mkString("|")
      println(f"cp=${r.getInt(0)}%05x e=${esc(r.getSeq[String](1))} c=${esc(r.getSeq[String](2))}")
    }
    spark.stop()
  }
}
