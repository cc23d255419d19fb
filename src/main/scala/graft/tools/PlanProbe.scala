package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.SparkEntry

object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.maxFields", "600")
      .appName("plan-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("q18_dedup_minhash", "q32_embed_neardup", "q41_sim_topk_lsh", "q34_jaccard_pairs")) {
      val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.01")
      df.write.format("noop").mode("overwrite").save()
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      val nEx = "Exchange hashpartitioning".r.findAllIn(plan).size
      val nReuse = "ShuffleQueryStage .*isReused=true".r.findAllIn(plan).size +
        "ReusedExchange".r.findAllIn(plan).size
      println(s"PLAN $q exchanges=$nEx reused=$nReuse nlj=${plan.contains("NestedLoop")}")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"/tmp/plan_$q.txt"), plan)
    }
    spark.stop()
  }
}
