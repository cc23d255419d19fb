package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located joins: pre-bucketing both fact tables on the
  * join key removes the per-query shuffle entirely — the 100-TB answer
  * for a join that runs on every report (vs paying the exchange each
  * time). Asserts the physical plan has NO shuffle exchange on either
  * side of the bucketed join.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join runs without a shuffle exchange") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val o = spark.read.parquet(s"$sf0001/orders.parquet")

    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    li.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    o.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString

    // the join itself must not reshuffle its bucketed inputs: the only
    // allowed exchange is the one feeding the final small aggregation
    val joinPart = plan.split("SortMergeJoin|ShuffledHashJoin").drop(1).mkString
    assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey"),
      "bucketed left side was reshuffled")
    assert(!joinPart.contains("Exchange hashpartitioning(o_orderkey"),
      "bucketed right side was reshuffled")

    // and the result matches the plain shuffle join
    val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    assert(joined.except(plain).count() == 0 && plain.except(joined).count() == 0)
  }
}
