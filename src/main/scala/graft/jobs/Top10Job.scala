package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ColumnLib._
import graft.operators.TopK

/** Daily top-10 best-selling resources per category (reference
  * `top10.py`), re-expressed as one declarative plan.
  *
  * Shape: clean dims (P1/P2/X1) → events day key (X2) → left joins
  * J1/J2 → purchase counts A1 → composite-key join-back J3 → dense_rank
  * top-10 W1/F1 (ties share a position, so >10 rows can survive — the
  * reference's observable semantics) → grain dedup O2 → global sort O1.
  *
  * Scale: the join-back re-expands to event grain exactly like the
  * reference, and the O2 dedup collapses it again — kept because it IS
  * the reference's semantics (dedup is observable when an event appears
  * twice per key). The counts aggregate shuffles on (date, resourceId);
  * dims are broadcast (bounded by contract). The reference's per-day
  * driver loop + full recompute (top10.py:262-278) is replaced by a
  * single partitioned write — one pass, no re-execution.
  */
object Top10Job {

  def cleanCategories(categories: DataFrame): DataFrame =
    categories.select(
      normalizeDottedId(col("id")).as("categoryId"),
      col("name").as("categoryName"))

  /** Resources store categoryId already normalized — only the categories
    * API payload needs the X1 rewrite (the reference normalizes
    * categories only, top10.py:62-83 vs :118-134).
    */
  def cleanResources(resources: DataFrame): DataFrame =
    resources.select(
      col("id").as("resourceId"),
      col("name").as("resourceName"),
      col("categoryId"))

  /** Day-keyed purchase counts — the compacted grain the report ranks
    * over: (date, resourceId, count). In streaming this grain is the
    * running aggregate state (StreamingReports.top10Stream); in batch
    * it is a plain groupBy.
    */
  def dailyCounts(events: DataFrame): DataFrame =
    events
      .withColumn("date", substring(col("processTime"), 1, 10))
      .groupBy("date", "resourceId").count()

  /** The top-10 report from pre-compacted counts. Identical output to
    * `transform` (JobsSpec asserts it): dense_rank is invariant to the
    * event-grain duplication that transform's reference-shaped
    * join-back re-introduces and its O2 dedup collapses again, so
    * ranking the compacted grain directly skips both steps.
    */
  def reportFromCounts(counts: DataFrame, resources: DataFrame, categories: DataFrame): DataFrame = {
    val withDims = counts
      .join(broadcast(cleanResources(resources)), Seq("resourceId"), "left")
      .join(broadcast(cleanCategories(categories)), Seq("categoryId"), "left")
    TopK.denseTopK(withDims, Seq("date", "categoryId"), col("count").desc, 10)
      .orderBy("date", "categoryId", "position")
      .select("position", "date", "categoryId", "categoryName", "resourceId", "resourceName")
  }

  def transform(events: DataFrame, resources: DataFrame, categories: DataFrame): DataFrame = {
    val ev = events
      .withColumn("date", substring(col("processTime"), 1, 10))
      .select("date", "resourceId")
    val joined = ev
      .join(broadcast(cleanResources(resources)), Seq("resourceId"), "left")
      .join(broadcast(cleanCategories(categories)), Seq("categoryId"), "left")
    val counts = joined.groupBy("date", "resourceId").count()
    val backed = joined.join(counts, Seq("date", "resourceId"), "left")
    TopK.denseTopK(backed, Seq("date", "categoryId"), col("count").desc, 10)
      .dropDuplicates("date", "categoryId", "resourceId")
      .orderBy("date", "categoryId", "position")
      .select("position", "date", "categoryId", "categoryName", "resourceId", "resourceName")
  }

  /** K1 sink: pipe-separated CSV with header, one directory per date via
    * partitionBy — the single-pass idiom for the reference's per-day
    * output layout (top10.py:271-278).
    */
  def write(report: DataFrame, path: String): Unit =
    report.write
      .partitionBy("date")
      .option("header", "true").option("sep", "|")
      .mode("overwrite")
      .csv(path)
}
