package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout maintenance: small-file compaction. Streaming sinks,
  * per-trigger upserts, and over-parallel writers leave thousands of
  * KB-scale files per partition; at 100 TB the resulting
  * footer/open/list overhead dominates scan time (every file costs a
  * driver listing entry plus a task). Compaction rewrites a dataset
  * into ~`targetBytes` files by estimating the current on-disk size
  * from the source files and repartitioning to ceil(size/target).
  *
  * The rewrite goes to a NEW directory (write-audit-publish): never
  * rewrite in place — a failed in-place overwrite destroys the input.
  * Publishing (atomic rename / metastore swap) is the caller's move.
  */
object Layout {

  /** Estimated on-disk bytes of the files backing `df` (best effort:
    * sums `inputFiles` lengths via the Hadoop FS).
    */
  def inputBytes(df: DataFrame): Long = {
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    df.inputFiles.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(conf).getFileStatus(p).getLen
    }.sum
  }

  /** Compact the parquet dataset at `srcDir` into ~`targetBytes` files
    * at `destDir`. Returns the file count written.
    */
  def compactParquet(
      spark: SparkSession, srcDir: String, destDir: String,
      targetBytes: Long = 128L * 1024 * 1024): Long = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val df = spark.read.parquet(srcDir)
    val nFiles = math.max(1L, (inputBytes(df) + targetBytes - 1) / targetBytes)
    df.repartition(nFiles.toInt).write.mode(SaveMode.ErrorIfExists).parquet(destDir)
    spark.read.parquet(destDir).inputFiles.length.toLong
  }
}
