package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-evolution reads across corpus dumps.
  *
  * A training corpus is re-delivered in dumps whose schema GROWS over
  * time (a `quality` score added in dump 2, a `lang` tag in dump 3).
  * Rewriting 100 TB of old dumps to the new schema is not an option;
  * the engine must read the union. Layout contract: one partitioned
  * tree `root/dump=<id>/...` — partition discovery gives every row its
  * dump id for free (a directory-name column, zero bytes in the files),
  * and `mergeSchema` unions the per-file parquet schemas at footer
  * level, so columns missing from older dumps read as typed nulls with
  * NO data rewrite and NO inference scan.
  *
  * Scale note: mergeSchema reads footers, not data, and Spark samples
  * footers in parallel. Column pruning still reaches every file — a
  * projection of 2 columns reads 2 columns from every dump regardless
  * of which dump first introduced them.
  */
object Evolving {

  /** Read every dump under `root` (layout `root/dump=<id>/`) with
    * merged schema; rows carry their `dump` partition column.
    */
  def readDumps(spark: SparkSession, root: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(root)
}
