package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset version diff — "what changed between corpus v1 and v2?".
  * The audit primitive behind corpus versioning: every regeneration,
  * backfill, or vendor re-delivery should be diffed before it replaces
  * the previous version, because "the pipeline succeeded" says nothing
  * about WHAT it produced (a silent upstream change that drops 3 % of
  * rows looks identical to success).
  *
  * One full-outer join on the key; change detection compares an
  * md5 fingerprint of the chosen value columns (computed per side, so
  * wide rows never cross the shuffle twice — only key + 32-byte hash
  * do, which at 100 TB is the difference between shuffling the corpus
  * and shuffling a manifest). Null-safe: a null key is a key, and the
  * fingerprint distinguishes NULL from '' from any real value.
  * Output: (key, status in {added, removed, changed, unchanged},
  * old_fp, new_fp).
  */
object Diff {

  /** md5 fingerprint of `cols`: a control-char field delimiter
    * (\u0001) so ("ab","") never collides with ("a","b"), and a
    * control-char null marker (\u0002) so NULL differs from '' and
    * from any real value — both reproducible in any engine with
    * chr()/md5 (the oracle mirrors this exactly).
    */
  def rowFingerprint(cols: Seq[Column]): Column =
    md5(concat_ws("\u0001",
      cols.map(c => coalesce(c.cast("string"), lit("\u0002"))): _*))

  /** ORDER-INDEPENDENT table digest: per-row md5 fingerprints reduced
    * by two BIGINT sums (the first and third 8-hex words of the hash)
    * plus the row count. Sums are associative/commutative, so the
    * digest is identical on any partitioning, any row order, any
    * engine — the cheap way to answer "are these two 100-TB tables the
    * same" without a sort or a join (compare 3 numbers), and mergeable
    * across shards/partitions by addition. Two independent 32-bit word
    * sums + the count make silent collisions a non-issue for
    * pipeline-equality checks; this is a drift DETECTOR, not a
    * cryptographic commitment.
    */
  def tableChecksum(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "checksum needs at least one column")
    val fp = rowFingerprint(cols.map(col))
    df.select(
        conv(substring(fp, 1, 8), 16, 10).cast("long").as("__a"),
        conv(substring(fp, 17, 8), 16, 10).cast("long").as("__b"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("__a")).as("sum_a"), sum(col("__b")).as("sum_b"))
  }

  def diff(
      oldDf: DataFrame, newDf: DataFrame, keyCol: String,
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "diff needs at least one value column")
    val o = oldDf.select(col(keyCol).as("__k"), lit(true).as("__op"),
      rowFingerprint(valueCols.map(col)).as("old_fp"))
    val n = newDf.select(col(keyCol).as("__nk"), lit(true).as("__np"),
      rowFingerprint(valueCols.map(col)).as("new_fp"))
    o.join(n, col("__k") <=> col("__nk"), "full_outer")
      .select(
        when(coalesce(col("__np"), lit(false)), col("__nk")).otherwise(col("__k")).as(keyCol),
        when(col("__op").isNull, lit("added"))
          .when(col("__np").isNull, lit("removed"))
          .when(col("old_fp") === col("new_fp"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"),
        col("old_fp"), col("new_fp"))
  }

  /** Roll a diff up to the numbers a publish gate checks: row counts
    * per status. Tiny frame; gate on e.g. removed/changed shares.
    */
  def diffSummary(d: DataFrame): DataFrame =
    d.groupBy("status").agg(count(lit(1)).as("n"))
}
