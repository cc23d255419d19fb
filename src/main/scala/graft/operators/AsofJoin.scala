package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LEFT as-of join: for each left row (key, t), attach the most recent
  * right row of the same key with rightTime <= t (inclusive), or nulls
  * when no such row exists.
  *
  * Spark has no native ASOF JOIN; the naive `l.key = r.key AND r.t <=
  * l.t` theta-join explodes to a per-key cartesian that a window
  * post-filter must then collapse. This operator is the union+window
  * rewrite: tag both sides, union on a narrow shared shape, and carry
  * the last right ROW forward with `last(struct, ignoreNulls)` over a
  * (key)-partitioned (time, tag) ordering — right rows sort BEFORE
  * left rows at equal timestamps, which is exactly the inclusive
  * `rightTime <= t` bound.
  *
  * 100-TB shape: ONE hashpartitioning(key) exchange shared by both
  * inputs (the window sort), no broadcast, no nested loop, and the
  * carried state per task is a single struct — the same running-last
  * mechanics as sessionization. The right row is carried as one atomic
  * struct, so a null in a right VALUE column rides along verbatim
  * instead of splicing values from different right rows (the bug the
  * per-column `last(ignoreNulls)` formulation would have).
  *
  * Contract: right must be unique per (key, rightTime) — pre-aggregate
  * otherwise (the certified q49 does) — and left/right value column
  * names must not collide.
  */
object AsofJoin {

  def asofLeft(
      left: DataFrame, right: DataFrame, keyCol: String,
      leftTimeCol: String, rightTimeCol: String,
      rightValueCols: Seq[String],
      asofTimeCol: String = "asof_time"): DataFrame = {

    val lCols = left.columns.toSeq
    require(!lCols.contains(asofTimeCol), s"left already has a '$asofTimeCol' column")
    require(rightValueCols.forall(!lCols.contains(_)),
      "right value columns must not collide with left columns")

    val lTagged = left
      .withColumn("__t", col(leftTimeCol))
      .withColumn("__tag", lit(1))
      .withColumn("__rt", lit(null).cast(right.schema(rightTimeCol).dataType))
      .select(Seq(col(keyCol), col("__t"), col("__tag"), col("__rt")) ++
        lCols.filterNot(_ == keyCol).map(col) ++
        rightValueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val rTagged = right
      .withColumn("__t", col(rightTimeCol))
      .withColumn("__tag", lit(0))
      .withColumn("__rt", col(rightTimeCol))
      .select(Seq(col(keyCol), col("__t"), col("__tag"), col("__rt")) ++
        lCols.filterNot(_ == keyCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightValueCols.map(col): _*)

    val w = Window.partitionBy(keyCol)
      .orderBy(col("__t").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rightRow = when(col("__tag") === 0,
      struct(col("__rt").as("__rt") +: rightValueCols.map(col): _*))

    lTagged.unionByName(rTagged)
      .withColumn("__r", last(rightRow, ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(lCols.map(col) ++
        (col("__r.__rt").as(asofTimeCol) +: rightValueCols.map(c => col(s"__r.$c"))): _*)
  }
}
