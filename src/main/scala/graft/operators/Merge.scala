package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC MERGE — apply a changeset to a snapshot (the `MERGE INTO`
  * shape incremental pipelines need: upsert today's changed rows into
  * the standing table, delete tombstoned keys, leave everything else
  * untouched).
  *
  * Semantics: `changes` carries the snapshot's key + value columns plus
  * an op column with `"U"` (upsert: update if the key exists, insert if
  * not) or `"D"` (delete; a delete for an absent key is a no-op).
  * At most one change row per key (enforce upstream — CDC logs compact
  * to last-op-per-key; a violated precondition would duplicate the key,
  * not corrupt other rows).
  *
  * Plan shape: ONE full-outer join on the key, then a projection that
  * resolves each column change-side-first. Spark cannot broadcast a
  * full-outer join (both sides must be complete), so this is a keyed
  * exchange of both inputs — the honest minimum for a merge that must
  * also INSERT unmatched change keys. At 100 TB the production wrapper
  * is storage-side: partition the snapshot on key ranges and rewrite
  * only partitions that actually contain change keys (semi-join the
  * change keys against partition values first — Layout.scala's pruning
  * conventions); the per-partition merge is exactly this operator.
  * When inserts are impossible (op='D'/'U'-update only), a left join +
  * broadcast change-side is the cheaper plan; AQE picks it if you
  * pre-filter and pass only matched updates.
  *
  * Reference scope: the reference engine rebuilds dimension snapshots
  * wholesale (create_resource.py overwrite path); merge is the
  * at-scale replacement, part of the extension family.
  */
object Merge {

  /** Executor-side op validation: anything outside {U, D} fails the
    * job loudly instead of picking one of two silent behaviors (a
    * typo'd op must never read as "no-op" here and "delete" in
    * [[mergeScd2]]).
    */
  private def validOp(c: Column): Column =
    when(c.isin("U", "D"), c)
      .otherwise(raise_error(concat(lit("unknown CDC op: "), coalesce(c, lit("NULL")))))

  def merge(snapshot: DataFrame, changes: DataFrame, keyCol: String, opCol: String): DataFrame = {
    val valueCols = snapshot.columns.filterNot(_ == keyCol).toSeq
    require(valueCols.forall(changes.columns.contains),
      s"changes must carry the snapshot's value columns: ${valueCols.mkString(", ")}")
    // presence flags, not key-nullness: a null KEY is legal in either
    // frame and must behave like any other key value (the join is
    // null-safe), so "row exists on this side" is tracked explicitly
    val s = snapshot.select(
      col(keyCol).as("__k") +: lit(true).as("__sp") +:
        valueCols.map(c => col(c).as(s"__s_$c")): _*)
    val c = changes.select(
      col(keyCol).as("__ck") +: lit(true).as("__cp") +: validOp(col(opCol)).as("__op") +:
        valueCols.map(v => col(v).as(s"__c_$v")): _*)
    s.join(c, col("__k") <=> col("__ck"), "full_outer")
      // deletes drop matched snapshot rows; unmatched deletes are no-ops
      .filter(coalesce(col("__op"), lit("")) =!= "D")
      // snapshot-only rows pass through; change-only rows must be upserts
      .filter(coalesce(col("__sp"), lit(false)) || col("__op") === "U")
      .select(
        when(coalesce(col("__cp"), lit(false)), col("__ck")).otherwise(col("__k")).as(keyCol) +:
          valueCols.map(v =>
            when(col("__op") === "U", col(s"__c_$v"))
              .otherwise(col(s"__s_$v")).as(v)): _*)
  }

  /** Compact a CDC event log to LAST-OP-PER-KEY — the step that turns a
    * raw change stream (many ops per key, ordered by a sequence column)
    * into the one-row-per-key changeset [[merge]] requires. Earlier ops
    * for a key are superseded, so only the row with the highest `seqCol`
    * survives. A CDC log's (key, LSN) is unique; when the sequence can
    * tie (merged shards, coarse timestamps), pass `tieBreak` columns
    * that make the per-key order TOTAL — "last" under a partial order
    * is engine-dependent nondeterminism (sf0.01's synthetic log has
    * 11k+ (key, seq) ties, which is exactly how real coarse-clock logs
    * look). All order columns sort descending.
    *
    * One key-partitioned window, so the log shuffles once on the key —
    * and since [[merge]] joins on the same key, the exchange is reused
    * by the downstream merge rather than re-shuffled. At 100 TB logs
    * are also time-partitioned: compaction runs per partition and only
    * the per-key tail crosses partition boundaries.
    */
  def compactLog(
      log: DataFrame, keyCol: String, seqCol: String,
      tieBreak: org.apache.spark.sql.Column*): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(col(seqCol).desc +: tieBreak.map(_.desc): _*)
    log.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__rk")
  }

  /** SCD TYPE-2 merge — apply a changeset WITHOUT losing history. Where
    * [[merge]] overwrites, this closes the superseded version and opens
    * a new one, so the dimension answers "what was this row worth as of
    * batch N?" — the slowly-changing-dimension discipline warehouse
    * dims and training-data lineage both need.
    *
    * `dim` carries the key, value columns, and validity interval
    * (`valid_from`, `valid_to`; `valid_to` NULL = current). `changes`
    * carries key + op ('U' upsert / 'D' delete) + value columns.
    * `batchSeq` stamps the transition (a monotone batch number or
    * epoch — a LITERAL, so the output is deterministic and
    * oracle-checkable):
    *
    *  - closed history rows (valid_to set) pass through untouched —
    *    history is immutable;
    *  - current rows whose key has a change get valid_to = batchSeq;
    *  - 'U' changes insert a new current row (valid_from = batchSeq),
    *    for both existing keys (new version) and new keys (insert);
    *  - 'D' closes without inserting (key has no current row after).
    *
    * Plan: one left join of current rows against the (compacted)
    * changeset + a union with the insert rows — the history mass is
    * never joined, only appended past. At 100 TB partition the dim by
    * open/closed so the current slice (the only join side) stays small
    * relative to accumulated history.
    */
  def mergeScd2(
      dim: DataFrame, changes: DataFrame, keyCol: String, opCol: String,
      batchSeq: Long): DataFrame = {
    val valueCols = dim.columns.filterNot(
      c => c == keyCol || c == "valid_from" || c == "valid_to").toSeq
    require(valueCols.forall(changes.columns.contains),
      s"changes must carry the dim's value columns: ${valueCols.mkString(", ")}")
    val closed = dim.filter(col("valid_to").isNotNull)
    val current = dim.filter(col("valid_to").isNull)
    val chg = changes.select(
      col(keyCol).as("__ck") +: validOp(col(opCol)).as("__op") +:
        valueCols.map(v => col(v).as(s"__c_$v")): _*)
    // current rows: close those with a change (U supersedes, D removes)
    val currentOut = current.join(chg, col(keyCol) === col("__ck"), "left")
      .withColumn("valid_to",
        when(col("__op").isNotNull, lit(batchSeq)).otherwise(col("valid_to")))
      .select(dim.columns.map(col): _*)
    // upserts: one new open row per 'U' change
    val inserts = chg.filter(col("__op") === "U")
      .select(
        col("__ck").as(keyCol) +:
          valueCols.map(v => col(s"__c_$v").as(v)) :+
          lit(batchSeq).as("valid_from") :+
          lit(null).cast("long").as("valid_to"): _*)
      .select(dim.columns.map(col): _*)
    closed.unionByName(currentOut).unionByName(inserts)
  }
}
