package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregation over mergeable state tables — the at-scale
  * alternative to recomputing a grouped aggregate over the full
  * history every day. The standing table stores each aggregate's
  * ACCUMULATOR (count, per-column sums/maxes/mins), today's batch is
  * aggregated alone (touching only today's partition), and the two
  * states merge by the aggregate's own combine rule: counts and sums
  * add, maxes take max, mins take min. At 100 TB the daily cost is
  * O(|batch| + |state|) instead of O(|history|) — the same partial/
  * final split Spark performs inside one job, lifted across jobs via
  * storage.
  *
  * The state schema is SELF-DESCRIBING: `cnt` plus `sum_*`/`max_*`/
  * `min_*` columns, so [[merge]] derives each column's combine rule
  * from its name and rejects columns it cannot merge (a non-algebraic
  * aggregate like a median must not silently pretend to compose;
  * mergeable quantiles live in the sketch surface, q62). Merge is a
  * union + re-aggregate, so a key present in only one side needs no
  * null handling, any number of states fold associatively, and the
  * plan is one keyed exchange of state-sized (not history-sized) rows.
  *
  * Exactness: counts and integer sums are exact under any grouping;
  * max/min never do arithmetic. Double sums stay order-dependent here
  * exactly as they are in a one-shot aggregate — use an exact-decimal
  * value column when bit-parity matters (the engine's money
  * discipline).
  */
object IncrementalAgg {

  /** Aggregate a frame into its state form: `cnt` + named accumulators
    * (`sum_<name>`, `max_<name>`, `min_<name>`).
    */
  def state(
      df: DataFrame, keys: Seq[String],
      sums: Map[String, Column] = Map.empty,
      maxes: Map[String, Column] = Map.empty,
      mins: Map[String, Column] = Map.empty): DataFrame = {
    val aggs = Seq(count(lit(1)).as("cnt")) ++
      sums.toSeq.sortBy(_._1).map { case (n, c) => sum(c).as(s"sum_$n") } ++
      maxes.toSeq.sortBy(_._1).map { case (n, c) => max(c).as(s"max_$n") } ++
      mins.toSeq.sortBy(_._1).map { case (n, c) => min(c).as(s"min_$n") }
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge two state tables with identical schemas. `merge(state(a),
    * state(b), keys) == state(a union b, keys)` — the property q97
    * certifies against the oracle's one-shot aggregate.
    */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    require(a.columns.toSeq == b.columns.toSeq,
      s"state schemas differ: ${a.columns.mkString(",")} vs ${b.columns.mkString(",")}")
    val stateCols = a.columns.filterNot(keys.contains).toSeq
    val aggs = stateCols.map {
      case "cnt" => sum(col("cnt")).as("cnt")
      case c if c.startsWith("sum_") => sum(col(c)).as(c)
      case c if c.startsWith("max_") => max(col(c)).as(c)
      case c if c.startsWith("min_") => min(col(c)).as(c)
      case c => throw new IllegalArgumentException(
        s"state column '$c' has no merge rule — only cnt/sum_*/max_*/min_* compose")
    }
    require(aggs.nonEmpty, "state has no accumulator columns")
    a.unionByName(b).groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
