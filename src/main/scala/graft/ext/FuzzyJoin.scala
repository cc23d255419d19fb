package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy string matching at scale: all pairs within edit distance 1 via
  * SYMMETRIC DELETION (the SymSpell trick). An all-pairs
  * `levenshtein(a,b) <= 1` join is a cartesian — O(n²·L²) and a
  * BroadcastNestedLoopJoin plan. Instead, every string emits its
  * single-character-deletion variants plus itself as join keys:
  *
  *  - substitution at i:  del_i(a) == del_i(b)
  *  - insertion/deletion: shorter string ∈ del1(longer)
  *
  * so every true pair shares ≥1 key and candidates come from a narrow
  * string equi-join of O(n·L) rows. Deletion-key collisions admit some
  * distance-2 impostors (del_i(a) == del_j(b) with i ≠ j, e.g. "abc" /
  * "bac"), so an exact levenshtein verifies each candidate — the same
  * candidates→verify discipline as the minhash/simhash dedup family,
  * applied at character granularity. Typo-level record linkage.
  */
object FuzzyJoin {

  /** Distinct unordered pairs of `strCol` values at edit distance
    * exactly 0 < d <= 1 (identical strings are not pairs). Output:
    * (s_a, s_b, dist) with s_a < s_b.
    */
  def editDistance1Pairs(df: DataFrame, strCol: String): DataFrame = {
    val v = df.select(col(strCol).as("s")).distinct()
      .withColumn("key", explode(array_distinct(concat(
        array(col("s")),
        transform(sequence(lit(1), length(col("s"))), i =>
          concat(
            col("s").substr(lit(1), i - lit(1)),
            col("s").substr(i + lit(1), length(col("s")))))))))
    val a = v.select(col("s").as("s_a"), col("key"))
    val b = v.select(col("s").as("s_b"), col("key"))
    a.join(b, "key")
      .where(col("s_a") < col("s_b"))
      .select("s_a", "s_b")
      .distinct()
      // compute the distance ONCE, then keep exactly-1 pairs: s_a < s_b
      // already excludes identical strings, so === 1 states the
      // "exactly 0 < d <= 1" contract directly (and avoids evaluating
      // levenshtein twice per candidate)
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")))
      .filter(col("dist") === 1)
  }
}
