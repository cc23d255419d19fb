package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}

/** SFT / chat-format training-data preparation — the validation and
  * templating stage between raw conversation logs and a tokenizer:
  * parse a JSON `messages` array ([{role, content}, …]), route every
  * record through a total first-failing verdict, and render the valid
  * ones into a training template. The rule set is the one every
  * instruction-tuning pipeline enforces somewhere:
  *
  *   - `bad_json`:    the column does not parse as the message schema
  *   - `empty`:       zero messages
  *   - `bad_role`:    a role outside {system, user, assistant}
  *   - `system_pos`:  a system message anywhere but index 0, or more
  *                    than one of them
  *   - `non_alternating`: after the optional leading system turn, the
  *                    conversation must go user, assistant, user, … —
  *                    starting with user
  *   - `empty_turn`:  any null/blank content
  *   - `dangling`:    the last turn is not the assistant's (nothing to
  *                    train on)
  *   - `keep`
  *
  * Output one row per input (the classify-every-input posture):
  * (idCol, n_turns, verdict, rendered, n_chars) — `rendered` is the
  * `<|role|>content` template joined by `\n`, emitted for EVERY
  * parseable record (audit posture, the c4Rules precedent), '' when
  * the JSON does not parse; n_turns 0 likewise.
  *
  * 100-TB shape: one `from_json` per row plus HOF array checks — a
  * pure codegen-friendly projection, no shuffle, no UDF, nothing
  * collected.
  */
object ChatData {

  val MessageSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("role", StringType), StructField("content", StringType))))

  def validateAndRender(
      df: DataFrame, idCol: String, jsonCol: String): DataFrame = {
    val msgs = from_json(coalesce(col(jsonCol), lit("")), MessageSchema)
    val staged = df.withColumn("__m", msgs)
    val m = col("__m")
    val roles = transform(m, x => x.getField("role"))
    val n = size(m).cast("long")
    val badRole = exists(roles,
      r => r.isNull || !r.isin("system", "user", "assistant"))
    val sysPos = array_position(roles, "system")
    val badSystem = (sysPos > 1) ||
      (size(filter(roles, r => r === "system")) > 1)
    // roles after the optional leading system turn must be
    // user, assistant, user, … — checked by an index-carrying FOLD,
    // never element_at over a generated index range: ANSI mode (the
    // session default) throws on out-of-bounds element_at, and a
    // system-only conversation leaves an EMPTY rest array whose
    // sequence(1, 0) would generate a descending [1, 0] and index 0.
    // The && below short-circuits (Spark And skips the right side on
    // false), so element_at(roles, 1) never runs on an empty array.
    val rest = when(size(m) >= 1 && element_at(roles, 1) === "system",
      slice(roles, lit(2), greatest(size(m) - 1, lit(0))))
      .otherwise(roles)
    val nonAlt = aggregate(col("__rest"),
      struct(lit(1).as("i"), lit(false).as("bad")),
      (st, r) => struct((st.getField("i") + 1).as("i"),
        (st.getField("bad") ||
          r =!= when(pmod(st.getField("i"), lit(2)) === 1, lit("user"))
            .otherwise(lit("assistant"))).as("bad")))
      .getField("bad")
    val emptyTurn = exists(m,
      x => x.getField("content").isNull ||
        trim(x.getField("content")) === "")
    val dangling = element_at(roles, -1) =!= "assistant"
    val rendered = when(m.isNull, lit(""))
      .otherwise(concat_ws("\n", transform(m, x =>
        concat(lit("<|"), x.getField("role"), lit("|>"),
          coalesce(x.getField("content"), lit(""))))))
    staged
      .withColumn("__rest", rest)
      .select(col(idCol),
        coalesce(n, lit(0L)).as("n_turns"),
        when(m.isNull, lit("bad_json"))
          .when(n === 0, lit("empty"))
          .when(badRole, lit("bad_role"))
          .when(badSystem, lit("system_pos"))
          .when(nonAlt, lit("non_alternating"))
          .when(emptyTurn, lit("empty_turn"))
          .when(dangling, lit("dangling"))
          .otherwise(lit("keep")).as("verdict"),
        rendered.as("rendered"),
        length(rendered).cast("long").as("n_chars"))
  }

  /** PREFERENCE-PAIR preparation (DPO/RLHF reward data): validate
    * (prompt, chosen, rejected) triples with a total first-failing
    * verdict —
    *
    *   - `missing`:        any field null/blank, or a prompt that
    *                       NORMALIZES to '' (it cannot key a dedup
    *                       group — see the normalizeForDedup
    *                       Latin-targeting contract)
    *   - `identical`:      chosen == rejected verbatim (no signal)
    *   - `near_identical`: chosen and rejected equal under
    *                       [[TextAnalysis.normalizeForDedup]] (case/
    *                       digit/punct variants — still no signal)
    *   - `dup_prompt`:     a VALID pair whose normalized prompt
    *                       already appears on a lower-id valid pair
    *                       (keep-first; one pair per prompt or DPO
    *                       double-counts it)
    *   - `keep`
    *
    * Output one row per input: (idCol, verdict, keep_id) — keep_id is
    * the prompt group's min id for valid pairs, null for rows that
    * fail the field gates (they never enter prompt grouping: dedup
    * runs over pairs that could actually train).
    *
    * 100-TB shape: pure projections plus ONE hash aggregate keyed on
    * xxhash64(normalized prompt) (8-byte exchange key, the q266
    * posture) and a keyed join back; both multi-consumer stages are
    * localCheckpoint'd once.
    */
  def preparePreferencePairs(
      df: DataFrame, idCol: String, promptCol: String,
      chosenCol: String, rejectedCol: String): DataFrame = {
    def blank(c: Column): Column = c.isNull || trim(c) === ""
    // a prompt that NORMALIZES to '' (e.g. an all-non-Latin prompt
    // under the Latin-targeted normalizer) routes `missing` — without
    // this gate every such prompt would hash into ONE dedup group and
    // unrelated pairs would be misrouted dup_prompt (review finding);
    // non-Latin corpora must route through scriptProfile first, the
    // normalizeForDedup contract
    val early = when(
      blank(col(promptCol)) || blank(col(chosenCol)) ||
        blank(col(rejectedCol)) ||
        TextAnalysis.normalizeForDedup(col(promptCol)) === "",
      lit("missing"))
      .when(col(chosenCol) === col(rejectedCol), lit("identical"))
      .when(TextAnalysis.normalizeForDedup(col(chosenCol)) ===
        TextAnalysis.normalizeForDedup(col(rejectedCol)),
        lit("near_identical"))
    val staged = df.withColumn("__early", early).localCheckpoint()
    val valid = staged.filter(col("__early").isNull)
      .withColumn("__h",
        xxhash64(TextAnalysis.normalizeForDedup(col(promptCol))))
      .localCheckpoint()
    val groups = valid.groupBy(col("__h"))
      .agg(min(col(idCol)).as("keep_id"))
    val joined = valid.join(groups, Seq("__h"))
      .select(col(idCol), col("keep_id"))
    staged.join(joined, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__early"),
          when(col("keep_id") =!= col(idCol), lit("dup_prompt"))
            .otherwise(lit("keep"))).as("verdict"),
        col("keep_id"))
  }
}
