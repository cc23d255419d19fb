package graft

import org.apache.spark.sql.functions._
import graft.operators.{Merge, Sampling}
import graft.ext.{ConnectedComponents, TextAnalysis}

/** Round-7 operators: CDC merge, data-driven mixture sampling,
  * canonical-per-cluster selection, token-rarity scoring.
  */
class MergeMixSpec extends SparkSpec {
  import spark.implicits._

  // ── CDC merge ──

  private def snap = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("k", "name", "v")

  test("merge applies update, insert, delete, and leaves the rest untouched") {
    val chg = Seq(
      (2L, "U", "b2", 22.0), // update matched key
      (4L, "U", "d", 40.0),  // insert unmatched key
      (3L, "D", "", 0.0),    // delete matched key
      (9L, "D", "", 0.0)     // delete absent key: no-op
    ).toDF("k", "op", "name", "v")
    val out = Merge.merge(snap, chg, "k", "op")
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, "a", 10.0), (2L, "b2", 22.0), (4L, "d", 40.0)))
  }

  test("merge output schema equals the snapshot schema") {
    val chg = Seq((2L, "U", "x", 0.0)).toDF("k", "op", "name", "v")
    assert(Merge.merge(snap, chg, "k", "op").columns.toSeq == Seq("k", "name", "v"))
  }

  test("merge rejects a changeset missing snapshot value columns") {
    val chg = Seq((2L, "U")).toDF("k", "op")
    val e = intercept[IllegalArgumentException] { Merge.merge(snap, chg, "k", "op") }
    assert(e.getMessage.contains("value columns"))
  }

  test("merge treats a null key as a key: untouched null-key rows pass through") {
    val s = Seq((Some(1L), "a", 1.0), (None, "nullk", 9.0)).toDF("k", "name", "v")
    val chg = Seq((Some(2L), "U", "b", 2.0)).toDF("k", "op", "name", "v")
    val out = Merge.merge(s, chg, "k", "op")
      .as[(Option[Long], String, Double)].collect().toSet
    assert(out == Set((Some(1L), "a", 1.0), (None, "nullk", 9.0), (Some(2L), "b", 2.0)))
    // and a null-key CHANGE updates the null-key row (null-safe join)
    val chg2 = Seq((Option.empty[Long], "U", "nullk2", 10.0)).toDF("k", "op", "name", "v")
    val out2 = Merge.merge(s, chg2, "k", "op")
      .as[(Option[Long], String, Double)].collect().toSet
    assert(out2 == Set((Some(1L), "a", 1.0), (None, "nullk2", 10.0)))
  }

  test("merge and mergeScd2 fail loudly on unrecognized ops instead of diverging silently") {
    val chg = Seq((1L, "u", "x", 0.0)).toDF("k", "op", "name", "v") // lowercase typo
    val e = intercept[Exception] {
      Merge.merge(snap, chg, "k", "op").collect()
    }
    assert(e.getMessage.contains("unknown CDC op"), e.getMessage)
    val dim = Seq((1L, "a", 1L, Option.empty[Long])).toDF("k", "name", "valid_from", "valid_to")
    val e2 = intercept[Exception] {
      Merge.mergeScd2(dim, Seq((1L, "I", "y")).toDF("k", "op", "name"), "k", "op", 2L).collect()
    }
    assert(e2.getMessage.contains("unknown CDC op"), e2.getMessage)
  }

  // ── CDC property tests: Spark pipeline vs an in-memory model ──

  test("property: compactLog+merge == sequential model on random logs (nulls, ties, deletes)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genKey: Gen[Option[Long]] =
      Gen.frequency(9 -> Gen.choose(0L, 9L).map(Some(_)), 1 -> Gen.const(None))
    val genLog = Gen.listOfN(40, for {
      k <- genKey
      seq <- Gen.choose(0L, 3L) // deliberate (key, seq) ties
      op <- Gen.oneOf("U", "D")
      v <- Gen.choose(0L, 99L)
    } yield (k, seq, op, s"n$v", v))
    val genSnap = Gen.listOfN(8, for {
      k <- genKey; v <- Gen.choose(100L, 199L)
    } yield (k, s"s$v", v))

    (0 until 10).foreach { i =>
      val p = Gen.Parameters.default
      val log = genLog.apply(p, Seed(7L + i)).get
      val snap = genSnap.apply(p, Seed(1000L + i)).get
        .groupBy(_._1).map(_._2.head).toSeq // unique keys
      val snapDf = snap.toDF("k", "name", "v")
      val logDf = log.toDF("k", "seq", "op", "name", "v")
      val got = Merge.merge(snapDf,
          Merge.compactLog(logDf, "k", "seq", col("op"), col("name"), col("v")).drop("seq"),
          "k", "op")
        .as[(Option[Long], String, Long)].collect().toSet
      // model: per key take max (seq, op, name, v); apply U=put, D=remove
      val lastPerKey = log.groupBy(_._1).map { case (k, rows) =>
        k -> rows.maxBy(r => (r._2, r._3, r._4, r._5))
      }
      val want = lastPerKey.foldLeft(snap.map(r => r._1 -> ((r._2, r._3))).toMap) {
        case (acc, (k, (_, _, op, name, v))) =>
          if (op == "D") acc - k else acc + (k -> ((name, v)))
      }.map { case (k, (name, v)) => (k, name, v) }.toSet
      assert(got == want, s"iteration $i: got ${got.size} rows, want ${want.size}")
    }
  }

  test("property: mergeScd2 keeps at-most-one open row per key and never mutates history") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genDim = Gen.listOfN(10, for {
      k <- Gen.choose(0L, 6L); v <- Gen.choose(0L, 99L)
    } yield (k, s"d$v"))
    val genChg = Gen.listOfN(6, for {
      k <- Gen.choose(0L, 9L); op <- Gen.oneOf("U", "D"); v <- Gen.choose(100L, 199L)
    } yield (k, op, s"c$v"))
    (0 until 10).foreach { i =>
      val p = Gen.Parameters.default
      val dimRows = genDim.apply(p, Seed(11L + i)).get
        .groupBy(_._1).map(_._2.head).toSeq // one current row per key
      val chgRows = genChg.apply(p, Seed(2000L + i)).get
        .groupBy(_._1).map(_._2.head).toSeq // compacted changeset
      // seed dim: closed history (valid 0→1) for even keys + open rows
      val dim = dimRows.flatMap { case (k, name) =>
        (if (k % 2 == 0) Seq((k, s"old_$name", 0L, Some(1L))) else Nil) :+
          ((k, name, 1L, Option.empty[Long]))
      }.toDF("k", "name", "valid_from", "valid_to")
      val out = Merge.mergeScd2(dim, chgRows.toDF("k", "op", "name"), "k", "op", batchSeq = 5L)
        .as[(Long, String, Long, Option[Long])].collect().toSeq
      // at most one open row per key
      out.filter(_._4.isEmpty).groupBy(_._1).foreach { case (k, rows) =>
        assert(rows.size == 1, s"iteration $i: key $k has ${rows.size} open rows")
      }
      // history rows pass through byte-identical
      val history = dim.as[(Long, String, Long, Option[Long])].collect()
        .filter(_._4.contains(1L)).toSet
      assert(history.subsetOf(out.toSet), s"iteration $i: history mutated")
      // every row of the old dim is accounted for: either unchanged or closed at 5
      val outSet = out.toSet
      dim.as[(Long, String, Long, Option[Long])].collect().foreach { r =>
        assert(outSet.contains(r) || outSet.contains((r._1, r._2, r._3, Some(5L))),
          s"iteration $i: dim row $r vanished")
      }
    }
  }

  // ── SCD type-2 merge ──

  test("mergeScd2 closes superseded versions, inserts new ones, keeps history immutable") {
    val dim = Seq(
      (1L, "a_v1", 0L, Some(1L)), // closed history: must pass untouched
      (1L, "a_v2", 1L, None),     // current, will be superseded by U
      (2L, "b", 1L, None),        // current, deleted by D
      (3L, "c", 1L, None)         // current, no change
    ).toDF("k", "name", "valid_from", "valid_to")
    val chg = Seq(
      (1L, "U", "a_v3"), (2L, "D", ""), (5L, "U", "e") // 5 = brand-new key
    ).toDF("k", "op", "name")
    val out = graft.operators.Merge.mergeScd2(dim, chg, "k", "op", batchSeq = 7L)
      .as[(Long, String, Long, Option[Long])].collect().toSet
    assert(out == Set(
      (1L, "a_v1", 0L, Some(1L)),  // history untouched
      (1L, "a_v2", 1L, Some(7L)),  // closed at batch 7
      (1L, "a_v3", 7L, None),      // new current version
      (2L, "b", 1L, Some(7L)),     // closed by delete, no replacement
      (3L, "c", 1L, None),         // untouched current
      (5L, "e", 7L, None)))        // brand-new key opens
  }

  test("mergeScd2 point-in-time queries see the right version") {
    val dim = Seq((1L, "old", 1L, Option.empty[Long])).toDF("k", "v", "valid_from", "valid_to")
    val chg = Seq((1L, "U", "new")).toDF("k", "op", "v")
    val merged = graft.operators.Merge.mergeScd2(dim, chg, "k", "op", batchSeq = 5L)
    def asOf(seq: Long) = merged
      .filter(col("valid_from") <= seq &&
        (col("valid_to").isNull || col("valid_to") > seq))
      .select("v").as[String].collect().toSeq
    assert(asOf(3L) == Seq("old"))
    assert(asOf(5L) == Seq("new"))
  }

  // ── data-driven mixture sampling ──

  // skewed strata: 4000/2000/500 rows
  private def docs = (0L until 6500L).toDF("id")
    .withColumn("dom",
      when(col("id") < 4000, "big").when(col("id") < 6000, "mid").otherwise("small"))

  test("balancedMix keeps the smallest stratum whole and levels the rest") {
    val out = Sampling.balancedMix(docs, "dom", col("id"), "s1")
    val byDom = out.groupBy("dom").count().as[(String, Long)].collect().toMap
    assert(byDom("small") == 500L, "smallest stratum must keep ALL rows")
    // 3-sigma binomial noise at n=4000, p=1/8 and n=2000, p=1/4
    assert(math.abs(byDom("big") - 500L) < 65, s"big leveled to ${byDom("big")}")
    assert(math.abs(byDom("mid") - 500L) < 60, s"mid leveled to ${byDom("mid")}")
  }

  test("balancedMix is partition-invariant and joins the rate table by broadcast") {
    val a = Sampling.balancedMix(docs, "dom", col("id"), "s1").agg(sum("id")).head.getLong(0)
    val b = Sampling.balancedMix(docs.repartition(13), "dom", col("id"), "s1")
      .agg(sum("id")).head.getLong(0)
    assert(a == b, "partitioning changed the sampled row set")
    val plan = Sampling.balancedMix(docs, "dom", col("id"), "s1")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"rate table should broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "corpus side must not shuffle for the rate join")
  }

  test("temperatureMix: alpha=1 reproduces natural proportions, alpha=0 levels") {
    val nat = Sampling.temperatureMix(docs, "dom", col("id"), alpha = 1.0,
        budget = 3250L, salt = "t")
      .groupBy("dom").count().as[(String, Long)].collect().toMap
    // alpha=1 ⇒ every stratum keeps ~budget/N = 1/2 of its rows
    assert(math.abs(nat("big") - 2000L) < 130, s"big ${nat("big")}")
    assert(math.abs(nat("small") - 250L) < 50, s"small ${nat("small")}")
    val flat = Sampling.temperatureMix(docs, "dom", col("id"), alpha = 0.0,
        budget = 1500L, salt = "t")
      .groupBy("dom").count().as[(String, Long)].collect().toMap
    // alpha=0 ⇒ equal 500-row targets per stratum
    assert(math.abs(flat("big") - 500L) < 65, s"big ${flat("big")}")
    assert(math.abs(flat("mid") - 500L) < 60, s"mid ${flat("mid")}")
    assert(flat("small") == 500L, "rate clamps at 1.0 for the small stratum")
  }

  // ── canonical-per-cluster ──

  test("canonicalPerCluster picks argmax score with min-id ties") {
    val clusters = Seq(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L), // cluster 1: scores 5,9,9 → id 2 wins tie
      (7L, 7L, 1L)                              // singleton
    ).toDF("doc_id", "cluster", "cluster_size")
    val scored = Seq((1L, 5L), (2L, 9L), (3L, 9L), (7L, 4L)).toDF("doc_id", "n_chars")
    val out = ConnectedComponents.canonicalPerCluster(clusters, "doc_id", scored, "n_chars")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 2L, 9L, 3L), (7L, 7L, 4L, 1L)))
  }

  // ── token rarity ──

  test("tokenRarity: integer df sums over distinct tokens, one final division") {
    val d = Seq(
      (1L, "common common rare"), // types {common, rare}
      (2L, "common other"),       // types {common, other}
      (3L, "common")              // types {common}
    ).toDF("doc_id", "text")
    // df: common=3, rare=1, other=1
    val out = TextAnalysis.tokenRarity(d, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 2L, 4L, 2.0),  // (3+1)/2
      (2L, 2L, 4L, 2.0),  // (3+1)/2
      (3L, 1L, 3L, 3.0))) // 3/1
  }

  test("tokenRarity drops token-less documents in both engines' semantics") {
    val d = Seq((1L, "abc"), (2L, "!!! ???")).toDF("doc_id", "text")
    val out = TextAnalysis.tokenRarity(d, "doc_id", "text").select("doc_id").as[Long].collect()
    assert(out.toSeq == Seq(1L))
  }

  // ── CDC log compaction ──

  test("compactLog keeps exactly the highest-seq op per key") {
    val log = Seq(
      (1L, 1L, "U", 10.0), (1L, 3L, "D", 0.0), (1L, 2L, "U", 11.0),
      (2L, 5L, "U", 20.0)
    ).toDF("k", "seq", "op", "v")
    val out = Merge.compactLog(log, "k", "seq")
      .as[(Long, Long, String, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 3L, "D", 0.0), (2L, 5L, "U", 20.0)))
  }

  test("compactLog then merge equals applying ops in seq order") {
    val snapshot = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
    // key 1: U 11 then D → net delete; key 3: D then U 30 → net insert
    val log = Seq(
      (1L, 1L, "U", 11.0), (1L, 2L, "D", 0.0),
      (3L, 1L, "D", 0.0), (3L, 2L, "U", 30.0)
    ).toDF("k", "seq", "op", "v")
    val out = Merge.merge(snapshot, Merge.compactLog(log, "k", "seq").drop("seq"), "k", "op")
      .as[(Long, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((2L, 20.0), (3L, 30.0)))
  }

  // ── salted join ──

  private def bigSide = (0L until 4000L).toDF("id")
    .withColumn("k", when(col("id") < 3000, 1L).otherwise(col("id") % 5)) // hot key 1
  private def smallSide = Seq((1L, "one"), (2L, "two"), (3L, "three"))
    .toDF("k", "label")

  test("saltedJoin equals the plain inner join") {
    val plain = bigSide.join(smallSide, "k")
      .select("id", "k", "label").as[(Long, Long, String)].collect().toSet
    val salted = graft.operators.SkewSalt.saltedJoin(bigSide, smallSide, "k", 8)
      .select("id", "k", "label").as[(Long, Long, String)].collect().toSet
    assert(salted == plain)
  }

  test("saltedJoin spreads a hot key across salt buckets") {
    val b = bigSide.withColumn(
      "__salt", pmod(xxhash64(col("id"), col("k")), lit(8L)))
    val buckets = b.filter(col("k") === 1L).select("__salt").distinct().count()
    assert(buckets == 8L, s"hot key should occupy all 8 salt buckets, got $buckets")
  }

  test("saltedJoin rejects colliding non-key column names") {
    val clash = Seq((1L, "x")).toDF("k", "id") // "id" also exists on big side
    val e = intercept[IllegalArgumentException] {
      graft.operators.SkewSalt.saltedJoin(bigSide, clash, "k")
    }
    assert(e.getMessage.contains("join key"))
  }

  // ── bounded top-k aggregator ──

  test("TopKByScore equals the window-rank top-k on skewed groups") {
    import org.apache.spark.sql.expressions.Window
    val data = (0L until 5000L).toDF("event_id")
      .withColumn("event_type", concat(lit("t"), col("event_id") % 3))
      .withColumn("value", (col("event_id") * 37 % 101).cast("double"))
    val topk = udaf(new graft.operators.TypedAgg.TopKByScore(4),
      org.apache.spark.sql.Encoders.product[graft.operators.TypedAgg.Scored])
    val agg = data
      .groupBy("event_type").agg(topk(col("event_id"), col("value")).as("top"))
      .select(col("event_type"), posexplode(col("top")))
      .select(col("event_type"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("event_id"), col("col.score").as("value"))
      .as[(String, Long, Long, Double)].collect().toSet
    val win = data
      .withColumn("rank", row_number().over(
        Window.partitionBy("event_type").orderBy(col("value").desc, col("event_id"))).cast("long"))
      .filter(col("rank") <= 4)
      .select("event_type", "rank", "event_id", "value")
      .as[(String, Long, Long, Double)].collect().toSet
    assert(agg == win)
  }

  // ── corpus version diff ──

  test("diff classifies added/removed/changed/unchanged, null-safe on keys and values") {
    import graft.operators.Diff
    val v1 = Seq(
      (Some(1L), Some("a")), (Some(2L), Some("b")),
      (Some(3L), Option.empty[String]),  // null VALUE
      (None, Some("nullkey")),           // null KEY
      (Some(5L), Some("gone"))
    ).toDF("k", "v")
    val v2 = Seq(
      (Some(1L), Some("a")),        // unchanged
      (Some(2L), Some("B")),        // changed
      (Some(3L), Some("")),         // null -> empty string IS a change
      (None, Some("nullkey")),      // null key matches itself: unchanged
      (Some(6L), Some("new"))       // added
    ).toDF("k", "v")
    val st = Diff.diff(v1, v2, "k", Seq("v"))
      .select("k", "status").as[(Option[Long], String)].collect().toMap
    assert(st == Map(
      Some(1L) -> "unchanged", Some(2L) -> "changed", Some(3L) -> "changed",
      None -> "unchanged", Some(5L) -> "removed", Some(6L) -> "added"))
    val sums = Diff.diffSummary(Diff.diff(v1, v2, "k", Seq("v")))
      .as[(String, Long)].collect().toMap
    assert(sums == Map("unchanged" -> 2L, "changed" -> 2L, "removed" -> 1L, "added" -> 1L))
  }

  test("diff fingerprint separates field boundaries") {
    import graft.operators.Diff
    // ("ab","") vs ("a","b") must NOT collide
    val a = Seq((1L, "ab", "")).toDF("k", "x", "y")
    val b = Seq((1L, "a", "b")).toDF("k", "x", "y")
    val st = Diff.diff(a, b, "k", Seq("x", "y"))
      .select("status").as[String].head()
    assert(st == "changed")
  }

  // ── incremental aggregation ──

  test("incremental state merge is associative and equals the one-shot aggregate") {
    import graft.operators.IncrementalAgg
    val data = (0L until 3000L).toDF("id")
      .withColumn("g", concat(lit("g"), col("id") % 4))
      .withColumn("v", (col("id") * 13 % 97).cast("double"))
    def st(d: org.apache.spark.sql.DataFrame) = IncrementalAgg.state(
      d, Seq("g"), sums = Map("id" -> col("id")), maxes = Map("v" -> col("v")),
      mins = Map("v" -> col("v")))
    val oneShot = st(data).as[(String, Long, Long, Double, Double)].collect().toSet
    // three-way fold, including a batch that misses some groups entirely
    val merged = IncrementalAgg.merge(
      IncrementalAgg.merge(
        st(data.filter(col("id") < 1000)), st(data.filter(col("id") >= 2500)), Seq("g")),
      st(data.filter(col("id") >= 1000 && col("id") < 2500)), Seq("g"))
      .as[(String, Long, Long, Double, Double)].collect().toSet
    assert(merged == oneShot)
  }

  test("incremental merge refuses schema drift and unmergeable columns") {
    import graft.operators.IncrementalAgg
    val a = Seq(("g1", 2L, 5L)).toDF("g", "cnt", "sum_id")
    val drifted = Seq(("g1", 2L)).toDF("g", "cnt")
    assert(intercept[IllegalArgumentException] {
      IncrementalAgg.merge(a, drifted, Seq("g"))
    }.getMessage.contains("schemas differ"))
    val alien = Seq(("g1", 2L, 1.5)).toDF("g", "cnt", "median_v")
    assert(intercept[IllegalArgumentException] {
      IncrementalAgg.merge(alien, alien, Seq("g"))
    }.getMessage.contains("no merge rule"))
  }

  test("TopKByScore buffer never exceeds k") {
    val a = new graft.operators.TypedAgg.TopKByScore(2)
    val buf = (1L to 100L).foldLeft(a.zero) { (b, i) =>
      val n = a.reduce(b, graft.operators.TypedAgg.Scored(i, (i % 7).toDouble))
      assert(n.size <= 2, s"buffer grew to ${n.size}")
      n
    }
    // best two of scores i%7: score 6 at ids 6 and 13
    assert(buf == Seq(
      graft.operators.TypedAgg.Scored(6L, 6.0), graft.operators.TypedAgg.Scored(13L, 6.0)))
  }

  test("tableChecksum: order/partition independent; any cell change moves a sum") {
    import graft.operators.Diff
    val df = (0L until 500L).map(i => (i, s"v$i", if (i % 7 == 0) None else Some(i * 3)))
      .toDF("id", "s", "x")
    val base = Diff.tableChecksum(df, Seq("id", "s", "x")).as[(Long, Long, Long)].head()
    val reordered = Diff.tableChecksum(df.orderBy(rand(42)).repartition(13),
      Seq("id", "s", "x")).as[(Long, Long, Long)].head()
    assert(base == reordered, "digest must be row-order and partitioning independent")
    val mutated = df.withColumn("x",
      when(col("id") === 250L, lit(999L)).otherwise(col("x")))
    val changed = Diff.tableChecksum(mutated, Seq("id", "s", "x")).as[(Long, Long, Long)].head()
    assert(base != changed, "a single-cell change must move the digest")
    assert(base._1 == changed._1, "row count unchanged by an in-place edit")
  }
}
