package graft

import org.apache.spark.sql.functions._
import graft.operators.{Histogram, Profile}

class ProfileHistSpec extends SparkSpec {
  import spark.implicits._

  test("profile counts rows, nulls, distincts, min/max per column") {
    val df = Seq(
      (Some(1), Some("x")), (Some(2), None), (Some(2), Some("a")), (None, Some("a")))
      .toDF("num", "str")
    val rows = Profile.profile(df, Seq("num", "str"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows("num") == (("num", 4L, 1L, 2L, "1", "2")))
    assert(rows("str") == (("str", 4L, 1L, 2L, "a", "x")))
  }

  test("profile is one job: single aggregate, one row per column") {
    val out = Profile.profile(Seq((1, 2, 3)).toDF("a", "b", "c"), Seq("a", "b", "c"))
    assert(out.count() == 3)
  }

  test("profileApprox: same shape, HLL distinct within tolerance, no Expand in plan") {
    val df = (0L until 20000L).map(i => (i, i % 1000)).toDF("id", "k")
    val rows = Profile.profileApprox(df, Seq("id", "k"))
    val got = rows.as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("id")._2 == 20000L && got("id")._3 == 0L)
    assert(math.abs(got("id")._4 - 20000L) < 20000 * 0.1)
    assert(math.abs(got("k")._4 - 1000L) < 1000 * 0.1)
    val plan = rows.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"approx profile still expands:\n$plan")
    // the exact form DOES expand (multi-distinct) — the contrast is the point
    assert(Profile.profile(df, Seq("id", "k"))
      .queryExecution.executedPlan.toString.contains("Expand"))
  }

  test("histogram: buckets partition the range, max lands in the last bucket") {
    val df = (0 to 100).map(_.toDouble).toDF("v")
    val h = Histogram.equiWidth(df, col("v"), buckets = 10)
      .select("bucket", "n").as[(Long, Long)].collect().toMap
    assert(h.keySet == (0L until 10L).toSet)
    assert(h.values.sum == 101)
    assert(h(9L) == 11) // 90..100 inclusive: max closes the last bucket
    assert((0L until 9L).forall(h(_) == 10))
  }

  test("histogram degenerate range: everything in bucket 0") {
    val h = Histogram.equiWidth(Seq(5.0, 5.0, 5.0).toDF("v"), col("v"), 8)
      .select("bucket", "n").as[(Long, Long)].collect()
    assert(h.toSeq == Seq((0L, 3L)))
  }

  test("histogram excludes NULLs instead of overcounting the last bucket") {
    // floor(null) is null and least() skips nulls, so without the
    // explicit filter each null would land in bucket n-1
    val df = Seq[Option[Double]](Some(0.0), Some(10.0), None, None).toDF("v")
    val h = Histogram.equiWidth(df, col("v"), buckets = 2)
      .select("bucket", "n").as[(Long, Long)].collect().toMap
    assert(h == Map(0L -> 1L, 1L -> 1L), s"nulls leaked into a bucket: $h")
  }

  test("keySkew ranks hot keys with exact shares, counts nulls, avoids a global sort") {
    val df = (0L until 1000L).toDF("id")
      .withColumn("k",
        when(col("id") < 500, "hot")
          .when(col("id") < 750, lit(null).cast("string"))
          .otherwise(concat(lit("k"), col("id") % 50)))
    val out = Profile.keySkew(df, "k", topN = 3)
      .as[(Long, String, Long, Double)].collect().toList
    assert(out.head == (1L, "hot", 500L, 0.5), s"hot key: ${out.head}")
    assert(out(1)._2 == null && out(1)._3 == 250L,
      s"null keys must profile as a group: ${out(1)}")
    assert(out.size == 3 && out(2)._3 == 5L)
    // distributed top-N, not a single-partition sort of the counts
    val plan = Profile.keySkew(df, "k", 3).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected TakeOrderedAndProject:\n$plan")
  }

  test("setOverlap: shared members counted once, ppm Jaccard exact, no zero-overlap rows") {
    val df = Seq(
      ("A", 1L), ("A", 2L), ("A", 3L), ("A", 3L), // duplicate membership collapses
      ("B", 2L), ("B", 3L), ("B", 4L),
      ("C", 9L)).toDF("g", "m")
    val got = Profile.setOverlap(df, "g", "m")
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    // only (A,B) overlaps: common {2,3}, |A|=3 |B|=3 → 2e6/(3+3-2)
    assert(got == Seq(("A", "B", 3L, 3L, 2L, 500000L)))
  }

  test("trailingSpikes: strict integer threshold, unfull windows never flag") {
    val rows = (1 to 10).map(d => ("k", f"d$d%02d", d match {
      case 8 => 20L // 7·20 vs 2·70: equal → NOT a spike (strict >)
      case 9 => 21L // vs trailing {d2..d8} sum 80: 7·21=147 > 2·80=160? no
      case _ => 10L
    }))
    val got = Profile.trailingSpikes(rows.toDF("k", "p", "n"), "k", "p", "n",
        window = 7, num = 2, den = 1)
      .select("p", "trail_sum", "spike").as[(String, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // days 1-7: window unfull → false, trail_sum still emitted
    assert(got("d01") == (0L, false) && got("d07") == (60L, false))
    assert(got("d08") == (70L, false), "boundary-equal must not flag (strict >)")
    assert(got("d09") == (80L, false))
    // make a real spike: 31 > 2·(81/7) → 7·31=217 > 2·81=162
    val spiky = rows.map { case (k, p, n) => (k, p, if (p == "d10") 31L else n) }
    val got2 = Profile.trailingSpikes(spiky.toDF("k", "p", "n"), "k", "p", "n", 7, 2, 1)
      .filter(col("spike")).select("p").as[String].collect().toSeq
    assert(got2 == Seq("d10"))
  }

  test("trendSlope: exact integer moments, degenerate keys report null slope") {
    val pts = Seq(
      ("a", 0L, 0L), ("a", 1L, 10L), ("a", 2L, 20L), // slope exactly 10
      ("b", 5L, 1L), ("b", 5L, 9L), // all x equal → den 0 → null
      ("c", 0L, 0L), ("c", 1L, 1L), ("c", 2L, 1L)).toDF("k", "x", "y")
    val got = Profile.trendSlope(pts, "k", col("x"), col("y"))
      .as[(String, Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("a") == ((3L, 60L, 6L, Some(10.0))))
    assert(got("b") == ((2L, 0L, 0L, None)), "degenerate x must yield null slope")
    assert(got("c") == ((3L, 3L, 6L, Some(0.5))))
  }

  test("ruleReport: one row per rule, ppm integer-exact, null predicate fails") {
    val df = Seq(
      (1L, Some("x")), (2L, Some("y")), (3L, None), (4L, Some("x")))
      .toDF("id", "s")
    val got = graft.operators.Quality.ruleReport(df, Seq(
        "id_positive" -> (col("id") > 0),
        "s_is_x" -> (col("s") === "x"), // null s → null predicate → fail
        "s_present" -> col("s").isNotNull),
      minPassPpm = 750000L)
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._4, r._5))).toMap
    assert(got("id_positive") == ((4L, 1000000L, true)))
    assert(got("s_is_x") == ((2L, 500000L, false)))
    assert(got("s_present") == ((3L, 750000L, true)), "threshold is inclusive")
  }

  test("equiDepth: uniform data splits evenly; boundary ties share a bucket; nulls drop") {
    val vals = (1 to 80).map(v => Some(v.toDouble)) :+ None
    val got = graft.operators.Histogram.equiDepth(vals.toDF("x"), "x", buckets = 8)
      .as[(Long, Long)].collect().toMap
    assert(got == (0L to 7L).map(_ -> 10L).toMap, s"uneven: $got")
    // heavy ties: every value equal → all boundaries equal → everything in bucket 0
    val ties = Seq.fill(50)(5.0).toDF("x")
    val got2 = graft.operators.Histogram.equiDepth(ties, "x", buckets = 4)
      .as[(Long, Long)].collect().toMap
    assert(got2 == Map(0L -> 50L), s"ties must collapse into the first bucket: $got2")
  }

  test("ewma: integer fold matches the model; single-point series; order independence") {
    // model: s1=10, s2=(26+3·10)>>2=14, s3=(2+3·14)>>2=11
    val pts = Seq(("k", 1L, 10L), ("k", 2L, 26L), ("k", 3L, 2L), ("solo", 9L, 7L))
      .toDF("k", "o", "y")
    val got = Profile.ewma(pts, "k", col("o"), col("y"), shift = 2)
      .as[(String, Int, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("k") == ((3, 11L)))
    assert(got("solo") == ((1, 7L)), "single point: ewma == the point")
    // arrival order must not matter (the sort is inside the operator)
    val shuffled = Seq(("k", 3L, 2L), ("k", 1L, 10L), ("k", 2L, 26L)).toDF("k", "o", "y")
    val got2 = Profile.ewma(shuffled.repartition(5), "k", col("o"), col("y"), 2)
      .as[(String, Int, Long)].collect().head
    assert((got2._2, got2._3) == ((3, 11L)))
  }

  test("transitions: consecutive pairs in total order; first event excluded; key isolation") {
    val ev = Seq(
      (1L, 1L, "v"), (1L, 2L, "c"), (1L, 3L, "c"), (1L, 4L, "p"), // v→c, c→c, c→p
      (2L, 1L, "p"), (2L, 2L, "v"), // p→v (no cross-user pair with u1)
      (3L, 9L, "v")).toDF("u", "o", "e") // single event → nothing
    val got = graft.operators.Profile
      .transitions(ev.repartition(5), "u", Seq(col("o")), col("e"))
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("v", "c", 1L), ("c", "c", 1L), ("c", "p", 1L), ("p", "v", 1L)))
  }

  test("pathTrigrams: windows per key, totals tie order, topN cut") {
    val ev = Seq(
      (1L, 1L, "v"), (1L, 2L, "c"), (1L, 3L, "p"), (1L, 4L, "v"), // v,c,p + c,p,v
      (2L, 1L, "v"), (2L, 2L, "c"), (2L, 3L, "p"),                // v,c,p
      (3L, 1L, "v"), (3L, 2L, "c")).toDF("u", "o", "e")           // too short
    val got = Profile.pathTrigrams(ev.repartition(3), "u", Seq(col("o")),
        col("e"), topN = 1)
      .as[(String, String, String, Long)].collect().toSeq
    assert(got == Seq(("v", "c", "p", 2L)), "most common journey wins; 2-event keys contribute nothing")
  }

  test("fkOrphans: null keys are not orphans; duplicate parent keys don't multiply") {
    val child = Seq(Some(1L), Some(1L), Some(9L), None).toDF("ck")
    val parent = Seq(1L, 1L, 2L).toDF("pk") // dup parent key: distinct-ed pre-join
    val got = graft.operators.Quality
      .fkOrphans(Seq(("e", child, "ck", parent, "pk")))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("e", 4L, 1L, 1L)),
      "4 child rows, 1 null key, 1 orphan (9); dup parent must not double-count the two 1s")
  }

  test("grainReport: dup_rows and max_per_key at the declared grain; null keys group as themselves") {
    val df = Seq(
      (Some(1L), "a"), (Some(1L), "b"), (Some(1L), "c"),
      (Some(2L), "d"), (None, "e"), (None, "f")).toDF("k", "x")
    val got = graft.operators.Quality
      .grainReport(Seq(("g", df, Seq("k"))))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // keys: 1→3 rows, 2→1, null→2 ⇒ 6 rows, 3 distinct, 3 dups, max 3
    assert(got == Seq(("g", 6L, 3L, 3L, 3L)))
  }

  test("madRobust: integer-exact median and MAD, odd and even counts, nulls excluded") {
    val df = (Seq(("o", 1L), ("o", 2L), ("o", 9L)) ++            // med 2, |d|=1,0,7 → mad 1
      Seq(("e", 1L), ("e", 2L), ("e", 3L), ("e", 10L)))          // disc med 2, |d|=1,0,1,8 → mad 1
      .map { case (k, v) => (k, Some(v)) }.toDF("k", "v")
      .union(Seq(("o", Option.empty[Long])).toDF("k", "v"))
    val got = graft.operators.Profile.madRobust(df, "k", col("v"))
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("o") == (("o", 3L, 2L, 1L)), s"odd: ${got("o")}")
    assert(got("e") == (("e", 4L, 2L, 1L)), s"even: ${got("e")}")
  }

  test("firstDigitReport: digit from decimal string, non-positive excluded, integer ppm") {
    val df = Seq(1L, 19L, 100L, 2L, 9999L, 0L, -5L).toDF("v")
    val got = graft.operators.Quality.firstDigitReport(df, col("v"))
      .as[(Int, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // positives: 1,19,100 → digit 1 (×3); 2 → 2; 9999 → 9. total 5
    assert(got == Map(1 -> ((3L, 600000L)), 2 -> ((1L, 200000L)), 9 -> ((1L, 200000L))))
  }

  test("approxQuantileContract: guarantee holds on uniform and heavy-tie data, any partitioning") {
    val uni = (0L until 2000L).map(i => ("u", i % 1000)).toDF("k", "v")
    val ties = (0L until 2000L).map(i => ("t", if (i % 10 == 0) i else 7L)).toDF("k", "v")
    Seq(1, 8).foreach { parts =>
      val got = graft.operators.Profile
        .approxQuantileContract(uni.union(ties).repartition(parts), "k", col("v"),
          accuracy = 100)
        .as[(String, Long, Boolean, Boolean)].collect().map(r => r._1 -> r).toMap
      assert(got("u") == (("u", 2000L, true, true)), s"parts=$parts: ${got("u")}")
      assert(got("t") == (("t", 2000L, true, true)), s"parts=$parts: ${got("t")}")
    }
  }

  test("weightedMedian: crossing rule on a histogram; dup values safe; non-positive weights dropped") {
    // k: (v=1,w=3) (v=2,w=2) (v=3,w=4) tot=9, half-cross at cum*2>=9:
    // cum 3(no:6<9), 5(yes:10>=9) -> median 2
    val h = Seq(("k", 1L, 3L), ("k", 2L, 2L), ("k", 3L, 4L),
      ("z", 5L, 1L), ("z", 9L, 0L), ("z", 4L, -7L)).toDF("g", "v", "w")
    val got = graft.operators.Profile.weightedMedian(h.repartition(3), "g", "v", "w")
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("k") == (("k", 2L, 9L)))
    assert(got("z") == (("z", 5L, 1L)), "zero/negative weights are excluded")
    // duplicate (key, value) rows: any crossing copy gives the same min
    val dup = Seq(("d", 7L, 1L), ("d", 7L, 1L), ("d", 8L, 1L)).toDF("g", "v", "w")
    val m = graft.operators.Profile.weightedMedian(dup, "g", "v", "w")
      .as[(String, Long, Long)].collect().head
    assert(m == (("d", 7L, 3L)))
  }

  test("minhashSetContract: identical sets estimate 1.0; random overlap within tolerance; deterministic") {
    // A == B (jaccard 1e6 ppm); C shares half of A (jaccard ~1/3);
    // D is DISJOINT from everything — the pair where a spuriously high
    // estimate is the failure of interest (round-7 advisory: these rows
    // were previously never verified because setOverlap omits them)
    val rows = (0L until 200L).flatMap(m => Seq(("A", m), ("B", m))) ++
      (100L until 300L).map(m => ("C", m)) ++
      (10000L until 10100L).map(m => ("D", m))
    val df = rows.toDF("g", "m")
    val out = graft.operators.Profile
      .minhashSetContract(df.repartition(7), "g", "m", k = 128)
      .select("grp_a", "grp_b", "jaccard_ppm", "sketch_ok")
      .as[(String, String, Long, Boolean)].collect().map(r => (r._1, r._2) -> r).toMap
    assert(out(("A", "B"))._3 == 1000000L && out(("A", "B"))._4,
      "identical sets: exact 1.0 and the sketch must agree (all registers equal)")
    assert(out(("A", "C"))._4 && out(("B", "C"))._4, s"overlap pairs in tolerance: $out")
    assert(out.size == 6, s"ALL 4-choose-2 pairs must be verified, disjoint included: $out")
    for (p <- Seq(("A", "D"), ("B", "D"), ("C", "D")))
      assert(out(p)._3 == 0L && out(p)._4,
        s"disjoint pair $p: exact jaccard 0 and the sketch estimate must stay under tolerance")
    // determinism: same input, different partitioning, same verdictful row set
    val out2 = graft.operators.Profile
      .minhashSetContract(df.repartition(2), "g", "m", k = 128)
      .select("grp_a", "grp_b", "jaccard_ppm", "sketch_ok")
      .as[(String, String, Long, Boolean)].collect().map(r => (r._1, r._2) -> r).toMap
    assert(out == out2, "min registers are order-independent")
  }

  test("setOverlap null groups/members are excluded") {
    val df = Seq(
      (Some("A"), Some(1L)), (None, Some(1L)), (Some("B"), None),
      (Some("B"), Some(1L))).toDF("g", "m")
    val got = Profile.setOverlap(df, "g", "m")
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("A", "B", 1L, 1L, 1L, 1000000L)))
  }
}
