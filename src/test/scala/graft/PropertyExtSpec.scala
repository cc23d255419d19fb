package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the round-7 extension family: each operator vs a
  * direct in-memory model over randomized inputs (the CDC-family
  * discipline in MergeMixSpec) — fixed seeds so failures reproduce.
  */
class PropertyExtSpec extends SparkSpec {
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("property: coalesceIntervals == in-memory sweep on random interval sets") {
    val genIv = Gen.listOfN(60, for {
      k <- Gen.oneOf("a", "b", "c")
      s <- Gen.choose(0L, 50L)
      len <- Gen.choose(0L, 12L)
    } yield (k, s, s + len))
    (0 until 10).foreach { i =>
      val ivs = sample(genIv, 21L + i)
      val got = graft.operators.Intervals
        .coalesceIntervals(ivs.toDF("k", "s", "e").repartition(7), "k", "s", "e")
        .select("k", "span_start", "span_end", "n_merged")
        .as[(String, Long, Long, Long)].collect().toSet
      val want = ivs.groupBy(_._1).flatMap { case (k, rows) =>
        val sorted = rows.map(r => (r._2, r._3)).sortBy(identity)
        val spans = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long)]
        sorted.foreach { case (s, e) =>
          spans.lastOption match {
            case Some((ss, se, n)) if s <= se =>
              spans(spans.size - 1) = (ss, math.max(se, e), n + 1)
            case _ => spans += ((s, e, 1L))
          }
        }
        spans.map { case (ss, se, n) => (k, ss, se, n) }
      }.toSet
      assert(got == want, s"iteration $i")
    }
  }

  test("property: apportion sums to budget; every alloc is quota or quota+1") {
    val genStrata = Gen.listOfN(120, Gen.oneOf("s0", "s1", "s2", "s3", "s4", "s5"))
    (0 until 10).foreach { i =>
      val rows = sample(genStrata, 33L + i)
      val budget = sample(Gen.choose(0L, 200L), 77L + i)
      val counts = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val total = rows.size.toLong
      val got = graft.operators.Sampling
        .apportion(rows.map(Tuple1(_)).toDF("s"), "s", budget)
        .as[(String, Long, Long)].collect()
      assert(got.map(_._3).sum == budget, s"iteration $i: sum != budget")
      got.foreach { case (k, n, alloc) =>
        assert(n == counts(k), s"iteration $i: counts wrong for $k")
        val quota = budget * n / total
        assert(alloc == quota || alloc == quota + 1,
          s"iteration $i: $k alloc $alloc not in {$quota, ${quota + 1}}")
      }
    }
  }

  test("property: funnelStages == in-memory ordered walk on random event streams") {
    val stages = Seq("v", "c", "s", "p")
    val genEvents = Gen.listOfN(150, for {
      u <- Gen.choose(0L, 11L)
      t <- Gen.choose(0L, 30L) // deliberate timestamp ties
      e <- Gen.oneOf("v", "c", "s", "p", "x", "y")
    } yield (u, t, e))
    (0 until 10).foreach { i =>
      val evs = sample(genEvents, 55L + i)
      val got = graft.operators.Funnel
        .funnelStages(evs.toDF("u", "t", "e").repartition(9), "u", "t", "e", stages)
        .as[(Int, Long)].collect().toMap
      val want = evs
        .map { case (u, t, e) => (u, t, stages.indexOf(e) + 1) }
        .filter(_._3 > 0)
        .groupBy(_._1).values.map { rows =>
          var stage = 0
          rows.map(r => (r._2, r._3)).sortBy(identity)
            .foreach { case (_, c) => if (c == stage + 1) stage += 1 }
          stage
        }
        .groupBy(identity).map { case (st, xs) => st -> xs.size.toLong }
      assert(got == want, s"iteration $i: $got vs $want")
    }
  }

  test("property: ewma fold == in-memory recurrence on random non-negative series") {
    val genSeries = Gen.listOfN(40, for {
      k <- Gen.oneOf("m0", "m1", "m2")
      o <- Gen.choose(0L, 99L)
      y <- Gen.choose(0L, 100000L)
    } yield (k, o, y))
    (0 until 10).foreach { i =>
      // one point per (key, order): duplicate orders make the walk ill-defined
      val pts = sample(genSeries, 91L + i).groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val got = graft.operators.Profile
        .ewma(pts.toDF("k", "o", "y").repartition(5), "k", col("o"), col("y"), shift = 3)
        .as[(String, Int, Long)].collect().map(r => r._1 -> r._3).toMap
      val want = pts.groupBy(_._1).map { case (k, rows) =>
        val ys = rows.sortBy(_._2).map(_._3)
        k -> ys.tail.foldLeft(ys.head)((acc, y) => (y + 7 * acc) >> 3)
      }
      assert(got == want, s"iteration $i")
    }
  }
}
