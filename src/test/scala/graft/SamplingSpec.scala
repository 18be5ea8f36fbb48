package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

/** Goldens + plan shape for the deterministic per-key cap. */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = (1L to 200L).map(i =>
    (i, s"src${i % 4}")).toDF("doc_id", "source")

  test("capPerKey: exactly k rows per key, ranks 1..k, deterministic") {
    val out = Sampling.capPerKey(corpus, "source", "doc_id", k = 7)
    val perKey = out.groupBy("source").count().as[(String, Long)]
      .collect().toMap
    assert(perKey.values.toSet === Set(7L))
    val ranks = out.groupBy("source")
      .agg(sort_array(collect_list("pick_rank")).as("r"))
      .as[(String, Seq[Int])].collect()
    ranks.foreach { case (_, r) => assert(r === (1 to 7)) }
    // Deterministic across runs: same kept set both times.
    val a = out.select("doc_id").as[Long].collect().toSet
    val b = Sampling.capPerKey(corpus, "source", "doc_id", k = 7)
      .select("doc_id").as[Long].collect().toSet
    assert(a === b)
  }

  test("capPerKey: keys under the cap keep everything; hash order is not id order") {
    val out = Sampling.capPerKey(corpus, "source", "doc_id", k = 1000)
    assert(out.count() === 200)
    // With a real cap, the kept set must not be the lowest-id prefix
    // (that would mean selection correlates with ingestion order).
    val kept = Sampling.capPerKey(corpus, "source", "doc_id", k = 5)
      .where(col("source") === "src0")
      .select("doc_id").as[Long].collect().toSet
    val prefix = corpus.where(col("source") === "src0")
      .orderBy("doc_id").limit(5).select("doc_id").as[Long].collect().toSet
    assert(kept !== prefix)
  }

  test("capPerKey plans a WindowGroupLimit (map-side top-k before the exchange)") {
    val plan = Sampling.capPerKey(corpus, "source", "doc_id", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"))
  }

  test("capAudit matches an actual capPerKey pass") {
    val audit = Sampling.capAudit(corpus, "source", k = 7)
      .as[(String, Long, Long, Double)].collect()
      .map { case (s, n, kept, share) => s -> ((n, kept, share)) }.toMap
    val actual = Sampling.capPerKey(corpus, "source", "doc_id", k = 7)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    audit.foreach { case (s, (n, kept, share)) =>
      assert(kept === actual(s))
      assert(n === 50L)
      assert(share === math.rint(kept.toDouble / n * 1e6) / 1e6)
    }
  }

  test("weightedSample: exact size, deterministic, weight-biased") {
    // 1000 rows, two weight classes: heavy rows weigh 20x light ones.
    // A-Res inclusion odds follow the weights, so the heavy half must
    // dominate a 100-row sample decisively (p(this imbalance by
    // unweighted chance) is astronomically small).
    val rows = (1L to 1000L).map(i =>
      (i, if (i % 2 == 0) 2000L else 100L)).toDF("doc_id", "w")
    val out = Sampling.weightedSample(rows, "doc_id", "w", k = 100)
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids.size === 100)
    val heavy = ids.count(_ % 2 == 0)
    assert(heavy >= 75, s"heavy rows in sample: $heavy of 100")
    // Deterministic: a rerun keeps the identical set.
    val again = Sampling.weightedSample(rows, "doc_id", "w", k = 100)
      .select("doc_id").as[Long].collect().toSet
    assert(again === ids)
    // Monotone in k: the top-50 is a subset of the top-100.
    val k50 = Sampling.weightedSample(rows, "doc_id", "w", k = 50)
      .select("doc_id").as[Long].collect().toSet
    assert(k50.subsetOf(ids))
  }

  test("weightedSample(PerKey): NULL / non-positive weights are excluded") {
    // Without the guard a negative weight flips ln(u)/w positive and
    // deterministically outranks every valid row; w=0 gives ±Inf keys
    // (ADVICE r5). Contract: such rows never enter the sample.
    val rows = Seq(
      (1L, "a", java.lang.Long.valueOf(-5L)),
      (2L, "a", java.lang.Long.valueOf(0L)),
      (3L, "a", null.asInstanceOf[java.lang.Long]),
      (4L, "a", java.lang.Long.valueOf(10L)),
      (5L, "a", java.lang.Long.valueOf(20L)),
      (6L, "b", java.lang.Long.valueOf(-1L)),
      (7L, "b", java.lang.Long.valueOf(7L))
    ).toDF("doc_id", "grp", "w")
    val flat = Sampling.weightedSample(rows, "doc_id", "w", k = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(flat === Set(4L, 5L, 7L))
    val perKey = Sampling
      .weightedSamplePerKey(rows, "grp", "doc_id", "w", k = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(perKey === Set(4L, 5L, 7L))
  }

  test("epochRepeat: floor copies always; residual is Bernoulli(frac); e=0 drops") {
    val rows = (1L to 2000L).map(i => (i, 2.3)).toDF("doc_id", "epochs")
    val out = Sampling.epochRepeat(rows, "doc_id", "epochs")
    val perDoc = out.groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    assert(perDoc.size === 2000) // floor(2.3) >= 1: every doc survives
    assert(perDoc.values.forall(n => n == 2L || n == 3L))
    // Expected multiplicity is exactly e: the 3-copy share estimates
    // frac(e) = 0.3 (2000 deterministic draws, tolerance ±4 sd).
    val three = perDoc.values.count(_ == 3L)
    assert(math.abs(three - 600) < 4 * math.sqrt(2000 * 0.3 * 0.7), s"$three")
    // copy_idx is dense 1..n.
    val idx = out.where(col("doc_id") === perDoc.find(_._2 == 3L).get._1)
      .select("copy_idx").as[Int].collect().sorted.toSeq
    assert(idx === Seq(1, 2, 3))
    // e = 0 drops; e in (0,1) downsamples to Bernoulli(e).
    val down = Sampling.epochRepeat(
      (1L to 2000L).map(i => (i, if (i <= 1000) 0.0 else 0.5))
        .toDF("doc_id", "epochs"), "doc_id", "epochs")
      .select("doc_id").as[Long].collect()
    assert(down.forall(_ > 1000))
    assert(math.abs(down.length - 500) < 4 * math.sqrt(1000 * 0.25), s"${down.length}")
    // Deterministic: rerun reproduces the identical multiset.
    val again = Sampling.epochRepeat(rows, "doc_id", "epochs")
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(again === perDoc)
  }

  test("weightedSamplePerKey: exact k per key, weight bias within strata") {
    val rows = (1L to 3000L).map(i =>
      (s"k${i % 3}", i, if (i % 2 == 0) 2000L else 100L))
      .toDF("grp", "doc_id", "w")
    val out = Sampling.weightedSamplePerKey(rows, "grp", "doc_id", "w", 50)
    val perKey = out.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(perKey === Map("k0" -> 50L, "k1" -> 50L, "k2" -> 50L))
    // Heavy rows dominate inside each stratum.
    val heavy = out.where(col("doc_id") % 2 === 0).count()
    assert(heavy >= 110, s"heavy rows across 150 picks: $heavy")
    // Keys smaller than k keep everything.
    val tiny = Seq(("a", 1L, 5L), ("a", 2L, 5L)).toDF("grp", "doc_id", "w")
    assert(Sampling.weightedSamplePerKey(tiny, "grp", "doc_id", "w", 10)
      .count() === 2)
    // WindowGroupLimit bounds the shuffle.
    val plan = Sampling.weightedSamplePerKey(rows, "grp", "doc_id", "w", 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"))
  }

  test("weightedSample plans TakeOrderedAndProject (bounded heap, no full sort)") {
    val rows = (1L to 100L).map(i => (i, i)).toDF("doc_id", "w")
    val plan = Sampling.weightedSample(rows, "doc_id", "w", k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(!plan.contains("SortExec"))
  }

  test("temperatureMixture: sqrt-share budgets, exact total, flattened vs proportional") {
    // char mass A=400, B=100, C=4 -> sqrt weights 20/10/2, W=32,
    // K=16 -> integer targets 10/5/1 (no remainder step needed).
    val docs =
      (1 to 20).map(i => ("A", i.toLong, 20L)) ++
      (1 to 10).map(i => ("B", 100L + i, 10L)) ++
      (1 to 4).map(i => ("C", 200L + i, 1L))
    val df = docs.toDF("source", "doc_id", "n_chars")
    val out = Sampling.temperatureMixture(df, "source", "doc_id",
        "n_chars", totalK = 16)
      .as[(String, Long, Int)].collect()
    assert(out.length === 16)
    val bySrc = out.groupBy(_._1).view.mapValues(_.length).toMap
    assert(bySrc === Map("A" -> 10, "B" -> 5, "C" -> 1))
    // alpha=0.5 flattens: proportional would give A 400/504*16 ~ 12.7
    assert(bySrc("A") < 13)
    // ranks are 1..k_i per source and the draw is deterministic
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted === (1 to rows.length))
    }
    val again = Sampling.temperatureMixture(df, "source", "doc_id",
        "n_chars", totalK = 16).as[(String, Long, Int)].collect()
    assert(out.toSet === again.toSet)
  }

  test("temperatureMixture: largest-remainder apportionment sums exactly to K") {
    // masses 9/4/1 -> sqrt 3/2/1, W=6, K=10 -> targets 5 / 3.33 / 1.67
    // -> bases 5/3/1, one leftover goes to the largest fraction (C).
    val docs =
      (1 to 9).map(i => ("A", i.toLong, 1L)) ++
      (1 to 6).map(i => ("B", 100L + i, 1L)) ++   // not enough mass? B mass 6
      (1 to 4).map(i => ("C", 200L + i, 1L))
    // per-row weight 1 => masses are row counts: A=9, B=6, C=4.
    // sqrt = 3 / 2.449... / 2, W exact-decimal; just assert the
    // invariants that must hold for ANY masses: total K, ranks 1..k.
    val out = Sampling.temperatureMixture(docs.toDF("source", "doc_id",
        "n_chars"), "source", "doc_id", "n_chars", totalK = 10)
      .as[(String, Long, Int)].collect()
    assert(out.length === 10)
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted === (1 to rows.length))
    }
  }

  test("temperatureMixture: corpus-side rank compiles to WindowGroupLimit") {
    // The static `pick_rank <= totalK` pre-cap must become a
    // WindowGroupLimit (map-side per-source top-K before the window
    // exchange): that is the property that bounds the post-shuffle
    // window state to |sources| * totalK rows TOTAL, independent of
    // corpus size. Without it, the per-source window would sort the
    // whole corpus.
    val docs = (1 to 50).map(i => ("A", i.toLong, 1L)) ++
      (1 to 50).map(i => ("B", 100L + i, 1L))
    val out = Sampling.temperatureMixture(
      docs.toDF("source", "doc_id", "n_chars"),
      "source", "doc_id", "n_chars", totalK = 7)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected the static totalK pre-cap to plan a WindowGroupLimit:\n$plan")
    assert(out.count() === 7)
  }

  test("temperatureMixture: NULL/NaN/non-positive weights carry no mass") {
    // One poisoned source (NaN + negative + NULL rows) and one clean
    // source. Without the pool guard a single NaN would poison the
    // DECIMAL total and every budget; with it, bad-weight rows are
    // neither mass nor pickable, and an all-bad source vanishes.
    val rows = Seq[(String, Long, java.lang.Double)](
      ("bad", 1L, Double.NaN), ("bad", 2L, -5.0), ("bad", 3L, null),
      ("ok", 10L, 4.0), ("ok", 11L, 4.0), ("ok", 12L, 1.0),
      // mixed source: only the positive row carries mass / is pickable
      ("mix", 20L, 9.0), ("mix", 21L, Double.NaN), ("mix", 22L, -1.0))
    val out = Sampling.temperatureMixture(
        rows.toDF("source", "doc_id", "w"),
        "source", "doc_id", "w", totalK = 4)
      .as[(String, Long, Int)].collect()
    // masses: ok=9, mix=9 -> sqrt 3/3, K=4 -> 2 + 2
    assert(out.map(_._1).toSet === Set("ok", "mix"))
    assert(out.count(_._1 == "ok") === 2)
    // mix has only ONE pickable row -> under-fills its budget (the
    // documented shortfall: budgets are fixed before the pick)
    assert(out.filter(_._1 == "mix").map(_._2).toSeq === Seq(20L))
    assert(!out.exists(_._1 == "bad"))
  }

  test("interleaveOrder: round-robin rotation; exhausted sources drop out") {
    // a has 3 docs, b has 2, c has 1 → rotations:
    //   pos 1: a1 b1 c1 | pos 2: a2 b2 | pos 3: a3
    val docs = Seq(
      ("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 10L), ("b", 20L),
      ("c", 100L)
    ).toDF("source", "doc_id")
    val out = Sampling.interleaveOrder(docs, "source", "doc_id")
      .orderBy("global_pos")
      .select("source", "doc_id", "pos", "global_pos")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("a", 1L, 1L, 1L), ("b", 10L, 1L, 2L), ("c", 100L, 1L, 3L),
      ("a", 2L, 2L, 4L), ("b", 20L, 2L, 5L),
      ("a", 3L, 3L, 6L)))
  }

  test("foldAssign: pure id function — stable under repartition and " +
      "strata-blind; foldBalance shares sum to 1 per stratum") {
    import org.apache.spark.sql.functions.col
    val df = (1L to 200L).map(i => (i, if (i % 3 == 0) "x" else "y"))
      .toDF("id", "s")
    val a1 = Sampling.foldAssign(df, "id", 5)
      .select("id", "fold").as[(Long, Int)].collect().toMap
    val a2 = Sampling.foldAssign(df.repartition(7), "id", 5)
      .select("id", "fold").as[(Long, Int)].collect().toMap
    assert(a1 === a2)
    assert(a1.values.forall(f => f >= 0 && f < 5))
    assert(a1.values.toSet.size === 5) // all folds populated at n=200
    val bal = Sampling.foldBalance(df, "id", "s", 5)
      .as[(String, Int, Long, Double)].collect().toSeq
    val byStratum = bal.groupBy(_._1)
    assert(byStratum("x").map(_._3).sum === 66L)
    assert(byStratum("y").map(_._3).sum === 134L)
    byStratum.values.foreach { cells =>
      assert(math.abs(cells.map(_._4).sum - 1.0) < 1e-4)
    }
  }

  test("mixturePlan: scarce source binds; epoch cap binds; shares validated") {
    import graft.operators.Sampling
    val mass = Seq(("a", 1000L), ("b", 10000L), ("x", 999L))
      .toDF("source", "tokens") // x untargeted -> dropped
    // a at 50% with only 1000 tokens binds T at 2000 (1 epoch cap).
    val plan = Sampling.mixturePlan(mass, "source", "tokens",
        Seq("a" -> 500, "b" -> 500))
      .as[(String, Long, Int, Long, Long, Boolean)].collect()
      .map(r => (r._1, r)).toMap
    assert(plan.size === 2)
    assert(plan("a") === (("a", 1000L, 500, 1000L, 1000L, true)))
    assert(plan("b") === (("b", 10000L, 500, 1000L, 100L, false)))
    // With 4x upsampling allowed, a can repeat: T = 8000.
    val up = Sampling.mixturePlan(mass, "source", "tokens",
        Seq("a" -> 500, "b" -> 500), maxEpochsPerMille = 4000)
      .as[(String, Long, Int, Long, Long, Boolean)].collect()
      .map(r => (r._1, r)).toMap
    assert(up("a") === (("a", 1000L, 500, 4000L, 4000L, true)))
    assert(up("b")._4 === 4000L && !up("b")._6)
    intercept[IllegalArgumentException] {
      Sampling.mixturePlan(mass, "source", "tokens", Seq("a" -> 900))
    }
  }

  test("mixturePlan: targeted source absent from mass binds T at 0") {
    import graft.operators.Sampling
    val mass = Seq(("a", 1000L)).toDF("source", "tokens")
    val plan = Sampling.mixturePlan(mass, "source", "tokens",
        Seq("a" -> 500, "missing" -> 500))
      .as[(String, Long, Int, Long, Long, Boolean)].collect()
      .map(r => (r._1, r)).toMap
    // the empty source appears, carries zero mass, and is BINDING:
    // the plan reports T = 0 instead of overstating the corpus.
    assert(plan.size === 2)
    assert(plan("missing") === (("missing", 0L, 500, 0L, 0L, true)))
    assert(plan("a") === (("a", 1000L, 500, 0L, 0L, false)))
  }
}
