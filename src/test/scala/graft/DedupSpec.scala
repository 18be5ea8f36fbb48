package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Unit tests for the dedup operator family (exact, MinHash/LSH,
  * n-gram Jaccard, SimHash) on small hand-built corpora with
  * hand-checkable goldens. */
class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"), // near dup of 1
    (4L, "completely different words appear in this one here now")
  ).toDF("doc_id", "text")

  test("exact dedup keeps min id per content group with n_copies") {
    val out = Dedup.exact(corpus, "text", "doc_id")
      .select("doc_id", "n_copies").orderBy("doc_id")
      .as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 2L), (3L, 1L), (4L, 1L)))
  }

  test("shingles: distinct word n-grams; short docs drop out") {
    val df = Seq((1L, "a b c d"), (2L, "a b")).toDF("doc_id", "text")
    val sh = Dedup.shingles(df, "doc_id", "text", 3)
      .as[(Long, String)].collect().toSet
    assert(sh === Set((1L, "a b c"), (1L, "b c d"))) // doc 2: no rows
  }

  test("minhash signatures: identical docs get identical signatures") {
    val sigs = Dedup.minhashSignatures(corpus, "doc_id", "text", 8, 3)
      .select("doc_id", "sig").as[(Long, Seq[String])]
      .collect().toMap
    assert(sigs(1L) === sigs(2L))
    assert(sigs(1L) !== sigs(4L))
    assert(sigs(1L).length === 8)
    // near-dup shares most minhashes with its source
    assert(sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b } >= 4)
  }

  test("LSH candidates find the exact and near pair, not the outlier") {
    val cand = Dedup.minhashCandidates(corpus, "doc_id", "text", 8, 2, 3)
      .select("doc_a", "doc_b", "n_match", "est_jaccard")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(cand.contains((1L, 2L)))
    assert(cand((1L, 2L)) === ((8L, 1.0)))
    assert(!cand.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("exact n-gram Jaccard on candidates: dup=1.0, near-dup correct") {
    val j = Dedup.ngramJaccard(corpus, "doc_id", "text", 8, 2, 3)
      .select("doc_a", "doc_b", "n_common", "jaccard")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(j((1L, 2L)) === ((7L, 1.0)))
    // docs 1 and 3 share 6 of their 7 3-shingles -> J = 6/8
    j.get((1L, 3L)).foreach { case (common, jac) =>
      assert(common === 6L)
      assert(jac === 6.0 / 8.0)
    }
  }

  test("simhash: 64-bit fingerprint, equal for dups, near for near-dups") {
    val fp = corpus
      .select(col("doc_id"), Dedup.simhash(col("text")).as("fp"))
      .as[(Long, String)].collect().toMap
    assert(fp.values.forall(f => f.length == 64 && f.forall(c => c == '0' || c == '1')))
    assert(fp(1L) === fp(2L))
    def hamming(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    assert(hamming(fp(1L), fp(3L)) < hamming(fp(1L), fp(4L)))
  }

  test("ShingleArray kernel is element-identical to the HOF shingles") {
    val edge = corpus.unionByName(Seq(
      (200L, "a b"), // fewer than n tokens
      (201L, "x y z x y z x y z") // repeated shingles
    ).toDF("doc_id", "text"))
    val fast = graft.operators.Dedup.shingles(edge, "doc_id", "text", 3)
      .as[(Long, String)].collect().sorted.toSeq
    val ref = graft.operators.Dedup.shinglesHof(edge, "doc_id", "text", 3)
      .as[(Long, String)].collect().sorted.toSeq
    assert(fast === ref)
    assert(!fast.exists(_._1 == 200L)) // short doc emits no rows
  }

  test("MinHashSig expression is bit-identical to the aggregation reference") {
    val fast = graft.operators.Dedup
      .minhashSignatures(corpus, "doc_id", "text", 8, 3)
      .as[(Long, Seq[Long])].collect().toMap
    val ref = graft.operators.Dedup
      .minhashSignaturesAgg(corpus, "doc_id", "text", 8, 3)
      .as[(Long, Seq[Long])].collect().toMap
    assert(fast === ref)
    // A doc with fewer than shingleSize tokens is dropped by both.
    val tiny = Seq((9L, "one two")).toDF("doc_id", "text")
    assert(graft.operators.Dedup.minhashSignatures(tiny, "doc_id", "text", 8, 3).count() === 0)
  }

  test("nearDupClusters: chains collapse to one min-id cluster; islands stay apart") {
    // Chain 1-2-3 (no direct 1-3 edge), pair 10-11, chain 20-21-22-23.
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (10L, 11L), (21L, 20L), (21L, 22L), (23L, 22L)
    ).toDF("doc_a", "doc_b")
    val expected = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L)
    // Driver union-find path (default for bounded edge sets)...
    val out = graft.operators.Dedup.nearDupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(out === expected)
    assert(out.count { case (id, c) => id == c } === 3)
    // ...and both distributed formulations agree exactly.
    val iter = graft.operators.Dedup.iterativeClusters(pairs, maxIter = 20)
      .as[(Long, Long)].collect().toMap
    assert(iter === expected)
    val star = graft.operators.Dedup
      .starContractClusters(
        pairs.select($"doc_a".cast("long"), $"doc_b".cast("long")),
        maxIter = 20)
      .as[(Long, Long)].collect().toMap
    assert(star === expected)
  }

  test("starContractClusters: 128-node path converges in O(log n) rounds, not diameter") {
    // A single path 0-1-2-...-127: the worst case for min-label
    // propagation (needs ~diameter = 127 rounds). Star contraction
    // must collapse it to cluster 0 well inside a logarithmic round
    // budget — this is the scale guarantee for pathological
    // duplicate-chains at 100 TB.
    val n = 128
    val pairs = (0 until n - 1).map(i => (i.toLong, i + 1L))
      .toDF("doc_a", "doc_b")
    val (out, rounds) = graft.operators.Dedup
      .starContractRounds(pairs, maxIter = 20)
    val labels = out.as[(Long, Long)].collect().toMap
    assert(labels.size === n)
    assert(labels.values.forall(_ == 0L), s"non-zero labels: ${labels.filter(_._2 != 0L)}")
    assert(rounds <= 12, s"path-128 took $rounds rounds (diameter-bound behavior)")

    // Self-pair-only nodes survive as singleton clusters (union-find parity).
    val selfy = Seq((5L, 5L), (7L, 8L)).toDF("doc_a", "doc_b")
    val selfOut = graft.operators.Dedup
      .starContractClusters(selfy, maxIter = 10)
      .as[(Long, Long)].collect().toMap
    assert(selfOut === Map(5L -> 5L, 7L -> 7L, 8L -> 7L))
  }

  /** Poll until the set of persisted RDD ids NEWLY created since
    * `before` shrinks to ≤ `allowed`, tolerating the in-flight async
    * work this census must not race: `unpersist(blocking = false)`
    * calls issued by the code under test and ContextCleaner activity
    * reclaiming EARLIER tests' blocks (disappearances of pre-existing
    * ids are ignored entirely — only ids this call created count). */
  private def assertNoNewPersistedRdds(
      before: Set[Int], allowed: Int, what: String): Unit = {
    val sc = spark.sparkContext
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    var leaked = sc.getPersistentRDDs.keySet.toSet -- before
    while (leaked.size > allowed && System.nanoTime() < deadline) {
      Thread.sleep(50)
      leaked = sc.getPersistentRDDs.keySet.toSet -- before
    }
    assert(leaked.size <= allowed,
      s"$what leaked persisted RDD ids $leaked (allowed $allowed)")
  }

  test("starContractClusters: random-graph parity with driver union-find") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
    val pairs = edges.toDF("doc_a", "doc_b")
    // Driver union-find ground truth (nearDupClusters with everything
    // under the probe cap takes that path). The driver path is a
    // single collect — it must leave NO cached RDDs behind.
    val beforeUf = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val uf = graft.operators.Dedup.nearDupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assertNoNewPersistedRdds(beforeUf, 0, "driver-path nearDupClusters")
    val beforeStar = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val star = graft.operators.Dedup
      .starContractClusters(
        pairs.select($"doc_a".cast("long"), $"doc_b".cast("long")),
        maxIter = 30)
      .as[(Long, Long)].collect().toMap
    assert(star === uf)
    // The star path's working caches are all released; only the
    // returned frame's localCheckpoint block may remain.
    assertNoNewPersistedRdds(beforeStar, 1, "starContractClusters")
  }

  test("starContractRounds: reliable checkpoint barrier when a checkpoint dir is set") {
    // On a real cluster localCheckpoint blocks die with their executor
    // and cannot be recomputed; setting a checkpoint dir must switch
    // every round barrier to a reliable FS checkpoint with identical
    // results. (The dir stays set for the rest of this suite's JVM —
    // harmless: it only changes which barrier starContractRounds picks.)
    // NOT deleted afterwards: sc.checkpointDir cannot be unset, and a
    // dangling dir would crash any later reliable checkpoint in this
    // JVM. A few KB in the test tmpdir is the cheaper trade.
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    val pairs = (0 until 63).map(i => (i.toLong, i + 1L))
      .toDF("doc_a", "doc_b")
    val (out, rounds) = graft.operators.Dedup
      .starContractRounds(pairs, maxIter = 20)
    val labels = out.as[(Long, Long)].collect().toMap
    assert(labels.size === 64)
    assert(labels.values.forall(_ == 0L))
    assert(rounds <= 12)
    // Reliable round state actually landed in the fault-tolerant dir.
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(java.nio.file.Files.isRegularFile(_)).count()
    assert(files > 0, "no reliable checkpoint files were written")
  }

  test("rolling chunks: contiguous full coverage, stable under prefix edits") {
    import graft.functions.RollingChunks
    val base = "the quick brown fox jumps over the lazy dog and then " * 8
    val edited = "XY " + base // insertion at the front
    val df = Seq((1L, base), (2L, edited), (3L, ""), (4L, "tiny"))
      .toDF("doc_id", "text")
    val chunks = df.select(
        $"doc_id", $"text",
        posexplode(RollingChunks($"text", 16, 32)))
      .select($"doc_id", $"pos", $"col.start", $"col.len",
        md5($"text".substr($"col.start", $"col.len")).as("h"))
      .as[(Long, Int, Int, Int, String)].collect()
      .groupBy(_._1)

    // Spans are contiguous from 1 and cover the whole text.
    for ((id, sp) <- chunks; sorted = sp.sortBy(_._2)) {
      assert(sorted.head._3 === 1)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._3 === a._3 + a._4); case _ =>
      }
      val text = if (id == 1) base else if (id == 2) edited else "tiny"
      assert(sorted.map(_._4).sum === text.length)
    }
    assert(!chunks.contains(3L)) // empty text -> no chunks
    assert(chunks(4L).length === 1) // shorter than window -> one tail chunk

    // Content-defined boundaries: after the first re-synced cut, the
    // edited doc shares most chunk hashes with the original.
    val h1 = chunks(1L).map(_._5).toSet
    val h2 = chunks(2L).map(_._5).toSet
    val shared = h1.intersect(h2).size
    assert(shared >= h1.size - 2, s"only $shared of ${h1.size} chunks survived the edit")
  }

  test("chunkDedup: global first-occurrence by (id, pos); full dups empty out") {
    // chunk size 2: doc 1 = [a b][c d]; doc 2 = full dup of 1 -> '';
    // doc 3 shares [a b] (dropped) but keeps its own tail [x y];
    // doc 4 = 3 tokens -> 2 chunks, short last chunk [z].
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b c d"),
      (3L, "a b x y"),
      (4L, "q r z")
    ).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(docs, "doc_id", "text", chunkTokens = 2)
      .select("doc_id", "n_chunks", "n_kept", "kept_text")
      .as[(Long, Long, Long, String)].collect().toSet
    assert(out === Set(
      (1L, 2L, 2L, "a b c d"),
      (2L, 2L, 0L, ""),
      (3L, 2L, 1L, "x y"),
      (4L, 2L, 2L, "q r z")))
  }

  test("simhashFast (codegen'd expression) is bit-identical to the HOF reference") {
    val edgeCases = Seq(
      (100L, "single"),
      (101L, "double  space trailing "), // empty tokens from split(-1)
      (102L, "a b c a b c repeated tokens")
    ).toDF("doc_id", "text")
    val both = corpus.unionByName(edgeCases)
      .select(
        Dedup.simhash(col("text")).as("ref"),
        Dedup.simhashFast(col("text")).as("fast"))
      .as[(String, String)].collect()
    both.foreach { case (ref, fast) => assert(ref === fast) }
  }

  test("splitLeakage: cross-split pairs flagged; one assignment scan in the plan") {
    val pairs = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("doc_a", "doc_b")
    val assign = Seq(
      (1L, "train"), (2L, "val"),   // leaked
      (3L, "train"), (4L, "train"), // same split
      (5L, "val"), (6L, "val")      // same split
    ).toDF("doc_id", "split")
    val out = Dedup.splitLeakage(pairs, assign, "doc_id", "split")
      .orderBy("doc_a")
      .as[(Long, Long, String, String, Boolean)].collect().toSeq
    assert(out === Seq(
      (1L, 2L, "train", "val", true),
      (3L, 4L, "train", "train", false),
      (5L, 6L, "val", "val", false)))
    // The corpus-sized assignment frame must appear exactly once in
    // the plan (melted-pair join), not once per pair side.
    val scans = Dedup.splitLeakage(pairs, assign, "doc_id", "split")
      .queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation
          if l.output.exists(_.name == "split") => l
      }
    assert(scans.size === 1)
  }

  test("splitCoherentRepair: clusters follow their representative; " +
      "repair closes leakage by construction") {
    val assign = Seq(
      (1L, "train"), (2L, "val"),   // cluster {1,2}: rep 1 -> train
      (3L, "val"), (4L, "train"),   // cluster {3,4}: rep 3 -> val
      (5L, "val")                   // unclustered: untouched
    ).toDF("doc_id", "split")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L))
      .toDF("id", "cluster")
    val out = Dedup.splitCoherentRepair(assign, "doc_id", "split", clusters)
      .orderBy("doc_id")
      .as[(Long, String, String, Boolean)].collect().toSeq
    assert(out === Seq(
      (1L, "train", "train", false),
      (2L, "val", "train", true),
      (3L, "val", "val", false),
      (4L, "train", "val", true),
      (5L, "val", "val", false)))
    // leakage closure: no cluster straddles splits after the repair
    val repaired = Dedup.splitCoherentRepair(
        assign, "doc_id", "split", clusters)
      .select(col("doc_id").as("id"), col("new_split"))
      .join(clusters, Seq("id"))
    assert(repaired.groupBy("cluster")
      .agg(countDistinct("new_split").as("k"))
      .where(col("k") > 1).count() === 0L)
  }

  test("exactSimilarityJoin: parity with brute force across thresholds") {
    // 40 docs built from overlapping word windows over a 60-word
    // alphabet: adjacent docs overlap heavily, distant docs little —
    // a smooth jaccard spectrum, so thresholds cut at many points.
    val vocab = (0 until 60).map(i => s"w$i")
    val docs = (0 until 40).map { d =>
      val words = (0 until 20).map(k => vocab((d * 3 + k * 2) % 60))
      (d.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
      .as[(Long, String)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    def brute(t: Double): Set[(Long, Long, Long)] = (for {
      a <- sh.keys; b <- sh.keys if a < b
      inter = (sh(a) & sh(b)).size
      j = inter.toDouble / (sh(a).size + sh(b).size - inter)
      if j >= t
    } yield (a, b, inter.toLong)).toSet
    for (t <- Seq(0.3, 0.5, 0.7, 0.9)) {
      val got = Dedup.exactSimilarityJoin(docs, "doc_id", "text", t, 3)
        .select("doc_a", "doc_b", "n_common")
        .as[(Long, Long, Long)].collect().toSet
      assert(got === brute(t), s"threshold $t")
    }
  }

  test("exactSimilarityJoin: prefix filter prunes the candidate space") {
    // The planted corpus: only the exact pair (1,2) and near pair
    // survive; doc 4 shares nothing. Also check the degenerate
    // threshold=1.0 prefix (single rarest shingle) still finds the
    // exact dup — the tightest prefix the lemma allows.
    val out = Dedup.exactSimilarityJoin(corpus, "doc_id", "text", 1.0, 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 2L)))
    val out6 = Dedup.exactSimilarityJoin(corpus, "doc_id", "text", 0.6, 3)
      .select("doc_a", "doc_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(out6.map(p => (p._1, p._2)) === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(out6.forall(_._3 >= 0.6))
  }

  test("containmentJoin: parity with brute force across thresholds") {
    // Same smooth-overlap corpus as the Jaccard parity test, PLUS a
    // planted subsumption: doc 100 is a 6-word slice of doc 0 — high
    // containment (its shingles all live in doc 0) but low Jaccard,
    // the case the directional join exists for.
    val vocab = (0 until 60).map(i => s"w$i")
    val base = (0 until 40).map { d =>
      val words = (0 until 20).map(k => vocab((d * 3 + k * 2) % 60))
      (d.toLong, words.mkString(" "))
    }
    val docs = (base :+ (100L,
      (0 until 6).map(k => vocab((k * 2) % 60)).mkString(" ")))
      .toDF("doc_id", "text")
    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
      .as[(Long, String)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    def brute(t: Double): Set[(Long, Long, Long)] = (for {
      a <- sh.keys; b <- sh.keys if a != b
      inter = (sh(a) & sh(b)).size
      if inter.toDouble / sh(a).size >= t
    } yield (a, b, inter.toLong)).toSet
    for (t <- Seq(0.3, 0.5, 0.8, 1.0)) {
      val got = Dedup.containmentJoin(docs, "doc_id", "text", t, 3)
        .select("doc", "container", "n_common")
        .as[(Long, Long, Long)].collect().toSet
      assert(got === brute(t), s"threshold $t")
    }
    // The planted slice is fully contained in doc 0 (containment 1.0
    // in that direction only) — asymmetry is the point.
    val strict = Dedup.containmentJoin(docs, "doc_id", "text", 1.0, 3)
      .select("doc", "container").as[(Long, Long)].collect().toSet
    assert(strict.contains((100L, 0L)))
    assert(!strict.contains((0L, 100L)))
  }

  test("containmentJoin: IEEE ceil boundary keeps zero false negatives") {
    // t=0.07 with a 100-shingle probe: 0.07*100 rounds UP to
    // 7.000000000000001 in double, so a naive ceil demands overlap 8
    // and shortens the prefix to 93 — yet overlap 7 passes the final
    // 7/100 >= 0.07 compare (both round to the same double). The
    // shared shingles are engineered to be the probe's 7 MOST COMMON
    // (df 6 vs df 1), so they sit exactly in the positions a
    // one-short prefix drops — the regression the loose-ceil bound
    // exists for.
    val sRun = (1 to 9).map(i => s"s$i")
    val probe = ((1 to 93).map(i => s"u$i") ++ sRun).mkString(" ")
    val container = (sRun ++ Seq("v1", "v2")).mkString(" ")
    val fillers = (3L to 6L).map(i =>
      (i, (sRun ++ Seq(s"f${i}a", s"f${i}b")).mkString(" ")))
    val docs = (Seq((1L, probe), (2L, container)) ++ fillers)
      .toDF("doc_id", "text")
    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
      .as[(Long, String)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(sh(1L).size === 100 && (sh(1L) & sh(2L)).size === 7)
    val got = Dedup.containmentJoin(docs, "doc_id", "text", 0.07, 3)
      .select("doc", "container").as[(Long, Long)].collect().toSet
    val brute = (for {
      a <- sh.keys; b <- sh.keys if a != b
      if (sh(a) & sh(b)).size.toDouble / sh(a).size >= 0.07
    } yield (a, b)).toSet
    assert(got === brute)
    assert(got.contains((1L, 2L)), "the boundary pair must survive pruning")
  }

  test("containmentJoin: exact duplicates contain each other both ways") {
    val out = Dedup.containmentJoin(corpus, "doc_id", "text", 1.0, 3)
      .select("doc", "container", "containment")
      .as[(Long, Long, Double)].collect().toSet
    assert(out.map(p => (p._1, p._2)).intersect(
      Set((1L, 2L), (2L, 1L))) === Set((1L, 2L), (2L, 1L)))
    assert(out.forall(_._3 == 1.0))
  }

  test("canonicalPick: best-quality wins, id breaks ties, NULL score loses, " +
      "singletons canonical") {
    import org.apache.spark.sql.functions.col
    val scored = Seq(
      (1L, Some(0.5)), (2L, Some(0.9)), (3L, Some(0.9)), // cluster 1
      (4L, None), (5L, Some(0.1)),                       // cluster 4
      (6L, Some(0.7))                                     // singleton
    ).toDF("doc_id", "q")
    val clusters = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L)
    ).toDF("id", "cluster")
    val out = graft.operators.Dedup
      .canonicalPick(scored, "doc_id", "q", clusters)
      .as[(Long, Long, Option[Double], Boolean)].collect().toSeq
    val pick = out.map(r => r._1 -> r._4).toMap
    // 2 and 3 tie at 0.9 -> lower id 2 wins
    assert(pick === Map(1L -> false, 2L -> true, 3L -> false,
      4L -> false, 5L -> true, 6L -> true))
    assert(out.find(_._1 == 6L).get._2 === 6L) // singleton cluster = own id
    // keeping only canonicals is a proper dedup: one per cluster
    val kept = out.filter(_._4).map(_._2)
    assert(kept.distinct.size === kept.size && kept.size === 3)
  }

  test("winnowFingerprints: detection guarantee, rightmost ties, density bound") {
    // The Schleimer guarantee at k=3, w=4: a copied span of
    // w+k-1 = 6 tokens MUST co-select at least one fingerprint.
    val span = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, s"one two three $span four five six"),
      (2L, s"red blue $span green yellow purple orange"),
      (3L, "totally different words everywhere here now and then")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(docs, "doc_id", "text",
        k = 3, w = 4, minShared = 1L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L),
      s"copied 6-token span must pair docs 1 and 2: $pairs")
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L))
    // All-equal hashes: every window's winner is its RIGHTMOST gram.
    val uni = Seq((9L, "a a a a a a a a")).toDF("doc_id", "text")
    val fp = Dedup.winnowFingerprints(uni, "doc_id", "text", k = 3, w = 4)
      .select("pos").as[Int].collect().toSeq.sorted
    // 6 shingles (m=6), starts 0..2, winner pos = start+3 -> {3,4,5}
    assert(fp === Seq(3, 4, 5), s"rightmost-tie winners: $fp")
    // Selection never exceeds the window count (density bound).
    val big = Seq((7L, (1 to 200).map(i => s"w${i % 37}").mkString(" ")))
      .toDF("doc_id", "text")
    val n = Dedup.winnowFingerprints(big, "doc_id", "text", 3, 4).count()
    val grams = 200 - 3 + 1
    assert(n <= grams - 4 + 1 && n > 0)
  }

  test("thresholdCurve: hand-computed confusion cells and F-scores; " +
      "degenerate cells go NULL per contract") {
    val pairs = Seq(
      (0.9, true), (0.7, false), (0.4, true), (0.2, false)
    ).toDF("est", "truth")
    val out = Dedup.thresholdCurve(pairs, col("est"), col("truth"),
        Seq(0.5, 0.8, 0.95))
      .orderBy("threshold")
      .as[(Double, Long, Long, Long, Long, Option[Double],
        Option[Double], Option[Double])].collect().toSeq
    assert(out(0) === ((0.5, 1L, 1L, 1L, 1L,
      Some(0.5), Some(0.5), Some(0.5))))
    val f1 = BigDecimal(2.0 * 1.0 * 0.5 / 1.5)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1) === ((0.8, 1L, 0L, 1L, 2L,
      Some(1.0), Some(0.5), Some(f1))))
    // nothing predicted positive at 0.95: precision undefined (NULL),
    // recall 0, F1 NULL (one side undefined)
    assert(out(2)._2 == 0L && out(2)._3 == 0L)
    assert(out(2)._6.isEmpty && out(2)._7 === Some(0.0) &&
      out(2)._8.isEmpty)
  }

  test("thresholdCurve: all-negative truth makes recall undefined, " +
      "defined-but-zero F1 stays 0") {
    val pairs = Seq((0.9, false), (0.3, false)).toDF("est", "truth")
    val out = Dedup.thresholdCurve(pairs, col("est"), col("truth"),
        Seq(0.5))
      .as[(Double, Long, Long, Long, Long, Option[Double],
        Option[Double], Option[Double])].collect().head
    // tp=0 fp=1 fn=0 tn=1: precision 0, recall NULL, F1 NULL
    assert(out._2 == 0L && out._3 == 1L && out._4 == 0L && out._5 == 1L)
    assert(out._6 === Some(0.0) && out._7.isEmpty && out._8.isEmpty)
  }

  test("incrementalClusters: merge/join/takeover/chain goldens") {
    // prior state: {1,2} -> 1, {10,11} -> 10
    val asg = Seq((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L))
      .toDF("id", "cluster")
    def run(pairs: Seq[(Long, Long)]): Map[Long, Long] =
      Dedup.incrementalClusters(asg, pairs.toDF("doc_a", "doc_b"))
        .as[(Long, Long)].collect().toMap
    // one new edge merges the two old clusters wholesale
    assert(run(Seq((2L, 11L))) ===
      Map(1L -> 1L, 2L -> 1L, 10L -> 1L, 11L -> 1L))
    // a new node joins an old cluster, keeping its representative
    assert(run(Seq((20L, 11L))) ===
      Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L, 20L -> 10L))
    // a new node SMALLER than the old representative takes over
    assert(run(Seq((0L, 11L))) ===
      Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 10L -> 0L, 11L -> 0L))
    // a chain through brand-new nodes bridges into an old cluster,
    // and a self/duplicate/mirror edge set is canonicalized away
    assert(run(Seq((30L, 31L), (31L, 1L), (31L, 30L), (30L, 30L))) ===
      Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L,
        30L -> 1L, 31L -> 1L))
    // empty increment: assignments pass through untouched
    assert(run(Seq.empty) ===
      Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("incrementalClusters: random-graph parity with from-scratch CC") {
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 3) {
      val n = 60
      val edges = (1 to 120).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val (old, fresh) = edges.splitAt(edges.length / 2)
      val oldAsg = Dedup.nearDupClusters(old.toDF("doc_a", "doc_b"))
      val inc = Dedup.incrementalClusters(
          oldAsg, fresh.toDF("doc_a", "doc_b"))
        .as[(Long, Long)].collect().toMap
      val full = Dedup.nearDupClusters(
          (old ++ fresh).toDF("doc_a", "doc_b"))
        .as[(Long, Long)].collect().toMap
      // full CC covers only ids with edges; incremental additionally
      // carries old ids whose cluster didn't change — compare on the
      // union domain with singletons defaulting to themselves
      (inc.keySet ++ full.keySet).foreach { id =>
        assert(inc.getOrElse(id, id) === full.getOrElse(id, id),
          s"trial $trial id $id")
      }
    }
  }
}
