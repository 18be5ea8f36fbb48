package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** Scale-readiness mechanics: skew salting (row-identical to plain
  * ops, partitioning spread) and bucketed co-located joins (no
  * exchange in the plan). */
class ScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedEquiJoin is row-identical to the plain join") {
    val large = (1 to 500).map(i => (i % 3L, i.toLong, i * 2.0))
      .toDF("key", "line", "amount") // 3 hot keys
    val small = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("key", "tag")
    val salted = Skew.saltedEquiJoin(large, small, Seq("key"), 8, col("line"))
      .orderBy("key", "line")
      .collect()
    val plain = large.join(small, "key").orderBy("key", "line").collect()
    assert(salted.toSeq === plain.toSeq)
  }

  test("saltedEquiJoin spreads a hot key over multiple salt buckets") {
    val large = (1 to 100).map(i => (7L, i.toLong)).toDF("key", "line")
    val nSalts = large
      .withColumn("__salt", pmod(hash(col("line")), lit(8)))
      .select("__salt").distinct().count()
    assert(nSalts > 4) // one hot key spreads across most of 8 buckets
  }

  test("saltedAggregate matches the plain aggregation") {
    val df = (1 to 300).map(i => (i % 2L, i.toLong, i.toDouble))
      .toDF("key", "line", "v")
    val out = Skew.saltedAggregate(
      df, Seq("key"), col("line"), 8,
      partials = Seq(sum("v").as("s"), count(lit(1)).as("c")),
      finals = Seq(
        sum("s").cast("double").as("total"), sum("c").as("n")))
      .orderBy("key")
      .as[(Long, Double, Long)].collect().toSeq
    val plain = df.groupBy("key")
      .agg(sum("v").cast("double").as("total"), count(lit(1)).as("n"))
      .orderBy("key")
      .as[(Long, Double, Long)].collect().toSeq
    assert(out === plain)
  }

  test("AQE splits a skewed join partition at runtime (skew=true in final plan)") {
    // The complement of saltedEquiJoin: when the hot key is NOT known
    // ahead of time, the engine's posture is to let AQE detect and
    // split the oversized shuffle partition. Thresholds are shrunk so
    // the sf-test-sized hot key (one key carrying ~all rows) trips
    // the same detection that a 100 TB hot key would trip at defaults.
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    def restore(): Unit = saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      val pad = "x" * 64
      val large = (1 to 40000).map(i => (0L, i.toLong, pad))
        .toDF("key", "line", "pad") // one hot key = one fat partition
      val right = (0 to 3).map(i => (i.toLong, s"tag$i")).toDF("key", "tag")
      val joined = large.join(right, "key")
      // collect() (not count()) so THIS QueryExecution runs and its
      // AdaptiveSparkPlanExec finalizes — count() builds a separate one.
      assert(joined.collect().length === 40000)
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case other => other.toString
      }
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the skewed join split:\n$finalPlan")
    } finally restore()
  }

  test("bucketed tables co-locate the join: zero shuffle exchanges") {
    val n = 1000
    (1 to n).map(i => (i.toLong, i * 10.0)).toDF("k", "a")
      .write.mode("overwrite").bucketBy(4, "k").sortBy("k")
      .saveAsTable("bkt_a")
    (1 to n).map(i => (i.toLong, s"v$i")).toDF("k", "b")
      .write.mode("overwrite").bucketBy(4, "k").sortBy("k")
      .saveAsTable("bkt_b")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
      assert(joined.count() === n)
      val executed = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case other => other
      }
      val shuffles = executed.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty,
        s"bucketed join should not shuffle, found: $shuffles")
      // Bucket pruning: an equality filter on the bucket key must scan
      // ONE bucket, not all four — at 100 TB that's a 4× (or
      // buckets×) scan reduction for point lookups, visible in the
      // scan node's "SelectedBucketsCount: 1 out of 4". The planner's
      // auto-bucketed-scan turns bucketed reading OFF for filter-only
      // queries (no exchange to elide) and drops the pruning with it,
      // so pin it on for the point lookup.
      val autoKey = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
      val prevAuto = spark.conf.get(autoKey)
      spark.conf.set(autoKey, "false")
      try {
        val pointPlan = spark.table("bkt_a").where(col("k") === 7L)
          .queryExecution.executedPlan.toString
        assert(pointPlan.contains("SelectedBucketsCount: 1 out of 4"),
          s"bucket pruning missing from point-lookup scan:\n$pointPlan")
      } finally spark.conf.set(autoKey, prevAuto)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }

  test("skewProbe: hot key tops the report with the salt factor that flattens it") {
    // 12 rows over 4 keys (uniform load = 3): "a"×8 needs salt 3,
    // everything else fits one reducer.
    val df = (Seq.fill(8)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d"))
      .toDF("k")
    val out = Skew.skewProbe(df, "k", topK = 2)
      .as[(String, Long, Double, Double, Long)].collect()
    assert(out.length === 2)
    assert(out(0) === (("a", 8L, 0.666667, 2.667, 3L)))
    assert(out(1) === (("b", 2L, 0.166667, 0.667, 1L)))
    // TakeOrderedAndProject bounds the report — no global sort.
    val p = Skew.skewProbe(df, "k", topK = 2)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("joinSizeProfile: exact pair counts vs the actually-run join") {
    val left = Seq("a", "a", "a", "b", "b", "c", "d")
      .toDF("k").withColumn("lid", monotonically_increasing_id())
    val right = Seq("a", "a", "b", "c", "c", "c", "e")
      .toDF("k").withColumn("rid", monotonically_increasing_id())
    val prof = Skew.joinSizeProfile(left, "k", right, "k", topK = 10)
      .select("key", "n_left", "n_right", "pairs", "share")
      .as[(String, Long, Long, String, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // ground truth by running the join it predicts
    val actual = left.join(right, "k").groupBy("k").count()
      .as[(String, Long)].collect().toMap
    assert(prof.keySet === actual.keySet) // d and e never join
    prof.foreach { case (k, (_, _, pairs, _)) =>
      assert(pairs === actual(k).toString, s"key $k")
    }
    assert(prof("a") === ((3L, 2L, "6", 0.545455))) // 6 of 11 total
    assert(math.abs(prof.values.map(_._4).sum - 1.0) < 1e-5)
    // profile cost is bounded: top-k via TakeOrderedAndProject
    val p = Skew.joinSizeProfile(left, "k", right, "k", topK = 2)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("bipartiteProject maxBasket bounds wedge volume on a power-law fixture") {
    import graft.operators.Graph
    // Zipf-ish two-mode fixture: left node j has basket {1..n/j} —
    // node 1 is an n-item hub, so UNCAPPED pair volume is dominated
    // by its C(n,2) and grows ~quadratically; with the cap the hub
    // tier drops and volume grows ~linearly.
    def rel(n: Int) = (1 to n).flatMap { j =>
      (1 to math.max(1, n / j)).map(r => (j.toLong, r.toLong))
    }.toDF("l", "r")
    def pairVolume(n: Int, cap: Long): Long =
      Graph.bipartiteProject(rel(n), "l", "r",
          minSupport = 1, maxBasket = cap)
        .agg(sum(col("support"))).collect().head.getLong(0)
    val (n1, n2) = (64, 256)
    val capped1 = pairVolume(n1, 16)
    val capped2 = pairVolume(n2, 16)
    val unc1 = pairVolume(n1, Long.MaxValue)
    val unc2 = pairVolume(n2, Long.MaxValue)
    // 4x the left nodes: capped volume scales ~4x, uncapped ~16x
    assert(capped2.toDouble / capped1 < 6.0,
      s"capped slope blew up: $capped1 -> $capped2")
    assert(unc2.toDouble / unc1 > 12.0,
      s"fixture lost its hub: $unc1 -> $unc2")
    // and the capped result IS the projection of the kept baskets
    val kept = rel(n2).groupBy("l").count()
      .where(col("count") <= 16).select("l")
    val reference = Graph.bipartiteProject(
        rel(n2).join(kept, Seq("l"), "left_semi"), "l", "r",
        minSupport = 1)
      .orderBy("node_a", "node_b").collect().toSeq
    val viaCap = Graph.bipartiteProject(rel(n2), "l", "r",
        minSupport = 1, maxBasket = 16)
      .orderBy("node_a", "node_b").collect().toSeq
    assert(viaCap === reference)
  }
}
