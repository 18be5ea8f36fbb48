package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** PageRank power iteration: closed-form goldens on tiny graphs,
  * invariants (mass conservation, dangling handling), and the
  * round-barrier hygiene shared with the CC loop. */
class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ranksOf(
      edges: Seq[(String, String, Long)], iters: Int = 30)
      : Map[String, Double] = {
    val df = edges.toDF("src", "dst", "w")
    Graph.pageRank(df, "src", "dst", "w", damping = 0.85, iters = iters)
      .as[(String, Double)].collect().toMap
  }

  test("two-node cycle converges to the uniform fixed point") {
    val r = ranksOf(Seq(("a", "b", 1L), ("b", "a", 1L)))
    assert(math.abs(r("a") - 0.5) < 1e-9)
    assert(math.abs(r("b") - 0.5) < 1e-9)
  }

  test("star graph: the hub outranks the spokes; mass sums to 1") {
    // spokes point at the hub; hub points back at every spoke.
    val spokes = (1 to 4).map(i => s"s$i")
    val edges = spokes.map(s => (s, "hub", 1L)) ++
      spokes.map(s => ("hub", s, 1L))
    val r = ranksOf(edges, iters = 60)
    assert(spokes.forall(s => r("hub") > r(s)))
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
    // closed form for this symmetric 5-node graph: hub = (1-d)/5 +
    // d·4·spoke and spoke = (1-d)/5 + d·hub/4 solve to
    // hub = (1+4d)/(5(1+d)). The hub↔spoke alternating mode decays
    // as d^k (0.85^60 ≈ 6e-5), so the tolerance tracks convergence,
    // not float noise.
    val d = 0.85
    val hub = (1 + 4 * d) / (5 * (1 + d))
    assert(math.abs(r("hub") - hub) < 1e-4)
  }

  test("dangling node redistributes its mass; ranks still sum to 1") {
    // c has no out-edges: its rank must spread to everyone, not leak.
    val r = ranksOf(Seq(("a", "b", 1L), ("b", "c", 1L)))
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
    assert(r("c") > r("b") * 0.5) // c receives from b, keeps nonzero mass
  }

  test("edge weights steer rank: heavier edge, bigger share") {
    val r = ranksOf(Seq(
      ("a", "b", 9L), ("a", "c", 1L), ("b", "a", 1L), ("c", "a", 1L)))
    assert(r("b") > r("c"))
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }

  test("iteration loop leaves no superseded checkpoint blocks behind") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet.toSet
    val df = Seq(("a", "b", 1L), ("b", "a", 1L)).toDF("src", "dst", "w")
    Graph.pageRank(df, "src", "dst", "w", iters = 5).collect()
    // Allow the final ranks frame + the persistent nodes frame; every
    // superseded round must have been freed (poll: unpersist is async).
    var leaked = sc.getPersistentRDDs.keySet.toSet -- before
    val deadline = System.nanoTime() + 10000000000L
    while (leaked.size > 2 && System.nanoTime() < deadline) {
      Thread.sleep(100)
      leaked = sc.getPersistentRDDs.keySet.toSet -- before
    }
    assert(leaked.size <= 2, s"leaked checkpoint RDDs: $leaked")
  }
}
