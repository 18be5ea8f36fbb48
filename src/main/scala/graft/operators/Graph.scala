package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import Barrier.BarrierOps

/**
 * Graph analytics beyond connected components ([[Dedup]]'s
 * large-star/small-star CC): weighted PageRank by power iteration —
 * steady-state importance over a directed weighted graph. The
 * behavioral use here: the event-type transition graph (q91's edges)
 * yields the long-run share of attention each state captures, which
 * raw counts misstate when states feed each other asymmetrically.
 * (Extension family; the reference engine has no graph surface.)
 *
 * Scale posture: each iteration is ONE join of the rank vector onto
 * the edge list (both hash-partitioned on src — co-partitioned after
 * the first iteration) plus a partial-aggregated contribution
 * shuffle on dst. Rank state is one row per node. Dangling mass
 * (nodes with no out-edges) and the teleport term are scalars — a
 * one-row cross join, never a collect. Per-round barriers reuse the
 * CC durability contract: reliable `checkpoint()` when the caller
 * set a checkpoint dir, `localCheckpoint()` otherwise, with the
 * superseded round's blocks freed eagerly (GraftBridge) so a long
 * power iteration holds exactly one round of state.
 *
 * The node count is the operator's only driver-side scalar (one
 * `count()` action) — it parameterizes the teleport literal.
 */
object Graph {

  /**
   * Weighted PageRank: `iters` rounds of
   * rank'(v) = (1−d)/N + d·(Σ_{u→v} rank(u)·w(u,v)/outW(u) + dang/N)
   * where dang is the total rank parked on nodes without out-edges.
   * Output: (node, rank) — ranks sum to 1 every round.
   *
   * Fixed iteration count (not a convergence test): PageRank changes
   * are dense and geometric (contraction factor d), so ~10 rounds
   * give ~d¹⁰ ≈ 0.2 relative residual shrink per additional round —
   * callers pick the precision/cost point; a fixed count also keeps
   * results engine-reproducible (a convergence test on floats is
   * not).
   */
  def pageRank(
      edges: DataFrame, srcCol: String, dstCol: String, weightCol: String,
      damping: Double = 0.85, iters: Int = 10): DataFrame = {
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0,1), got $damping")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.select(
      col(srcCol).as("src"), col(dstCol).as("node"),
      col(weightCol).cast("double").as("w"))
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("node")))
      .distinct()
    val outW = e.groupBy("src").agg(sum(col("w")).as("ow"))
    import Barrier.barrier
    val nodesP = barrier(nodes)
    val nN = nodesP.count().toDouble
    // Loop-invariant frames, materialized ONCE: the edge⋈out-weight
    // normalization join (w and ow kept as separate columns so the
    // per-round double-op sequence rank·w/ow is bit-identical to the
    // unhoisted form and the oracle's row-level arithmetic) and the
    // sink set (nodes with no out-edges). Before this hoist every
    // round re-ran the edge scan and the outW groupBy twice — ~2
    // redundant edge aggregations per iteration.
    val eNorm = barrier(e.join(outW, "src"))
    val sinks = barrier(nodesP
      .join(outW, col("node") === col("src"), "left_anti")
      .select(col("node").as("__sink")))
    var ranks = barrier(nodesP.withColumn("rank", lit(1.0 / nN)))
    for (_ <- 1 to iters) {
      val r = ranks.select(col("node").as("__src"), col("rank"))
      val contribs = r
        .join(eNorm, col("__src") === col("src"))
        .select(col("node"),
          (col("rank") * col("w") / col("ow")).as("__c"))
        .groupBy("node").agg(sum(col("__c")).as("__contrib"))
      val dangling = r
        .join(sinks, col("__src") === col("__sink"), "left_semi")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("__dang"))
      val next = barrier(nodesP
        .join(contribs, Seq("node"), "left")
        .crossJoin(dangling)
        .select(col("node"),
          (lit((1.0 - damping) / nN) + lit(damping) *
            (coalesce(col("__contrib"), lit(0.0)) + col("__dang") / nN))
            .as("rank")))
      Barrier.free(ranks)
      ranks = next
    }
    Barrier.free(eNorm)
    Barrier.free(sinks)
    ranks
  }

  /**
   * G2: exact triangle counting over an undirected graph — the
   * clustering-density number for the near-dup graph: near-duplicate
   * edges from verified pairs (q17/q48) form cliques when a document
   * was templated many times, and the triangle count (vs edge count)
   * separates clique-y template families from chains of incidental
   * pairwise overlap — the signal deciding whether cluster-level or
   * pair-level dedup is the right eviction policy. Output: one row
   * per node with its triangle count plus the node's degree; the
   * global triangle total is `sum(n_triangles) / 3`.
   *
   * Algorithm (the standard MapReduce formulation, cf. Suri &
   * Vassilvitskii, WWW'11 "Counting Triangles and the Curse of the
   * Last Reducer"): canonicalize to undirected distinct edges
   * (lo, hi); compute degrees; orient each edge from the
   * LOWER-(degree, id) endpoint to the higher — every triangle is
   * then counted exactly once at its lowest-ordered vertex, and the
   * join fan-out per node is its ORIENTED out-degree, which the
   * orientation caps at O(√m) for any degree distribution — the
   * skew-proofing that makes the wedge join survive power-law
   * graphs (a raw hub of degree d would otherwise fan out d²).
   *
   * Scale: one degree aggregation, one wedge self-join on the
   * oriented edges' shared low vertex, one edge-existence semi-join
   * back onto the oriented edge set, one count aggregation — all
   * hash-partitioned equi-joins, never nested-loop; total wedge
   * volume is Σ outDeg(v)² ≤ m^1.5 by the orientation bound.
   */
  def triangleCounts(
      edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // barrier the canonical edge set (three consumers: degrees, the
    // orientation join, the closing-edge join) and, below, the
    // oriented set (both wedge self-join branches) — guaranteed
    // single evaluation instead of hoping canonical exchange reuse
    // fires (the q127 pruning class), and the reliable-checkpoint
    // durability contract when a checkpoint dir is set
    val und = edges
      .select(
        least(col(srcCol), col(dstCol)).as("lo"),
        greatest(col(srcCol), col(dstCol)).as("hi"))
      .where(col("lo") =!= col("hi"))
      .distinct()
      .barriered
    val degrees = und.select(col("lo").as("node"))
      .unionAll(und.select(col("hi").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    // orient by (degree, id): from the lower-ordered endpoint out
    val withDeg = und
      .join(degrees.select(col("node").as("lo"), col("degree").as("__dl")),
        "lo")
      .join(degrees.select(col("node").as("hi"), col("degree").as("__dh")),
        "hi")
    // lo < hi holds by construction (least/greatest + self-loop
    // filter), so the (degree, id) orientation reduces to dl <= dh
    val oriented = withDeg.select(
      when(col("__dl") <= col("__dh"), col("lo"))
        .otherwise(col("hi")).as("u"),
      when(col("__dl") <= col("__dh"), col("hi"))
        .otherwise(col("lo")).as("v"))
      .barriered
    // wedges at the shared low vertex u: a.v < b.v both dedupes the
    // two orderings of each wedge AND canonicalizes (lo, hi) for the
    // closing-edge join — a.v IS the smaller endpoint by the join
    // condition, no extra comparison needed
    val wedges = oriented.as("a")
      .join(oriented.as("b"),
        col("a.u") === col("b.u") && col("a.v") < col("b.v"))
      .select(col("a.u").as("apex"),
        col("a.v").as("lo"), col("b.v").as("hi"))
    val closing = und.select(col("lo"), col("hi"))
    val triangles = wedges.join(closing, Seq("lo", "hi"))
      .select(col("apex"), col("lo"), col("hi"))
    val perNode = triangles
      .select(explode(array(col("apex"), col("lo"), col("hi"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    degrees
      .join(perNode, Seq("node"), "left")
      .na.fill(0L, Seq("n_triangles"))
      .select(col("node"), col("degree"), col("n_triangles"))
  }

  /**
   * G3: k-core decomposition (fixed peel rounds) — the densest-part
   * extractor for the near-dup graph: the k-core is the maximal
   * subgraph where every node keeps ≥ k neighbors, found by
   * repeatedly PEELING nodes of degree < k (removing a weak node can
   * demote its neighbors, hence iteration). On a near-dup graph the
   * 2-core separates template FAMILIES (dense mutual overlap) from
   * incidental pairwise chains, a sharper cut than raw degree.
   *
   * Determinism/oracle: the peel is a pure fixpoint iteration —
   * integer degrees, no tie-breaks, no floats — so `rounds` fixed
   * rounds replay exactly as an unrolled CTE chain (the q123/q195
   * fixed-iteration contract); once the peel converges, extra rounds
   * are value-neutral, so a `rounds` comfortably above the observed
   * convergence depth keeps the gate meaningful at any data that
   * converges within it (the gate corpora converge in ≤ 3).
   *
   * Scale: each round is one degree aggregation + two semi-joins,
   * all hash-partitioned on node/edge keys; rounds barrier via
   * localCheckpoint (superseded states freed) so round r never
   * re-executes rounds 1..r−1 — the PageRank loop discipline.
   *
   * Output: (node, degree) over the surviving k-core edges,
   * ascending by node; empty when the graph has no k-core.
   */
  def kCore(
      edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    def degrees(e: DataFrame): DataFrame = e
      .select(col("lo").as("node"))
      .unionAll(e.select(col("hi").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    var live = edges
      .select(
        least(col(srcCol), col(dstCol)).as("lo"),
        greatest(col(srcCol), col(dstCol)).as("hi"))
      .where(col("lo") =!= col("hi"))
      .distinct()
      .barriered
    var r = 0
    while (r < rounds) {
      val keep = degrees(live).where(col("degree") >= k).select("node")
      val next = live
        .join(keep.withColumnRenamed("node", "lo"), Seq("lo"), "left_semi")
        .join(keep.withColumnRenamed("node", "hi"), Seq("hi"), "left_semi")
        .barriered
      Barrier.free(live)
      live = next
      r += 1
    }
    degrees(live).orderBy("node")
  }

  /**
   * Synchronous weighted label propagation (Raghavan et al. 2007,
   * made deterministic): community detection by iterated plurality
   * vote — each round EVERY node simultaneously adopts the label
   * carrying the largest summed edge weight among its neighbors,
   * ties broken by smallest label. Communities emerge without a
   * cluster-count dial, in near-linear work per round — the standard
   * cheap alternative when modularity optimization is unaffordable.
   * Unlike [[graft.operators.Dedup.nearDupClusters]]' min-label CC
   * (which floods ANY connectivity), plurality voting respects edge
   * density: weakly-bridged dense regions keep distinct labels.
   *
   * Determinism contract: the classic algorithm is notoriously
   * run-dependent (random visit order, random tie-break). This
   * variant is fully reproducible: synchronous rounds, integer
   * weight sums (exact, partition-order-free), and the
   * (weight desc, label asc) argmax expressed as `min(struct(-w,
   * lbl))` — one partial-aggregated shape, no per-node window. A
   * FIXED round count, not a convergence test: sync LPA can 2-cycle
   * on bipartite-ish regions, so "run to convergence" is not
   * well-defined; fixed rounds are, and they replay in the oracle.
   *
   * Scale: edges symmetrize once up front (both directions,
   * self-loops dropped, parallel edges weight-summed) and
   * localCheckpoint; each round is ONE join of the label vector onto
   * the edge list (hash-partitioned on the neighbor key) + one
   * (node, label) partial-aggregated shuffle + one node-keyed
   * argmax aggregate. Label state is one row per node. Rounds
   * barrier via localCheckpoint with superseded state freed (the
   * PageRank/kCore loop discipline) so round r never re-executes
   * rounds 1..r−1.
   *
   * Output: (node, label) over every node with at least one
   * non-self edge, ascending by node.
   */
  def labelPropagation(
      edges: DataFrame, srcCol: String, dstCol: String, weightCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val directed = edges
      .select(col(srcCol).as("a"), col(dstCol).as("b"),
        col(weightCol).cast("long").as("w"))
      .where(col("a") =!= col("b"))
    val und = directed
      .unionAll(directed.select(col("b").as("a"), col("a").as("b"),
        col("w")))
      .groupBy("a", "b").agg(sum(col("w")).as("w"))
      .barriered
    var labels = und.select(col("a").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
      .barriered
    var r = 0
    while (r < rounds) {
      val next = und
        .join(labels.select(col("node").as("b"), col("lbl").as("nl")),
          Seq("b"))
        .groupBy(col("a"), col("nl"))
        .agg(sum(col("w")).as("s"))
        .groupBy(col("a"))
        .agg(min(struct((-col("s")).as("ns"), col("nl").as("l")))
          .as("__m"))
        .select(col("a").as("node"), col("__m.l").as("lbl"))
        .barriered
      Barrier.free(labels)
      labels = next
      r += 1
    }
    labels.orderBy("node")
  }

  /**
   * G12 (r12): Newman modularity audit of a community partition —
   * the "are these communities real?" number (Newman & Girvan 2004):
   * Q = Σ_c [ intra_c/2m − (deg_c/2m)² ], the intra-community edge
   * share minus what a degree-preserving random rewiring would put
   * there. Pairs with G4 ([[labelPropagation]]): LP always RETURNS a
   * partition; modularity says whether it found structure (Q near 0
   * = no better than random, one-community partitions score exactly
   * 0 by construction) and per-community contributions rank which
   * clusters carry the signal — the accept/reject gate before a
   * dedup pipeline trusts cluster-level decisions.
   *
   * Semantics: edges symmetrize and coalesce exactly as
   * [[labelPropagation]] (self-loops dropped, duplicate directions
   * summed), so the audited graph IS the graph LP labeled. Per
   * community over the symmetrized edge set: `intra_w` = total
   * weight with BOTH endpoints inside, `deg_w` = total weight with
   * the source inside (the weighted degree mass), `total_w` = 2m
   * (Σ_c deg_w = total_w — the conservation identity the spec pins).
   * Endpoints missing from `labels` drop (inner join — LP labels
   * every node of the graph it ran on, so a miss means the caller
   * passed a foreign partition); labeled nodes with no surviving
   * edges contribute no row.
   *
   * ENGINE-EXACT: weights are longs, every aggregate an exact
   * integer sum; the per-community numerator intra_c·2m − deg_c² is
   * exact DECIMAL(38,0) (can be negative — a community with less
   * internal mass than its degree share predicts), and `q_contrib`
   * is ONE final IEEE division of the two exact integers
   * (num / (2m·2m), each factor cast to double once), round(6) —
   * the house one-guarded-division finish.
   *
   * Scale: two hash-partitioned equi-joins of the edge set with the
   * node-label table, one partial-aggregated community rollup (the
   * per-community distinct-node count rides the same shuffle via
   * Expand), and the 2m scalar as a one-row broadcast cross join.
   * No windows, no driver state; community count never exceeds node
   * count.
   *
   * Output: (label, n_nodes, intra_w, deg_w, total_w, q_contrib),
   * one row per community with ≥1 edge endpoint, ascending label.
   */
  def modularity(
      edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, labels: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val directed = edges
      .select(col(srcCol).as("a"), col(dstCol).as("b"),
        col(weightCol).cast("long").as("w"))
      .where(col("a") =!= col("b"))
    val und = directed
      .unionAll(directed.select(col("b").as("a"), col("a").as("b"),
        col("w")))
      .groupBy("a", "b").agg(sum(col("w")).as("w"))
      .barriered
    val w2 = und.agg(sum(col("w")).as("total_w"))
    val lab = labels.select(col("node"), col("lbl"))
    val e2 = und
      .join(lab.select(col("node").as("a"), col("lbl").as("la")), Seq("a"))
      .join(lab.select(col("node").as("b"), col("lbl").as("lb")), Seq("b"))
    val dec = DecimalType(38, 0)
    e2
      .groupBy(col("la").as("label"))
      .agg(
        countDistinct(col("a")).as("n_nodes"),
        sum(when(col("la") === col("lb"), col("w")).otherwise(0L))
          .as("intra_w"),
        sum(col("w")).as("deg_w"))
      .crossJoin(broadcast(w2))
      .withColumn("__qnum",
        col("intra_w").cast(dec) * col("total_w").cast(dec) -
          col("deg_w").cast(dec) * col("deg_w").cast(dec))
      .withColumn("q_contrib",
        round(col("__qnum").cast("double") /
          (col("total_w").cast("double") * col("total_w").cast("double")),
          6))
      .select("label", "n_nodes", "intra_w", "deg_w", "total_w",
        "q_contrib")
      .orderBy("label")
  }

  /**
   * G15 (r13): global transitivity / clustering-coefficient audit —
   * the ONE-ROW "is this graph clique-y?" readout that decides the
   * dedup EVICTION POLICY: C = 3·triangles / wedges compares closed
   * to open triads, so a near-dup candidate graph with high C is
   * template families (cluster-level eviction is safe — G2's
   * scaladoc rationale, now as a number) while low C is chains of
   * incidental pairwise overlap where flooding a connected component
   * would over-merge (pair-level eviction only). The n_wedges /
   * n_triangles split also prices a G5 link-prediction pass before
   * running it (wedges ARE its candidate volume).
   *
   * Mechanics: ONE aggregate over [[triangleCounts]] (degree-ordered
   * orientation, wedge volume ≤ m^1.5 — the whole cost); per-node
   * wedge contributions d(d−1) div 2 are exact longs (d ≤ 3·10⁹
   * before d² threatens 2⁶³) summed in DECIMAL(38,0) — n_wedges
   * renders as a STRING (the q189 rule: it is Σd² -shaped and
   * outruns BIGINT long before the corpus is interesting);
   * Σ node-triangles is 3T exactly (each triangle counts at all
   * three corners), so n_triangles = Σ div 3 with zero rounding; the
   * coefficient is ONE guarded IEEE division of the two exact
   * totals, round(6), in [0,1] by construction (no signed-zero
   * exposure). Empty/wedge-free graphs emit NULL coefficient.
   *
   * Output (one row): (n_nodes, n_edges, n_wedges, n_triangles,
   * global_clustering).
   */
  def transitivity(
      edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val tc = triangleCounts(edges, srcCol, dstCol)
    val d = col("degree").cast("long")
    // integral `div` everywhere: Spark's `/` on integers is DOUBLE
    // division, which silently loses exactness past 2^53
    tc
      .withColumn("__dl", d)
      .agg(
        count(lit(1)).as("n_nodes"),
        sum(col("__dl")).as("__sd"),
        sum(expr("(__dl * (__dl - 1)) div 2").cast(dec))
          .cast(dec).as("__w"),
        sum(col("n_triangles").cast("long")).as("__t3"))
      .select(
        col("n_nodes"),
        expr("__sd div 2").as("n_edges"),
        col("__w").cast("string").as("n_wedges"),
        expr("__t3 div 3").as("n_triangles"),
        round(col("__t3").cast("double") /
          when(col("__w") > 0, col("__w").cast("double")), 6)
          .as("global_clustering"))
  }

  /**
   * G5: neighborhood link prediction — for every NON-adjacent node
   * pair sharing at least one neighbor, the three classic
   * missing-edge scores (Liben-Nowell & Kleinberg, CIKM'03):
   * common-neighbor count, Adamic–Adar (Σ 1/ln deg(via) — rare
   * shared neighbors count more), and neighborhood Jaccard
   * (|Γa∩Γb| / |Γa∪Γb|). On the near-dup candidate graph these are
   * the "pairs LSH probably MISSED" detector: two documents sharing
   * several near-dup neighbors but no direct candidate edge are the
   * prime re-verification targets (band hashing is probabilistic;
   * triadic closure over verified overlap is evidence a band
   * collision simply didn't fire).
   *
   * Scale: wedge enumeration at the shared neighbor is the whole
   * cost — Σ_via deg(via)², which a power-law hub makes quadratic.
   * `maxViaDegree` caps it (the q130/q212 blocked-join rule): a via
   * node above the cap contributes ≤ 1/ln(cap) per pair to AA —
   * near-noise — while costing deg² wedges, so dropping super-hub
   * vias is the standard LP trade (and is mirrored in the oracle,
   * keeping the gate exact). Everything else is hash-partitioned
   * equi-joins: one degree agg, one self-join on via, one pair agg,
   * one anti-join against the existing edge set, two degree joins.
   *
   * Float parity: per-via AA terms round(12) into DECIMAL(38,12)
   * before summing (the q155 RRF discipline) — the sum is exact and
   * partition-order independent; the jaccard division is one final
   * IEEE op. Both scores finish round(6) (non-negative — no
   * signed-zero exposure).
   *
   * Output: (node_a, node_b, common_nbrs, adamic_adar, nbr_jaccard),
   * node_a < node_b, ascending.
   */
  def linkPredict(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxViaDegree: Int): DataFrame = {
    require(maxViaDegree >= 2,
      s"maxViaDegree must be >= 2 (a via needs two neighbors), " +
        s"got $maxViaDegree")
    // The edge-derivation subtree feeds four consumers (both nbrs
    // union branches, the anti-join) and the via frame feeds both
    // self-join branches — asymmetric column pruning defeats
    // canonical exchange reuse (the q127/q212 class), so barrier the
    // small shared frames once.
    val und = edges
      .select(
        least(col(srcCol), col(dstCol)).as("lo"),
        greatest(col(srcCol), col(dstCol)).as("hi"))
      .where(col("lo") =!= col("hi"))
      .distinct()
      .barriered
    val nbrs = und.select(col("lo").as("node"), col("hi").as("nbr"))
      .unionAll(und.select(col("hi").as("node"), col("lo").as("nbr")))
    val deg = nbrs.groupBy("node").agg(count(lit(1)).as("degree"))
      .barriered
    // via-keyed adjacency, super-hub vias dropped BEFORE the
    // self-join so wedge volume is ≤ cap · |kept adjacency|
    val via = nbrs
      .select(col("nbr").as("via"), col("node"))
      .join(deg.select(col("node").as("via"), col("degree").as("__vd")),
        Seq("via"))
      .where(col("__vd") <= maxViaDegree)
      .barriered
    val pairs = via.as("a")
      .join(via.as("b"),
        col("a.via") === col("b.via") && col("a.node") < col("b.node"))
      .select(col("a.node").as("node_a"), col("b.node").as("node_b"),
        round(lit(1.0) / log(col("a.__vd").cast("double")), 12)
          .cast(org.apache.spark.sql.types.DecimalType(38, 12)).as("__aa"))
      .groupBy("node_a", "node_b")
      .agg(count(lit(1)).as("common_nbrs"), sum(col("__aa")).as("__aas"))
    pairs
      .join(und,
        col("node_a") === col("lo") && col("node_b") === col("hi"),
        "left_anti")
      .join(deg.select(col("node").as("node_a"), col("degree").as("__da")),
        Seq("node_a"))
      .join(deg.select(col("node").as("node_b"), col("degree").as("__db")),
        Seq("node_b"))
      .select(
        col("node_a"), col("node_b"), col("common_nbrs"),
        round(col("__aas").cast("double"), 6).as("adamic_adar"),
        round(col("common_nbrs").cast("double") /
          (col("__da") + col("__db") - col("common_nbrs")).cast("double"),
          6).as("nbr_jaccard"))
      .orderBy("node_a", "node_b")
  }

  /**
   * G7: weighted bipartite projection — the standard way a graph is
   * BORN from tabular data: a two-mode relation (customer–part,
   * user–item, doc–entity) projects onto one side, connecting two
   * right-nodes when they share ≥ `minSupport` left-nodes, weighted
   * by that shared count. The co-purchase / co-engagement /
   * co-mention graph every downstream graph operator here (PageRank,
   * communities, link prediction) consumes.
   *
   * Scale: the self-join fans out per left-node as basket², so total
   * volume is Σ|basket|² — linear in left-node count when basket
   * sizes are distribution-bounded (the realistic case), and the
   * support threshold prunes AFTER one partial-aggregated pair
   * shuffle. A pathological hub basket (one customer touching 10⁶
   * parts) would square — `maxBasket` caps it by dropping left-nodes
   * above the cap (standard practice: a bot-scale basket carries no
   * co-preference signal; mirror the cap in any oracle).
   *
   * Output: (node_a, node_b, support), node_a < node_b.
   */
  def bipartiteProject(
      rel: DataFrame, leftCol: String, rightCol: String,
      minSupport: Long, maxBasket: Long = Long.MaxValue): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    require(maxBasket >= 2, s"maxBasket must be >= 2, got $maxBasket")
    // barrier the deduped relation: it feeds both wedge self-join
    // branches (plus the basket-count aggregate when capped) —
    // guaranteed single evaluation + the shared durability contract
    val cp = rel
      .select(col(leftCol).as("__l"), col(rightCol).as("__r"))
      .distinct()
      .barriered
    val kept =
      if (maxBasket == Long.MaxValue) cp
      else {
        val k = cp.join(
          cp.groupBy("__l").agg(count(lit(1)).as("__bs"))
            .where(col("__bs") <= maxBasket)
            .select("__l"),
          Seq("__l"), "left_semi")
          .barriered
        Barrier.free(cp)
        k
      }
    kept.as("a")
      .join(kept.as("b"),
        col("a.__l") === col("b.__l") && col("a.__r") < col("b.__r"))
      .groupBy(col("a.__r").as("node_a"), col("b.__r").as("node_b"))
      .agg(count(lit(1)).as("support"))
      .where(col("support") >= minSupport)
  }

  /**
   * G8: degree-assortativity summary (Newman 2002) — ONE row
   * characterizing a graph before running anything iterative on it:
   * node/edge counts, max/avg degree, and the assortativity
   * coefficient r = Pearson correlation of endpoint degrees over all
   * directed edge orientations. r > 0 (hubs attach to hubs) says
   * degree-capped operators (linkPredict's via cap, blocked joins)
   * will bite hardest at the core; r < 0 (hub-and-spoke) says skew
   * mitigation should target the few hubs. The 30-second triage
   * before committing cluster hours to PageRank/LPA/k-core dials.
   *
   * Float parity: all five moment sums accumulate exact
   * DECIMAL(38,0) over integer degrees (per-row products need
   * deg² < 2⁶³ — any real graph); the Pearson finish is one fixed
   * IEEE chain, round(6), r SIGNED (oracle carries `+ 0.0`).
   * Regular graphs (zero degree variance) emit NULL r.
   *
   * Scale: one degree aggregation, two degree equi-joins onto the
   * directed edge list, one global one-row aggregate per frame —
   * one-row cross joins only (house contract), nothing driver-sized.
   */
  def degreeAssortativity(
      edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val und = edges
      .select(
        least(col(srcCol), col(dstCol)).as("lo"),
        greatest(col(srcCol), col(dstCol)).as("hi"))
      .where(col("lo") =!= col("hi"))
      .distinct()
      .barriered
    val nbrs = und.select(col("lo").as("node"), col("hi").as("nbr"))
      .unionAll(und.select(col("hi").as("node"), col("lo").as("nbr")))
    val deg = nbrs.groupBy("node").agg(count(lit(1)).as("degree"))
      .barriered
    val joined = nbrs
      .join(deg.select(col("node"), col("degree").as("__dx")), Seq("node"))
      .join(deg.select(col("node").as("nbr"), col("degree").as("__dy")),
        Seq("nbr"))
    val es = joined.agg(
      count(lit(1)).as("__mm"),
      sum(col("__dx").cast(dec)).as("__sx"),
      sum(col("__dy").cast(dec)).as("__sy"),
      sum((col("__dx") * col("__dy")).cast(dec)).as("__sxy"),
      sum((col("__dx") * col("__dx")).cast(dec)).as("__sxx"),
      sum((col("__dy") * col("__dy")).cast(dec)).as("__syy"))
    val ns = deg.agg(
      count(lit(1)).as("n_nodes"), max(col("degree")).as("max_degree"))
    val em = und.agg(count(lit(1)).as("n_edges"))
    val md = col("__mm").cast("double")
    val mx = col("__sx").cast("double") / md
    val my = col("__sy").cast("double") / md
    val num = col("__sxy").cast("double") / md - mx * my
    val denx = col("__sxx").cast("double") / md - mx * mx
    val deny = col("__syy").cast("double") / md - my * my
    ns.crossJoin(em).crossJoin(es).select(
      col("n_nodes"), col("n_edges"), col("max_degree"),
      round((lit(2L) * col("n_edges")).cast("double") /
        col("n_nodes").cast("double"), 6).as("avg_degree"),
      when(col("__mm") > 0 && denx * deny > 0,
        round(num / sqrt(denx * deny), 6)).as("assortativity"))
  }

  /**
   * G6: multi-source BFS hop distance, bounded rounds — the
   * contamination BLAST RADIUS: seed nodes (e.g. documents the
   * T17/T49 decontaminators flagged as benchmark-leaked) expand
   * through the near-dup graph, and every node within `rounds` hops
   * gets its MINIMUM hop count. Hop-1 nodes are near-dups of leaked
   * docs; hop-2 nodes are near-dups of those — the transitive
   * quarantine set a release gate actually wants, with the hop
   * number grading eviction confidence.
   *
   * Frontier algorithm: reached_0 = seeds (hop 0, whether or not
   * the node appears in the graph — an isolated leaked doc is still
   * leaked); each round expands ONLY the newest frontier through the
   * adjacency (one hash-partitioned join), dedups, and anti-joins
   * the reached set — a node is labeled the first time it is seen,
   * which IS its minimum hop. Integer labels, no tie-breaks → exact
   * oracle replay as an unrolled CTE chain (the kCore contract).
   *
   * Scale: per round, join volume = frontier adjacency only (not the
   * whole reached set); state is one row per reached node. Rounds
   * barrier via localCheckpoint with superseded frontier freed (the
   * PageRank/kCore loop discipline). Total work ≈ one pass over each
   * edge per direction per time its endpoint enters a frontier —
   * O(m) across all rounds on simple graphs.
   *
   * Output: (node, hop), hop ∈ [0, rounds], ascending by node.
   */
  def bfsHops(
      edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // barrier the edge derivation once: it feeds BOTH union branches
    // (an expensive upstream — e.g. minhash candidates — would run
    // twice), then free it as soon as the adjacency is materialized
    val und = edges
      .select(
        least(col(srcCol), col(dstCol)).as("lo"),
        greatest(col(srcCol), col(dstCol)).as("hi"))
      .where(col("lo") =!= col("hi"))
      .distinct()
      .barriered
    val nbrs = und.select(col("lo").as("node"), col("hi").as("nbr"))
      .unionAll(und.select(col("hi").as("node"), col("lo").as("nbr")))
      .barriered
    Barrier.free(und)
    var frontier = seeds.select(col(seedCol).as("node")).distinct()
      .barriered
    var reached = frontier.select(col("node"), lit(0).as("hop"))
      .barriered
    var r = 1
    while (r <= rounds) {
      val next = frontier
        .join(nbrs, Seq("node"))
        .select(col("nbr").as("node"))
        .distinct()
        .join(reached.select("node"), Seq("node"), "left_anti")
        .barriered
      val grown = reached
        .unionAll(next.select(col("node"), lit(r).as("hop")))
        .barriered
      Barrier.free(frontier)
      Barrier.free(reached)
      frontier = next
      reached = grown
      r += 1
    }
    Barrier.free(nbrs)
    reached.orderBy("node")
  }

  /**
   * G16 (r14): bounded-round WEIGHTED shortest-path distances
   * (Bellman–Ford) — the weighted companion to [[bfsHops]]: on a
   * similarity-weighted near-dup graph, hop count is NOT closeness
   * (two hops through 0.95-similar twins is nearer than one hop
   * through a 0.55-similar borderline match), so the contamination
   * radius a release gate quarantines by should be the cheapest-PATH
   * distance, not the fewest-edge one. Emits BOTH relaxations from
   * the same frontier joins — `dist` (min edge-weight sum) and
   * `hops` (min edge count) — so the divergence is measurable per
   * node; the planted GraphSpec fixture pins a node whose weighted
   * shortest path takes three hops past a heavy direct edge.
   *
   * Edges symmetrize (undirected near-dup semantics); parallel
   * edges keep the MINIMUM weight; self-loops drop. Weights are
   * exact LONGS (require non-negative — Bellman–Ford with bounded
   * rounds is a shortest-WALK bound otherwise), so every relaxation
   * is integer arithmetic with zero float hazard and the oracle
   * replays as an unrolled min-merge CTE chain.
   *
   * Frontier discipline: only rows whose (dist, hops) IMPROVED last
   * round re-expand (the delta-relaxation pruning — an unchanged
   * node re-proposes candidates the min-merge already absorbed), so
   * per-round join volume is the changed set's adjacency, not the
   * whole reached set; rounds barrier via localCheckpoint with
   * superseded state freed (the [[bfsHops]] loop discipline). After
   * `rounds` rounds, dist is exact for every node whose true
   * shortest path uses ≤ rounds edges — state the regime at the
   * call site, as with every bounded-round operator here.
   *
   * Output: (node, dist, hops) for every seed or graph node;
   * unreached nodes carry NULLs. Ascending by node.
   */
  def weightedDistances(
      edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, seeds: DataFrame, seedCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val directed = edges
      .select(col(srcCol).as("a"), col(dstCol).as("b"),
        col(weightCol).cast("long").as("w"))
      .where(col("a") =!= col("b"))
    val und = directed
      .unionAll(directed.select(col("b").as("a"), col("a").as("b"),
        col("w")))
      .groupBy("a", "b").agg(min(col("w")).as("w"))
      .barriered
    // Fail fast on a negative weight: one bounded aggregate.
    val minW = und.agg(coalesce(min(col("w")), lit(0L)))
      .collect()(0).getLong(0)
    require(minW >= 0L,
      s"weights must be non-negative, found $minW")
    var state = seeds.select(col(seedCol).as("node")).distinct()
      .select(col("node"), lit(0L).as("dist"), lit(0L).as("hops"))
      .barriered
    var frontier = state
    var freeFrontier = false // round-0 frontier IS state: free once
    var r = 1
    while (r <= rounds) {
      val cand = frontier
        .join(und, frontier("node") === und("a"))
        .select(col("b").as("node"),
          (col("dist") + col("w")).as("dist"),
          (col("hops") + lit(1L)).as("hops"))
      val merged = state.unionByName(cand)
        .groupBy("node")
        .agg(min(col("dist")).as("dist"), min(col("hops")).as("hops"))
        .barriered
      val changed = merged
        .join(state, Seq("node", "dist", "hops"), "left_anti")
        .barriered
      if (freeFrontier) Barrier.free(frontier)
      Barrier.free(state)
      state = merged
      frontier = changed
      freeFrontier = true
      r += 1
    }
    if (freeFrontier) Barrier.free(frontier)
    // und and state back the returned plan — the caller owns their
    // lifetime (the bfsHops convention; Barrier.free is root-only
    // and the result still reads both).
    val nodes = und.select(col("a").as("node"))
      .unionAll(seeds.select(col(seedCol).as("node")))
      .distinct()
    nodes.join(state, Seq("node"), "left").orderBy("node")
  }

  /**
   * G9: HITS hubs and authorities (Kleinberg 1999, JACM "Authoritative
   * sources in a hyperlinked environment") over a DIRECTED graph —
   * the two-sided importance readout PageRank's single score folds
   * away: an authority is pointed at by good hubs, a hub points at
   * good authorities. On the customer→part purchase bipartition this
   * is the classic market readout (discerning buyers vs staple
   * products); on a doc→cited-doc graph it separates surveys (hubs)
   * from primary sources (authorities).
   *
   * Mutual recursion, `iters` rounds of
   *   auth'(v) = Σ_{u→v} hub(u),   then L1-normalize;
   *   hub'(u)  = Σ_{u→v} auth'(v), then L1-normalize.
   * L1 normalization (not Kleinberg's L2) keeps every step rational:
   * the limit directions are the same dominant eigenvectors of AᵀA /
   * AAᵀ, only the scale convention differs — and L1 admits the exact
   * integer replay below where an L2 norm would put a sqrt inside
   * the recursion.
   *
   * ENGINE-EXACT (oracle-replayable, the q123/q200 discipline):
   * scores live as NANO-unit longs (floor(x·10⁹)). Per half-round the
   * raw score is an exact integer sum of the counterpart's nano
   * scores, the total is an exact integer sum of those, and the
   * normalized score is floor((raw/total)·10⁹) — one IEEE division +
   * one multiply + floor, bit-identical on every engine; no rounding
   * rule, no float accumulation anywhere. Mass bound (ANSI throws,
   * never corrupts): Σ raw ≤ |E|·10⁹ < 2⁶³ ⇒ safe below ~9.2e9 edges;
   * shard the graph before that. Quantization floor: a node whose
   * true share is below 1e-9 of the total reads 0 — at that share it
   * is noise under any convention.
   *
   * Scale: two equi-joins + two partial-agg shuffles per round over
   * the edge list, state one row per node; rounds barrier via
   * localCheckpoint with superseded state freed (the PageRank loop
   * discipline). Totals ride one-row broadcast cross joins.
   *
   * Output: (node, hub, auth) for every node, scores as DOUBLE
   * nano-grid values in [0,1], each column summing to ≤ 1.
   */
  def hits(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 5): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val NANO = 1000000000.0d
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .barriered
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct()
      .barriered
    // floor((raw/total)·10⁹) as a long; total == 0 (possible only on
    // an empty edge set) degrades to all-zero scores, never NaN.
    def norm(raw: Column, total: Column): Column =
      when(total <= 0L, lit(0L)).otherwise(
        floor(raw.cast("double") / total.cast("double") * lit(NANO)))
    var hub = nodes.withColumn("hq", lit(NANO.toLong)).barriered
    var auth: DataFrame = null
    for (_ <- 1 to iters) {
      // each half-round's raw aggregate feeds TWO consumers (the
      // one-row total and the normalization join) — barrier it so the
      // edge join + partial-agg shuffle executes once, not twice (the
      // q127 reuse rule), and free it as soon as the normalized state
      // has materialized
      val aRaw = e.join(hub.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("hq")).as("__raw"))
        .barriered
      val aTot = aRaw.agg(
        coalesce(sum(col("__raw")), lit(0L)).as("__tot"))
      val nextAuth = nodes
        .join(aRaw, Seq("node"), "left")
        .crossJoin(aTot)
        .select(col("node"),
          norm(coalesce(col("__raw"), lit(0L)), col("__tot")).as("aq"))
        .barriered
      Barrier.free(aRaw)
      val hRaw = e.join(nextAuth.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src").as("node"))
        .agg(sum(col("aq")).as("__raw"))
        .barriered
      val hTot = hRaw.agg(
        coalesce(sum(col("__raw")), lit(0L)).as("__tot"))
      val nextHub = nodes
        .join(hRaw, Seq("node"), "left")
        .crossJoin(hTot)
        .select(col("node"),
          norm(coalesce(col("__raw"), lit(0L)), col("__tot")).as("hq"))
        .barriered
      Barrier.free(hRaw)
      if (auth != null)
        Barrier.free(auth)
      Barrier.free(hub)
      auth = nextAuth
      hub = nextHub
    }
    val out = hub.join(auth, "node")
      .select(col("node"),
        (col("hq").cast("double") / lit(NANO)).as("hub"),
        (col("aq").cast("double") / lit(NANO)).as("auth"))
      .barriered
    Barrier.free(hub)
    Barrier.free(auth)
    Barrier.free(e)
    Barrier.free(nodes)
    out
  }

  /**
   * G11: hierarchy flattening — parent-child rows to (node, root,
   * depth, materialized path), the classic dimension-hierarchy
   * operator (org charts, category trees, thread ancestry, folder
   * structures) every warehouse needs and recursive-CTE-less Spark
   * lacks natively. Contract: one row per node with its parent,
   * parent NULL marking a root; every node's row is emitted with the
   * root it descends from, its depth (root = 0), and the
   * '/'-delimited id path from the root.
   *
   * Fixed `maxDepth` rounds (the kCore/BFS replay contract — rounds
   * past exhaustion join empty frontiers and are value-neutral, so
   * the DuckDB oracle unrolls the same chain): each round is ONE
   * hash equi-join of the edge table onto the previous frontier,
   * barriered via the shared [[Barrier]] contract. Nodes deeper than
   * maxDepth — including every member of a parent CYCLE, which never
   * reaches a root — are absent from the output by construction
   * (pick maxDepth above the legal hierarchy depth and a row-count
   * delta against the input IS the cycle/overdepth audit). Paths are
   * bounded by depth × id width; state is one row per emitted node.
   */
  def flattenHierarchy(
      edges: DataFrame, childCol: String, parentCol: String,
      maxDepth: Int): DataFrame = {
    require(maxDepth >= 1, s"maxDepth must be >= 1, got $maxDepth")
    val e = edges.select(
      col(childCol).as("__c"), col(parentCol).as("__p"))
      .barriered
    var level = e.where(col("__p").isNull)
      .select(col("__c").as("node"), col("__c").as("root"),
        lit(0).as("depth"), col("__c").cast("string").as("path"))
      .barriered
    var out = level
    var d = 1
    while (d <= maxDepth) {
      val next = e
        .join(level.select(col("node").as("__p"), col("root"),
          col("path")), "__p")
        .select(col("__c").as("node"), col("root"),
          lit(d).as("depth"),
          concat(col("path"), lit("/"), col("__c").cast("string"))
            .as("path"))
        .barriered
      out = out.unionAll(next)
      level = next
      d += 1
    }
    out
  }

  /**
   * G10: personalized PageRank / random walk with restart (Haveliwala
   * 2002; the Pinterest-Pixie serving shape) — [[pageRank]]'s global
   * teleport replaced by a restart to a SEED set, so scores mean
   * "proximity to these seeds under the link structure", not global
   * importance: the "related items for THIS cluster" queue, the
   * expand-a-labeled-seed-set primitive, the neighborhood scorer on
   * co-engagement bipartitions.
   *
   * rank'(v) = (1−d)·e(v) + d·(Σ_{u→v} rank(u)·w(u,v)/outW(u) +
   * dang·e(v)), e uniform over the seeds — dangling mass restarts at
   * the seeds, as teleport does.
   *
   * ENGINE-EXACT (a DELIBERATE upgrade over q123's raw-double
   * pageRank replay, whose per-node contribution sums depend on fold
   * order and stay green only on small graphs): state is NANO-unit
   * longs. Per round each edge contributes
   * floor(rank_u · (w/outW_u)) — one IEEE multiply on identical
   * doubles, floored to a long — so per-node sums are EXACT integer
   * aggregates; the teleport and dangling terms floor separately and
   * add as longs. Each floor leaks < 1e-9 mass (scores are lower
   * bounds at that granularity, ranking-stable); bound: |E|·10⁹ < 2⁶³.
   *
   * Scale: identical loop shape to [[pageRank]] — loop-invariant
   * normalized edges + sink set materialized once, one contribution
   * join + one partial-agg shuffle per round, one-row dangling
   * aggregate, checkpoint-barriered rounds with superseded state
   * freed. Seeds broadcast (a seed list is small by definition).
   *
   * Output: (node, score) for every node, score the nano-grid
   * DOUBLE; seeds absent from the graph still receive their teleport
   * share (they are real pages with no observed links yet).
   */
  def personalizedPageRank(
      edges: DataFrame, srcCol: String, dstCol: String, weightCol: String,
      seeds: DataFrame, seedCol: String,
      damping: Double = 0.85, iters: Int = 6): DataFrame = {
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0,1), got $damping")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val NANO = 1000000000.0d
    // barrier the edge derivation once: it feeds outW, the node set,
    // and the normalization join (an expensive upstream — e.g. a
    // bipartite-projection or candidate-graph build — would run
    // three times during setup otherwise); freed after eNorm lands
    val e = edges.select(
      col(srcCol).as("src"), col(dstCol).as("node"),
      col(weightCol).cast("long").as("w"))
      .where(col("src").isNotNull && col("node").isNotNull && col("w") > 0L)
      .barriered
    val sd = seeds.select(col(seedCol).as("node")).distinct()
      .barriered
    val nS = sd.count()
    require(nS >= 1L, "seeds must be non-empty")
    // teleq: each seed's teleport allocation in nano-units (exact
    // integer division — identical on both engines for non-negative
    // operands)
    val teleqSeed = NANO.toLong / nS
    val outW = e.groupBy("src").agg(sum(col("w")).as("ow"))
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("node")))
      .unionAll(sd.select(col("node")))
      .distinct()
      .barriered
    val eNorm = e.join(outW, "src").barriered
    val sinks = nodes
      .join(outW, col("node") === col("src"), "left_anti")
      .select(col("node").as("__sink"))
      .barriered
    val teleported = nodes
      .join(sd.select(col("node"), lit(true).as("__isSeed")),
        Seq("node"), "left")
      .select(col("node"),
        when(col("__isSeed"), lit(teleqSeed)).otherwise(lit(0L))
          .as("teleq"))
      .barriered
    var ranks = teleported.select(col("node"), col("teleq").as("rq"))
      .barriered
    Barrier.free(e)
    for (_ <- 1 to iters) {
      val r = ranks.select(col("node").as("__src"), col("rq"))
      val contribs = r
        .join(eNorm, col("__src") === col("src"))
        .select(col("node"),
          floor(col("rq").cast("double")
            * (col("w").cast("double") / col("ow").cast("double")))
            .as("__c"))
        .groupBy("node").agg(sum(col("__c")).as("__contrib"))
      val dangling = r
        .join(sinks, col("__src") === col("__sink"), "left_semi")
        .agg(coalesce(sum(col("rq")), lit(0L)).as("__dang"))
      val next = teleported
        .join(contribs, Seq("node"), "left")
        .crossJoin(dangling)
        .select(col("node"),
          (floor(lit(1.0 - damping) * col("teleq").cast("double"))
            + floor(lit(damping)
              * coalesce(col("__contrib"), lit(0L)).cast("double"))
            + floor(lit(damping) * (col("__dang").cast("double")
              * (col("teleq").cast("double") / lit(NANO)))))
            .as("rq"))
        .barriered
      Barrier.free(ranks)
      ranks = next
    }
    val out = ranks
      .select(col("node"), (col("rq").cast("double") / lit(NANO))
        .as("score"))
      .barriered
    Barrier.free(ranks)
    Barrier.free(eNorm)
    Barrier.free(sinks)
    Barrier.free(teleported)
    Barrier.free(nodes)
    Barrier.free(sd)
    out
  }

  /**
   * G13 (r13): bounded-round deterministic Louvain — modularity
   * OPTIMIZATION, completing G12's modularity *audit*: G4's label
   * propagation returns a partition with no quality target; Louvain
   * (Blondel et al. 2008) moves each node to the neighboring
   * community with the best modularity GAIN. This is the one-level
   * move phase made deterministic and Spark-shaped:
   *
   *  - Per round every node scores each candidate community C
   *    (neighbor labels + its own) with the EXACT integer gain rank
   *    S(C) = 2m·w(v,C) − k_v·Σtot(C∖v) in DECIMAL(38,0) — the
   *    standard ΔQ with constant terms dropped, scaled by 2m² so no
   *    division exists; argmax by min(struct(−S, label)) (ties →
   *    smaller label), and a node moves only on a STRICT improvement
   *    over staying (tie moves would oscillate).
   *  - Synchronous parallel moves can still thrash (two nodes
   *    swapping), so rounds alternate an md5-PARITY schedule — only
   *    nodes with md5-uniform parity r mod 2 may move in round r
   *    (deterministic, engine-replayable, the mix31/md5 house
   *    convention) — and every round is ACCEPT-TESTED: the exact
   *    integer modularity numerator Qnum = Σintra·2m − Σdeg_c²
   *    (G12's arithmetic) must STRICTLY increase or the round's
   *    labels are discarded and the loop stops. Monotone Q per
   *    emitted round holds BY CONSTRUCTION (spec-pinned), not by
   *    hope — the honest guarantee a synchronous parallel Louvain
   *    can actually make.
   *
   * Edges symmetrize/coalesce exactly as [[labelPropagation]] /
   * [[modularity]], so the optimized graph IS the audited graph.
   * Each round: one Σtot label-degree aggregate, one neighbor-label
   * edge join + (node, label) partial agg, three key joins for the
   * scoring frame, one node argmax, and G12's two label joins for
   * the accept test — all hash-partitioned equi-joins, label state
   * one row per node, rounds Barrier-routed with superseded state
   * freed (the PageRank loop discipline). Driver sees ONE bounded
   * row per round (Qnum, moves, communities) — the k-means control-
   * loop contract; the data never crosses.
   *
   * Output: the round TRACE — (round, n_moves, n_communities,
   * q_num, q): round 0 is the singleton baseline (Qnum = −Σk_v²,
   * negative), then one row per ACCEPTED round; q_num is the exact
   * integer numerator as a STRING (q189 rule — it reaches (2m)²),
   * q = round(q_num/(2m)², 6) — one IEEE division, SIGNED (oracle
   * carries + 0.0). Empty graph → empty trace.
   */
  def louvain(
      edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, maxRounds: Int): DataFrame = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val spark = edges.sparkSession
    import spark.implicits._
    val directed = edges
      .select(col(srcCol).as("a"), col(dstCol).as("b"),
        col(weightCol).cast("long").as("w"))
      .where(col("a") =!= col("b"))
    val und = directed
      .unionAll(directed.select(col("b").as("a"), col("a").as("b"),
        col("w")))
      .groupBy("a", "b").agg(sum(col("w")).as("w"))
      .barriered
    val totalW = und.agg(coalesce(sum(col("w")), lit(0L)))
      .collect()(0).getLong(0) // 2m — the one graph-wide scalar
    if (totalW == 0L) {
      Barrier.free(und)
      return Seq.empty[(Int, Long, Long, String, Double)]
        .toDF("round", "n_moves", "n_communities", "q_num", "q")
    }
    val (labels, trace) = moveLoop(und, totalW, maxRounds)
    Barrier.free(labels)
    Barrier.free(und)
    trace
      .toDF("round", "n_moves", "n_communities", "q_num", "q")
  }

  /**
   * G14 (r13): TWO-LEVEL Louvain — the coarsening phase that makes
   * [[louvain]] the real Blondel et al. algorithm: after the level-1
   * move phase converges, communities COLLAPSE into super-nodes
   * (inter-community mass aggregates into coarse edges, each
   * community's internal mass into a SELF-LOOP on its super-node —
   * the bookkeeping that keeps modularity IDENTICAL across the
   * collapse) and the SAME move phase runs on the coarse graph,
   * merging whole communities at a cost proportional to the coarse
   * graph, not the corpus. Level-1 moves cannot merge two dense
   * communities joined by a weak bridge (no single node improves by
   * crossing); the super-node move can, which is exactly why Louvain
   * is multi-level.
   *
   * The one arithmetic delta vs level 1: the gain rank and accept
   * test run on a self-loop-BEARING table — weighted degrees and
   * Σtot include self-loop mass (it is internal mass the community
   * carries along), candidate w(v,C) aggregates exclude the self row
   * (a node cannot "join itself"), and the G12 accept arithmetic is
   * unchanged (self rows have la = lb by construction). 2m is the
   * SAME scalar at both levels — coarsening conserves total mass —
   * so Q values are directly comparable across levels, and level-2
   * round 0 (the coarse singleton partition = level-1's final
   * partition) must read EXACTLY level-1's final Q. That
   * conservation row is emitted, spec-pinned, and oracle-checked.
   *
   * Monotonicity: each level's accepted rounds strictly increase the
   * exact Q numerator (the [[louvain]] contract), and the cross-level
   * boundary is Q-neutral — so the WHOLE emitted trace is
   * non-decreasing in Q by construction.
   *
   * Output: (level, round, n_moves, n_communities, q_num, q) —
   * level 1 rounds 0..R₁, level 2 rounds 0..R₂, ordered. Empty
   * graph → empty trace.
   */
  def louvainTwoLevel(
      edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, maxRoundsPerLevel: Int): DataFrame = {
    require(maxRoundsPerLevel >= 1,
      s"maxRoundsPerLevel must be >= 1, got $maxRoundsPerLevel")
    val spark = edges.sparkSession
    import spark.implicits._
    val directed = edges
      .select(col(srcCol).as("a"), col(dstCol).as("b"),
        col(weightCol).cast("long").as("w"))
      .where(col("a") =!= col("b"))
    val und = directed
      .unionAll(directed.select(col("b").as("a"), col("a").as("b"),
        col("w")))
      .groupBy("a", "b").agg(sum(col("w")).as("w"))
      .barriered
    val totalW = und.agg(coalesce(sum(col("w")), lit(0L)))
      .collect()(0).getLong(0)
    if (totalW == 0L) {
      Barrier.free(und)
      return Seq.empty[(Int, Int, Long, Long, String, Double)]
        .toDF("level", "round", "n_moves", "n_communities", "q_num",
          "q")
    }
    val (labels1, trace1) = moveLoop(und, totalW, maxRoundsPerLevel)
    val l1 = labels1.select("node", "lbl")
    // Coarsen: communities -> super-nodes; inter-community mass ->
    // coarse edges; internal mass -> SELF-LOOPS (kept — the la = lb
    // rows). Total row mass is conserved: 2m is the same scalar.
    val coarse = und
      .join(l1.select(col("node").as("a"), col("lbl").as("la")),
        Seq("a"))
      .join(l1.select(col("node").as("b"), col("lbl").as("lb")),
        Seq("b"))
      .groupBy(col("la").as("a"), col("lb").as("b"))
      .agg(sum(col("w")).as("w"))
      .barriered
    val (labels2, trace2) = moveLoop(coarse, totalW, maxRoundsPerLevel)
    Barrier.free(labels1)
    Barrier.free(labels2)
    Barrier.free(coarse)
    Barrier.free(und)
    (trace1.map(t => (1, t._1, t._2, t._3, t._4, t._5)) ++
      trace2.map(t => (2, t._1, t._2, t._3, t._4, t._5)))
      .toDF("level", "round", "n_moves", "n_communities", "q_num",
        "q")
  }

  /** The Louvain move phase over a symmetrized (a, b, w) table that
    * MAY carry self-loop rows (the coarse level): weighted degrees
    * and Σtot include self mass, candidate aggregates exclude the
    * self row, accept tests run G12's arithmetic (self rows are
    * la = lb internal mass). Returns the final ACCEPTED label table
    * (caller frees) and the trace rows (round 0 baseline + one per
    * accepted round). */
  private def moveLoop(
      und: DataFrame, totalW: Long, maxRounds: Int)
      : (DataFrame, Seq[(Int, Long, Long, String, Double)]) = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val deg = und.groupBy(col("a").as("node"))
      .agg(sum(col("w")).as("k")).barriered
    val nonSelf = und.where(col("a") =!= col("b"))

    def roundQ(qnum: BigDecimal): Double =
      java.math.BigDecimal
        .valueOf(qnum.toDouble /
          (totalW.toDouble * totalW.toDouble))
        .setScale(6, java.math.RoundingMode.HALF_UP)
        .doubleValue

    // Exact integer modularity numerator + community count — one
    // bounded driver row (G12's arithmetic, totaled; self rows are
    // always intra). The aggregate subtree is shared with
    // [[roundStats]] below.
    def qAgg(labels: DataFrame): DataFrame = und
      .join(labels.select(col("node").as("a"), col("lbl").as("la")),
        Seq("a"))
      .join(labels.select(col("node").as("b"), col("lbl").as("lb")),
        Seq("b"))
      .groupBy(col("la"))
      .agg(
        sum(when(col("la") === col("lb"), col("w")).otherwise(0L))
          .as("intra"),
        sum(col("w")).as("degw"))
      .agg(
        (sum(col("intra")).cast(dec) * lit(totalW).cast(dec) -
          sum(col("degw").cast(dec) * col("degw").cast(dec)))
          .as("qnum"),
        count(lit(1)).as("ncomm"))

    def qstats(labels: DataFrame): (BigDecimal, Long) = {
      val row = qAgg(labels).collect()(0)
      (BigDecimal(row.getDecimal(0)), row.getLong(1))
    }

    // r17 (VERDICT r16 ask #3, guide §4 job-count discipline): the
    // per-round accept-test stats — modularity numerator, community
    // count AND move count — ride ONE driver action: both one-row
    // aggregates cross-join (the house one-row BNLJ contract) and
    // collect together, replacing the r16 shape's separate
    // `count()` + qstats jobs (3 driver actions per round → 2,
    // barrier included). Values are identical: the same qAgg subtree
    // and a sum of the precomputed __moved flags on the
    // checkpointed move table.
    def roundStats(next: DataFrame): (BigDecimal, Long, Long) = {
      val mvAgg = next.agg(
        coalesce(sum(when(col("__moved"), 1L).otherwise(0L)),
          lit(0L)).as("__mv"))
      val row = qAgg(next.select("node", "lbl"))
        .crossJoin(mvAgg).collect()(0)
      (BigDecimal(row.getDecimal(0)), row.getLong(1), row.getLong(2))
    }

    var labels = und.select(col("a").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
      .barriered
    var (qPrev, ncomm0) = qstats(labels)
    val trace = scala.collection.mutable.ArrayBuffer(
      (0, 0L, ncomm0, qPrev.underlying.toBigInteger.toString,
        roundQ(qPrev)))
    var r = 1
    var go = true
    while (go && r <= maxRounds) {
      val sigma = labels.join(deg, "node")
        .groupBy(col("lbl")).agg(sum(col("k")).as("sig"))
      val cand = nonSelf
        .join(labels.select(col("node").as("b"), col("lbl").as("lb")),
          Seq("b"))
        .groupBy(col("a"), col("lb")).agg(sum(col("w")).as("wvc"))
        .unionByName(labels.select(col("node").as("a"),
          col("lbl").as("lb"), lit(0L).as("wvc"))) // own community
        .groupBy("a", "lb").agg(sum(col("wvc")).as("wvc"))
      val scored = cand
        .join(labels.select(col("node").as("a"), col("lbl").as("la")),
          Seq("a"))
        .join(deg.select(col("node").as("a"), col("k")), Seq("a"))
        .join(sigma.select(col("lbl").as("lb"), col("sig")), Seq("lb"))
        .withColumn("__sigx",
          when(col("lb") === col("la"), col("sig") - col("k"))
            .otherwise(col("sig")))
        .withColumn("__score",
          lit(totalW).cast(dec) * col("wvc").cast(dec) -
            col("k").cast(dec) * col("__sigx").cast(dec))
      val next = scored.groupBy(col("a"))
        .agg(
          min(struct((-col("__score")).as("ns"), col("lb").as("l")))
            .as("__best"),
          max(when(col("lb") === col("la"), col("__score")))
            .as("__stay"),
          first(col("la")).as("__la"))
        .withColumn("__par",
          pmod(conv(substring(md5(col("a").cast("string")), 1, 7),
            16, 10).cast("long"), lit(2L)))
        .withColumn("lbl",
          when(col("__par") === lit(r % 2) &&
              (-col("__best.ns")) > col("__stay"),
            col("__best.l")).otherwise(col("__la")))
        .select(col("a").as("node"), col("lbl"),
          (col("lbl") =!= col("__la")).as("__moved"))
        .barriered
      val (qNext, ncomm, nMoves) = roundStats(next)
      if (qNext > qPrev) {
        trace += ((r, nMoves, ncomm,
          qNext.underlying.toBigInteger.toString, roundQ(qNext)))
        Barrier.free(labels)
        labels = next
        qPrev = qNext
        r += 1
      } else {
        Barrier.free(next)
        go = false
      }
    }
    Barrier.free(deg)
    // labels is the BARRIER ROOT (free() is root-only) — callers
    // project (node, lbl) at use sites and free the root when done.
    (labels, trace.toSeq)
  }
}
