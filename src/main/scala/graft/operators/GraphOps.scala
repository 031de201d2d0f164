package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph ranking over relationship graphs derived from the
  * relational tables. The reference engine has no graph surface
  * (reference `WordCount.java` is a single map/reduce pass); this is
  * part of the beyond-reference analytics family, alongside the
  * connected-components closure in [[DedupOps]].
  *
  * == Determinism discipline ==
  * PageRank is a repeated floating-point sum, and a float sum's value
  * depends on association order — unfixable across engines. So ranks
  * here are SCALED LONGS: rank(node) is an integer in units of
  * 1/[[GraphOps.PagerankScale]], every per-edge contribution is an
  * integer division `rank div outdeg`, and the damping step is
  * `base + (85 * sum) div 100` — all order-independent exact integer
  * arithmetic, bit-identical in any engine (DuckDB mirrors it with
  * `//`; all operands are non-negative so truncating and floor
  * division coincide). The truncated remainders are mass the surfer
  * "loses" — well-defined semantics, same loss in both engines.
  *
  * == Scale shape ==
  * Per iteration: one shuffled equi-join (ranks ⋈ edges on the source
  * node) plus one hash aggregate by destination — the canonical
  * distributed PageRank step. The arcs-with-degree subtree appears
  * once per iteration but every copy canonicalizes identically, so
  * AQE collapses them to ONE computed exchange plus ReusedExchange
  * nodes (the engine's standing preference over `.cache()`, which
  * breaks cross-branch reuse — see PLANS.md, bm25 wrinkle); on a
  * cluster the same role is played by a write-once edges table
  * bucketed by `src`, making every iteration's join co-located and
  * shuffle-free on the edge side. Node count N is a one-scalar driver
  * aggregate (PageRank's standard init). Nothing data-sized is ever
  * collected.
  */
object GraphOps {

  /** Rank unit: ranks are longs in units of 1/PagerankScale. */
  val PagerankScale: Long = 1000000000000000L // 1e15

  /** Damping d = DampNum/DampDen = 0.85, applied in integer space. */
  val DampNum: Long = 85L
  val DampDen: Long = 100L

  val PagerankIters: Int = 3
  val PagerankTopK: Int = 20

  val TriangleTopK: Int = 20

  /** Local triangle counts on the part CO-ORDER graph (parts that
    * appear in the same order are adjacent): the top-[[TriangleTopK]]
    * parts by number of triangles they participate in.
    *
    * == Scale shape ==
    * The co-order projection fans out C(items, 2) pairs per order —
    * items-per-order is a small data constant (≤13 here; ≤7 in
    * TPC-H), so the edge list is LINEAR in orders, never quadratic in
    * parts. Triangles are counted with the DEGREE-ORDERED ORIENTATION
    * algorithm: each undirected edge is directed from its lower
    * (degree, id) endpoint to the higher, which caps every
    * out-neighborhood at O(√E), so the wedge join (two-paths from a
    * common source) generates O(E^1.5) candidates worst-case — the
    * arboricity bound — instead of Σ deg² of the naive formulation
    * that dies on the first hub vertex. Every step is an equi-join or
    * hash aggregate on vertex keys; counts are exact integers (no
    * float anywhere).
    */
  def coorderTriangles(lineitem: DataFrame,
                       topK: Int = TriangleTopK): DataFrame = {
    // The oriented list feeds three consumers, so it must be
    // materialized once (r13: relying on ReusedExchange left the
    // distinct+degree subtree recomputed on reuse misses). r20
    // measurement: materializing via localCheckpoint erased SIZE
    // STATISTICS — a LogicalRDD reports the default (huge) size, so
    // the planner gave the walk's joins SortMergeJoin + full shuffles
    // while the parquet-backed indexed twin planned BroadcastHashJoins
    // from real file stats (40.9 s inline vs 10.3 s indexed at sf0.1
    // for the SAME walk). Fix: spill the list to a per-invocation
    // scratch parquet dir and read it back — the walk then plans from
    // genuine on-disk statistics, identical to the indexed row by
    // construction, at every scale (a big list simply keeps SMJ).
    // Nothing is reused across invocations: the scratch dir is fresh
    // per call and reaped on JVM exit.
    trianglesFromOriented(
      Checkpoints.scratchParquet(orientedEdges(lineitem), "tri_oriented"),
      topK)
  }

  /** The degree-oriented co-order edge list — the derived structure
    * the triangle count is really computed over: each undirected edge
    * directed from its lower (degree, id) endpoint to the higher,
    * with the destination's (degree, id) key carried so wedges can
    * order their two endpoints without a global vertex ranking
    * (struct comparison = lexicographic).
    */
  private def orientedEdges(lineitem: DataFrame): DataFrame = {
    val op = lineitem.select(col("l_orderkey").as("ok"),
      col("l_partkey").as("pk")).distinct()
    val edges = op.as("a").join(op.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v"))
      .distinct()
    val deg = edges.select(col("u").as("p")).union(edges.select(col("v").as("p")))
      .groupBy("p").agg(count(lit(1)).as("deg"))
    val withDegs = edges
      .join(deg.withColumnRenamed("p", "u").withColumnRenamed("deg", "du"), "u")
      .join(deg.withColumnRenamed("p", "v").withColumnRenamed("deg", "dv"), "v")
    val ku = struct(col("du").as("d"), col("u").as("id"))
    val kv = struct(col("dv").as("d"), col("v").as("id"))
    withDegs.select(
      when(ku < kv, col("u")).otherwise(col("v")).as("src"),
      when(ku < kv, kv).otherwise(ku).as("dstKey"))
      .select(col("src"), col("dstKey.id").as("dst"), col("dstKey"))
  }

  /** Neighborhood-intersection triangle walk over an already
    * materialized oriented list — shared by the inline and indexed
    * triangle queries. For each oriented edge (u,v), the closing
    * vertices are exactly N⁺(u) ∩ N⁺(v) (w there means u→w and v→w,
    * completing the u→v, u→w, v→w oriented triangle, and each
    * triangle has exactly one such (u,v) edge — the one out of its
    * lowest-(deg,id) vertex to its middle vertex — so every triangle
    * is emitted once).
    *
    * r20 rewrite (guide §2.3/§2.4): the former wedge-join + closing-
    * join shape materialized and SHUFFLED all O(E^1.5) two-paths (41M
    * rows at sf0.1, 8–11 s) just so a second join could discard the
    * non-closing ones. Grouping the out-neighborhoods into sorted
    * arrays instead (one aggregate of E rows) turns the closing test
    * into a codegen'd sorted-array intersection per edge: the
    * candidate set never exists as rows, the per-edge arrays are
    * bounded by the orientation's O(√E) out-degree cap, and the walk
    * drops to 2–3.4 s on the same list. Triangle output (and thus the
    * oracle hash) is identical — only the discovery order changed.
    */
  private def trianglesFromOriented(oriented: DataFrame,
                                    topK: Int): DataFrame = {
    val ori = oriented.select(col("src"), col("dst"))
    val adj = ori.groupBy(col("src").as("s"))
      .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
    val triangles = ori
      .join(adj.withColumnRenamed("s", "src").withColumnRenamed("nbrs", "un"),
        Seq("src"))
      .join(adj.withColumnRenamed("s", "dst").withColumnRenamed("nbrs", "vn"),
        Seq("dst"))
      .select(col("src").as("tu"), col("dst").as("tv"),
        explode(array_intersect(col("un"), col("vn"))).as("tw"))
    triangles
      .select(explode(array(col("tu"), col("tv"), col("tw"))).as("l_partkey"))
      .groupBy("l_partkey")
      .agg(count(lit(1)).as("n_tri"))
      .orderBy(col("n_tri").desc, col("l_partkey"))
      .limit(topK)
  }

  /** Write-once oriented-edge-list index: the co-order projection,
    * degree computation and orientation run ONCE at build time; every
    * later triangle query is a read + two joins. This is the registry's
    * single most expensive derived structure (the co-order distinct +
    * degree join dominate the inline query's cost), so it gets the
    * same write-once discipline as the LSH band index, the BM25
    * postings and the pagerank rank table.
    */
  def orientedEdgeDir(lineitem: DataFrame, sfDir: String): String =
    graft.sources.Fixtures.ensure("coorder_oriented", sfDir,
      Seq(s"$sfDir/lineitem.parquet")) { dir =>
      orientedEdges(lineitem).write.mode("overwrite").parquet(dir)
      ()
    }

  /** [[coorderTriangles]] over the persisted oriented list — gated by
    * the SAME oracle as the inline form, so the hash match is the
    * index == inline proof (the bm25_indexed discipline applied to
    * the graph family).
    */
  def coorderTrianglesIndexed(lineitem: DataFrame, sfDir: String,
                              topK: Int = TriangleTopK): DataFrame =
    trianglesFromOriented(
      lineitem.sparkSession.read.parquet(orientedEdgeDir(lineitem, sfDir)),
      topK)

  /** Customer–supplier trade graph: an undirected edge per DISTINCT
    * (customer, supplier) pair that ever traded (orders ⋈ lineitem).
    * Node ids are namespaced into one long space — customers at
    * `2*custkey`, suppliers at `2*suppkey+1` — and each undirected
    * edge is stored as both directed arcs, so every node has in- and
    * out-degree ≥ 1 (no dangling-mass term needed).
    */
  private[graft] def tradeEdges(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val trade = orders
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2L).as("c"),
        (col("l_suppkey") * 2L + 1L).as("s"))
      .distinct()
    // both arcs exploded from ONE row (not a self-union): a union's
    // two legs pick up asymmetric null-guard filters and stop
    // canonicalizing equal, so every consumer would recompute the
    // trade distinct; the explode keeps one subtree that AQE's
    // exchange reuse dedups across all three iterations
    trade
      .select(explode(array(
        struct(col("c").as("src"), col("s").as("dst")),
        struct(col("s").as("src"), col("c").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
  }

  /** Integer-scaled PageRank over the customer–supplier trade graph:
    * `iters` damped power-iteration rounds from the uniform start
    * `PagerankScale div N`, then the top-`topK` entities by final
    * rank (ties broken by entity id). Output: `entity` ("c<custkey>"
    * or "s<suppkey>"), `rank_val` (scaled-long rank).
    */
  def pagerankTrade(orders: DataFrame, lineitem: DataFrame,
                    iters: Int = PagerankIters,
                    topK: Int = PagerankTopK): DataFrame =
    rankTopK(pagerankRanks(tradeEdges(orders, lineitem), iters), topK)

  /** `iters` damped rounds from the uniform start over `edges`;
    * returns the full (node, rank) table. */
  private[operators] def pagerankRanks(edges: DataFrame,
                                       iters: Int): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // one arc row carrying its source's out-degree — the subtree each
    // iteration joins against (deduped to one exchange by AQE reuse)
    val arcs = edges.join(deg, "src")
      .select(col("src"), col("dst"), col("outdeg"))
    val n = deg.count() // N: one scalar, the standard PageRank init
    val r0 = PagerankScale / n
    val seeds = deg.select(col("src").as("node"), lit(r0).as("rank"))
    dampedRounds(arcs, seeds, n, iters)
  }

  /** `iters` damped rounds from the given seed ranks. */
  private def dampedRounds(arcs: DataFrame, seeds: DataFrame, n: Long,
                           iters: Int): DataFrame = {
    val base = (PagerankScale * (DampDen - DampNum) / DampDen) / n
    var ranks = seeds
    for (_ <- 1 to iters) {
      ranks = arcs
        .join(ranks, arcs("src") === ranks("node"))
        .select(col("dst"), expr("rank div outdeg").as("contrib"))
        .groupBy("dst")
        .agg(sum("contrib").as("csum"))
        .select(col("dst").as("node"),
          (lit(base) + expr(s"($DampNum * csum) div $DampDen")).as("rank"))
    }
    ranks
  }

  /** Render a trade-graph node id back to its entity name
    * ("c<custkey>" / "s<suppkey>") — shared by every trade-graph
    * result surface.
    */
  private def entityCol: org.apache.spark.sql.Column =
    when(pmod(col("node"), lit(2L)) === 0L,
      concat(lit("c"), expr("node div 2")))
      .otherwise(concat(lit("s"), expr("(node - 1) div 2")))
      .as("entity")

  private def rankTopK(ranks: DataFrame, topK: Int): DataFrame =
    ranks
      .select(entityCol, col("rank").as("rank_val"))
      .orderBy(col("rank_val").desc, col("entity"))
      .limit(topK)

  /** Hop bound for [[bfsHops]] — shared with the unrolled oracle. */
  val BfsMaxHops = 4

  /** DELTA-FRONTIER min-plus relaxation, the shared engine of
    * [[bfsHops]] and [[ssspWeighted]]: each round relaxes outgoing
    * edges of ONLY the nodes whose distance changed last round (the
    * frontier), instead of the whole distance table. After round r
    * the table holds exactly the min cost over paths of ≤ r edges —
    * identical to the dense Bellman-Ford loop round for round
    * (values propagate one hop per round in both; a node whose
    * ≤(r−1)-edge optimum settled in round s sat in round s's
    * frontier, so its successors see that optimum in round s+1 ≤ r)
    * — which is why the unrolled oracles gate both forms unchanged.
    *
    * == Scale shape ==
    * Per round: edges ⋈ frontier (the probe side SHRINKS as the
    * wavefront passes — on a diameter-scale graph later rounds touch
    * only the expanding rim, not every settled node), a map-side
    * pre-aggregated candidate min, a node-keyed left join against
    * the running table to keep strict improvements, and an anti-join
    * merge (replace improved rows) — every step hash-partitioned on
    * the node id. Both the table and the frontier are
    * lineage-truncated per round (the table feeds the next round
    * twice). `frontierSizes` (spec hook) forces a count per round
    * when tracking — the production path never does.
    */
  private[graft] def deltaRelax(edges: DataFrame, seed: Long, rounds: Int,
                                trackFrontier: Boolean = false)
      : (DataFrame, Seq[Long]) = {
    val spark = edges.sparkSession
    import spark.implicits._
    var dist = Checkpoints.truncate(Seq((seed, 0L)).toDF("node", "dist"))
    var frontier = dist
    val sizes = Seq.newBuilder[Long]
    for (_ <- 1 to rounds) {
      if (trackFrontier) sizes += frontier.count()
      val (d2, improved) = relaxStep(edges, dist, frontier)
      dist = d2
      frontier = improved
    }
    (dist, sizes.result())
  }

  /** One min-plus relaxation round: relax the frontier's outgoing
    * edges, keep strict improvements against `dist`, merge. Returns
    * (updated dist, improved rows) — `improved` IS the next frontier,
    * and `improved.isEmpty` is Bellman-Ford's convergence test for
    * free.
    *
    * r20 rework (guide §1.2 — these loops are driver-latency-bound at
    * gate SFs: the event log showed ~80 sub-100 ms jobs and the wall
    * time living in scheduling gaps, not tasks): the old shape ran TWO
    * eager materializations per round (`improved` via left join, then
    * `newDist` via anti join + union), each a multi-job adaptive
    * execution. One FULL OUTER join of the candidate minima against
    * the running table computes both results at once — new distance =
    * min(old, cand), improved flag = strict improvement — and ONE
    * truncation materializes them; the next frontier is a filter over
    * the already-materialized blocks (no extra job). Same values, same
    * improved set, half the per-round joins and driver round-trips.
    */
  private def relaxStep(edges: DataFrame, dist: DataFrame,
                        frontier: DataFrame): (DataFrame, DataFrame) = {
    val cand = edges.join(frontier, edges("src") === frontier("node"))
      .select(col("dst").as("node"), (col("dist") + col("w")).as("cdist"))
      .groupBy("node").agg(min("cdist").as("cdist"))
    val merged = Checkpoints.truncate(
      cand.join(dist.select(col("node"), col("dist").as("old")),
          Seq("node"), "full_outer")
        .select(col("node"),
          when(col("old").isNull || (col("cdist").isNotNull &&
            col("cdist") < col("old")), col("cdist")).otherwise(col("old"))
            .as("dist"),
          (col("old").isNull || (col("cdist").isNotNull &&
            col("cdist") < col("old"))).as("improved")))
    (merged.select(col("node"), col("dist")),
      merged.where(col("improved")).select(col("node"), col("dist")))
  }

  /** [[deltaRelax]] run to EMPTY-FRONTIER EXHAUSTION — the 100 TB
    * posture the bounded queries document, executed for real: no
    * round count, the loop stops when a round improves nothing
    * (`improved.isEmpty`, one cheap action on an already
    * materialized frame per round — the per-round driver check every
    * distributed fixpoint pays, from Pregel supersteps to GraphX).
    * `maxRounds` is a SAFETY bound, not a semantic one: exceeding it
    * throws instead of silently returning a non-converged table, so
    * a gated fixpoint run PROVES the fixture's diameter is below the
    * cap the oracle's recursion shares. Returns (distances, rounds
    * actually run).
    */
  private[graft] def deltaRelaxFixpoint(edges: DataFrame, seed: Long,
                                        maxRounds: Int = FixpointMaxRounds)
      : (DataFrame, Int) = {
    val spark = edges.sparkSession
    import spark.implicits._
    var dist = Checkpoints.truncate(Seq((seed, 0L)).toDF("node", "dist"))
    var frontier = dist
    var rounds = 0
    while (!frontier.isEmpty) {
      require(rounds < maxRounds,
        s"fixpoint did not converge within $maxRounds rounds — " +
          "graph diameter exceeds the declared cap")
      val (d2, improved) = relaxStep(edges, dist, frontier)
      dist = d2
      frontier = improved
      rounds += 1
    }
    (dist, rounds)
  }

  /** Single-source shortest HOP distances (BFS) from the
    * [[PprSeedNode]] seed over the trade graph, bounded to
    * [[BfsMaxHops]] rounds: every entity reachable within the bound,
    * with its exact hop distance. Distances are exact integers — no
    * float anywhere — so the gate is a zero-tolerance hash match.
    *
    * == Scale shape ==
    * [[deltaRelax]] with unit edge weights: per round, only the
    * frontier (nodes discovered last round — for unit weights a node
    * never re-improves) probes the edge table, so round r's join
    * input is hop-ring r−1, not the whole reachable set. The arcs
    * subtree canonicalizes identically across rounds (AQE
    * ReusedExchange, the pagerank discipline). Rounds = the hop
    * bound, a declared constant; a diameter-scale BFS at 100 TB runs
    * the same loop to frontier exhaustion.
    */
  def bfsHops(orders: DataFrame, lineitem: DataFrame,
              seed: Long = PprSeedNode, maxHops: Int = BfsMaxHops): DataFrame = {
    val edges = tradeEdges(orders, lineitem).withColumn("w", lit(1L))
    deltaRelax(edges, seed, maxHops)._1
      .select(entityCol, col("dist")).orderBy(col("dist"), col("entity"))
  }

  /** WEIGHTED single-source shortest paths — the min-plus companion
    * of [[bfsHops]]: each trade edge carries an integer cost derived
    * from its trade multiplicity (`1 + n_orders % 3` — deterministic,
    * non-uniform), and [[BfsMaxHops]] Bellman-Ford rounds relax
    * `dist = min(dist, min(dist(src) + w))` from the seed. Exact
    * longs end to end (zero-tolerance hash). Same [[deltaRelax]]
    * loop as BFS — weighted relaxation can re-improve a settled
    * node, and exactly then (and only then) the node re-enters the
    * frontier — except the edge subtree is the WEIGHTED trade
    * aggregate (one groupBy(c,s) count) instead of the distinct.
    * Bounded rounds give the ≤k-hop-cheapest-path semantics; a full
    * fixpoint at 100 TB runs the same loop to frontier exhaustion
    * (empty frontier ⇔ no distance changed — Bellman-Ford's
    * convergence test for free).
    */
  def ssspWeighted(orders: DataFrame, lineitem: DataFrame,
                   seed: Long = PprSeedNode,
                   rounds: Int = BfsMaxHops): DataFrame = {
    val trade = orders
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2L).as("c"), (col("l_suppkey") * 2L + 1L).as("s"),
        col("o_orderkey"))
      .groupBy("c", "s")
      .agg((countDistinct(col("o_orderkey")) % 3L + 1L).as("w"))
    val edges = trade
      .select(explode(array(
        struct(col("c").as("src"), col("s").as("dst"), col("w")),
        struct(col("s").as("src"), col("c").as("dst"), col("w")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"), col("e.w").as("w"))
    deltaRelax(edges, seed, rounds)._1
      .select(entityCol, col("dist")).orderBy(col("dist"), col("entity"))
  }

  /** Order-key modulus of the fixpoint gate's bounded-diameter
    * fixture slice: `o_orderkey % FixpointSliceMod == 0` thins the
    * trade graph enough that its eccentricity from the minimum node
    * EXCEEDS [[BfsMaxHops]] at gate SFs (5–6 hops measured) — so the
    * fixpoint provably runs past the bounded queries' round count
    * before converging.
    */
  val FixpointSliceMod: Long = 37L

  /** Safety cap on fixpoint rounds, shared with the oracle's bounded
    * recursion: the Spark loop THROWS past it (never returns a
    * non-converged table), the oracle recursion stops extending walks
    * at it — so a green hash on the fixpoint row certifies both that
    * the loop converged and that the fixture diameter is under the
    * cap.
    */
  val FixpointMaxRounds: Int = 48

  /** BFS hop distances run to CONVERGENCE (empty frontier) on the
    * [[FixpointSliceMod]]-sliced trade graph, seeded at the slice's
    * minimum node id (a one-scalar driver aggregate both engines
    * recompute). This is the gate for the exhaustion path the bounded
    * [[bfsHops]]/[[ssspWeighted]] document as their 100 TB posture:
    * the oracle is a DuckDB recursive CTE over the same slice (the
    * dup_components precedent), so the hash match proves the
    * unbounded loop reaches exactly the recursive fixpoint.
    */
  def bfsHopsFixpoint(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val sliced = orders.where(
      pmod(col("o_orderkey"), lit(FixpointSliceMod)) === 0L)
    val edges = tradeEdges(sliced, lineitem).withColumn("w", lit(1L))
    val seed = edges.agg(min(col("src"))).head().getLong(0)
    deltaRelaxFixpoint(edges, seed)._1
      .select(entityCol, col("dist")).orderBy(col("dist"), col("entity"))
  }

  /** WEIGHTED fixpoint companion of [[bfsHopsFixpoint]]: min-plus
    * Bellman-Ford run to empty frontier on the same thinned slice,
    * with the trade-multiplicity costs of [[ssspWeighted]]. Weighted
    * relaxation RE-IMPROVES settled nodes (a longer-hop cheaper path
    * arrives later), so this gate exercises the re-entry leg of the
    * frontier loop to exhaustion, not just ring expansion. Oracle:
    * the same capped recursive CTE, extending walks by edge cost —
    * the cost cap bounds cycle extension exactly as the hop cap does
    * for BFS (shortest costs are far below it on this fixture, and
    * the Spark loop's round cap throws if convergence stalls).
    */
  def ssspFixpoint(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val sliced = orders.where(
      pmod(col("o_orderkey"), lit(FixpointSliceMod)) === 0L)
    val trade = sliced
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2L).as("c"), (col("l_suppkey") * 2L + 1L).as("s"),
        col("o_orderkey"))
      .groupBy("c", "s")
      .agg((countDistinct(col("o_orderkey")) % 3L + 1L).as("w"))
    val edges = trade
      .select(explode(array(
        struct(col("c").as("src"), col("s").as("dst"), col("w")),
        struct(col("s").as("src"), col("c").as("dst"), col("w")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"), col("e.w").as("w"))
    val seed = edges.agg(min(col("src"))).head().getLong(0)
    deltaRelaxFixpoint(edges, seed)._1
      .select(entityCol, col("dist")).orderBy(col("dist"), col("entity"))
  }

  /** Warm-start rounds the incremental form runs over the updated
    * graph (vs [[PagerankIters]] cold rounds on a rebuild). */
  val PagerankWarmRounds: Int = 1

  /** PPR restart entity: customer 1 (node id 2). */
  val PprSeedNode: Long = 2L

  /** PERSONALIZED PageRank: the restart mass concentrates on one
    * seed node instead of spreading uniformly — the result ranks
    * entities by proximity to the seed ("suppliers related to this
    * customer"), decaying with graph distance. Same scaled-long
    * integer discipline as [[pagerankTrade]]: r0 = full scale at the
    * seed, 0 elsewhere; each round adds the 15% restart only at the
    * seed. Zero ranks flow through the same join+aggregate rounds
    * (their contributions are exact zeros), so the plan shape is
    * identical to the global form.
    */
  def pprTrade(orders: DataFrame, lineitem: DataFrame,
               seed: Long = PprSeedNode,
               iters: Int = PagerankIters,
               topK: Int = PagerankTopK): DataFrame = {
    val edges = tradeEdges(orders, lineitem)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val arcs = edges.join(deg, "src")
      .select(col("src"), col("dst"), col("outdeg"))
    val restart = PagerankScale * (DampDen - DampNum) / DampDen
    var ranks = deg.select(col("src").as("node"),
      when(col("src") === seed, lit(PagerankScale)).otherwise(lit(0L))
        .as("rank"))
    for (_ <- 1 to iters) {
      ranks = arcs
        .join(ranks, arcs("src") === ranks("node"))
        .select(col("dst"), expr("rank div outdeg").as("contrib"))
        .groupBy("dst")
        .agg(sum("contrib").as("csum"))
        .select(col("dst").as("node"),
          (when(col("dst") === seed, lit(restart)).otherwise(lit(0L)) +
            expr(s"($DampNum * csum) div $DampDen")).as("rank"))
    }
    rankTopK(ranks.where(col("rank") > 0L), topK)
  }

  /** Write-once rank index of the already-ingested base graph (even
    * o_orderkey orders — the parity convention of the other persisted
    * indexes): the full (node, rank) table after [[PagerankIters]]
    * cold rounds.
    */
  def pagerankRankDir(orders: DataFrame, lineitem: DataFrame,
                      sfDir: String): String =
    graft.sources.Fixtures.ensure("prank", sfDir,
      Seq(s"$sfDir/orders.parquet", s"$sfDir/lineitem.parquet")) { dir =>
      pagerankRanks(
        tradeEdges(orders.where(pmod(col("o_orderkey"), lit(2L)) === 0L),
          lineitem), PagerankIters)
        .write.mode("overwrite").parquet(dir)
      ()
    }

  /** STEADY-STATE PageRank: the arriving batch (odd-o_orderkey
    * orders) extends the trade graph, and instead of re-running the
    * full cold iteration the engine runs [[PagerankWarmRounds]]
    * damped round(s) over the UPDATED graph seeded from the persisted
    * base ranks — nodes the batch introduces start at the uniform
    * `PagerankScale div N` of the new node count. This is the
    * standard warm-start posture of production rank maintenance
    * (ranks drift slowly; a round per batch tracks them without the
    * full-graph recompute); the semantics are exactly defined — same
    * integer arithmetic, seeded instead of uniform — so the oracle
    * replays base-cold-rounds + warm round and the gate hash-matches
    * bit-for-bit. Scale shape: identical to one cold round (join +
    * aggregate) plus a node-keyed left join against the stored ranks.
    */
  def incrementalPagerank(orders: DataFrame, lineitem: DataFrame,
                          sfDir: String,
                          topK: Int = PagerankTopK): DataFrame =
    incrementalPagerankBatch(
      orders.where(pmod(col("o_orderkey"), lit(2L)) === 1L),
      orders, lineitem, sfDir, topK)

  /** ARBITRARY-BATCH form of [[incrementalPagerank]] — the public
    * steady-state API (the dedup family's `_batch2` discipline): the
    * arriving batch is a PARAMETER, not a baked-in split, so the
    * operator is provably batch-agnostic — `incremental_pagerank`
    * gates it on the parity split, `incremental_pagerank_batch2` on
    * a different (mod-4) split against an independently-written
    * oracle. The persisted base index (even-key orders) is untouched;
    * the updated graph is base ∪ batch.
    */
  def incrementalPagerankBatch(batchOrders: DataFrame,
                               orders: DataFrame, lineitem: DataFrame,
                               sfDir: String,
                               topK: Int = PagerankTopK): DataFrame = {
    val spark = orders.sparkSession
    val stored = spark.read.parquet(pagerankRankDir(orders, lineitem, sfDir))
      .select(col("node").as("snode"), col("rank").as("srank"))
    val base = orders.where(pmod(col("o_orderkey"), lit(2L)) === 0L)
    val edges = // the updated graph: ingested base ∪ arriving batch
      tradeEdges(base.unionByName(batchOrders), lineitem)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val arcs = edges.join(deg, "src")
      .select(col("src"), col("dst"), col("outdeg"))
    val n = deg.count()
    val r0 = PagerankScale / n
    val seeds = deg.select(col("src").as("node"))
      .join(stored, col("node") === col("snode"), "left")
      .select(col("node"), coalesce(col("srank"), lit(r0)).as("rank"))
    rankTopK(dampedRounds(arcs, seeds, n, PagerankWarmRounds), topK)
  }
}
