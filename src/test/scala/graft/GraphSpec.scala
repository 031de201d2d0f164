package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphOps

/** Semantics of the integer-scaled PageRank: exact expected ranks on
  * a hand-computed fixture graph (every truncating division worked by
  * hand), plus the mass-conservation invariant on real data — the
  * scaled-long discipline means expectations are EXACT equalities,
  * no float tolerance anywhere.
  */
class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pagerank_trade: exact ranks on the hand-computed fixture graph") {
    // c1 trades with s10 and s20, c2 with s10 (one duplicated trade
    // row proves the DISTINCT) — N=4, degrees c1:2 c2:1 s10:2 s20:1.
    // Three damped rounds worked by hand in 1/1e15 units.
    val orders = Seq((1L, 1L), (2L, 2L)).toDF("o_orderkey", "o_custkey")
    val lineitem = Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 10L))
      .toDF("l_orderkey", "l_suppkey")
    val got = GraphOps.pagerankTrade(orders, lineitem)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val expected = Seq(
      "c1" -> 330285156250000L,
      "s10" -> 330285156250000L, // ties c1; entity order breaks it
      "c2" -> 169714843750000L,
      "s20" -> 169714843750000L)
    assert(got === expected)
  }

  test("pagerank_trade: rank mass is conserved up to truncation loss") {
    val orders = Tables.orders(spark, TestSpark.Sf0001)
    val lineitem = Tables.lineitem(spark, TestSpark.Sf0001)
    val all = GraphOps.pagerankTrade(orders, lineitem, topK = Int.MaxValue)
      .collect().map(_.getLong(1))
    assert(all.forall(_ > 0L))
    val mass = all.sum
    // each round loses < 1 unit per arc (contrib truncation) plus
    // < 2 per node (damp + base truncation) — invisible at 1e15 scale
    assert(mass <= GraphOps.PagerankScale)
    assert(mass >= GraphOps.PagerankScale / 100L * 99L,
      s"excessive mass loss: $mass")
  }

  private def writeSf(orders: org.apache.spark.sql.DataFrame,
                      lineitem: org.apache.spark.sql.DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-graphspec").toString
    orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    lineitem.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("incremental_pagerank: empty batch == one extra cold round, exactly") {
    // all orderkeys even → the base graph IS the full graph, so the
    // warm round seeded from stored r3 must equal cold r4 bit-for-bit
    val orders = Seq((2L, 1L), (4L, 2L)).toDF("o_orderkey", "o_custkey")
    val lineitem = Seq((2L, 10L), (2L, 20L), (4L, 10L))
      .toDF("l_orderkey", "l_suppkey")
    val dir = writeSf(orders, lineitem)
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val l = spark.read.parquet(s"$dir/lineitem.parquet")
    val inc = GraphOps.incrementalPagerank(o, l, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val cold4 = GraphOps.pagerankTrade(o, l, iters = 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(inc === cold4)
  }

  test("incremental_pagerank: batch-introduced node seeds uniform, exact ranks") {
    // base (even order 2): c1–s10, a symmetric 2-cycle whose ranks are
    // the 5e14 fixed point; batch (odd order 1) adds c3–s10. Warm
    // round worked by hand: s10 sums the stored c1 seed and c3's
    // uniform 1e15//3 seed.
    val orders = Seq((2L, 1L), (1L, 3L)).toDF("o_orderkey", "o_custkey")
    val lineitem = Seq((2L, 10L), (1L, 10L)).toDF("l_orderkey", "l_suppkey")
    val dir = writeSf(orders, lineitem)
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val l = spark.read.parquet(s"$dir/lineitem.parquet")
    val got = GraphOps.incrementalPagerank(o, l, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val expected = Seq(
      "s10" -> 758333333333333L,
      "c1" -> 262500000000000L,
      "c3" -> 262500000000000L)
    assert(got === expected)
  }

  test("ppr_trade: exact distance-decayed ranks; unreachable components drop") {
    // seed = c1 (node 2). c1 trades s10,s20; c2 trades s10 — three
    // rounds worked by hand. The isolated pair c5–s50 never receives
    // mass and the rank>0 cut must exclude it.
    val orders = Seq((1L, 1L), (2L, 2L), (3L, 5L))
      .toDF("o_orderkey", "o_custkey")
    val lineitem = Seq((1L, 10L), (1L, 20L), (2L, 10L), (3L, 50L))
      .toDF("l_orderkey", "l_suppkey")
    val got = GraphOps.pprTrade(orders, lineitem)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val expected = Seq(
      "s10" -> 447578125000000L,
      "s20" -> 294046875000000L,
      "c1" -> 231281250000000L,
      "c2" -> 27093750000000L)
    assert(got === expected)
  }

  test("coorder_triangles: exact counts on overlapping triangles and a K4") {
    // order 1 = {1,2,3} and order 2 = {2,3,4}: triangles {1,2,3} and
    // {2,3,4} sharing edge 2-3. order 3 = {10,11,12,13}: a K4 — four
    // triangles, every vertex in three, ALL degrees tied (the
    // orientation's id tie-break carries the whole ordering). One
    // duplicated row proves the (order, part) distinct.
    val li = (Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 2L), (2L, 3L),
      (2L, 4L), (2L, 4L)) ++
      Seq(10L, 11L, 12L, 13L).map(p => (3L, p)))
      .toDF("l_orderkey", "l_partkey")
    val got = GraphOps.coorderTriangles(li)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = Seq(10L -> 3L, 11L -> 3L, 12L -> 3L, 13L -> 3L,
      2L -> 2L, 3L -> 2L, 1L -> 1L, 4L -> 1L)
    assert(got === expected)
  }

  test("coorder_triangles: a triangle-free bipartite-ish order set is empty") {
    // two-part orders only → the co-order graph is a matching/paths,
    // no order contributes a closing edge
    val li = Seq((1L, 1L), (1L, 2L), (2L, 2L), (2L, 3L), (3L, 3L), (3L, 4L))
      .toDF("l_orderkey", "l_partkey")
    assert(GraphOps.coorderTriangles(li).count() === 0L)
  }

  test("deltaRelax: weighted re-improvement re-enters the frontier; exact dists") {
    // seed(0)→a(1) w=10, seed→b(2) w=1, b→a w=2: a is settled at 10
    // in round 1, then IMPROVES to 3 via b in round 2 — the node
    // must re-enter the frontier exactly once, and later rounds see
    // an empty frontier (convergence for free).
    val edges = Seq((0L, 1L, 10L), (0L, 2L, 1L), (2L, 1L, 2L))
      .toDF("src", "dst", "w")
    val (dist, sizes) =
      GraphOps.deltaRelax(edges, seed = 0L, rounds = 4, trackFrontier = true)
    val m = dist.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(m === Map(0L -> 0L, 1L -> 3L, 2L -> 1L))
    // round join inputs: {seed}, {a@10, b@1}, {a@3}, {} — the dense
    // loop would have probed all 3 reached nodes in EVERY round
    assert(sizes === Seq(1L, 2L, 1L, 0L))
  }

  test("deltaRelax: BFS frontier join input shrinks past the wavefront peak") {
    val orders = Tables.orders(spark, TestSpark.Sf0001)
    val lineitem = Tables.lineitem(spark, TestSpark.Sf0001)
    val edges = GraphOps.tradeEdges(orders, lineitem)
      .withColumn("w", org.apache.spark.sql.functions.lit(1L))
    val (dist, sizes) = GraphOps.deltaRelax(edges, GraphOps.PprSeedNode,
      GraphOps.BfsMaxHops, trackFrontier = true)
    val reached = dist.count()
    // on the near-bipartite trade graph the wavefront saturates fast:
    // the last round's frontier is a small tail of the peak ring, and
    // the TOTAL join input across rounds beats the dense loop's
    // rounds × |dist| by a wide margin — the point of delta-frontier
    assert(sizes.head === 1L)
    assert(sizes.last < sizes.max,
      s"frontier never shrank: $sizes")
    assert(sizes.sum < reached * GraphOps.BfsMaxHops / 2,
      s"delta join input ${sizes.sum} not clearly below dense ${reached * GraphOps.BfsMaxHops}")
  }

  test("pagerank_trade: higher-degree hubs outrank leaves") {
    // on the fixture above the degree-2 nodes strictly outrank the
    // degree-1 nodes; sanity that damping didn't invert the ordering
    val orders = Seq((1L, 1L), (2L, 2L)).toDF("o_orderkey", "o_custkey")
    val lineitem = Seq((1L, 10L), (1L, 20L), (2L, 10L))
      .toDF("l_orderkey", "l_suppkey")
    val m = GraphOps.pagerankTrade(orders, lineitem)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(m("c1") > m("c2") && m("s10") > m("s20"))
  }

  test("bfsHopsFixpoint: converges past the bounded round count and " +
    "equals an over-provisioned bounded relax exactly") {
    import org.apache.spark.sql.functions.{col, lit, min => smin, pmod}
    val sf = TestSpark.Sf0001
    val orders = Tables.orders(spark, sf)
      .where(pmod(col("o_orderkey"), lit(GraphOps.FixpointSliceMod)) === 0L)
    val edges = GraphOps.tradeEdges(orders, Tables.lineitem(spark, sf))
      .withColumn("w", lit(1L))
    val seed = edges.agg(smin(col("src"))).head().getLong(0)
    val (dist, rounds) = GraphOps.deltaRelaxFixpoint(edges, seed)
    // the slice is thinned precisely so convergence needs MORE rounds
    // than the bounded queries run — otherwise the fixpoint gate would
    // never exercise the loop past what bfs_hops already proves
    assert(rounds > GraphOps.BfsMaxHops - 1,
      s"fixture too dense: converged in $rounds <= ${GraphOps.BfsMaxHops - 1} rounds")
    assert(rounds < GraphOps.FixpointMaxRounds)
    // fixpoint == any bounded run past the diameter (Bellman-Ford
    // monotone convergence), exact row equality
    val bounded = GraphOps.deltaRelax(edges, seed, rounds + 3)._1
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fixed = dist.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fixed === bounded)
  }

  test("deltaRelaxFixpoint: throws rather than returning a non-converged table") {
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
      .toDF("src", "dst", "w")
    val ex = intercept[IllegalArgumentException] {
      GraphOps.deltaRelaxFixpoint(edges, 1L, maxRounds = 2)
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("coorderTrianglesIndexed == coorderTriangles, row for row") {
    val sf = TestSpark.Sf0001
    val li = Tables.lineitem(spark, sf)
    val inline = GraphOps.coorderTriangles(li)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val indexed = GraphOps.coorderTrianglesIndexed(li, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(indexed === inline)
  }
}
