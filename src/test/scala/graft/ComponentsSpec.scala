package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupOps

/** Connected-components audit: the distributed min-label propagation
  * in [[DedupOps.connectedComponents]] against a sequential
  * union-find model (union-by-min keeps every root at its component's
  * minimum, which is exactly the label contract), plus the
  * convergence-shape cases that matter — cliques (the dedup-graph
  * common case, diameter 1) and a chain sized against
  * [[DedupOps.ComponentsMaxIters]] (the worst propagation diameter
  * the default bound must cover), plus the survivors invariant on the
  * real fixture.
  */
class ComponentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def edgesDf(edges: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    edges.toDF("a_id", "b_id")
  }

  private def run(edges: Seq[(Long, Long)], maxIters: Int = DedupOps.ComponentsMaxIters): Map[Long, Long] =
    DedupOps.connectedComponents(edgesDf(edges), maxIters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Union-find with union-by-min: the root of every set is its
    * minimum member, so `find` yields the expected component label.
    */
  private def model(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.flatMap(e => Seq(e._1, e._2)).distinct.map(x => x -> find(x)).toMap
  }

  test("propagation equals union-find on seeded random graphs") {
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val n = 24
      val edges = Seq.fill(20 + rnd.nextInt(15)) {
        val a = rnd.nextInt(n).toLong
        val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      // random graphs can have diameter beyond the dedup-tuned
      // default bound; the safety margin is the parameter's job
      assert(run(edges, maxIters = 64) === model(edges), s"seed $seed")
    }
  }

  test("a clique labels every member with the minimum in two rounds") {
    val ids = Seq(11L, 3L, 42L, 17L, 29L)
    val edges = for {
      a <- ids; b <- ids if a < b
    } yield (a, b)
    // diameter 1: one round converges, the second proves the fixpoint
    val got = run(edges, maxIters = 2)
    assert(got === ids.map(_ -> 3L).toMap)
  }

  test("a chain at the default bound's worst diameter converges") {
    // path 100 -> 121: diameter 21 needs 21 propagation rounds + the
    // fixpoint round, inside ComponentsMaxIters = 25
    val edges = (100L until 121L).map(i => (i, i + 1))
    val got = run(edges)
    assert(got === (100L to 121L).map(_ -> 100L).toMap)
  }

  test("two components stay separate") {
    val got = run(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("empty edge set yields an empty labelling") {
    assert(run(Seq.empty) === Map.empty)
  }

  test("incremental components equal the full rebuild (fixture)") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val full = DedupOps.dupComponents(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val inc = DedupOps.incrementalComponents(docs, TestSpark.Sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full.nonEmpty)
    assert(inc === full,
      "persisted-index incremental closure must equal the from-scratch rebuild")
    // and the persisted-edge overload agrees with the direct form
    val viaIndex = DedupOps.dupComponents(docs, TestSpark.Sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaIndex === full)
  }

  test("incremental edge set = full pair graph minus corpus-corpus pairs (fixture)") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val full = graft.operators.DedupOps.nearDupJaccard(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val incr = DedupOps.incrementalEdges(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val expected = full.filter(e => e._1 % 2 == 1 || e._2 % 2 == 1)
    assert(incr === expected,
      "incremental edges must be exactly the >=1-batch-endpoint pairs, bit-equal jaccard included")
    // the LSH-index probe (what incrementalComponents actually feeds
    // on) must emit the same edge set as the exact inverted-index form
    val viaLsh = DedupOps.incrementalNearDedup(docs, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaLsh === expected,
      "LSH-index incremental edges must equal the exact inverted-index edges")
  }

  test("survivors = corpus minus non-canonical cluster members (fixture)") {
    val docs = Tables.documents(spark, TestSpark.Sf0001).cache()
    val comp = DedupOps.dupComponents(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val survivors = DedupOps.dedupSurvivors(docs)
      .collect().map(_.getLong(0)).toSet
    val dropped = comp.collect { case (id, c) if c < id => id }.toSet
    assert(comp.nonEmpty, "fixture should contain duplicate clusters")
    assert(dropped.nonEmpty)
    assert(survivors.intersect(dropped).isEmpty)
    assert(survivors.size + dropped.size === docs.count())
    // every cluster retains exactly its minimum member
    comp.groupBy(_._2).foreach { case (label, members) =>
      val ids = members.map(_._1).toSet
      assert(ids.min === label)
      assert(survivors.intersect(ids) === Set(label))
    }
  }
}
