package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SimilarityOps

/** Round-16 ANN quality surface: the composed IVF-PQ family's move to
  * the trained codebook + deeper rerank, the IVFADC A/B, and the
  * recall-vs-nprobe tuning curve. These pin the CLAIMS the scaladocs
  * make (ordering and threshold relations between measured recalls),
  * not the raw numbers — the registry hash gates pin those.
  */
class Round16AnnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def q(name: String): DataFrame =
    Queries.queries(name)(spark, TestSpark.Sf0001)

  private def recallOf(df: DataFrame): Double =
    df.collect().head.getAs[Double]("recall")

  test("composed IVF-PQ recall stays within the routing tax of trained-PQ") {
    // the composed index probes nprobe/K of the corpus where the
    // full-scan trained-PQ row sees everything, so "composed >= the
    // trained-PQ bar" (the round-16 target, 0.63 vs 0.61 at the
    // sf0.01 gate) is corpus-dependent; the invariant worth pinning
    // is that routing costs at most a few points on TOP of the same
    // quantizer, and that the composed row stays a working index
    val composed = recallOf(q("ann_ivfpq_recall_eval"))
    val trainedPq = recallOf(q("ann_pq_trained_recall_eval"))
    assert(composed >= trainedPq - 0.05,
      s"composed $composed fell past the routing-tax bound of " +
        s"full-scan trained-PQ $trainedPq")
    assert(composed >= 0.6, s"regression guard: composed recall $composed")
  }

  test("IVFADC A/B: residual encoding loses on this corpus, as documented") {
    val adc = recallOf(q("ann_ivfadc_recall_eval"))
    val raw = recallOf(q("ann_ivfpq_recall_eval"))
    assert(adc <= raw,
      s"unit-norm near-uniform embeddings: residual ($adc) <= raw ($raw)")
    assert(adc >= 0.4, s"ADC must still be a working index, got $adc")
  }

  test("nprobe sweep is monotone per method and flat-IVF dominates IVF-PQ") {
    val rows = q("ann_recall_nprobe_sweep").collect()
      .map(r => (r.getAs[String]("method"), r.getAs[Long]("nprobe"),
        r.getAs[Double]("recall")))
    assert(rows.length === 8)
    for (m <- Seq("ivf", "ivfpq")) {
      val curve = rows.filter(_._1 == m).sortBy(_._2).map(_._3)
      assert(curve.zip(curve.tail).forall { case (a, b) => a <= b },
        s"$m recall must be non-decreasing in nprobe: ${curve.mkString(",")}")
    }
    val byNp = rows.groupBy(_._2)
    byNp.foreach { case (np, rs) =>
      val ivf = rs.find(_._1 == "ivf").get._3
      val pq = rs.find(_._1 == "ivfpq").get._3
      assert(ivf >= pq, s"nprobe=$np: exact in-list scoring ($ivf) must " +
        s"dominate quantized candidate generation ($pq)")
    }
  }

  test("NSW graph walk out-recalls the routed families (its reason to exist)") {
    val nsw = recallOf(q("ann_nsw_recall_eval"))
    val ivfpq = recallOf(q("ann_ivfpq_recall_eval"))
    assert(nsw >= ivfpq,
      s"exact-scored beam walk ($nsw) must beat quantized routing ($ivfpq)")
    assert(nsw >= 0.9,
      s"regression guard: nsw recall $nsw (0.98 at sf0.001, 0.94 at " +
        "sf0.01 under the adaptive-K build at the beam-32 default; " +
        "the beam sweep prices the 0.77/0.59 cheaper walks)")
  }

  test("NSW adjacency is bounded by 2 x mods x G edges per vector") {
    import graft.operators.SimilarityOps
    val emb = Tables.embeddings(spark, TestSpark.Sf0001)
    val n = emb.count()
    val edges = SimilarityOps.nswEdges(emb, SimilarityOps.NswMods)
    assert(edges.count() <=
      2L * SimilarityOps.NswMods.size * SimilarityOps.NswG * n,
      "symmetrized union of per-mod top-G lists")
    // symmetry: every edge has its reverse
    val asym = edges.as("e").join(
      edges.select(org.apache.spark.sql.functions.col("dst").as("src"),
        org.apache.spark.sql.functions.col("src").as("dst")).as("r"),
      Seq("src", "dst"), "left_anti").count()
    assert(asym === 0L, "adjacency must be undirected")
  }

  test("NSW delete leg never returns a tombstoned vertex") {
    import graft.operators.SimilarityOps
    val dead = q("ann_nsw_delete").collect()
      .map(_.getAs[Long]("vec_id"))
      .count(v => v % SimilarityOps.IvfDeleteMod == SimilarityOps.IvfDeleteRes)
    assert(dead === 0)
  }

  test("IVFADC returns the k x probes result contract of the composed family") {
    val adc = q("ann_ivfadc").collect()
    val pq = q("ann_ivfpq").collect()
    assert(adc.length === pq.length)
    assert(adc.map(_.schema.fieldNames.toSeq).distinct ===
      pq.map(_.schema.fieldNames.toSeq).distinct)
  }
}
