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

  test("IVFADC returns the k x probes result contract of the composed family") {
    val adc = q("ann_ivfadc").collect()
    val pq = q("ann_ivfpq").collect()
    assert(adc.length === pq.length)
    assert(adc.map(_.schema.fieldNames.toSeq).distinct ===
      pq.map(_.schema.fieldNames.toSeq).distinct)
  }
}
