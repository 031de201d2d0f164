package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MultimodalOps, ResolutionOps}

/** Round-16 operator wave: Holt level+trend smoothing, perceptual
  * image dedup, and token-reorder entity resolution.
  */
class Round16OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def q(name: String): DataFrame =
    Queries.queries(name)(spark, TestSpark.Sf0001)

  test("Holt: first day of each series is level = x, trend = 0, forecast = x") {
    val rows = q("events_holt_trend").collect()
    val firsts = rows.groupBy(_.getAs[String]("event_type"))
      .values.map(_.minBy(_.getAs[String]("day")))
    assert(firsts.nonEmpty)
    firsts.foreach { r =>
      assert(r.getAs[Double]("level") === r.getAs[Double]("sum_value"))
      assert(r.getAs[Double]("trend") === 0.0)
      assert(r.getAs[Double]("forecast_next") === r.getAs[Double]("level"))
    }
  }

  test("Holt: trend responds to a rising series (second point)") {
    val rows = q("events_holt_trend").collect()
      .filter(r => r.getAs[Double]("trend") != 0.0)
    assert(rows.nonEmpty, "some day must show a nonzero trend")
  }

  test("pHash is deterministic, 63-bit, and zero-distance on identical pixels") {
    val px = Array.tabulate(40 * 20)(i => (i * 37 + 11) % 251)
    val h1 = MultimodalOps.pHash63(px, 40, 20)
    val h2 = MultimodalOps.pHash63(px.clone(), 40, 20)
    assert(h1 === h2)
    assert(h1 >= 0L, "DC bit dropped, hash must stay in 63 bits")
    // a small perturbation moves few bits; an unrelated grid moves many
    val near = px.clone(); near(5) = (near(5) + 3) % 251
    val far = Array.tabulate(40 * 20)(i => (i * 101 + 7) % 241)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h1, MultimodalOps.pHash63(near, 40, 20)) <
      ham(h1, MultimodalOps.pHash63(far, 40, 20)))
  }

  test("image_phash_dup pairs are symmetric-free and within the hamming bound") {
    val rows = q("image_phash_dup").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("a_id") < r.getAs[Long]("b_id"))
      assert(r.getAs[Long]("hamming") <= MultimodalOps.PhashMaxHamming)
    }
  }

  test("reorder recall: positional blocking misses the class, sorted-set closes it") {
    val rows = q("fuzzy_recall_eval").collect()
      .map(r => (r.getAs[String]("strategy"), r.getAs[String]("pair_class")) ->
        r.getAs[Double]("recall")).toMap
    assert(rows(("first_last_union", "reorder")) === 0.0,
      "both positional keys move under permutation")
    assert(rows(("sorted_set_union", "reorder")) === 1.0,
      "the sorted-set key is permutation-invariant by construction")
    assert(rows(("sorted_set_union", "typo")) >=
      rows(("first_last_union", "typo")),
      "adding a key can only widen typo recall")
  }

  test("every reversed catalog name resolves back at Jaccard 1.0") {
    val resolved = q("fuzzy_reorder_resolve").collect()
    assert(resolved.nonEmpty)
    val perfect = resolved.filter(_.getAs[Double]("jaccard") == 1.0)
      .map(r => (r.getAs[String]("dirty_name"), r.getAs[String]("resolved_name")))
    perfect.foreach { case (d, res) =>
      assert(d.split(" ").sorted.toSeq === res.split(" ").sorted.toSeq)
    }
    // the class is invisible to the edit-distance verifier for names
    // whose reversal moves more than the band
    assert(resolved.exists(_.getAs[Long]("dist") == -1L) ||
      resolved.forall(_.getAs[Long]("dist") >= -1L))
  }

  test("ResolutionOps.JaccardMinSim rejects the single-shared-token accident") {
    // two 2-token names sharing one token: jaccard 1/3 < 0.5
    assert(1.0 / 3.0 < ResolutionOps.JaccardMinSim)
  }
}
