package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupOps

/** Scale-up consistency: replicate the corpus 5x (distinct doc_ids)
  * and check the MinHash+LSH path produces EXACTLY the predictable
  * result — every copy of every original near-dup pair, plus all
  * C(5,2) identical-copy pairs per document. This exercises the
  * candidate-generation fan-out (dense buckets of identical
  * signatures) that a grown corpus creates, not just the small
  * fixture shape.
  */
class DedupScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("minhash dedup is copy-consistent on a 5x replicated corpus") {
    val copies = 5
    val shift = 10000000L
    val base = Tables.documents(spark, TestSpark.Sf0001)
    val big = (0 until copies)
      .map(i => base.withColumn("doc_id", col("doc_id") + lit(i * shift)))
      .reduce(_ unionAll _)

    val basePairs = DedupOps.nearDupJaccard(base).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val nDocs = base.count()

    val got = DedupOps.nearDupMinhash(big).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val expected = scala.collection.mutable.Set.empty[(Long, Long, Double)]
    // identical-copy pairs: jac 1.0 between every pair of copies
    base.select("doc_id").collect().map(_.getLong(0)).foreach { id =>
      for (i <- 0 until copies; j <- (i + 1) until copies)
        expected += ((id + i * shift, id + j * shift, 1.0))
    }
    // every copy-combination of every original near-dup pair
    basePairs.foreach { case (a, b, jac) =>
      for (i <- 0 until copies; j <- 0 until copies) {
        val (x, y) = (a + i * shift, b + j * shift)
        expected += (if (x < y) (x, y, jac) else (y, x, jac))
      }
    }

    assert(got.size === expected.size,
      s"pair count: got ${got.size}, expected ${expected.size} " +
        s"(${nDocs} docs x C($copies,2) + ${basePairs.length} base pairs x $copies^2)")
    assert(got === expected.toSet)
  }

  test("simhash pairing is copy-consistent on a replicated corpus") {
    val copies = 3
    val shift = 10000000L
    val base = Tables.documents(spark, TestSpark.Sf0001)
    val big = (0 until copies)
      .map(i => base.withColumn("doc_id", col("doc_id") + lit(i * shift)))
      .reduce(_ unionAll _)
    val basePairs = DedupOps.simhashDup(base).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // identical copies pair at hamming 0 (only docs that HAVE a
    // signature — empty-token docs are excluded upstream)
    val sigIds = DedupOps.simhash(base).collect().map(_.getLong(0))
    val expected = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    sigIds.foreach { id =>
      for (i <- 0 until copies; j <- (i + 1) until copies)
        expected += ((id + i * shift, id + j * shift, 0L))
    }
    basePairs.foreach { case (a, b, h) =>
      for (i <- 0 until copies; j <- 0 until copies) {
        val (x, y) = (a + i * shift, b + j * shift)
        expected += (if (x < y) (x, y, h) else (y, x, h))
      }
    }
    val got = DedupOps.simhashDup(big).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
  }

  test("pathological LSH bucket is capped without disturbing normal pairs") {
    val base = Tables.documents(spark, TestSpark.Sf0001)
    val basePairs = DedupOps.nearDupJaccard(base).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val inPairs = basePairs.flatMap(p => Set(p._1, p._2))
    // clone a document that has NO near-dup partner, so the dense
    // cluster's buckets are disjoint from every legitimate pair's
    val loner = base.select("doc_id").collect().map(_.getLong(0))
      .filterNot(inPairs).min
    val cloneBase = 20000000L
    val clones = (1 to 8)
      .map(i => base.where(col("doc_id") === loner)
        .withColumn("doc_id", lit(cloneBase + i)))
      .reduce(_ unionAll _)
    val big = base.unionAll(clones)

    // cap below the 9-doc identical cluster: its buckets are dropped
    // in every band, so the cluster contributes nothing — and normal
    // pairs (tiny buckets) are untouched
    val capped = DedupOps.nearDupMinhash(big, maxBucket = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(capped === basePairs)

    // default cap admits the cluster: all C(9,2) identical pairs at 1.0
    val clusterIds = loner +: (1 to 8).map(cloneBase + _)
    val clusterPairs = (for {
      i <- clusterIds.indices; j <- (i + 1) until clusterIds.size
      a = math.min(clusterIds(i), clusterIds(j))
      b = math.max(clusterIds(i), clusterIds(j))
    } yield (a, b, 1.0)).toSet
    val uncapped = DedupOps.nearDupMinhash(big).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(uncapped === (basePairs ++ clusterPairs))
  }
}
