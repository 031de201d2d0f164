package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupOps

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val docs = Tables.documents(spark, TestSpark.Sf0001).cache()

  test("minhash+verify equals exact jaccard join") {
    val exact = DedupOps.nearDupJaccard(docs).collect().toSet
    val lsh = DedupOps.nearDupMinhash(docs).collect().toSet
    assert(exact.nonEmpty, "fixture should contain near-duplicate documents")
    assert(lsh === exact)
  }

  test("exact dedup groups are disjoint and cover all docs") {
    val total = docs.count()
    val groups = DedupOps.exactDedup(docs).collect()
    assert(groups.map(_.getLong(1)).sum === total)
  }

  test("incremental dedup: batch survivors are unseen by the corpus and collapsed") {
    import org.apache.spark.sql.functions._
    val survivors = DedupOps.incrementalDedup(docs).collect()
    assert(survivors.nonEmpty)
    val corpusFps = docs.where(pmod(col("doc_id"), lit(2)) === 0)
      .select(md5(lower(col("text")))).collect().map(_.getString(0)).toSet
    val batchIds = docs.where(pmod(col("doc_id"), lit(2)) === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // no survivor digest exists in the corpus; every keeper is a
    // batch doc; survivor digests are unique (within-batch collapse)
    val fps = survivors.map(_.getString(2))
    assert(fps.forall(fp => !corpusFps.contains(fp)))
    assert(survivors.map(_.getLong(0)).forall(batchIds.contains))
    assert(fps.distinct.length === fps.length)
  }

  test("incremental near-dedup equals full-rebuild LSH restricted to batch-endpoint pairs") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    val full = DedupOps.nearDupMinhash(docs).collect()
      .filter(r => r.getLong(0) % 2 == 1 || r.getLong(1) % 2 == 1)
      .map(key).toSeq
    val inc = DedupOps.incrementalNearDedup(docs, TestSpark.Sf0001)
      .collect().map(key).toSeq
    assert(full.nonEmpty, "fixture should contain batch-endpoint near-dup pairs")
    assert(inc === full)
  }

  test("incremental near-dedup combined-bucket cap matches the full-rebuild count window") {
    // the incremental form's stored-count + batch-count criterion
    // must gate exactly the bands the full rebuild's count window
    // gates, at every cap — including caps tight enough to bite
    // (cap=1 admits no pair at all, so the bite is guaranteed)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    def restricted(rows: Array[org.apache.spark.sql.Row]) = rows
      .filter(r => r.getLong(0) % 2 == 1 || r.getLong(1) % 2 == 1)
      .map(key).toSeq
    val uncapped = restricted(DedupOps.nearDupMinhash(docs).collect())
    assert(uncapped.nonEmpty)
    var someCapBites = false
    for (cap <- Seq(1, 3)) {
      val full = restricted(DedupOps.nearDupMinhash(docs, maxBucket = cap).collect())
      val inc = DedupOps.incrementalNearDedup(docs, TestSpark.Sf0001, maxBucket = cap)
        .collect().map(key).toSeq
      assert(inc === full, s"cap=$cap: incremental != full rebuild")
      if (full.size < uncapped.size) someCapBites = true
    }
    assert(someCapBites, "no tested cap dropped a pair — the cap path went untested")
  }

  test("simhash is stable and near-dup pairs agree on most bits") {
    val sh = DedupOps.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = DedupOps.nearDupJaccard(docs).collect()
    assert(sh.nonEmpty)
    // near-dup docs should have close simhashes (hamming <= 6 of 20 bits)
    pairs.foreach { r =>
      val h = java.lang.Long.bitCount(sh(r.getLong(0)) ^ sh(r.getLong(1)))
      assert(h <= 6, s"pair ${r.getLong(0)},${r.getLong(1)} hamming $h")
    }
  }
}
