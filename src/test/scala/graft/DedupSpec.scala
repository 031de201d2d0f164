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

  test("combined-bucket cap at exact bucket-size boundaries (±1) matches full rebuild") {
    // The subtlest steady-state logic is the kept-band criterion
    // `coalesce(corpus_n, 0) + batch_n <= maxBucket`: it must flip a
    // band at EXACTLY the same population the full rebuild's count
    // window flips it. Derive real bucket populations from the
    // fixture's own banding (same bandsOf the engine uses) and test
    // caps sitting exactly ON a populated size and one below it, so
    // the <= boundary itself is exercised — not just the 1/3/∞ caps.
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    def restricted(rows: Array[org.apache.spark.sql.Row]) = rows
      .filter(r => r.getLong(0) % 2 == 1 || r.getLong(1) % 2 == 1)
      .map(key).toSeq
    val bandRows = DedupOps.bandsOf(DedupOps.docShingles(docs))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byBand = bandRows.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    // bands that can emit a batch-endpoint pair: >=2 docs, >=1 odd
    val pairCapable = byBand.filter { case (_, ids) =>
      ids.length >= 2 && ids.exists(_ % 2 == 1)
    }
    assert(pairCapable.nonEmpty, "fixture has no batch-occupied multi-doc band")
    val sizes = pairCapable.values.map(_.length).toSeq.distinct.sorted
    // brand-new-bucket edge: a band the arriving batch creates from
    // nothing (no even/corpus member -> corpus_n is NULL in the index
    // left join; the coalesce(...,0) path). The fixture's duplicate
    // pairs among odd docs must produce at least one.
    val batchOnly = pairCapable.filter { case (_, ids) => ids.forall(_ % 2 == 1) }
    assert(batchOnly.nonEmpty,
      "no batch-only multi-doc band in fixture — coalesce(corpus_n,0) path untested")
    val boundaryCaps =
      (Seq(sizes.head, sizes.last) ++ batchOnly.values.map(_.length))
        .flatMap(p => Seq(p - 1, p)).filter(_ >= 1).distinct.sorted
    for (cap <- boundaryCaps) {
      val full = restricted(DedupOps.nearDupMinhash(docs, maxBucket = cap).collect())
      val inc = DedupOps.incrementalNearDedup(docs, TestSpark.Sf0001, maxBucket = cap)
        .collect().map(key).toSeq
      assert(inc === full, s"boundary cap=$cap: incremental != full rebuild")
    }
    // the boundary must actually flip something across SOME tested ±1
    // step, or the caps all landed outside the populated range
    val pairSets = boundaryCaps.map(c =>
      c -> restricted(DedupOps.nearDupMinhash(docs, maxBucket = c).collect()).toSet)
    assert(pairSets.sliding(2).exists {
      case Seq((_, a), (_, b)) => a != b
      case _ => false
    }, "no ±1 cap step changed the pair set — boundary never exercised")
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
