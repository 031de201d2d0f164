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

  test("substring dedup: coverage math on a hand fixture") {
    import spark.implicits._
    // a 10-token run shared by docs 1/2/3 (owner = 1 keeps its copy);
    // doc 4 shares nothing long enough; doc 5 is shorter than the run
    val run = (1 to 10).map(i => s"w$i").mkString(" ")
    val fixture = Seq(
      (1L, s"alpha beta $run gamma"),
      (2L, s"$run delta epsilon zeta"),
      (3L, s"prefix one two three $run"),
      (4L, "w1 w2 w3 w4 unrelated tail of words here now"),
      (5L, "too short")
    ).toDF("doc_id", "text")
    val out = DedupOps.substringDedup(fixture).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // the 10-token run opens 3 shingles of 8; owner doc 1 keeps all
    assert(out(1L) === ((13L, 0L, 1.0)))
    // docs 2 and 3: all 10 run tokens covered by the 3 overlapping shingles
    assert(out(2L)._2 === 10L && out(3L)._2 === 10L)
    assert(out(2L) === ((13L, 10L, math.rint((13.0 - 10) / 13 * 10000) / 10000)))
    assert(out(4L)._2 === 0L)
    assert(out(5L) === ((2L, 0L, 1.0)))
  }

  test("substring dedup: doc-frequency cap drops boilerplate mega-runs") {
    import spark.implicits._
    val boiler = (1 to 8).map(i => s"b$i").mkString(" ")
    val fixture = (1L to 6L).map(id => (id, s"$boiler unique$id"))
      .toDF("doc_id", "text")
    // cap 5 < 6 docs: the boilerplate run is dropped, nothing is covered
    val capped = DedupOps.substringDedup(fixture, cap = 5).collect()
    assert(capped.forall(_.getLong(2) === 0L))
    // cap 6: every non-owner doc has its 8 boilerplate tokens covered
    val uncapped = DedupOps.substringDedup(fixture, cap = 6).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(uncapped(1L) === 0L)
    (2L to 6L).foreach(id => assert(uncapped(id) === 8L, s"doc $id"))
  }

  test("substring batch probe equals full rebuild restricted to the batch, for an arbitrary split") {
    import org.apache.spark.sql.functions._
    // universe = even corpus + a mod-4 arriving batch (NOT the parity
    // split the gated query uses): the probe's combined df/owner math
    // must reproduce the from-scratch computation on that universe
    val batch = docs.where(pmod(col("doc_id"), lit(4)) === 1)
    val universe = docs.where(
      pmod(col("doc_id"), lit(2)) === 0 || pmod(col("doc_id"), lit(4)) === 1)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    val full = DedupOps.substringDedup(universe).collect()
      .filter(_.getLong(0) % 4 == 1).map(key).toSeq
    val probed = DedupOps.substringDedupBatch(batch, docs, TestSpark.Sf0001)
      .collect().map(key).toSeq
    assert(full.exists(_._3 > 0), "fixture should contain cross-document runs")
    assert(probed === full)
  }

  test("minhash rows stay independent under a tiny-hash shingle (100x regression)") {
    // the old (2j+1)x + j^2 + 7 family is monotone in x per row, so a
    // shingle whose base hash lands near zero wins EVERY row's
    // minimum at once: a J=0.9 pair differing by exactly that shingle
    // had zero band collisions on the 100x gate (odds ~1e-23 under
    // min-wise independent rows). Reconstruct the pathology and
    // assert per-row agreement tracks J.
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.types.UTF8String
    val P = graft.operators.DedupOps.P
    def xm(s: String): Long = {
      val u = UTF8String.fromString(s)
      val x = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      ((x % P) + P) % P
    }
    // deterministic search for an adversarial shingle: base hash
    // within 50k of zero (~1 in 20k strings)
    val tiny = Iterator.from(0).map(i => s"tiny$i").find(xm(_) < 50000L).get
    val base = (0 until 30).map(i => s"shingle body number $i")
    def sig(xs: Seq[String]): Seq[Long] = {
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      import org.apache.spark.sql.types.{ArrayType, StringType}
      graft.functions.expressions.MinHashSignature(
        Literal.create(new GenericArrayData(xs.map(UTF8String.fromString).toArray),
          ArrayType(StringType)),
        graft.operators.DedupOps.NumHashes, P)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq
    }
    val withTiny = sig(base :+ tiny)
    val without = sig(base)
    val agree = withTiny.zip(without).count { case (a, b) => a == b }
    // E[agreement] = J * rows = (30/31) * 64 ≈ 62; the old family
    // scored ~0 here. 40 is a >10-sigma floor.
    assert(agree >= 40,
      s"tiny-hash shingle '$tiny' collapsed row independence: $agree/64 rows agree")
  }

  test("substring excise: cleaned text drops exactly the covered tokens") {
    import spark.implicits._
    val run = (1 to 10).map(i => s"w$i").mkString(" ")
    val fixture = Seq(
      (1L, s"alpha beta $run gamma"),
      (2L, s"$run delta epsilon zeta"),
      (3L, s"prefix one two three $run"),
      (4L, "w1 w2 w3 w4 unrelated tail of words here now"),
      (5L, s"$run exactdup"), // whole doc minus 1 token is the run
      (6L, s"$run exactdup")  // exact dup of 5 -> excises to NOTHING
    ).toDF("doc_id", "text")
    val out = DedupOps.substringExcise(fixture).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // owner keeps everything, non-owners lose the run but keep their
    // own words in original order
    assert(out(1L) === ((13L, 13L, s"alpha beta $run gamma")))
    assert(out(2L) === ((13L, 3L, "delta epsilon zeta")))
    assert(out(3L) === ((14L, 4L, "prefix one two three")))
    assert(out(4L)._3 === "w1 w2 w3 w4 unrelated tail of words here now")
    // doc 5's w1..w10 tokens are owned by doc 1's family, but the
    // run crossing into "exactdup" is owned by 5 — so 5 keeps exactly
    // that token; 6 (exact dup of 5) excises to the empty row, which
    // must still be present
    assert(out(5L) === ((11L, 1L, "exactdup")))
    assert(out(6L) === ((11L, 0L, "")))
    // consistency with the coverage metric: kept == n_tokens - dup
    val cov = DedupOps.substringDedup(fixture).collect()
      .map(r => r.getLong(0) -> (r.getLong(1) - r.getLong(2))).toMap
    out.foreach { case (id, (_, kept, _)) =>
      assert(cov(id) === kept, s"doc $id kept/coverage mismatch")
    }
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
