package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{EventsOps, PipelineOps, RelationalOps}

/** Invariants of the corpus-pipeline and new relational operators,
  * each checked against an independently-computed naive formulation
  * on the sf0.001 fixture.
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("clean pipeline survivors are deduped and pass the gate") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val out = PipelineOps.cleanCorpus(docs).collect()
    assert(out.nonEmpty && out.length < docs.count())
    // dedup: surviving doc_ids unique; every survivor meets the gate
    val ids = out.map(_.getLong(0))
    assert(ids.distinct.length === ids.length)
    assert(out.forall(_.getLong(2) >= 5))          // n_tokens gate
    assert(out.forall(_.getLong(3) >= 1))          // n_copies
    // copies accounted: total gated rows == sum of group sizes
    val survivorsPlusCopies = out.map(_.getLong(3)).sum
    assert(survivorsPlusCopies >= out.length)
  }

  test("dataset split partitions the corpus deterministically") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val out = PipelineOps.datasetSplit(docs).collect()
    assert(out.map(_.getLong(2)).sum === docs.count())
    assert(out.map(_.getString(1)).toSet.subsetOf(Set("train", "val", "test")))
    // deterministic: a second run is identical
    val again = PipelineOps.datasetSplit(docs).collect()
    assert(out.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("clean pipeline is replication-consistent") {
    // duplicate the corpus under shifted ids: every fingerprint group
    // doubles its copy count, the surviving doc stays the original
    // (smaller id), and the group count is unchanged — dedup behaves
    // identically on a denser corpus
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val shifted = docs.withColumn("doc_id", col("doc_id") + lit(1000000L))
    val base = PipelineOps.cleanCorpus(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val doubled = PipelineOps.cleanCorpus(docs.unionByName(shifted)).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(doubled.keySet === base.keySet)
    base.foreach { case (id, copies) => assert(doubled(id) === 2 * copies) }
  }

  test("contamination check doubles with a replicated corpus side") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val shifted = docs.where(col("doc_id") >= 20)
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
    val base = PipelineOps.contaminationCheck(docs).count()
    val doubled = PipelineOps.contaminationCheck(docs.unionByName(shifted)).count()
    assert(doubled === 2 * base)
  }

  test("binned range join equals the naive theta join") {
    val part = Tables.part(spark, TestSpark.Sf0001)
    val lineitem = Tables.lineitem(spark, TestSpark.Sf0001)
    val naive = part.where(col("p_size") === 1)
      .select(col("p_partkey"), (col("p_retailprice") * 0.9).as("lo"),
        (col("p_retailprice") * 1.1).as("hi"))
      .crossJoin(lineitem.select(col("l_extendedprice")))
      .where(col("l_extendedprice") >= col("lo") && col("l_extendedprice") <= col("hi"))
      .groupBy("p_partkey").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val binnedByKey = RelationalOps.rangeJoinBinned(part, lineitem).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(binnedByKey === naive)
  }

  test("q6 aggregate equals the filtered scan") {
    val lineitem = Tables.lineitem(spark, TestSpark.Sf0001)
    val row = RelationalOps.q6Forecast(lineitem).collect().head
    val n = lineitem.where(
      col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24).count()
    assert(row.getLong(1) === n)
  }

  test("pivot rows sum to yearly order counts") {
    val orders = Tables.orders(spark, TestSpark.Sf0001)
    val out = RelationalOps.ordersPivot(orders).collect()
    val perYear = orders.groupBy(year(col("o_orderdate")).cast("long").as("yr"))
      .count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) + r.getLong(3) === perYear(r.getLong(0)))
    }
  }

  test("grouping sets contain exactly the declared sets") {
    val ev = Tables.events(spark, TestSpark.Sf0001)
    val out = EventsOps.groupingSetsDaily(ev).collect()
    // every row has at least one ALL side (no (type, day) cross rows)
    assert(out.forall(r => r.getString(0) == "ALL" || r.getString(1) == "ALL"))
    // the grand total row equals the event count
    val grand = out.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(grand.length === 1 && grand.head.getLong(2) === ev.count())
    // per-type rows roll up to the grand total
    val perType = out.filter(r => r.getString(0) != "ALL").map(_.getLong(2)).sum
    assert(perType === grand.head.getLong(2))
  }

  test("doc chunks cover every token with the declared size/stride/overlap") {
    import graft.operators.PipelineOps.{ChunkSize, ChunkStride}
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val nTokens = graft.operators.TextAnalysisOps.tokenStats(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val chunks = graft.operators.PipelineOps.docChunks(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(chunks.nonEmpty)
    chunks.groupBy(_._1).foreach { case (id, cs) =>
      val n = nTokens(id)
      val sorted = cs.sortBy(_._2)
      // chunk i holds exactly the tokens [i*stride, i*stride + size)
      sorted.foreach { case (_, cid, len, text) =>
        assert(len === math.min(ChunkSize.toLong, n - cid * ChunkStride), s"doc $id chunk $cid")
        assert(text.split(" ").length.toLong === len, s"doc $id chunk $cid")
      }
      // ids are dense from 0 and the last window reaches the last token
      assert(sorted.map(_._2) === (0L until sorted.length).toSeq)
      assert((sorted.length - 1) * ChunkStride < n && n <= (sorted.length - 1) * ChunkStride + math.max(ChunkSize, ChunkStride))
    }
  }

  test("chunk packing reproduces the sequential shelf-packing model") {
    import graft.operators.PipelineOps.PackCapacity
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    // sequential model: walk chunks per lang in (doc_id, chunk_id)
    // order, assign bin = tokens_before / capacity
    val chunks = graft.operators.PipelineOps.docChunks(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(c => (c._1, c._2))
    val langOf = docs.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val model = chunks.groupBy(c => langOf(c._1)).toSeq.flatMap { case (lang, cs) =>
      var cum = 0L
      cs.sortBy(c => (c._1, c._2)).toSeq.map { case (_, _, n) =>
        val bin = cum / PackCapacity; cum += n; (lang, bin) -> n
      }
    }.groupBy(_._1).map { case (k, vs) => k -> ((vs.size.toLong, vs.map(_._2).sum)) }
    val got = graft.operators.PipelineOps.chunkPacking(docs).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got === model)
    // shelf bounds: a non-last bin spans one full capacity stripe,
    // shifted by at most the previous bin's boundary-crossing chunk
    // overhang (< ChunkSize), so its token count sits within
    // capacity ± (ChunkSize − 1)
    import graft.operators.PipelineOps.ChunkSize
    val lastBin = got.keys.groupBy(_._1).map { case (l, ks) => l -> ks.map(_._2).max }
    got.foreach { case ((lang, bin), (_, toks)) =>
      if (bin != lastBin(lang)) {
        assert(toks >= PackCapacity - (ChunkSize - 1), s"$lang bin $bin underfilled")
        assert(toks <= PackCapacity + (ChunkSize - 1), s"$lang bin $bin overfilled")
      }
    }
  }

  test("pii scrub redacts every injected span and nothing else") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val byId = graft.operators.TextAnalysisOps.piiScrub(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val original = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId.size === original.size)
    byId.foreach { case (id, r) =>
      val (scrubbed, nEmail, nPhone) = (r.getString(1), r.getLong(2), r.getLong(3))
      if (id % 10 == 0) {
        assert(nEmail === 1L && nPhone === 1L, s"doc $id")
        assert(scrubbed.endsWith(" contact <EMAIL> or call <PHONE>"), s"doc $id: $scrubbed")
        assert(!scrubbed.contains("@") && !scrubbed.exists(_.isDigit), s"doc $id")
        assert(scrubbed.startsWith(original(id)), s"doc $id: prefix must be untouched")
      } else {
        assert(nEmail === 0L && nPhone === 0L, s"doc $id")
        assert(scrubbed === original(id), s"doc $id: clean text must pass byte-identical")
      }
    }
  }

  test("filter funnel conserves documents stage to stage") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val out = PipelineOps.filterFunnel(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    // stage 1 enters with the whole corpus; every stage conserves
    // docs_in = docs_dropped + docs_out; each stage's out feeds the next
    assert(out.head._3 === docs.count())
    out.foreach { case (st, rule, in, dropped, outN) =>
      assert(in === dropped + outN, s"stage $st ($rule) leaks documents")
      assert(dropped >= 0 && outN >= 0)
    }
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a._5 === b._3, s"stage ${b._1} docs_in != stage ${a._1} docs_out")
    }
  }

  test("filter funnel attributes a pathological row at stage 1") {
    import spark.implicits._
    // empty text: zero tokens -> fails min_tokens; the null-prone
    // downstream gates (ratios with zero denominators) must coalesce
    // to false so the row neither double-counts nor vanishes
    val docs = Seq((1L, "en", ""), (2L, "en", "the of and to a in is it you that was for on are"))
      .toDF("doc_id", "lang", "text")
    val out = PipelineOps.filterFunnel(docs).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out(0) === ((1L, 2L, 1L, 1L)))  // empty doc dropped at min_tokens
    assert(out(4)._4 === 1L)               // the clean doc survives every gate
  }

  test("temperature sample keeps the smallest language whole and flattens the rest") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val out = PipelineOps.temperatureSample(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val counts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.map(_._1).toSet === counts.keySet)
    val nMin = counts.values.min
    out.foreach { case (lang, nTotal, nKept, thr) =>
      assert(nTotal === counts(lang))
      assert(nKept <= nTotal)
      // threshold is exactly floor(1e6 * sqrt(n_min/n_l)); the
      // smallest language's is the full million (keeps everything)
      assert(thr === math.floor(1e6 * math.sqrt(nMin.toDouble / nTotal.toDouble)).toLong)
      if (nTotal == nMin) assert(nKept === nTotal)
    }
    // α = 1/2 flattening: post-sample EXPECTED shares are sqrt-compressed,
    // so the realized max/min imbalance must shrink vs the raw corpus
    val rawImb = counts.values.max.toDouble / nMin
    val kept = out.map(_._3)
    assert(kept.max.toDouble / kept.min < rawImb)
  }

  private def naiveTokens(text: String): Seq[String] =
    text.toLowerCase.split("[ \t\n\r\f]+").toSeq.filter(_.nonEmpty)

  private def det4d(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0

  test("gopher rules equal a naive per-document recompute") {
    import graft.operators.TextAnalysisOps._
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val got = graft.operators.TextAnalysisOps.gopherRules(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val raw = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.keySet === raw.keySet.filter(id => naiveTokens(raw(id)).nonEmpty))
    raw.foreach { case (id, text) =>
      val ws = naiveTokens(text)
      if (ws.nonEmpty) {
        val r = got(id)
        val n = ws.size.toLong
        val meanLen = det4d(ws.map(_.length).sum.toDouble / n)
        val alpha = det4d(ws.count(_.exists(c => c >= 'a' && c <= 'z')).toDouble / n)
        val stopHits = ws.distinct.count(EnStopwords.contains).toLong
        assert(r.getLong(1) === n)
        assert(r.getDouble(2) === meanLen)
        assert(r.getDouble(3) === alpha)
        assert(r.getLong(4) === stopHits)
        assert(r.getLong(5) === (if (n >= GopherMinWords && n <= GopherMaxWords) 1L else 0L))
        assert(r.getLong(6) === (if (meanLen >= GopherMinMeanLen && meanLen <= GopherMaxMeanLen) 1L else 0L))
        assert(r.getLong(7) === (if (alpha >= GopherMinAlphaRatio) 1L else 0L))
        assert(r.getLong(8) === (if (stopHits >= GopherMinStopHits) 1L else 0L))
        assert(r.getLong(9) ===
          (if (Seq(5, 6, 7, 8).forall(i => r.getLong(i) == 1L)) 1L else 0L))
      }
    }
    // the gate must discriminate on this fixture, not emit a constant
    val passes = got.values.map(_.getLong(9)).toSet
    assert(passes === Set(0L, 1L))
  }

  test("mixture schedule is a sqrt-rate stride interleave") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val out = PipelineOps.mixtureSchedule(docs).collect()
    assert(out.length === docs.count())
    val counts = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.size > 1, "fixture needs multiple sources")
    // per source: ranks are exactly 1..n_src, vtime follows the
    // closed form and therefore strictly increases with rank
    out.groupBy(_.getString(1)).foreach { case (src, rows) =>
      val sorted = rows.sortBy(_.getLong(2))
      assert(sorted.map(_.getLong(2)).toSeq === (1L to counts(src)))
      sorted.foreach { r =>
        val expect = (2.0 * r.getLong(2) - 1) / (2.0 * math.sqrt(counts(src).toDouble))
        assert(r.getDouble(3) === expect, s"$src rank ${r.getLong(2)}")
      }
    }
    // interleave rates: before ANY source exhausts (vtime < sqrt of
    // the smallest count), source s has emitted floor(v*sqrt(n_s)+0.5)
    // docs — occurrence rate proportional to sqrt(n_s), the whole
    // point of the stride construction
    val vCut = math.sqrt(counts.values.min.toDouble) * 0.9
    val prefixCounts = out.filter(_.getDouble(3) < vCut)
      .groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    counts.foreach { case (src, nSrc) =>
      val expect = math.floor(vCut * math.sqrt(nSrc.toDouble) + 0.5).toLong
      val got = prefixCounts.getOrElse(src, 0L)
      assert(math.abs(got - expect) <= 1L,
        s"$src: $got docs before vtime $vCut, stride predicts $expect")
    }
    // the schedule order is the (vtime, source, doc_id) sort
    val keys = out.map(r => (r.getDouble(3), r.getString(1), r.getLong(0)))
    assert(keys.sameElements(keys.sorted))
  }

  test("dsir weights equal a naive hashed-ngram importance recompute") {
    import PipelineOps.{DsirBuckets, DsirSmooth, ProbeMaxId}
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val raw = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def bucket(w: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % DsirBuckets
    }
    val tgtCnt = new scala.collection.mutable.HashMap[Long, Long]().withDefaultValue(0L)
    val rawCnt = new scala.collection.mutable.HashMap[Long, Long]().withDefaultValue(0L)
    raw.foreach { case (id, text) =>
      val m = if (id < ProbeMaxId) tgtCnt else rawCnt
      naiveTokens(text).foreach(w => m(bucket(w)) += 1)
    }
    val (tt, tr) = (tgtCnt.values.sum.toDouble, rawCnt.values.sum.toDouble)
    val smB = DsirSmooth * DsirBuckets
    def lr(b: Long): Double =
      math.log(((tgtCnt(b) + DsirSmooth) / (tt + smB)) /
        ((rawCnt(b) + DsirSmooth) / (tr + smB)))
    val got = PipelineOps.dsirWeights(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val expected = raw.collect { case (id, text) if id >= ProbeMaxId =>
      val tf = naiveTokens(text).groupBy(bucket).map { case (b, g) => b -> g.size.toLong }
      val w = det4d(tf.toSeq.sortBy(_._1).map { case (b, f) => f.toDouble * lr(b) }.sum)
      id -> (naiveTokens(text).size.toLong, w)
    }
    assert(got.keySet === expected.keySet)
    expected.foreach { case (id, (n, w)) =>
      val r = got(id)
      assert(r._1 === n, s"doc $id n_tokens")
      assert(r._2 === w, s"doc $id weight")
    }
    // weights must vary — a constant weight means the hash or the
    // model collapsed
    assert(expected.values.map(_._2).toSet.size > 1)
  }
}
