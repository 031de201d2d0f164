package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{EventsOps, LayoutOps, RelationalOps, ResolutionOps, TextAnalysisOps}

/** Round-14 wave B: entity resolution, attribution, interpolation,
  * path mining, SCD2 point-in-time, compaction. Semantics plus the
  * plan shapes that make each one survive 100 TB.
  */
class Round14WaveBSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def sf = TestSpark.Sf0001

  test("fuzzyPartPairs: blocked equi-join, never a cartesian/nested-loop " +
    "verify, and every pair respects block + distance") {
    val pairs = ResolutionOps.fuzzyPartPairs(Tables.part(spark, sf))
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"edit-distance verify must run inside hash-join blocks:\n$plan")
    val rows = pairs.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b, d) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(a < b)
      val (ta, tb) = (a.split(" "), b.split(" "))
      assert(ta.head === tb.head || ta.last === tb.last,
        "pair shares neither blocking key (first/last token)")
      assert(d >= 1 && d <= ResolutionOps.MaxEditDistance)
    }
  }

  test("fuzzyCanonicalParts: canonicals are a subset of names, every part " +
    "is counted exactly once, and canon <= all names it absorbs") {
    val part = Tables.part(spark, sf)
    val res = ResolutionOps.fuzzyCanonicalParts(part).collect()
    assert(res.map(_.getLong(2)).sum === part.count())
    val canons = res.map(_.getString(0)).toSet
    val names = part.select("p_name").distinct().collect().map(_.getString(0)).toSet
    assert(canons.subsetOf(names))
  }

  test("attributionLastTouch: one exchange on user_id; purchases before " +
    "any click are organic; attributed gap is non-negative") {
    val att = EventsOps.attributionLastTouch(Tables.events(spark, sf))
    val plan = att.queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 1, s"expected the single user_id window exchange:\n$plan")
    val rows = att.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val organic = r.getString(5) == "organic"
      assert(organic == r.isNullAt(3))
      if (!organic) assert(r.getLong(4) > 0L, "click must strictly precede")
    }
  }

  test("interpolateDaily: observed days keep their value, interpolated " +
    "days sit between (or clamp to) their neighbors, spine is dense") {
    val res = EventsOps.interpolateDaily(Tables.events(spark, sf)).collect()
    val byUser = res.groupBy(_.getLong(0))
    val nDays = res.map(_.getString(1)).distinct.length
    byUser.foreach { case (_, rs) =>
      assert(rs.length === nDays, "per-user spine must cover every day")
      val vals = rs.map(_.getLong(2))
      rs.sliding(3).foreach { w =>
        if (w.length == 3 && w(1).getString(3) == "interp") {
          // a single interpolated day between two bounds lies between them
          val (a, m, b) = (w(0).getLong(2), w(1).getLong(2), w(2).getLong(2))
          if (w(0).getString(3) == "obs" && w(2).getString(3) == "obs")
            assert(m >= math.min(a, b) - 1 && m <= math.max(a, b) + 1)
        }
      }
      assert(vals.forall(_ >= 0L))
    }
  }

  test("trigramPaths: counts sum to the exact number of length-3 windows") {
    val events = Tables.events(spark, sf)
    val res = EventsOps.trigramPaths(events).collect()
    val perUser = events.groupBy("user_id").count().collect()
      .map(r => math.max(0L, r.getLong(1) - 2)).sum
    assert(res.map(_.getLong(3)).sum === perUser)
    assert(res.length <= 125, "result domain is |types|^3")
  }

  test("scd2PointInTime: epoch 0 reads only pre-merge segments; the " +
    "post-merge epoch sees the inserted keys' orders excluded (no " +
    "orders reference inserted custkeys) and changed keys' new segs") {
    val res = RelationalOps.scd2PointInTime(
      Tables.customer(spark, sf), Tables.orders(spark, sf))
    val rows = res.collect()
    assert(rows.map(_.getLong(1)).toSet === Set(0L, 1L))
    // epoch 0 predates the merge: no SEG_* (update-batch) segments
    assert(!rows.exists(r => r.getLong(1) == 0L && r.getString(0).startsWith("SEG_")))
    // epoch 1 must contain at least one updated segment
    assert(rows.exists(r => r.getLong(1) == 1L && r.getString(0).startsWith("SEG_")))
    // every order lands in exactly one version per epoch: totals match
    val orders = Tables.orders(spark, sf)
    val withCust = orders.join(
      Tables.customer(spark, sf).select(col("c_custkey").as("o_custkey")),
      Seq("o_custkey")).count()
    assert(rows.map(_.getLong(2)).sum === withCust)
  }

  test("rollingActiveUsers: dau <= wau <= sum of window dau; first day " +
    "wau == dau (partial trailing window); no day-range join in plan") {
    val res = EventsOps.rollingActiveUsers(Tables.events(spark, sf))
    // the max-day clip is a 1-row broadcast; the window itself must
    // never appear as a day-range (cartesian) join
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"the trailing window must be the contribute-forward explode:\n$plan")
    val rows = res.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) <= r.getLong(2),
      s"day ${r.getString(0)}: dau > wau"))
    assert(rows.head.getLong(1) === rows.head.getLong(2),
      "the first day's trailing window contains only itself")
  }

  test("sourceVocabOverlap: symmetric-complete pair domain, jaccard " +
    "bounds, and n_common <= min(n_a, n_b)") {
    val res = TextAnalysisOps.sourceVocabOverlap(Tables.documents(spark, sf))
      .collect()
    val sources = Tables.documents(spark, sf)
      .select("source").distinct().count().toInt
    assert(res.length === sources * (sources - 1) / 2)
    res.foreach { r =>
      val (na, nb, common, j) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(common <= math.min(na, nb))
      assert(j > 0.0 && j <= 1.0)
    }
  }

  test("streamedAttribution: the time-split staged replay equals the " +
    "batch window row-for-row, and at least one phase-2 purchase is " +
    "attributed to a phase-1 click (state survived the restart)") {
    val dir = graft.streaming.EventStreams
      .streamedAttributionLayout(spark, sf)
    val streamed = spark.read.parquet(dir)
      .select("purchase_id", "user_id", "value", "click_id", "gap_ms", "src")
      .collect().map(_.toString).sorted
    val batch = EventsOps.attributionLastTouch(Tables.events(spark, sf))
      .select(col("purchase_id"), col("user_id"), col("value"),
        col("click_id"), col("gap_ms"), col("src"))
      .collect().map(_.toString).sorted
    assert(streamed.nonEmpty)
    assert(streamed === batch)
    // cross-restart carry: a purchase whose attributing click happened
    // before the split boundary while the purchase happened after it
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), expr("ts div 1000000").as("ms")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mid = ev.values.min + (ev.values.max - ev.values.min) / 2
    val crossed = spark.read.parquet(dir)
      .where(col("src") === "click").collect()
      .exists(r => ev(r.getLong(0)) >= mid && ev(r.getLong(3)) < mid)
    assert(crossed, "no attribution crossed the restart boundary — " +
      "the state-carry leg proved nothing")
  }

  test("compaction: the compacted layout has the declared file count, " +
    "fewer files than the fragmented one, tight shipdate clustering, " +
    "and byte-identical content") {
    val li = Tables.lineitem(spark, sf)
    val dir = LayoutOps.compactedLayoutDir(li, sf)
    def parquets(d: String) =
      new java.io.File(d).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(parquets(dir).length === LayoutOps.CompactedFiles)
    val compacted = spark.read.parquet(dir)
    assert(compacted.count() === li.count())
    // range clustering: per-file shipdate envelopes must not overlap
    val envelopes = compacted
      .select(input_file_name().as("f"), col("l_shipdate").cast("string").as("d"))
      .groupBy("f").agg(min("d").as("lo"), max("d").as("hi"))
      .collect()
      .map(r => (r.getString(1), r.getString(2)))
      .sortBy(_._1)
    envelopes.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2,
        "file envelopes overlap — compaction did not cluster")
      case _ =>
    }
  }
}
