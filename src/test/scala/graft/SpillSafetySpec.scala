package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Memory-safety audit for the window-heavy paths (VERDICT r7 item
  * 5): the skew fixture proves hot groups stay FAST; this proves they
  * stay CORRECT when they cannot stay in memory. WindowExec buffers
  * one partition group at a time — sessionize/funnel buffer a user's
  * events, the dedup band cap buffers a bucket — so a hot key's group
  * is the OOM candidate at 100 TB. Forcing the window buffer to spill
  * after a handful of rows makes fixture-scale groups take the same
  * external-sorter path a monster group takes at scale; results must
  * be bit-identical to the in-memory run, and the spill counters must
  * show the path actually engaged.
  */
class SpillSafetySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def withConf[A](kv: (String, String)*)(body: => A): A = {
    val conf = spark.conf
    val saved = kv.map { case (k, _) => k -> conf.getOption(k) }
    kv.foreach { case (k, v) => conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  /** The window-buffer forcing pair — the default spill trigger. */
  private val windowSpillConfs = Seq(
    "spark.sql.windowExec.buffer.in.memory.threshold" -> "16",
    "spark.sql.windowExec.buffer.spill.threshold" -> "16")

  /** Rows of `df` collected with the given buffers forced to spill
    * almost immediately, plus the bytes the run spilled to disk.
    */
  private def collectSpilled(df: => DataFrame,
                             confs: Seq[(String, String)] = windowSpillConfs): (Seq[String], Long) = {
    val spilled = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          spilled.addAndGet(e.taskMetrics.diskBytesSpilled + e.taskMetrics.memoryBytesSpilled)
    }
    spark.sparkContext.addSparkListener(listener)
    try withConf(confs: _*) {
      val rows = df.collect().map(_.toString).toSeq.sorted
      // task-end events arrive async; poll until the counter shows the
      // spill (or give up and let the assertion report the zero)
      val deadline = System.currentTimeMillis + 5000
      while (spilled.get() == 0L && System.currentTimeMillis < deadline)
        Thread.sleep(50)
      (rows, spilled.get())
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  private def assertSpillSafe(name: String)(df: => DataFrame): Unit = {
    val baseline = df.collect().map(_.toString).toSeq.sorted
    val (forced, spilledBytes) = collectSpilled(df)
    assert(baseline.nonEmpty, s"$name: empty result proves nothing")
    assert(forced === baseline,
      s"$name: results must not change when window buffers spill")
    assert(spilledBytes > 0L,
      s"$name: expected the forced threshold to actually spill (vacuous otherwise)")
  }

  test("events_sessionize is spill-safe (per-user window group)") {
    assertSpillSafe("events_sessionize") {
      Queries.queries("events_sessionize")(spark, TestSpark.Sf0001)
    }
  }

  test("event_funnel is spill-safe (chained window minimums)") {
    assertSpillSafe("event_funnel") {
      Queries.queries("event_funnel")(spark, TestSpark.Sf0001)
    }
  }

  test("winnow_overlap is spill-safe (fp doc-freq cap window)") {
    // fixture fp buckets hold 1-2 docs; the bucket that matters at
    // scale is a boilerplate fingerprint shared by MANY docs. 60
    // copies of one real document put each of its fingerprints in 61
    // docs — under the WinnowMaxDocFreq=100 cap (so the rows survive
    // to be buffered) but far past the forced 16-row threshold, so
    // the cap's count window must spill the fp group and still emit
    // the identical 61-choose-2 pair set
    import org.apache.spark.sql.functions._
    val base = Tables.documents(spark, TestSpark.Sf0001).select("doc_id", "text")
    val one = base.where(length(col("text")) > 200).orderBy("doc_id")
      .limit(1).select(col("text"))
    val copies = spark.range(1000000L, 1000060L).crossJoin(one)
      .select(col("id").as("doc_id"), col("text"))
    assertSpillSafe("winnow_overlap") {
      graft.operators.TextAnalysisOps.winnowOverlap(base.union(copies))
    }
  }

  test("near_dedup_minhash is spill-safe (band-bucket count window)") {
    // fixture band buckets hold 1-2 docs — too small to ever buffer;
    // the bucket that matters at scale is a DENSE one, so append 60
    // copies of one real document: its 32 band buckets each hold 61
    // entries, well past the forced threshold, and the cap window
    // must spill them, not drop or double them
    import org.apache.spark.sql.functions._
    val base = Tables.documents(spark, TestSpark.Sf0001).select("doc_id", "text")
    val one = base.where(length(col("text")) > 200).orderBy("doc_id")
      .limit(1).select(col("text"))
    val copies = spark.range(1000000L, 1000060L).crossJoin(one)
      .select(col("id").as("doc_id"), col("text"))
    assertSpillSafe("near_dedup_minhash") {
      graft.operators.DedupOps.nearDupMinhash(base.union(copies))
    }
  }

  test("events_holt_winters is spill-safe (ordered prefix fold window)") {
    // the Holt-Winters recurrence rides a collect_list over a
    // running per-event_type window — the per-group day series IS
    // the buffered group (r17 verdict #7). Forcing the window buffer
    // to spill after 16 rows makes the fixture's ~30-day series take
    // the external-sorter path a years-long series takes at scale;
    // the fold is order-sensitive, so a reordered or dropped spill
    // row would flip every level/trend/season after it
    assertSpillSafe("events_holt_winters") {
      Queries.queries("events_holt_winters")(spark, TestSpark.Sf0001)
    }
  }

  test("dup_components hot-hub memory bound: buffered join side is key-unique") {
    // the components loop has no window: its per-round sort-merge
    // join buffers one join-key group at a time, and the buffered
    // side is the LABEL table — key-unique by construction (one row
    // per node), so no degree of hub skew can ever put more than one
    // row in an SMJ buffer. The memory bound is structural, not
    // empirical: with broadcast disabled (the 100 TB distributed-join
    // path) and the SMJ buffer forced down to 16 rows, a 200-spoke
    // hub — whose streamed-side group is 12x that threshold — must
    // converge bit-identically WITHOUT tripping a spill, because the
    // monster group never sits in a buffer at all
    import org.apache.spark.sql.functions._
    val hub = spark.range(1, 201).select(lit(0L).as("a_id"), col("id").as("b_id"))
    val chain = spark.range(1000, 1010)
      .select(col("id").as("a_id"), (col("id") + 1).as("b_id"))
    val edges = hub.union(chain)
    val df = () => graft.operators.DedupOps.connectedComponents(edges)
    val baseline = df().collect().map(_.toString).toSeq.sorted
    val (forced, _) = collectSpilled(df(), confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold" -> "16",
      "spark.sql.sortMergeJoinExec.buffer.spill.threshold" -> "16"))
    assert(baseline.count(_.contains(",0]")) === 201,
      "hub component should label all 201 members with 0")
    assert(forced === baseline,
      "dup_components: results must not change on the forced-SMJ path")
  }
}
