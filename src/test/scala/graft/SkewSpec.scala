package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventsOps

/** Skew audit (the 100 TB hot-key story): proves that (1) AQE's
  * runtime skew-split actually fires on the engine's join shape when
  * one key dominates a sort-merge join — the mechanism the dedup
  * candidate joins rely on beyond their static bucket caps — and
  * (2) the sessionize window stays CORRECT when one user owns 20% of
  * the event stream (the per-user window partition is the documented
  * serialization point; correctness must not depend on key balance).
  * Thresholds are lowered so the fixture-scale stream crosses the
  * same code paths a 100 TB run crosses at defaults.
  */
class SkewSpec extends AnyFunSuite {
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

  /** 20% of rows carry user_id 7 — the Zipf-head shape. */
  private def skewedLeft: DataFrame = {
    import spark.implicits._
    spark.range(0, 50000).select(
      when($"id" % 5 === 0, lit(7L)).otherwise($"id").as("user_id"),
      concat(lit("payload_"), $"id", lit("_"),
        lpad($"id".cast("string"), 32, "x")).as("payload"))
  }

  test("AQE skew-split fires on a hot-key sort-merge join") {
    import spark.implicits._
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      // enough reducers that the median partition is small relative
      // to the hot key's partition (the skew detector compares the
      // two)
      "spark.sql.shuffle.partitions" -> "16",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val right = spark.range(0, 1000)
        .select($"id".as("user_id"), ($"id" * 2).as("score"))
      val joined = skewedLeft.join(right, "user_id")
      // collect() (not count()) so the adaptive plan we inspect below
      // is the one that actually executed — count() spawns its own
      // QueryExecution and would leave `joined`'s plan un-finalized
      val n = joined.collect().length
      // hot key 7: 10,000 left rows x 1 right row; plus ids 1..999
      // not divisible by 5 (800 of them), one row each
      assert(n === 10800, s"skewed join row count wrong: $n")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the hot partition as skewed:\n$plan")
    }
  }

  test("sessionize stays correct when one user owns 20% of the stream") {
    import spark.implicits._
    val nanos = 1_000_000L // 1 ms in the nanos-long ts domain
    val gapMs = 30L * 60L * 1000L
    // hot user 7: 10,000 events 1 ms apart, with a > gap jump every
    // 1,000 events -> exactly 10 sessions; 100 cold users get 3
    // events each inside one session
    val hot = spark.range(0, 10000).selectExpr(
      "CAST(7 AS BIGINT) AS user_id",
      "id AS event_id",
      s"id * ${nanos}L + (id div 1000) * ${2 * gapMs * nanos}L AS ts")
    val cold = spark.range(0, 300).selectExpr(
      "id % 100 + 100 AS user_id",
      "id + 20000 AS event_id",
      s"(id div 100) * ${nanos}L AS ts")
    val out = EventsOps.sessionize(hot.unionAll(cold)).collect()
    val hotRow = out.find(_.getLong(0) == 7L).get
    assert(hotRow.getLong(1) === 10L,
      s"hot user session count wrong: ${hotRow.getLong(1)}")
    assert(out.count(_.getLong(0) >= 100L) === 100)
    out.filter(_.getLong(0) >= 100L)
      .foreach(r => assert(r.getLong(1) === 1L, s"cold user split: $r"))
  }

  test("source_cap's group limit bounds the megadomain before the shuffle") {
    import spark.implicits._
    // one domain owns 96% of a 50k-doc corpus — the crawl-reality
    // shape the per-source cap exists for. Text varies per doc so
    // the quality key has a real ordering.
    val docs = spark.range(0, 50000).select(
      $"id".as("doc_id"),
      when($"id" % 25 =!= 0, lit("megadomain"))
        .otherwise(concat(lit("src"), ($"id" % 7).cast("string"))).as("source"),
      concat(lit("the quick word "), lit("and of to in it "),
        ($"id" % 997).cast("string")).as("text"))
    val out = graft.operators.PipelineOps.sourceCap(docs).collect()
    // cap holds: no source exceeds N rows, megadomain hits exactly N
    val bySource = out.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(bySource.values.max <= graft.operators.PipelineOps.SourceCapN)
    assert(bySource("megadomain") === graft.operators.PipelineOps.SourceCapN)
    // the partial WindowGroupLimit must prune map-side: across BOTH
    // exchanges (window + result sort) the shuffle carries only each
    // task's local top-N, bounded far under the 50k corpus
    val written = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null && e.taskMetrics.shuffleWriteMetrics != null)
          written.addAndGet(e.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      graft.operators.PipelineOps.sourceCap(docs).collect()
      val deadline = System.currentTimeMillis + 5000
      while (written.get() == 0L && System.currentTimeMillis < deadline)
        Thread.sleep(50)
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(written.get() > 0L, "expected shuffle writes from the window exchange")
    assert(written.get() < 5000L,
      s"shuffles carried ${written.get()} rows — the megadomain was not pre-pruned map-side")
  }
}
