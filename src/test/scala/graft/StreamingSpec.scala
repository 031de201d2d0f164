package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventsOps
import graft.streaming.EventStreams

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** The file stream source wants a directory; stage the single-file
    * fixture into one.
    */
  lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.Sf0001}/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("streaming wordcount equals the batch wordcount") {
    val dir = java.nio.file.Files.createTempDirectory("graft-docs-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.Sf0001}/documents.parquet"),
      dir.resolve("documents.parquet"))
    val stream = EventStreams.readDocumentsStream(spark, dir.toString)
    val q = EventStreams.streamingWordCount(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("swc_stream")
      .start()
    try { q.processAllAvailable() } finally { q.stop() }
    val streamed = spark.table("swc_stream")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = graft.operators.WordCountOps
      .wordCount(Tables.documents(spark, TestSpark.Sf0001))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed === batch)
  }

  test("streaming windowed counts equal the batch hourly totals") {
    val stream = EventStreams.readEventsStream(spark, eventsDir)
    // complete mode: append would (correctly) hold back the windows
    // still inside the watermark horizon at end-of-input
    val q = EventStreams.windowedCounts(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("wc_stream")
      .start()
    try { q.processAllAvailable() } finally { q.stop() }
    val streamed = spark.table("wc_stream")
      .groupBy("event_type").sum("n")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = EventsOps.hourly(Tables.events(spark, TestSpark.Sf0001))
      .groupBy("event_type").sum("n")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed === batch)
  }

  test("streaming dedup drops replayed duplicates") {
    // stage the same fixture TWICE: an at-least-once replay
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.Sf0001}/events.parquet"),
      dir.resolve("a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.Sf0001}/events.parquet"),
      dir.resolve("b.parquet"))
    val stream = EventStreams.readEventsStream(spark, dir.toString)
    val q = EventStreams.dedupEvents(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_stream")
      .start()
    try { q.processAllAvailable() } finally { q.stop() }
    val originals = Tables.events(spark, TestSpark.Sf0001).count()
    assert(spark.table("dedup_stream").count() === originals)
  }

  test("stateful sessionize emits closed sessions") {
    val stream = EventStreams.readEventsStream(spark, eventsDir)
    val q = EventStreams.sessionize(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_stream")
      .start()
    try { q.processAllAvailable() } finally { q.stop() }
    val sessions = spark.table("sess_stream").collect()
    assert(sessions.nonEmpty)
    sessions.foreach { r =>
      assert(r.getLong(2) >= 1L)   // n_events
      assert(r.getLong(3) >= 0L)   // span_ms
    }
  }
}
