package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Runnable surface for the streaming module: replays an events
  * parquet fixture through the windowed-count and sessionize streams
  * and prints a one-line JSON summary.
  *
  * Usage: StreamDemo <sfDir> — e.g. /root/testdata/sf0.001
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // file stream source wants a directory; stage the fixture file
    val dir = Files.createTempDirectory("graft-stream-demo")
    Files.copy(Paths.get(s"$sfDir/events.parquet"), dir.resolve("events.parquet"))

    val wc = EventStreams.windowedCounts(EventStreams.readEventsStream(spark, dir.toString))
      .writeStream.outputMode("complete").format("memory").queryName("demo_wc").start()
    try wc.processAllAvailable() finally wc.stop()
    val windows = spark.table("demo_wc").count()
    val events = spark.table("demo_wc").agg(org.apache.spark.sql.functions.sum("n"))
      .head().getLong(0)

    val sess = EventStreams.sessionize(EventStreams.readEventsStream(spark, dir.toString))
      .writeStream.outputMode("append").format("memory").queryName("demo_sess").start()
    try sess.processAllAvailable() finally sess.stop()
    val sessions = spark.table("demo_sess").count()

    // at-least-once replay: stage the fixture twice, dedup the stream
    val dupDir = Files.createTempDirectory("graft-stream-demo-dup")
    Files.copy(Paths.get(s"$sfDir/events.parquet"), dupDir.resolve("a.parquet"))
    Files.copy(Paths.get(s"$sfDir/events.parquet"), dupDir.resolve("b.parquet"))
    val dedup = EventStreams.dedupEvents(EventStreams.readEventsStream(spark, dupDir.toString))
      .writeStream.outputMode("append").format("memory").queryName("demo_dedup").start()
    try dedup.processAllAvailable() finally dedup.stop()
    val deduped = spark.table("demo_dedup").count()

    println(s"""{"windows":$windows,"events":$events,"closed_sessions":$sessions,"replayed_deduped":$deduped}""")
    spark.stop()
  }
}
