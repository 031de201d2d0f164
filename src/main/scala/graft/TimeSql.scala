package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round probe: time ad-hoc SQL statements against the
  * registered views at the bench's core count. Each statement is run
  * with the noop sink (computes every column, discards the result —
  * guide §1.4) and its wall time printed, so a slow query can be
  * decomposed stage by stage without editing the engine.
  *
  * Usage: TimeSql <sfDir> <sql...>   (cores from SPARK_GRAFT_CPUS)
  */
object TimeSql {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Catalog.registerViews(spark, sfDir)
    // "chk:" prefix: materialize via localCheckpoint (the engine's
    // lineage-truncation path) instead of the noop sink, to compare
    // the two materialization costs on an identical plan.
    args.drop(1).zipWithIndex.foreach { case (stmt, i) =>
      val (sql, viaChk) =
        if (stmt.startsWith("chk:")) (stmt.stripPrefix("chk:"), true)
        else (stmt, false)
      val t0 = System.nanoTime()
      try {
        if (viaChk) spark.sql(sql).localCheckpoint()
        else spark.sql(sql).write.format("noop").mode("overwrite").save()
        println(f"[timesql] stmt$i%d ${(System.nanoTime() - t0) / 1e9}%.2f s :: ${sql.take(80)}")
      } catch { case e: Exception =>
        println(s"[timesql] stmt$i ERROR ${e.getMessage.linesIterator.next()}")
      }
    }
    spark.stop()
  }
}
