package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints `explain("formatted")` for the named queries
  * (or a default set of representative ones) so scan pruning, pushed
  * filters, exchange placement, and codegen coverage can be reviewed.
  * A name prefixed `run:` EXECUTES the query first and prints the
  * final adaptive plan instead — the only way to see what AQE
  * actually did at runtime (ReusedExchange insertion, skew splits,
  * broadcast demotions).
  *
  * Usage: Explain [sfDir [queryName | run:queryName ...]]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("wordcount", "q1_pricing", "q5_region", "similarity_topk",
        "near_dedup_minhash", "token_stats", "events_sessionize")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val (name, runFirst) =
        if (n.startsWith("run:")) (n.stripPrefix("run:"), true) else (n, false)
      println(s"\n========== $n ==========")
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          val df = fn(spark, sfDir)
          if (runFirst) {
            df.collect() // force THIS plan's execution (count() would
            // wrap it in a new agg plan and leave this one untouched)
            println(df.queryExecution.executedPlan.toString)
          } else df.explain("formatted")
        case None => println(s"unknown query: $name")
      }
    }
    spark.stop()
  }
}
