package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Checkpoints, DedupOps, EventsOps}

/** The `graft.checkpoint.dir` durability switch must be behavior-free:
  * every truncation point ([[Checkpoints.truncate]]) is eager in BOTH
  * modes, so flipping local → reliable checkpoints may change fault
  * tolerance but never results. Proven on the fixtures whose shapes
  * motivated truncation in the first place: the chain (longest
  * propagation diameter) and the clique (dedup common case) through
  * the connected-components loop, and the thrice-referenced daily
  * rollup through dailyGapfill.
  */
class CheckpointModeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def withReliableDir[A](body: => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.conf.set(Checkpoints.DirConf, dir)
    try body
    finally {
      spark.conf.unset(Checkpoints.DirConf)
      // the SparkContext keeps its checkpoint dir; harmless for
      // subsequent local-mode calls (the conf gates the mode)
    }
  }

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    DedupOps.connectedComponents(edges.toDF("a_id", "b_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain and clique components are identical across checkpoint modes") {
    val chain = (0L until 12L).sliding(2).map(w => (w(0), w(1))).toSeq
    val clique = for { a <- Seq(11L, 3L, 42L, 17L); b <- Seq(11L, 3L, 42L, 17L) if a < b } yield (a, b)
    for (edges <- Seq(chain, clique)) {
      val local = components(edges)
      val reliable = withReliableDir(components(edges))
      assert(local === reliable)
      assert(local.values.toSet.size === 1) // both fixtures are one component
    }
  }

  test("reliable mode actually writes checkpoint files") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-probe").toString
    spark.conf.set(Checkpoints.DirConf, dir)
    try {
      Checkpoints.truncate(Seq(1L, 2L, 3L).toDF("x")).count()
      def countFiles(p: java.io.File): Int =
        if (p.isDirectory) p.listFiles().map(countFiles).sum else 1
      assert(countFiles(new java.io.File(dir)) > 0,
        "graft.checkpoint.dir set but no reliable checkpoint data written")
    } finally spark.conf.unset(Checkpoints.DirConf)
  }

  test("dailyGapfill grid is identical across checkpoint modes") {
    val events = Tables.events(spark, TestSpark.Sf0001)
    val local = EventsOps.dailyGapfill(events).collect().map(_.toSeq)
    val reliable = withReliableDir(
      EventsOps.dailyGapfill(events).collect().map(_.toSeq))
    assert(local.length === reliable.length)
    local.zip(reliable).foreach { case (a, b) => assert(a === b) }
  }

  // r20: scratchParquet is the stats-carrying materialization the
  // triangle walk switched to (a localCheckpoint's LogicalRDD reports
  // the default huge size and silently forces sort-merge joins
  // downstream). It must behave as a pure materialization: same rows,
  // a FRESH directory per call (never a cross-invocation cache), and
  // real file statistics visible to the planner.
  test("scratchParquet round-trips rows, is per-invocation, and carries file stats") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val m1 = Checkpoints.scratchParquet(df, "spec")
    val m2 = Checkpoints.scratchParquet(df, "spec")
    assert(m1.orderBy("k").collect().toSeq === df.orderBy("k").collect().toSeq)
    def root(d: org.apache.spark.sql.DataFrame): String =
      d.queryExecution.sparkPlan.collectFirst {
        case sc: org.apache.spark.sql.execution.FileSourceScanExec =>
          sc.relation.location.rootPaths.head.toString
      }.get
    assert(root(m1) !== root(m2),
      "scratchParquet must write a fresh dir per call — a shared dir would be cross-run caching")
    val stats = m1.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(stats > 0 && stats < 1024L * 1024,
      s"expected genuine on-disk size statistics, got $stats")
  }
}
