package graft.operators

import org.apache.spark.sql.DataFrame

/** One policy switch for every lineage-truncation point in the engine.
  *
  * Iterative operators ([[DedupOps.connectedComponents]]'s label loop,
  * the index-probe subtree in [[DedupOps.incrementalComponents]],
  * [[SimilarityOps]]'s shared cluster assignment, [[EventsOps
  * .dailyGapfill]]'s thrice-read daily table) must materialize
  * intermediate results: without truncation the plan tree doubles per
  * round and multi-consumer subtrees re-execute per reference.
  *
  * `localCheckpoint()` is the right default on local[N] and for
  * latency (no DFS round-trip) but its blocks live on executors only —
  * a lost executor kills the job instead of recomputing. On a real
  * cluster set `graft.checkpoint.dir` (Spark conf) to a DFS path and
  * every truncation point below switches to reliable `checkpoint()`
  * writes there; both modes are eager, so the calling code's cost
  * model (materialize ONCE, then read) is identical. The fixpoints
  * these loops compute are mode-independent — `CheckpointModeSpec`
  * proves both modes converge to identical labels on the chain/clique
  * fixtures.
  */
object Checkpoints {

  /** Spark conf key: empty/unset = localCheckpoint, else a reliable
    * checkpoint directory (HDFS/S3 path on a cluster).
    */
  val DirConf = "graft.checkpoint.dir"

  /** Eagerly materialize `df` and truncate its lineage, using the
    * session-configured durability mode.
    */
  def truncate(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(DirConf).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        // setCheckpointDir stores `<qualified dir>/<random uuid>`, so
        // compare by substring — an equality check never matches and
        // would mkdir a fresh UUID subdir on EVERY truncation. For
        // long-running cluster jobs also set
        // spark.cleaner.referenceTracking.cleanCheckpoints=true, or
        // checkpoint data accumulates for the app's lifetime.
        if (!sc.getCheckpointDir.exists(_.contains(dir))) sc.setCheckpointDir(dir)
        df.checkpoint() // eager + reliable: survives executor loss
      case None =>
        df.localCheckpoint() // eager, executor-local (fast, lossy)
    }
  }

  /** Materialize `df` through a per-invocation scratch parquet dir
    * and read it back. Unlike [[truncate]], the result carries REAL
    * size statistics (on-disk bytes), so the planner can still pick
    * broadcast strategies for small materialized structures — a
    * localCheckpoint's LogicalRDD reports the default (huge) size and
    * silently forces sort-merge everywhere downstream (the r20
    * coorder_triangles find: same walk, 4x slower purely from the
    * lost stats). Nothing persists across invocations: every call
    * writes a fresh directory under java.io.tmpdir, reaped on JVM
    * exit, so oracle runs and benches always recompute from inputs.
    */
  def scratchParquet(df: DataFrame, tag: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(System.getProperty("java.io.tmpdir")),
      s"graft_scratch_${tag}_")
    scratchDirs.add(dir)
    df.write.mode("overwrite").parquet(dir.toString)
    df.sparkSession.read.parquet(dir.toString)
  }

  private val scratchDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()
  sys.addShutdownHook {
    scratchDirs.forEach { dir =>
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir)
          .sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      } catch { case _: Throwable => () }
    }
  }
}
