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
}
