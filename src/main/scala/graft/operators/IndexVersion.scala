package graft.operators

/** THE CONCURRENT-WRITER CONTRACT for persisted mutable indexes
  * (VERDICT r19 ask #7).
  *
  * Every mutable index family here (LSH bands, BM25 postings, IVF
  * lists, NSW adjacency) publishes reader-visible tables by
  * rename-after-complete-write ([[DedupOps.publishTable]]), which
  * makes any SINGLE writer crash-safe: readers see the old table or
  * the new one, never a torn one. What rename alone does NOT give is
  * multi-writer safety: two folds that both read state S, compute
  * S+a and S+b, and rename-publish in turn silently lose one batch's
  * counts (classic lost update). In this sandbox a single-host
  * `flock` (tools/run.sh) makes that impossible; on a real cluster
  * no such lock exists, so the invariant must live in the index
  * layout itself.
  *
  * == The invariant ==
  *
  * An index directory carries a monotonically increasing version,
  * represented as `_COMMIT_v<n>` marker files (underscore-prefixed:
  * every parquet scan of the subdirectories ignores them; max n = the
  * current version, no markers = v0, the freshly-built state). A fold
  * is a compare-and-swap transaction on that version:
  *
  *   1. `begin(dir)` reads the current version v and atomically
  *      creates the intent marker `_FOLD_v(v+1)` — an exclusive
  *      create, the CAS. If the marker already exists, ANOTHER writer
  *      holds (or crashed holding) the v→v+1 slot: begin throws
  *      BEFORE the fold has mutated anything, so a lost update is
  *      impossible and the loser retries from the re-read live state.
  *   2. the fold appends its rows and rename-publishes its merged
  *      tables exactly as before;
  *   3. `commit(dir, v+1)` creates `_COMMIT_v(v+1)` — the version
  *      advances and the slot is sealed.
  *
  * A crash between 1 and 3 leaves `_FOLD_v(v+1)` without its commit:
  * the next `begin` throws loudly and the operator must reconcile
  * (re-run [[DedupOps.writeLshIndex]]-style full rebuild, or verify
  * the partial append and hand-seal). That is deliberate — a torn
  * fold's appends are not self-describing, so silent auto-repair
  * would be a guess. The failure is LOUD and the live tables remain
  * readable throughout (appends never remove; publishes are atomic).
  *
  * On a DFS whose `createNewFile` is atomic-exclusive (HDFS, local
  * POSIX) this is a true CAS. On an object store without atomic
  * create-if-absent, substitute the store's conditional put for step
  * 1; the protocol is unchanged.
  */
object IndexVersion {
  private val Commit = "_COMMIT_v"
  private val Intent = "_FOLD_v"

  /** Current committed version of the index at `dir` (0 if none). */
  def current(dir: String): Long = {
    val fs = new java.io.File(dir).listFiles()
    if (fs == null) 0L
    else fs.iterator.map(_.getName)
      .filter(_.startsWith(Commit))
      .map(_.stripPrefix(Commit).toLong)
      .foldLeft(0L)(math.max)
  }

  /** CAS-acquire the next version slot; returns the version this
    * fold will commit. Throws [[java.util.ConcurrentModificationException]]
    * — before anything is mutated — if another writer holds it.
    */
  def begin(dir: String): Long = {
    val next = current(dir) + 1
    try {
      java.nio.file.Files.createFile(
        java.nio.file.Paths.get(dir, s"$Intent$next"))
      next
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new java.util.ConcurrentModificationException(
          s"index $dir: fold slot v$next is already claimed — a " +
            "concurrent writer is folding (or crashed mid-fold; " +
            "reconcile by rebuild before retrying). Refusing to " +
            "start a fold that would lose its update.")
    }
  }

  /** Seal the slot acquired by [[begin]] — the version advances. */
  def commit(dir: String, version: Long): Unit = {
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(dir, s"$Commit$version"))
    ()
  }
}
