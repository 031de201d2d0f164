package graft

/** In-process acquisition of the heavy-harness lock (VERDICT r19 ask
  * #2). The r17/r19 bench artifacts were poisoned by host contention:
  * tools/run.sh, gates.sh, and check.py all serialize on
  * /tmp/graft_heavy.lock, but a DIRECT invocation of graft.Bench or
  * graft.Verify (the driver's per-round entry path) bypassed the shell
  * wrappers and could co-run with a gate chain or a 42 GB DuckDB
  * oracle pass. Both mains now block on the same lockfile themselves,
  * so there is NO entry path left that can time a query while another
  * heavy job runs. GRAFT_LOCK_HELD marks a parent (run.sh/gates.sh)
  * already holding it — flock(2) locks are per open-file-description,
  * so re-locking from a child JVM would self-deadlock.
  */
object HeavyLock {
  private var held: Option[java.nio.channels.FileLock] = None

  /** Block until the heavy-job lock is ours (or inherited). Returns
    * "inherited" when a parent wrapper already holds it, "acquired"
    * when this JVM took it. The lock is held until process exit —
    * these mains do one job and die, so no release path is needed.
    */
  def acquire(): String = synchronized {
    if (sys.env.contains("GRAFT_LOCK_HELD")) "inherited"
    else {
      val ch = java.nio.channels.FileChannel.open(
        java.nio.file.Paths.get("/tmp/graft_heavy.lock"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      val t0 = System.nanoTime()
      val lk = ch.lock() // blocks until any gate chain / oracle pass ends
      val waited = (System.nanoTime() - t0) / 1e9
      if (waited > 1.0)
        System.err.println(f"[heavylock] waited $waited%.1f s for /tmp/graft_heavy.lock")
      held = Some(lk)
      "acquired"
    }
  }

  /** 1-minute loadavg, or -1 if /proc is unreadable. */
  def load1(): Double =
    try java.nio.file.Files.readString(
      java.nio.file.Paths.get("/proc/loadavg")).split("\\s+")(0).toDouble
    catch { case _: Throwable => -1.0 }

  /** The r18 bench method's pre-flight, in-process: wait (bounded) for
    * the 1-minute load to decay below `threshold` before timing
    * anything — the lock stops OUR heavy jobs, this catches everything
    * else on the host. Returns the load the run actually started at;
    * a still-hot start is reported loudly and stamped into the bench
    * JSON (the artifact self-identifies as contended) rather than
    * refused outright, because the driver contract needs SOME artifact
    * and a stamped-contended number beats a silent absence.
    */
  def awaitIdle(threshold: Double = 8.0, maxWaitSec: Int = 600): Double = {
    var l = load1()
    val deadline = System.nanoTime() + maxWaitSec * 1e9.toLong
    while (l > threshold && System.nanoTime() < deadline) {
      System.err.println(f"[heavylock] load1=$l%.2f > $threshold%.1f — waiting for host to idle")
      Thread.sleep(15000)
      l = load1()
    }
    if (l > threshold)
      System.err.println(f"[heavylock] WARNING: starting CONTENDED at load1=$l%.2f " +
        "after the bounded wait — this run's timings are suspect and stamped so")
    l
  }
}
