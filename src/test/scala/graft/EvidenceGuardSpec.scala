package graft

import java.io.File
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Negative tests for the round-18 evidence guards (VERDICT r17 ask
  * #8): a partial Verify dump and an empty oracle compare must FAIL
  * LOUDLY instead of producing the silent `{}` artifact that zeroed
  * round 17's correctness record.
  */
class EvidenceGuardSpec extends AnyFunSuite {

  test("Verify exit code is nonzero when any selected query failed") {
    assert(Verify.exitCode(272, Nil) === 0)
    assert(Verify.exitCode(272, Seq("ann_nsw")) !== 0)
    assert(Verify.exitCode(272, Seq("a", "b", "c")) !== 0)
    // a run that selected nothing dumped nothing — never a clean exit
    assert(Verify.exitCode(0, Nil) !== 0)
  }

  test("publishDir survives a leftover _old dir and null listFiles") {
    val base = Files.createTempDirectory("graft-publish").toFile
    val live = new File(base, "live")
    val staging = new File(base, "live_compacting")
    val old = new File(base, "live_old")
    // simulate: previous publish crashed after rename-aside (live
    // absent, _old populated), new staging complete
    old.mkdirs()
    Files.writeString(new File(old, "part-0").toPath, "stale")
    staging.mkdirs()
    Files.writeString(new File(staging, "part-0").toPath, "fresh")
    graft.operators.SimilarityOps.publishDir(staging, live)
    assert(live.isDirectory)
    assert(Files.readString(new File(live, "part-0").toPath) === "fresh")
    assert(!old.exists(), "_old must be reclaimed after publish")
    assert(!staging.exists())
  }

  test("check.py refuses an empty oracle dump (exit nonzero)") {
    val out = Files.createTempDirectory("graft-checkguard").toFile
    Files.writeString(new File(out, "oracle_sql.json").toPath, "{}")
    // GRAFT_LOCK_HELD skips the heavy-job lock: this guard test must
    // not queue behind a real gate chain (and must not hold the lock)
    val pb = new ProcessBuilder("python3", "tools/check.py",
      "/root/testdata/sf0.001", out.getPath)
    pb.directory(new File("/root/repo"))
    pb.environment().put("GRAFT_LOCK_HELD", "1")
    pb.redirectErrorStream(true)
    val p = pb.start()
    val outTxt = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val code = p.waitFor()
    assert(code !== 0, s"check.py exited 0 on an empty oracle: $outTxt")
    assert(outTxt.contains("refusing"), outTxt)
  }
}
