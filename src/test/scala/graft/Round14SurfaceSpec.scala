package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.RelationalOps
import graft.streaming.EventStreams

/** Semantics of the round-14 surfaces: CDC state GC (tombstone
  * compaction under the sequence-horizon contract, version-chain
  * truncation) and the delta-frontier relaxation's public faces.
  * Exact equalities only.
  */
class Round14SurfaceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sf = TestSpark.Sf0001

  private def stateRows(df: org.apache.spark.sql.DataFrame) =
    df.select("key", "price", "src", "applied_seq")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .sortBy(_._1).toSeq

  test("cdcCompact: fold over compacted state == fold over live state " +
    "when every batch seq clears the horizon") {
    val orders = Tables.orders(spark, sf)
    val ops = RelationalOps.cdcOps(orders)
    val off = RelationalOps.CdcSeqOffset
    val s1 = RelationalOps.cdcFold(RelationalOps.cdcSnapshot(orders),
      ops.where(col("seq") < off))
    // compaction genuinely removes rows (the fixture has deletes)
    val tombstones = s1.where(col("src") === "del").count()
    assert(tombstones > 0, "fixture produced no tombstones")
    val compacted = RelationalOps.cdcCompact(s1, off)
    assert(compacted.where(col("src") === "del").count() === 0)
    assert(compacted.count() === s1.count() - tombstones)
    val wave2 = ops.where(col("seq") >= off)
    val live = stateRows(RelationalOps.cdcFold(s1, wave2)
      .where(col("src") =!= "del"))
    val comp = stateRows(RelationalOps.cdcFold(compacted, wave2)
      .where(col("src") =!= "del"))
    assert(comp === live)
  }

  test("cdcCompact negative: a stale op below the horizon CAN resurrect " +
    "a compacted key — the horizon bound is load-bearing") {
    val state = Seq((10L, Option.empty[Double], "del", Some(100L)))
      .toDF("key", "price", "src", "applied_seq")
    val staleInsert = Seq(("I", 10L, Some(5.0), 50L))
      .toDF("op", "key", "new_price", "seq")
    // live state: seq 50 loses to applied_seq 100 — key stays dead
    val live = RelationalOps.cdcFold(state, staleInsert)
      .where(col("src") =!= "del").count()
    assert(live === 0L)
    // compacted at horizon 100: the tombstone is gone, the stale op
    // lands as a fresh insert — exactly what horizon > 50 forbids
    val resurrected = RelationalOps.cdcFold(
      RelationalOps.cdcCompact(state, 100L), staleInsert)
      .where(col("src") =!= "del").count()
    assert(resurrected === 1L)
  }

  test("compactCdcChain: chain collapses to one committed version; " +
    "readers see the live chain's exact rows") {
    val root = java.nio.file.Files.createTempDirectory("graft-cdcchain")
    val stateRoot = root.resolve("state").toString
    val orders = Tables.orders(spark, sf)
    val ops = RelationalOps.cdcOps(orders)
    val off = RelationalOps.CdcSeqOffset
    RelationalOps.cdcSnapshot(orders).write.parquet(s"$stateRoot/v0")
    RelationalOps.cdcFold(spark.read.parquet(s"$stateRoot/v0"),
        ops.where(col("seq") < off))
      .write.parquet(s"$stateRoot/v1")
    RelationalOps.cdcFold(spark.read.parquet(s"$stateRoot/v1"),
        ops.where(col("seq") >= off))
      .write.parquet(s"$stateRoot/v2")
    val before = stateRows(spark.read.parquet(s"$stateRoot/v2")
      .where(col("src") =!= "del"))
    val v = EventStreams.compactCdcChain(spark, stateRoot, Long.MaxValue)
    assert(v === 3L)
    assert(EventStreams.latestCdcVersion(stateRoot) === 3L)
    // older versions are gone from disk, not just unreferenced
    val dirs = new java.io.File(stateRoot).listFiles()
      .filter(_.getName.matches("v\\d+")).map(_.getName).toSet
    assert(dirs === Set("v3"))
    val after = stateRows(spark.read.parquet(s"$stateRoot/v3"))
    assert(after === before)
    // and the compacted version holds zero tombstones
    assert(spark.read.parquet(s"$stateRoot/v3")
      .where(col("src") === "del").count() === 0L)
  }

  test("incremental_pagerank_batch2: a different batch yields a " +
    "different-but-valid warm result (batch truly parameterizes)") {
    val full = Queries.queries("incremental_pagerank")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val b2 = Queries.queries("incremental_pagerank_batch2")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(full.nonEmpty && b2.nonEmpty)
    // mod-4 batch is a strict subset of the odd batch, so the warm
    // graphs differ and so must at least one rank
    assert(full !== b2)
    assert(b2.forall(_._2 > 0L))
  }
}
