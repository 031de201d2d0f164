package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Pins AQE's join-strategy selection for the two unhinted
  * scale-dependent joins (VERDICT r7 item 4): the q5 customer hop and
  * the doc⋈embedding feature join carry NO broadcast hint by design —
  * customer and embeddings scale with SF, so a pinned broadcast is
  * the 100 TB OOM. That leaves the choice to AQE, which this spec
  * pins at both ends: small SF → broadcast (post-execution adaptive
  * plan), and the flip to a shuffle join when the runtime size
  * crosses the threshold — exercised deterministically by lowering
  * the adaptive broadcast threshold, and for real at the 10× fixture
  * when present (the genuine size-driven flip).
  */
class AqeJoinStrategySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def withConf[A](kv: (String, String)*)(body: => A): A = {
    val conf = spark.conf
    val saved = kv.map { case (k, _) => k -> conf.getOption(k) }
    kv.foreach { case (k, v) => conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  /** Execute the query, then return the FINAL adaptive plan's lines
    * mentioning the given join key — the post-execution plan is the
    * only place AQE's actual strategy choice is visible.
    */
  private def executedJoinLines(df: DataFrame, key: String): Seq[String] = {
    df.collect()
    // an executed AdaptiveSparkPlan prints BOTH its final and initial
    // plans; only the final section shows the strategy AQE actually
    // ran (the initial section matters when the build side has no
    // stats — e.g. a checkpoint scan — and the static planner guesses
    // big: the survivors pin exists precisely because AQE corrects it)
    df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
      .linesIterator
      .filter(l => l.contains("Join") && l.contains(key))
      .toSeq
  }

  test("q5 customer hop broadcasts at sf0.001 (AQE, no hint)") {
    val df = Queries.queries("q5_region")(spark, TestSpark.Sf0001)
    val lines = executedJoinLines(df, "o_custkey")
    assert(lines.nonEmpty, "expected a join on o_custkey in the executed plan")
    assert(lines.forall(_.contains("BroadcastHashJoin")),
      s"customer-side dims should broadcast at sf0.001, got:\n${lines.mkString("\n")}")
  }

  test("doc_embedding_join broadcasts at sf0.001 (AQE, no hint)") {
    val df = Queries.queries("doc_embedding_join")(spark, TestSpark.Sf0001)
    val lines = executedJoinLines(df, "vec_id")
    assert(lines.nonEmpty)
    assert(lines.forall(_.contains("BroadcastHashJoin")),
      s"embeddings should broadcast at sf0.001, got:\n${lines.mkString("\n")}")
  }

  test("both joins flip off broadcast when the runtime size exceeds the threshold") {
    // the unhinted design under test: force every size to read as
    // over-threshold and the SAME plans must pick a shuffle join —
    // proving no hint pins the broadcast that would OOM at 100 TB
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val q5 = Queries.queries("q5_region")(spark, TestSpark.Sf0001)
      val l5 = executedJoinLines(q5, "o_custkey")
      assert(l5.nonEmpty)
      assert(l5.forall(l => l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")),
        s"customer hop must flip to a shuffle join, got:\n${l5.mkString("\n")}")
      val de = Queries.queries("doc_embedding_join")(spark, TestSpark.Sf0001)
      val ld = executedJoinLines(de, "vec_id")
      assert(ld.nonEmpty)
      assert(ld.forall(l => l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")),
        s"embedding join must flip to a shuffle join, got:\n${ld.mkString("\n")}")
    }
  }

  test("incremental_dedup's corpus anti join broadcasts small and flips at size") {
    // the PlanAuditSpec pin counts 2 exchanges because the corpus
    // digest column broadcasts at fixture scale; this closes the
    // other half of that claim — when the index reads as
    // over-threshold the SAME unhinted plan takes the shuffled anti
    // join (the 100 TB shape, where the corpus index dwarfs a batch)
    val small = Queries.queries("incremental_dedup")(spark, TestSpark.Sf0001)
    val ls = executedJoinLines(small, "LeftAnti")
    assert(ls.nonEmpty, "expected a left-anti join in the executed plan")
    assert(ls.forall(_.contains("BroadcastHashJoin")),
      s"fixture-scale corpus digests should broadcast, got:\n${ls.mkString("\n")}")
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val big = Queries.queries("incremental_dedup")(spark, TestSpark.Sf0001)
      val lb = executedJoinLines(big, "LeftAnti")
      assert(lb.nonEmpty)
      assert(lb.forall(l => l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")),
        s"over-threshold corpus index must flip to a shuffled anti join, got:\n${lb.mkString("\n")}")
    }
  }

  test("dedup_survivors' non-canonical anti join broadcasts small and flips at size") {
    // the non-canonical set is bounded by the pair-graph node count —
    // dimension-sized next to the corpus, so it broadcasts unhinted;
    // the threshold-forced run pins that the SAME plan degrades to a
    // shuffled anti join rather than breaking when a pathological
    // corpus makes the drop set big
    val small = Queries.queries("dedup_survivors")(spark, TestSpark.Sf0001)
    val ls = executedJoinLines(small, "LeftAnti")
    assert(ls.nonEmpty, "expected a left-anti join in the executed plan")
    assert(ls.forall(_.contains("BroadcastHashJoin")),
      s"fixture-scale drop set should broadcast, got:\n${ls.mkString("\n")}")
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val big = Queries.queries("dedup_survivors")(spark, TestSpark.Sf0001)
      val lb = executedJoinLines(big, "LeftAnti")
      assert(lb.nonEmpty)
      assert(lb.forall(l => l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")),
        s"over-threshold drop set must flip to a shuffled anti join, got:\n${lb.mkString("\n")}")
    }
  }

  test("bloom_dedup's is_dup compare join broadcasts small and flips at size") {
    // the sketch itself ALWAYS broadcasts (1 row, by construction);
    // the scale-dependent join is the exact-verdict compare against
    // the corpus digest set, which carries no hint — at 100 TB that
    // side dwarfs a batch and must degrade to a shuffled join, not
    // pin a broadcast of the corpus index
    val small = Queries.queries("bloom_dedup")(spark, TestSpark.Sf0001)
    val ls = executedJoinLines(small, "LeftOuter")
    assert(ls.nonEmpty, "expected the left-outer compare join in the executed plan")
    assert(ls.forall(_.contains("BroadcastHashJoin")),
      s"fixture-scale corpus digests should broadcast, got:\n${ls.mkString("\n")}")
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val big = Queries.queries("bloom_dedup")(spark, TestSpark.Sf0001)
      val lb = executedJoinLines(big, "LeftOuter")
      assert(lb.nonEmpty)
      assert(lb.forall(l => l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")),
        s"over-threshold corpus set must flip to a shuffled join, got:\n${lb.mkString("\n")}")
    }
  }

  test("10x fixture: broadcast survives under default thresholds — pruning keeps the build side small") {
    assume(new java.io.File("/tmp/sf1/customer.parquet").exists(),
      "10x fixture not present on this host")
    // measured pin, not an assumption: at 10x AQE still (correctly)
    // broadcasts, because what it sizes is not the table — it's the
    // DATE-FILTERED orders subtree (2 of 7 years) on q5 and the
    // COLUMN-PRUNED docs side (text pruned at the scan) on the
    // embedding join, both still under the 10 MB threshold. The flip
    // point is a function of post-pruning bytes, which the
    // threshold-forced test above pins; this pins that plan-side
    // pruning defers the flip well past naive table size.
    val df = Queries.queries("q5_region")(spark, "/tmp/sf1")
    val lines = executedJoinLines(df, "o_custkey")
    assert(lines.nonEmpty)
    assert(lines.forall(_.contains("BroadcastHashJoin")),
      s"pruned q5 build side should still broadcast at 10x, got:\n${lines.mkString("\n")}")
    val de = Queries.queries("doc_embedding_join")(spark, "/tmp/sf1")
    val ld = executedJoinLines(de, "vec_id")
    assert(ld.nonEmpty)
    assert(ld.forall(_.contains("BroadcastHashJoin")),
      s"pruned docs build side should still broadcast at 10x, got:\n${ld.mkString("\n")}")
  }
}
