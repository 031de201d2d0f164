package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-registry regression net: every declared query must ANALYZE
  * against the fixture (schema resolution catches renamed columns,
  * bad casts, unresolved functions without running a job), each
  * oracle key must reference a registered query, and a sampled
  * execution set must return rows.
  */
class RegistrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("every registered query analyzes at sf0.001") {
    Queries.registry.foreach { case (name, qd) =>
      val schema = qd.run(spark, TestSpark.Sf0001).schema
      assert(schema.nonEmpty, s"$name resolved to an empty schema")
    }
  }

  test("no registered query outputs a raw decimal column") {
    // Spark widens sum(DECIMAL(p,s)) to DECIMAL(p+10,s) while DuckDB
    // widens to DECIMAL(38,s): values match but a type-sensitive hash
    // diverges (the round-10 q18_large_orders red). Decimal math is
    // fine INSIDE a query (decimal-exact filters/joins); the OUTPUT
    // projection must land on double/long/string on both engines.
    import org.apache.spark.sql.types.DecimalType
    Queries.registry.foreach { case (name, qd) =>
      val decimals = qd.run(spark, TestSpark.Sf0001).schema.fields
        .collect { case f if f.dataType.isInstanceOf[DecimalType] => f.name }
      assert(decimals.isEmpty,
        s"$name emits raw decimal column(s) ${decimals.mkString(",")}; cast the output")
    }
  }

  test("no new round(sum(<double>)) column (exact-decimal discipline)") {
    // A rounded DOUBLE sum is summation-order sensitive: a .xx5 tie at
    // an untested scale rounds differently per engine / per partition
    // layout and reds the hash gate (the 10x q1_pricing cent flip;
    // SURVEY §8.2). Money-like sums must use the revenueExact pattern
    // (sum exact DECIMAL, round, cast back to double). The allowlist
    // below is what remains after the round-15 burn-down converted
    // every MONEY sum to the decimal pattern: only the 4-decimal sums
    // of the synthetic full-precision events.value column, where a
    // decimal cast would ROUND each value (changing semantics) rather
    // than recover an exact representation — cents exist for money;
    // no exact decimal exists for an arbitrary double. The set can
    // only SHRINK: any new query (or a regression in a fixed one)
    // fails here until its sum is made decimal-exact.
    import org.apache.spark.sql.catalyst.expressions.Round
    import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Sum}
    import org.apache.spark.sql.types.DoubleType
    val legacy = Set(
      "events_cube", "events_dpp_join", "events_grouping_sets",
      "events_hourly", "events_moving_avg", "events_partition_pruned",
      "events_topusers", "events_variant", "streamed_day_counts")
    val offenders = Queries.registry.flatMap { case (name, qd) =>
      val plan = qd.run(spark, TestSpark.Sf0001).queryExecution.analyzed
      val bad = plan.collect { case p =>
        p.expressions.flatMap(_.collect {
          case r: Round => r.child match {
            case ae: AggregateExpression => ae.aggregateFunction match {
              case s: Sum => s.child.dataType == DoubleType
              case _      => false
            }
            case _ => false
          }
        }).contains(true)
      }.contains(true)
      if (bad) Some(name) else None
    }.toSet
    val fresh = offenders -- legacy
    assert(fresh.isEmpty,
      s"round(sum(<double>)) crept into ${fresh.toSeq.sorted.mkString(", ")}; " +
        "use the revenueExact exact-decimal pattern instead")
  }

  test("every registered query is oracle-gated (no rows-only entries)") {
    val names = Queries.registry.map(_._1).toSet
    assert(Queries.oracleSql.keySet.subsetOf(names))
    // round 10 closed the last rows-only entry (coded_shuffle_sim's
    // rank-zip closed form); a new rows-only query is a regression
    val rowsOnly = names -- Queries.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"rows-only queries crept back in: $rowsOnly")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("observed wordcount reports plan metrics (O14 analog)") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val (wc, obs) = graft.operators.WordCountOps.wordCountObserved(docs)
    val total = wc.collect().map(_.getLong(1)).sum
    val row = obs.get
    assert(row("tokens_seen").asInstanceOf[Long] === total)
    assert(row("chars_seen").asInstanceOf[Long] > 0)
  }
}
