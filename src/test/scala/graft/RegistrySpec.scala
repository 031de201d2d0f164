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
