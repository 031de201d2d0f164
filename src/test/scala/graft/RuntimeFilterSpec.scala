package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime scan-reduction proofs — the two mechanisms that cut a
  * 100 TB fact scan at execution time, beyond the static pruning
  * PlanAuditSpec pins:
  *
  *  - dynamic partition pruning: a join against a filtered dimension
  *    prunes the partitioned fact's directories at RUNTIME (the dim
  *    rows aren't known at plan time), so a "days that saw X" join
  *    reads only those days' files;
  *  - runtime bloom-filter join reduction: a selective predicate on
  *    one join side injects a bloom filter into the other side's
  *    scan, dropping non-joining rows before the shuffle.
  *
  * Both are Catalyst features the engine gets by keeping plans
  * declarative; these tests pin that our shapes actually trigger
  * them, and that results are identical with the mechanisms off.
  */
class RuntimeFilterSpec extends AnyFunSuite {
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

  /** The registry's DPP query: partitioned events joined to the
    * days-with-a-high-value-purchase dim, which is only known at
    * runtime.
    */
  private def dppJoin = graft.sources.Partitioning
    .eventsDppJoin(spark, TestSpark.Sf0001)

  test("partitioned join prunes fact partitions dynamically (DPP)") {
    val df = dppJoin
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamicpruning partition filter on the fact scan:\n$plan")
  }

  test("DPP results equal the mechanism-off run") {
    val on = dppJoin.collect().map(_.toString).sorted
    val off = withConf(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "false") {
      dppJoin.collect().map(_.toString).sorted
    }
    assert(on.nonEmpty && on === off)
  }

  /** Selective orders-side predicate joined to lineitem over a
    * shuffle join — the bloom-filter injection shape. Thresholds are
    * lowered so the fixture-scale tables qualify the way 100 TB
    * tables do by size.
    */
  private def bloomJoin = {
    val orders = Tables.orders(spark, TestSpark.Sf0001)
      .where(col("o_orderpriority") === "1-URGENT")
    Tables.lineitem(spark, TestSpark.Sf0001)
      .join(orders.hint("shuffle_merge"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
  }

  private val bloomConf = Seq(
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
    // size the thresholds so the fixture tables qualify the way
    // 100 TB tables do: at real scale neither side broadcasts and the
    // fact scan is far past the application-side threshold
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")

  test("selective join side injects a runtime bloom filter into the fact scan") {
    withConf(bloomConf: _*) {
      val df = bloomJoin
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected a bloom-filter probe on the lineitem side:\n$plan")
    }
  }

  test("bloom-filtered join results equal the mechanism-off run") {
    val on = withConf(bloomConf: _*) {
      bloomJoin.collect().map(_.toString).sorted
    }
    val off = withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
      bloomJoin.collect().map(_.toString).sorted
    }
    assert(on.nonEmpty && on === off)
  }
}
