package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Bucketing

class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed join is exchange-free and matches the plain join") {
    val joined = Bucketing.bucketedOrdersLineitem(spark, TestSpark.Sf0001)
    val n = joined.count()
    assert(Bucketing.isExchangeFree(joined),
      s"bucketed join should not shuffle:\n${joined.queryExecution.executedPlan}")
    val li = Tables.lineitem(spark, TestSpark.Sf0001)
    val o = Tables.orders(spark, TestSpark.Sf0001)
    val plain = li.join(o, li("l_orderkey") === o("o_orderkey")).count()
    assert(n === plain)
  }
}
