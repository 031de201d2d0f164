package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.DelimitedSource

class SinksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("partitioned parquet sink lays out hive-style dirs and round-trips") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft-part-sink").toString
    DelimitedSource.writePartitionedParquet(docs, dir, Seq("lang"))

    val langDirs = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("lang=")).sorted
    val langs = docs.select("lang").distinct()
      .collect().map("lang=" + _.getString(0)).sorted
    assert(langDirs === langs)

    // a filter on the partition column prunes to that partition's files
    val back = spark.read.parquet(dir)
    val one = langs.head.stripPrefix("lang=")
    assert(back.where(col("lang") === one).count() ===
      docs.where(col("lang") === one).count())
    assert(back.count() === docs.count())
  }

  test("csv and jsonl fixtures round-trip exactly") {
    val orders = Tables.orders(spark, TestSpark.Sf0001)
      .select("o_orderstatus", "o_totalprice")
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    DelimitedSource.writeCsvFixture(orders, dir)
    val back = DelimitedSource.readCsv(spark, dir, orders.schema)
    assert(back.count() === orders.count())
    val a = orders.agg(round(sum("o_totalprice"), 2)).head.getDouble(0)
    val b = back.agg(round(sum("o_totalprice"), 2)).head.getDouble(0)
    assert(a === b)
  }

  test("avro fixture round-trips every projected column exactly, " +
    "including the NTZ timestamp, and writes one container per partition") {
    import graft.sources.AvroSource
    val orders = Tables.orders(spark, TestSpark.Sf0001)
    val src = orders
      .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      .repartition(3)
    val dir = java.nio.file.Files.createTempDirectory("graft-avro").toString + "/o"
    AvroSource.writeOrdersAvro(src, dir)
    // distributed write: one .avro container per input partition
    val parts = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.endsWith(".avro"))
    assert(parts.length === 3, s"expected 3 container files, got ${parts.toSeq}")
    val back = AvroSource.readOrdersAvro(spark, dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      src.schema.map(f => (f.name, f.dataType)))
    val key = Seq("o_orderkey")
    assert(back.count() === src.count())
    assert(back.join(src, key, "left_anti").isEmpty &&
      back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty,
      "avro round trip must be value-exact on every column")
  }
}
