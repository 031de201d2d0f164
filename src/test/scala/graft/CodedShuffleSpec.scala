package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.WordCountOps
import graft.plans.CodedShuffleSim

class CodedShuffleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val docs = Tables.documents(spark, TestSpark.Sf0001).cache()

  test("coded shuffle reduces packets and decode is exact") {
    val acc = spark.sparkContext.longAccumulator("packetsSent")
    val accEnc = spark.sparkContext.longAccumulator("encodedPacketsSent")
    val r = CodedShuffleSim.simulate(docs, Some(acc), Some(accEnc), checkDecode = true)
    assert(r.decodedOk, "XOR decode must reproduce the exact word counts")
    assert(r.encodedPackets > 0, "fixture should offer coding opportunities")
    assert(r.packetsSent == r.naivePackets - r.encodedPackets)
    assert(r.packetsSent < r.naivePackets)
    // theoretical bound: coding at replication r=2 saves at most half
    assert(r.packetsSent * 2 >= r.naivePackets)
    // O14 counter analog
    assert(acc.value === r.packetsSent)
    assert(accEnc.value === r.encodedPackets)
  }

  test("simulation is deterministic") {
    val a = CodedShuffleSim.simulate(docs)
    val b = CodedShuffleSim.simulate(docs)
    assert(a === b)
  }

  test("tsv sink round-trips the wordcount (reference O11)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tsv").toString
    val wc = WordCountOps.wordCount(docs)
    WordCountOps.writeTsv(wc, dir)
    val back = spark.read.option("sep", "\t").csv(dir)
      .collect().map(r => r.getString(0) -> r.getString(1).toLong).toMap
    val expect = wc.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(back === expect)
  }
}
