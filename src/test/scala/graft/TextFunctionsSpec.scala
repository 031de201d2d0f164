package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions._

class TextFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tok(s: String): Seq[String] =
    Seq(s).toDF("text").select(tokens(col("text")).as("t"))
      .head.getSeq[String](0)

  test("tokens matches StringTokenizer delimiter semantics") {
    assert(tok("a b\tc\nd\re\ff") === Seq("a", "b", "c", "d", "e", "f"))
    assert(tok("  leading and   runs ") === Seq("leading", "and", "runs"))
    assert(tok("") === Seq.empty)
    assert(tok(" \t\n") === Seq.empty)
    assert(tok("MiXeD Case") === Seq("mixed", "case"))
  }

  test("wordNgrams produces n-1 fewer entries, empty below n") {
    val df = Seq("a b c d").toDF("text")
      .select(wordNgrams(tokens(col("text")), 2).as("g"))
    assert(df.head.getSeq[String](0) === Seq("a b", "b c", "c d"))
    val short = Seq("a b").toDF("text")
      .select(wordNgrams(tokens(col("text")), 5).as("g"))
    assert(short.head.getSeq[String](0) === Seq.empty)
  }

  test("rollingFingerprint is deterministic and order-sensitive") {
    def fp(s: String): Long =
      Seq(s).toDF("text").select(rollingFingerprint(tokens(col("text"))).as("h"))
        .head.getLong(0)
    assert(fp("a b c") === fp("a b c"))
    assert(fp("a b c") !== fp("c b a"))
    assert(fp("") === 0L)
  }
}
