package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.functions.expressions.{MinHashSignature, RollingFingerprintExpr, SimHashSignature, Tokenize, WinnowFingerprintsExpr, WordNgramsExpr}

/** Property-based checks of the native expressions via direct
  * Catalyst `eval` (no Spark jobs — thousands of cases per second).
  */
object ExpressionProperties extends Properties("graft.expressions") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(200)

  private val delimChars = Gen.oneOf(' ', '\t', '\n', '\r', '\f')
  private val wordChar = Gen.frequency(
    9 -> Gen.alphaChar, 2 -> Gen.numChar, 1 -> Gen.oneOf('.', ',', '!', '_'))
  private val rawString: Gen[String] = Gen.listOfN(
    40, Gen.frequency(4 -> wordChar, 1 -> delimChars)).map(_.mkString)
  private val wordList: Gen[List[String]] =
    Gen.listOf(Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)).map(_.take(20))

  private def tokenize(s: String): Seq[String] =
    Tokenize(Literal(UTF8String.fromString(s), StringType))
      .eval(null).asInstanceOf[ArrayData]
      .toObjectArray(StringType).toSeq.map(_.toString)

  private def strArrayLit(xs: Seq[String]) =
    Literal.create(xs, ArrayType(StringType))

  property("tokenize matches java.util.StringTokenizer semantics") =
    forAll(rawString) { s =>
      val model = {
        val st = new java.util.StringTokenizer(s.toLowerCase)
        val b = Seq.newBuilder[String]
        while (st.hasMoreTokens) b += st.nextToken()
        b.result()
      }
      tokenize(s) == model
    }

  property("tokenize distributes over whitespace concatenation") =
    forAll(rawString, rawString) { (a, b) =>
      tokenize(a + " " + b) == tokenize(a) ++ tokenize(b)
    }

  property("ngram count is len-n+1 (or 0 below n)") =
    forAll(wordList, Gen.choose(1, 6)) { (ws, n) =>
      val out = WordNgramsExpr(strArrayLit(ws), n)
        .eval(null).asInstanceOf[ArrayData].numElements()
      out == math.max(0, ws.length - n + 1)
    }

  property("rolling fingerprint equals the fold model") =
    forAll(wordList) { ws =>
      val got = RollingFingerprintExpr(strArrayLit(ws)).eval(null)
        .asInstanceOf[Long]
      val model = ws.foldLeft(0L) { (h, w) =>
        (h * 31L + (7L * w.length + (if (w.isEmpty) 0L else w.codePointAt(0).toLong))) % 1000000007L
      }
      got == model
    }

  private def sig(xs: Seq[String]): Seq[Long] =
    MinHashSignature(strArrayLit(xs), 16, 1000000007L)
      .eval(null).asInstanceOf[ArrayData].toLongArray().toSeq

  property("minhash signature of a union is the elementwise min") =
    forAll(wordList, wordList) { (a, b) =>
      sig(a ++ b) == sig(a).zip(sig(b)).map { case (x, y) => math.min(x, y) }
    }

  property("minhash signature is order- and duplicate-invariant") =
    forAll(wordList) { ws =>
      sig(ws) == sig(scala.util.Random.shuffle(ws ++ ws))
    }

  private def simsig(xs: Seq[String], bits: Int): Long =
    SimHashSignature(strArrayLit(xs), bits).eval(null).asInstanceOf[Long]

  property("simhash equals the md5 bit-count model") =
    forAll(wordList, Gen.oneOf(20, 32)) { (ws, bits) =>
      val counts = new Array[Int](bits)
      ws.foreach { w =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(w.getBytes("UTF-8"))
        val hex = d.take(8).map(b => f"$b%02x").mkString.take(15)
        val h = java.lang.Long.parseLong(hex, 16) % 4294967291L
        (0 until bits).foreach { j =>
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        }
      }
      val model = (0 until bits).map(j => if (counts(j) > 0) 1L << j else 0L).sum
      simsig(ws, bits) == model
    }

  property("simhash is order-invariant and scales with duplication") =
    forAll(wordList) { ws =>
      simsig(ws, 32) == simsig(scala.util.Random.shuffle(ws), 32) &&
        simsig(ws ++ ws, 32) == simsig(ws, 32)
    }

  private def winnow(xs: Seq[String], w: Int): Seq[Long] =
    WinnowFingerprintsExpr(strArrayLit(xs), w)
      .eval(null).asInstanceOf[ArrayData].toLongArray().toSeq

  /** The naive model: md5-prefix-60-bit hash per gram, min of every
    * length-`w` window, distinct in first-occurrence order.
    */
  private def winnowModel(xs: Seq[String], w: Int): Seq[Long] = {
    if (xs.length < w) return Seq.empty
    val hs = xs.map { g =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8"))
        .take(8).map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    hs.sliding(w).map(_.min).toSeq.distinct
  }

  property("winnow fingerprints equal the sliding-min model") =
    forAll(wordList, Gen.choose(1, 6)) { (ws, w) =>
      winnow(ws, w) == winnowModel(ws, w)
    }

  property("winnowing guarantee: a shared w-gram run shares a fingerprint") =
    forAll(wordList, wordList, wordList,
      Gen.listOfN(6, Gen.alphaLowerChar.map(_.toString))) { (a, b, c, run) =>
      // any two documents containing the same w consecutive grams
      // must share at least one fingerprint (w = 5 < run length 6)
      val d1 = winnow(a ++ run ++ b, 5).toSet
      val d2 = winnow(c ++ run, 5).toSet
      d1.intersect(d2).nonEmpty
    }
}
