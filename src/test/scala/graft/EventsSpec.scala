package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventsOps

class EventsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mkEvents(rows: (Long, Long, Long)*) = // (event_id, ms, user_id)
    rows.toDF("event_id", "ms", "user_id")
      .selectExpr("event_id", "ms * 1000000 AS ts", "user_id",
        "'click' AS event_type", "1.0 AS value", "'{}' AS props")

  test("sessionize splits on gaps > 30 min") {
    val m = 60L * 1000L
    val ev = mkEvents(
      (1, 0, 1), (2, 10 * m, 1), (3, 50 * m, 1),     // user 1: 2 sessions
      (4, 0, 2), (5, 29 * m, 2), (6, 58 * m, 2))     // user 2: 1 session (gaps 29m)
    val res = EventsOps.sessionize(ev).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(res === Map(1L -> 2L, 2L -> 1L))
  }

  test("sessionize on fixture: spans below gap-free bound") {
    val ev = Tables.events(spark, TestSpark.Sf0001)
    val res = EventsOps.sessionize(ev).collect()
    assert(res.nonEmpty)
    res.foreach { r =>
      assert(r.getLong(1) >= 1L)                  // n_sessions
      assert(r.getDouble(2) >= 1.0)               // avg events/session
      assert(r.getLong(3) >= 0L)                  // max span
    }
  }

  test("as-of join picks the strictly prior click") {
    val m = 60L * 1000L
    val ev = Seq(
      (1L, 0L, 1L, "click"), (2L, 5 * m, 1L, "purchase"),   // gap 5m
      (3L, 6 * m, 1L, "click"), (4L, 6 * m, 1L, "purchase"), // same-ms click is prior by event_id
      (5L, 0L, 2L, "purchase"))                              // no prior click -> null
      .toDF("event_id", "ms", "user_id", "event_type")
      .selectExpr("event_id", "ms * 1000000 AS ts", "user_id", "event_type",
        "1.0 AS value", "'{}' AS props")
    val rows = EventsOps.asofPurchaseClick(ev).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(rows === Map(2L -> 5 * m, 4L -> 0L, 5L -> -1L))
  }

  test("session_window records equal the lag+cumsum records, including the exact-gap boundary") {
    import spark.implicits._
    val m = 60L * 1000L
    // fixture corpus equality
    val ev = Tables.events(spark, TestSpark.Sf0001)
    val a = EventsOps.sessionRecords(ev).collect().map(_.toString).toSeq
    val b = EventsOps.sessionRecordsViaSessionWindow(ev).collect().map(_.toString).toSeq
    assert(a.nonEmpty && a === b)
    // boundary: an event at EXACTLY the 30-minute gap stays in the
    // session under the strict `diff > gap` cut; one ms past it cuts
    val edge = Seq(
      (1L, 0L, 1L), (2L, 30 * m, 1L),          // diff == gap: same session
      (3L, 0L, 2L), (4L, 30 * m + 1, 2L))      // diff == gap+1: cut
      .toDF("event_id", "ms", "user_id")
      .selectExpr("event_id", "ms * 1000000 AS ts", "user_id",
        "'view' AS event_type", "1.0 AS value", "'{}' AS props")
    val lagForm = EventsOps.sessionRecords(edge).collect().map(_.toString).toSeq
    val winForm = EventsOps.sessionRecordsViaSessionWindow(edge).collect().map(_.toString).toSeq
    assert(lagForm === winForm)
    assert(lagForm.length === 3, s"user 1: one merged session; user 2: two:\n$lagForm")
  }

  test("approx distinct users within rsd of exact") {
    val ev = Tables.events(spark, TestSpark.Sf0001)
    val approx = EventsOps.approxDistinctUsers(ev).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = EventsOps.distinctUsersSalted(ev).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, n) =>
      assert(math.abs(approx(t) - n).toDouble / n < 0.1, s"$t: ${approx(t)} vs $n")
    }
  }

  test("hourly buckets cover all events") {
    val ev = Tables.events(spark, TestSpark.Sf0001)
    val total = ev.count()
    val bucketed = EventsOps.hourly(ev).collect().map(_.getLong(2)).sum
    assert(bucketed === total)
  }

  test("daily gapfill zero-fills the holes (the fixture has none — synthetic)") {
    // type A logs on days 0 and 3 of a 4-day span; type B only on
    // day 1. Grid must be 2 types x 4 days = 8 rows, with the 5
    // silent (type, day) cells zero-filled — a plain groupBy would
    // return 3 rows and corrupt any downstream moving average.
    val dayNanos = 86400L * 1000000000L
    val rows = Seq(
      ("A", 0L, 1.0), ("A", 3L, 2.0), ("B", 1L, 5.0))
    val ev = spark.createDataFrame(rows.map { case (t, d, v) =>
      (d * 10 + t.hashCode.toLong, d * dayNanos, 1L, t, v)
    }).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventsOps.dailyGapfill(ev).collect()
    assert(out.length === 8, s"expected the full 2x4 grid, got ${out.length}")
    val zeros = out.filter(_.getLong(2) == 0L)
    assert(zeros.length === 5, s"expected 5 zero-filled cells, got ${zeros.length}")
    zeros.foreach(r => assert(r.getDouble(3) === 0.0))
    val a0 = out.find(r => r.getString(0) == "A" && r.getString(1).endsWith("-01")).get
    assert(a0.getLong(2) === 1L && a0.getDouble(3) === 1.0)
  }
}
