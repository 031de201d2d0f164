package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned layout + partition-pruned reads — the OTHER half
  * of the 100 TB read-path story next to [[Bucketing]]: a production
  * corpus is laid out `events/day=YYYY-MM-DD/part-*.parquet`, and a
  * query constrained to a date range must open only the matching
  * directories (partition pruning in the scan), not filter after
  * reading everything. PlanAuditSpec pins that the pruned scan's
  * selected-partition count is the filter's day count, strictly below
  * the table's total.
  */
object Partitioning {

  /** Inclusive day range for [[eventsPartitionPruned]]; the DuckDB
    * oracle is generated from the same constants, so the two sides
    * cannot silently diverge. One week out of the fixture's 30 days —
    * the pruned scan must touch 7 of 30 partition directories.
    */
  val PruneDayFrom = "2024-01-10"
  val PruneDayTo = "2024-01-16"

  /** Write-once date-partitioned copy of `events` under /tmp
    * ([[Fixtures.ensure]] keying: dataset basename + source parquet
    * fingerprint), `day=YYYY-MM-DD/` derived from the nanos `ts` with
    * integer ms math (the [[graft.operators.EventsOps]] convention,
    * so the oracle's `date_trunc` over TIMESTAMP_NS sees identical
    * day cuts). Returns a reader over the partitioned layout with
    * `day` kept as STRING (partition-column type inference would
    * otherwise make it DATE and the schema engine-dependent).
    */
  def partitionedEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val path = Fixtures.ensure("events_bydate", sfDir,
      Seq(s"$sfDir/events.parquet")) { p =>
      graft.Tables.events(spark, sfDir)
        .withColumn("day",
          date_format(date_trunc("day", timestamp_millis(expr("ts div 1000000"))), "yyyy-MM-dd"))
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(p)
    }
    // explicit schema: the written `ts` is nanos Long and `day` must
    // stay STRING (partition-column type inference would make it DATE
    // and the pruning filter below would sit behind a cast)
    val schema = graft.Tables.events(spark, sfDir).schema
      .add("day", org.apache.spark.sql.types.StringType)
    spark.read.schema(schema).parquet(path)
  }

  /** Per-(day, type) counts and value sums over ONE WEEK of the
    * date-partitioned layout. The `day` predicate is a pure
    * partition-column filter: it resolves against directory names at
    * planning time (7 of 30 directories opened; zero data pages read
    * outside the range) — at 100 TB this is the difference between
    * scanning ~23% of a month and all of it. Everything after the
    * pruned scan is one bounded aggregate exchange.
    */
  def eventsPartitionPruned(spark: SparkSession, sfDir: String): DataFrame =
    partitionedEvents(spark, sfDir)
      .where(col("day") >= PruneDayFrom && col("day") <= PruneDayTo)
      .groupBy("day", "event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .orderBy("day", "event_type")

  /** Dim-side value threshold for [[eventsDppJoin]]'s hot-day set;
    * the DuckDB oracle is generated from the same constant.
    */
  val DppHotValue = 0.9

  /** Dynamic-partition-pruning shape over the partitioned layout:
    * per-day event stats restricted to the days that saw a
    * high-value purchase — a dimension only known at RUNTIME, so
    * unlike [[eventsPartitionPruned]]'s literal range the pruning
    * filter is a `dynamicpruning` subquery: Catalyst runs the tiny
    * dim aggregate first and prunes the fact directories with its
    * result (RuntimeFilterSpec pins the mechanism; at 100 TB this is
    * "scan 4 hot days, not the month" without any literal in the
    * query). The dim side derives from the FLAT table, stays
    * |days|-row, and broadcasts.
    */
  def eventsDppJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val hotDays = graft.Tables.events(spark, sfDir)
      .where(col("event_type") === "purchase" && col("value") > DppHotValue)
      .select(date_format(date_trunc("day",
        timestamp_millis(expr("ts div 1000000"))), "yyyy-MM-dd").as("day"))
      .distinct()
    partitionedEvents(spark, sfDir)
      .join(broadcast(hotDays), Seq("day"))
      .groupBy("day")
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .orderBy("day")
  }
}
