package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * Every query in the engine takes `(SparkSession, sfDir)` and pulls its
  * inputs through here, so the scan always goes through the parquet
  * datasource V2 path (column pruning + predicate pushdown land in the
  * FileScan — see `.explain("formatted")`: `PushedFilters`/`ReadSchema`).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** The engine-internal `events.ts` contract is nanos-since-epoch
    * LONG ([[graft.operators.EventsOps]] does all time math on
    * integers, so no precision is lost vs the DuckDB oracle's native
    * timestamp functions). The fixture's physical type has varied
    * across driver regenerations — TIMESTAMP(NANOS) (readable only as
    * Long via `nanosAsLong`) and TIMESTAMP(MICROS) (read as NTZ) —
    * so [[normalizeEventsTs]] maps whatever the reader produced onto
    * the contract instead of assuming one physical layout. The NTZ
    * branch interprets wall time as UTC (the session timezone every
    * entry point pins), matching DuckDB's naive-timestamp read of the
    * same file.
    */
  def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType => df
      case TimestampNTZType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr(
            "unix_micros(cast(ts as timestamp)) * 1000"))
      case TimestampType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr("unix_micros(ts) * 1000"))
      case other => sys.error(s"unexpected events.ts type: $other")
    }
  }

  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // UTC is pinned by every entry point (TestSpark / Verify / Bench /
    // SparkEntry); the NTZ branch of normalizeEventsTs reads the session
    // TZ lazily at execution, so assert the contract here rather than
    // re-mutating global state as a table-load side effect.
    require(s.conf.get("spark.sql.session.timeZone") == "UTC",
      "events requires spark.sql.session.timeZone=UTC (pinned by entry points)")
    normalizeEventsTs(load(s, d, "events"))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
