package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV / JSON-lines ingestion: the other two text-based formats a
  * training-data pipeline ingests besides raw lines
  * ([[TextSource]]) and parquet ([[graft.Tables]]).
  *
  * Both readers take an explicit schema — at 100 TB, schema
  * inference is a full extra pass over the data; a declared schema
  * keeps the scan single-pass and the types stable. Fixture writers
  * project the needed columns BEFORE writing, so the round-trip
  * never depends on CSV/JSON serialization of types the query does
  * not touch.
  */
object DelimitedSource {

  def writeCsvFixture(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  def writeJsonlFixture(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Sink counterpart: hive-style partitioned parquet layout
    * (`path/col=value/...`) — the standard way a pipeline stages data
    * so downstream scans prune whole partitions by filter.
    */
  def writePartitionedParquet(df: DataFrame, path: String,
                              partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
}
