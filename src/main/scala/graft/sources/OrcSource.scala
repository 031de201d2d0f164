package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** ORC ingestion/staging — the second columnar format next to parquet
  * ([[graft.Tables]]). Same declared-schema discipline as
  * [[DelimitedSource]]: no inference pass, stable types, and the
  * reader keeps column pruning + predicate pushdown (ORC carries its
  * own min/max indexes, so `PushedFilters` applies just like the
  * parquet path).
  */
object OrcSource {

  def writeOrcFixture(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)
}
