package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raw-text ingestion — the reference's actual input format (O1,
  * `TextInputFormat` at `WordCountDriver.java:58`): line-oriented
  * text files become a documents-shaped DataFrame, so every text
  * operator (wordcount, dedup, fingerprints, ...) runs unchanged on
  * plain text corpora.
  *
  * The reference's `(byteOffset, line)` pair maps to
  * (`monotonically_increasing_id`, `value`); the originating file
  * (`input_file_name`) plays the split-location role (O3).
  */
object TextSource {

  /** Read line-oriented text file(s) as (doc_id, text, source, n_chars). */
  def readAsDocuments(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(
        monotonically_increasing_id().as("doc_id"),
        col("value").as("text"),
        regexp_extract(input_file_name(), "([^/]+)$", 1).as("source"),
        length(col("value")).cast("long").as("n_chars"))

  /** Materialize a documents table's text as plain line-oriented text
    * files (the reference's on-disk input format). Any embedded
    * newline re-splits a document into multiple lines on read-back —
    * global token counts are invariant to that, which is what the
    * text-scan wordcount query relies on.
    */
  def writeTextFixture(docs: DataFrame, path: String): Unit =
    docs.select(col("text")).write.mode("overwrite").text(path)

  /** Gzip-compressed variant: `spark.read.text` decompresses by file
    * extension, so the read side is [[readAsDocuments]] unchanged.
    * Scale note: gzip streams are NOT splittable — one file = one
    * read task regardless of size — so this is the ingestion-
    * compatibility path for externally-supplied .gz corpora; a
    * 100 TB corpus you control should land in a splittable container
    * (parquet/ORC) instead.
    */
  def writeTextFixtureGzip(docs: DataFrame, path: String): Unit =
    docs.select(col("text")).write.mode("overwrite")
      .option("compression", "gzip").text(path)
}
