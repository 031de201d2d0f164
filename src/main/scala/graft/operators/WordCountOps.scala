package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.NativeText

/** The reference's entire query surface — word count and its direct
  * derivatives (reference `src/wordcount/WordCount.java:44-63,226-241`)
  * — re-expressed as declarative DataFrame plans.
  *
  * Physical shape of `wordCount` (see `.explain("formatted")`):
  * {{{
  * HashAggregate(final)          <- reference O10 IntSumReducer
  *   Exchange hashpartitioning   <- reference O8 HashPartitioner shuffle
  *     HashAggregate(partial)    <- reference O5 combiner
  *       Generate explode        <- reference O2 tokenizer
  *         FileScan parquet [text]  (column-pruned: only `text` is read)
  * }}}
  * Partial aggregation before the exchange is what the reference built
  * its combiner for; Catalyst inserts it automatically, and at cluster
  * scale the shuffle carries one row per (partition, word) — not one
  * per token.
  */
object WordCountOps {

  /** Native tokenizer column (registers the expression first). */
  private def tokens(docs: DataFrame, textCol: String = "text"): Column = {
    NativeText.register(docs.sparkSession)
    NativeText.tokens(col(textCol))
  }

  /** (word, cnt) — `SELECT word, count(*) GROUP BY word`. */
  def wordCount(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(tokens(docs, textCol)).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("word")

  /** The wordcount with named plan metrics via `Dataset.observe` —
    * the modern form of the reference's O14 counters
    * (`WordCountDriver.java:17-20`): `tokens_seen` and `chars_seen`
    * are collected by the plan itself during the one pass (no second
    * job, no accumulator re-count on task retry — observed metrics
    * are exactly-once per completed query). Returns the observed
    * wordcount and the [[org.apache.spark.sql.Observation]] handle to
    * read after an action.
    */
  def wordCountObserved(docs: DataFrame): (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation("graft_wordcount")
    val words = docs
      .select(explode(tokens(docs)).as("word"))
      .observe(obs, count(lit(1)).as("tokens_seen"),
        sum(length(col("word"))).as("chars_seen"))
    (words.groupBy("word").agg(count(lit(1)).as("cnt")).orderBy("word"), obs)
  }

  /** Driver-surface form of [[wordCountObserved]]: runs the observed
    * wordcount to completion and returns the exactly-once plan
    * metrics as a one-row DataFrame — oracle-checkable because both
    * totals are plain aggregates over the same tokenization
    * (`tokens_seen` = token count, `chars_seen` = total token
    * length). The single action materializes the counts; the returned
    * row is O(1) driver state, same size class as the coded-shuffle
    * counter summary.
    */
  def wordCountObservedMetrics(docs: DataFrame): DataFrame = {
    val (wc, obs) = wordCountObserved(docs)
    wc.count() // one action: fires the plan, populates the observation
    val row = obs.get
    val spark = docs.sparkSession
    import spark.implicits._
    Seq((row("tokens_seen").asInstanceOf[Long],
      row("chars_seen").asInstanceOf[Long]))
      .toDF("tokens_seen", "chars_seen")
  }

  /** Counts grouped by provenance — the analog of the reference's
    * split-location tagging (O3, `WordCount.java:48-59`): the `source`
    * column plays the role of the input-split host list.
    */
  def wordCountPerSource(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), explode(tokens(docs)).as("word"))
      .groupBy("source", "word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("source", "word")

  /** Top-k words. TakeOrderedAndProject: each partition keeps a k-sized
    * heap, the driver merges — no global sort at any scale.
    */
  def wordCountTopK(docs: DataFrame, k: Int = 20): DataFrame =
    docs
      .select(explode(tokens(docs)).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("word"))
      .limit(k)

  /** Case-PRESERVING word count — the reference's raw
    * `StringTokenizer` semantics (`WordCount.java:45-47`: split on
    * `" \t\n\r\f"`, no normalization). The default [[wordCount]]
    * lowercases as a deliberate normalization choice (most text
    * pipelines want case-folded counts); this variant is the exact
    * reference token identity, driver-gated with its own oracle.
    */
  def wordCountCased(docs: DataFrame): DataFrame =
    docs
      .select(explode(filter(split(col("text"), "[ \\t\\n\\r\\f]+"),
        w => w =!= "")).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("word")

  /** Distinct vocabulary (dedup on the token stream). */
  def distinctWords(docs: DataFrame): DataFrame =
    docs
      .select(explode(tokens(docs)).as("word"))
      .distinct()
      .orderBy("word")

  /** Composite-key aggregation — the reference's `GroupedWord`
    * (locations[], word) key semantics (`GroupedWord.java:12-35`),
    * with (lang, word) as the composite grouping key.
    */
  def groupedKeyAgg(docs: DataFrame): DataFrame =
    docs
      .select(col("lang"), col("doc_id"), explode(tokens(docs)).as("word"))
      .groupBy("lang", "word")
      .agg(count(lit(1)).as("cnt"), countDistinct(col("doc_id")).as("n_docs"))
      .orderBy("lang", "word")

  /** Uncoded shuffle-packet accounting — the reference's PACKETS_SENT
    * counter semantics (O14, `WordCountDriver.java:17-20`): one packet
    * per distinct (map-locality, word) partial aggregate. Two-level
    * aggregation; the first level is exactly the partial-aggregate
    * count the combiner would emit.
    */
  def packetsBaseline(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), explode(tokens(docs)).as("word"))
      .groupBy("source", "word").agg(count(lit(1)).as("cnt"))
      .groupBy("source").agg(count(lit(1)).as("packets"), sum("cnt").as("tokens"))
      .orderBy("source")

  /** Reference O11 sink parity (`WordCountDriver.java:59`, default
    * TextOutputFormat): write `word TAB count` text lines.
    */
  def writeTsv(wordcounts: DataFrame, path: String): Unit =
    wordcounts.write.mode("overwrite").option("sep", "\t").csv(path)

  /** Faithful O4: the reference's `FileLocationsLookup`
    * (`FileLocationsLookup.java:20-65`) maps a record's byte offset
    * to its HDFS block and that block's replica hosts. Analog: a
    * document's offset within its source file is the running sum of
    * `n_chars` (one window pass, partitioned by source); offset /
    * blockSize is the block; the replica pair {h, (h+1) % 3}
    * (reference topology: 3 nodes, replication 2,
    * `WordCount.java:141,174`) comes from an arithmetic hash of
    * (source, block) that the SQL oracle reproduces exactly. Output
    * is the per-block lookup table — block, hosts, document count,
    * first offset — that a locality-aware scheduler would consume.
    */
  def offsetRangeLookup(docs: DataFrame, blockSize: Long = 4096): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("offset", coalesce(sum(col("n_chars")).over(w), lit(0L)))
      .withColumn("block", floor(col("offset") / blockSize).cast("long"))
      .withColumn("h", pmod(col("block") + length(col("source")), lit(3)).cast("long"))
      .groupBy("source", "block", "h")
      .agg(count(lit(1)).as("n_docs"), min("offset").as("first_offset"))
      .select(col("source"), col("block"),
        concat(lit("node"), col("h").cast("string"),
          lit(",node"), pmod(col("h") + 1, lit(3)).cast("string")).as("hosts"),
        col("n_docs"), col("first_offset"))
      .orderBy("source", "block")
  }
}
