package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, pmod}

import graft.functions.VectorFunctions
import graft.operators._

/** Registry slice: reference parity: the wordcount family. */
private[graft] trait QueriesWordcount extends QueriesOracleHelpers {

  protected lazy val wordcountRegistry: Seq[(String, QueryDef)] = Seq(

    // ----- reference parity: the wordcount family ---------------------
    "wordcount" -> QueryDef(
      (s, d) => WordCountOps.wordCount(Tables.documents(s, d)),
      Some(s"""SELECT word, count(*) AS cnt FROM (
              |  SELECT unnest($toksSql) AS word FROM documents
              |) GROUP BY word ORDER BY word""".stripMargin)),

    "wordcount_per_source" -> QueryDef(
      (s, d) => WordCountOps.wordCountPerSource(Tables.documents(s, d)),
      Some(s"""SELECT source, word, count(*) AS cnt FROM (
              |  SELECT source, unnest($toksSql) AS word FROM documents
              |) GROUP BY source, word ORDER BY source, word""".stripMargin)),

    // gzip-compressed raw-text ingestion: same token totals as the
    // parquet corpus (line re-splits are count-invariant); gz is the
    // non-splittable compatibility path — see TextSource scaladoc
    "wordcount_textscan_gz" -> QueryDef(
      (s, d) => {
        val fixture = graft.sources.Fixtures.ensure("textscan_gz", d,
          Seq(s"$d/documents.parquet")) { p =>
          graft.sources.TextSource.writeTextFixtureGzip(Tables.documents(s, d), p)
        }
        WordCountOps.wordCount(graft.sources.TextSource.readAsDocuments(s, fixture))
      },
      Some(s"""SELECT word, count(*) AS cnt FROM (
              |  SELECT unnest($toksSql) AS word FROM documents
              |) GROUP BY word ORDER BY word""".stripMargin)),

    // O14 exactly-once counters on the driver path: the observed
    // metrics row is recomputed by the oracle as plain aggregates
    // over the same tokenization
    "wordcount_observed" -> QueryDef(
      (s, d) => WordCountOps.wordCountObservedMetrics(Tables.documents(s, d)),
      Some(s"""SELECT CAST(count(*) AS BIGINT) AS tokens_seen,
              |  CAST(sum(length(word)) AS BIGINT) AS chars_seen FROM (
              |  SELECT unnest($toksSql) AS word FROM documents)""".stripMargin)),

    "wordcount_topk" -> QueryDef(
      (s, d) => WordCountOps.wordCountTopK(Tables.documents(s, d)),
      Some(s"""SELECT word, count(*) AS cnt FROM (
              |  SELECT unnest($toksSql) AS word FROM documents
              |) GROUP BY word ORDER BY cnt DESC, word LIMIT 20""".stripMargin)),

    // case-preserving reference StringTokenizer semantics (the default
    // wordcount lowercases by documented choice — SURVEY §7)
    "wordcount_cased" -> QueryDef(
      (s, d) => WordCountOps.wordCountCased(Tables.documents(s, d)),
      Some("""SELECT word, count(*) AS cnt FROM (
             |  SELECT unnest(list_filter(string_split_regex(text, '[ \t\n\r\f]+'), w -> w <> '')) AS word FROM documents
             |) GROUP BY word ORDER BY word""".stripMargin)),

    // the reference's actual O1 input format, driver-gated: documents
    // round-trip through line-oriented text files and the wordcount
    // runs on the raw-text scan; global token counts are invariant to
    // the line re-splitting, so the parquet wordcount oracle applies
    "wordcount_textscan" -> QueryDef(
      (s, d) => {
        val fixture = graft.sources.Fixtures.ensure("textscan", d,
          Seq(s"$d/documents.parquet")) { p =>
          graft.sources.TextSource.writeTextFixture(Tables.documents(s, d), p)
        }
        WordCountOps.wordCount(graft.sources.TextSource.readAsDocuments(s, fixture))
      },
      Some(s"""SELECT word, count(*) AS cnt FROM (
              |  SELECT unnest($toksSql) AS word FROM documents
              |) GROUP BY word ORDER BY word""".stripMargin)),

    // CSV ingestion: orders round-trip through headered CSV (only the
    // queried columns are written, so serialization of untouched
    // types never enters the picture) and aggregate per status
    "orders_csv_scan" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.functions.{col, count, lit, round, sum}
        val src = Tables.orders(s, d).select("o_orderstatus", "o_totalprice")
        val fixture = graft.sources.Fixtures.ensure("orderscsv", d,
          Seq(s"$d/orders.parquet")) { p =>
          graft.sources.DelimitedSource.writeCsvFixture(src, p)
        }
        graft.sources.DelimitedSource.readCsv(s, fixture, src.schema)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_orders"),
            round(sum(col("o_totalprice").cast("decimal(15,2)")), 2)
              .cast("double").as("revenue"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n_orders,
             |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(15,2))), 2) AS DOUBLE) AS revenue
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // Avro ingestion (no spark-avro connector in this runtime: built
    // on avro-mapred's sync-marker-splittable Hadoop input format —
    // sources/AvroSource.scala). min/max o_orderdate prove the
    // epoch-micros timestamp round trip; revenue is decimal-exact
    // (new queries may not round a double sum — RegistrySpec pin)
    "orders_avro_scan" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.functions.{col, count, lit, max, min, round, sum}
        val fixture = graft.sources.AvroSource.ordersAvroDir(Tables.orders(s, d), d)
        graft.sources.AvroSource.readOrdersAvro(s, fixture)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_orders"),
            round(sum(col("o_totalprice").cast("decimal(15,2)")), 2)
              .cast("double").as("revenue"),
            min(col("o_orderdate")).as("first_date"),
            max(col("o_orderdate")).as("last_date"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n_orders,
             |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(15,2))), 2) AS DOUBLE) AS revenue,
             |  min(o_orderdate) AS first_date, max(o_orderdate) AS last_date
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // JSON-lines ingestion: documents metadata round-trips through
    // JSONL and aggregates per language
    "documents_jsonl_scan" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.functions.{col, count, lit, sum}
        val src = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
        val fixture = graft.sources.Fixtures.ensure("docsjsonl", d,
          Seq(s"$d/documents.parquet")) { p =>
          graft.sources.DelimitedSource.writeJsonlFixture(src, p)
        }
        graft.sources.DelimitedSource.readJsonl(s, fixture, src.schema)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
          .orderBy("lang")
      },
      Some("""SELECT lang, count(*) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS total_chars
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // ORC ingestion: the second columnar format — lineitem measures
    // round-trip through ORC (declared schema, pruned+pushed scan)
    // and aggregate per return flag; oracle reads the parquet source
    "lineitem_orc_scan" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.functions.{col, count, lit, round, sum}
        val src = Tables.lineitem(s, d).select("l_returnflag", "l_quantity", "l_extendedprice")
        val fixture = graft.sources.Fixtures.ensure("lineitemorc", d,
          Seq(s"$d/lineitem.parquet")) { p =>
          graft.sources.OrcSource.writeOrcFixture(src, p)
        }
        graft.sources.OrcSource.readOrc(s, fixture, src.schema)
          .where(col("l_quantity") >= 10)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n_lines"),
            round(sum(col("l_extendedprice").cast("decimal(15,2)")), 2)
              .cast("double").as("revenue"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, count(*) AS n_lines,
             |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(15,2))), 2) AS DOUBLE) AS revenue
             |FROM lineitem WHERE l_quantity >= 10
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    "distinct_words" -> QueryDef(
      (s, d) => WordCountOps.distinctWords(Tables.documents(s, d)),
      Some(s"""SELECT DISTINCT word FROM (
              |  SELECT unnest($toksSql) AS word FROM documents
              |) ORDER BY word""".stripMargin)),

    "grouped_key_agg" -> QueryDef(
      (s, d) => WordCountOps.groupedKeyAgg(Tables.documents(s, d)),
      Some(s"""SELECT lang, word, count(*) AS cnt, count(DISTINCT doc_id) AS n_docs FROM (
              |  SELECT lang, doc_id, unnest($toksSql) AS word FROM documents
              |) GROUP BY lang, word ORDER BY lang, word""".stripMargin)),

    "packets_baseline" -> QueryDef(
      (s, d) => WordCountOps.packetsBaseline(Tables.documents(s, d)),
      Some(s"""WITH pa AS (
              |  SELECT source, word, count(*) AS cnt FROM (
              |    SELECT source, unnest($toksSql) AS word FROM documents
              |  ) GROUP BY source, word)
              |SELECT source, count(*) AS packets, CAST(sum(cnt) AS BIGINT) AS tokens
              |FROM pa GROUP BY source ORDER BY source""".stripMargin)),

    // faithful O4 (FileLocationsLookup): offset -> block -> replica
    // hosts; running-sum offsets, arithmetic host hash the oracle
    // reproduces exactly
    "offset_range_lookup" -> QueryDef(
      (s, d) => WordCountOps.offsetRangeLookup(Tables.documents(s, d)),
      Some("""WITH o AS (
             |  SELECT doc_id, source, n_chars,
             |    CAST(coalesce(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
             |  FROM documents),
             |b AS (SELECT source, off // 4096 AS block,
             |        (off // 4096 + length(source)) % 3 AS h, off
             |      FROM o)
             |SELECT source, block,
             |  'node' || h::VARCHAR || ',node' || ((h + 1) % 3)::VARCHAR AS hosts,
             |  count(*) AS n_docs, min(off) AS first_offset
             |FROM b GROUP BY source, block, h ORDER BY source, block""".stripMargin)),
  )
}
