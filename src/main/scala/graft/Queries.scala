package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, pmod}

import graft.functions.VectorFunctions
import graft.operators._

/** One engine query: the Spark plan builder plus (when the semantics
  * are SQL-expressible) the equivalent DuckDB oracle SQL the driver
  * hash-compares against.
  */
final case class QueryDef(
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Central registry wiring [[Tables]] to the operator families.
  * `SparkEntry` exposes exactly this map to the driver.
  *
  * Oracle dialect notes (DuckDB 1.0):
  *  - tokenization mirrors [[graft.functions.TextFunctions.tokens]]
  *    exactly (same regex, same empty-drop, same lower());
  *  - counts are BIGINT on both sides (Spark `size()` is cast);
  *  - double aggregates are rounded identically on both sides;
  *  - vector math reproduces the same IEEE754 op sequence as the
  *    native expressions in [[graft.functions.expressions]].
  */
object Queries {

  /** Watermark delay (ms) of the streamed watermark layout — the
    * oracle must apply the same horizon the stream ran with.
    */
  private val wmDelayMs = graft.streaming.EventStreams.WatermarkDelayMs

  /** Shared oracle of `priority_sample_weighted` AND
    * `streamed_priority_sample`: the streamed fold's final state must
    * replay the batch sampler over the whole corpus row for row
    * (top-K over union is associative), so one SQL text gates both.
    */
  private lazy val prioritySampleSql =
    s"""WITH h AS (SELECT source, doc_id, n_chars,
       |  ${graft.operators.PipelineOps.SamplePrioritySql} AS priority FROM documents),
       |r AS (SELECT *, row_number() OVER (PARTITION BY source
       |        ORDER BY priority DESC, doc_id) AS rnk FROM h)
       |SELECT source, rnk AS smp_rank, doc_id, n_chars, priority
       |FROM r WHERE rnk <= ${graft.operators.PipelineOps.PrioK}
       |ORDER BY source, smp_rank""".stripMargin

  /** DuckDB: lower-cased whitespace tokens, empties dropped. */
  /** Okapi BM25 oracle — shared verbatim by `bm25_topk` (inline
    * aggregation) and `bm25_indexed` (persisted postings probe): the
    * two engine paths must produce identical rows, so one SQL text
    * gates both. The scoring expression mirrors
    * [[graft.operators.RetrievalOps]] token-for-token (same literal
    * folding, same left-associative op sequence) so the hash gate
    * pins the exact IEEE arithmetic.
    */
  private lazy val bm25Sql = bm25SqlRanking("")

  /** [[bm25Sql]] with an optional WHERE on the ranked set — the
    * delete-leg oracle ranks only LIVE documents while keeping the
    * full-corpus statistics (the stale-stats deferred-delete
    * semantics the tombstoned index implements).
    */
  private def bm25SqlRanking(rankWhere: String): String =
    s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS word FROM documents),
       |tf AS (SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY 1, 2),
       |tfd AS (SELECT doc_id, word, tf, sum(tf) OVER (PARTITION BY doc_id) AS dl FROM tf),
       |ws AS (SELECT word, sum(tf) AS ctf, count(*) AS df FROM tf GROUP BY word),
       |q AS (SELECT word, df FROM (
       |        SELECT word, df, row_number() OVER (ORDER BY ctf DESC, word) AS qrank FROM ws)
       |      WHERE qrank > 5 AND qrank <= 10),
       |stats AS (SELECT (SELECT count(*)::DOUBLE FROM documents) AS n_docs,
       |        (SELECT sum(tf)::DOUBLE / count(DISTINCT doc_id) FROM tf) AS avgdl),
       |sc AS (SELECT t.doc_id,
       |        ln((n_docs - q.df + 0.5) / (q.df + 0.5) + 1.0)
       |          * (t.tf * (1.2 + 1.0))
       |          / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * t.dl / avgdl)) AS contrib
       |      FROM tfd t JOIN q USING (word) CROSS JOIN stats),
       |agg AS (SELECT doc_id, sum(contrib) AS score_raw, count(*) AS n_hits FROM sc GROUP BY doc_id),
       |r AS (SELECT doc_id, n_hits, score_raw,
       |        row_number() OVER (ORDER BY round(score_raw, 6) DESC, doc_id) AS rnk
       |      FROM agg $rankWhere)
       |SELECT doc_id, rnk, n_hits, round(score_raw, 4) + 0 AS score
       |FROM r WHERE rnk <= 10 ORDER BY rnk""".stripMargin

  /** Hybrid RRF oracle — shared verbatim by `hybrid_rrf` (inline
    * lexical leg) and `hybrid_rrf_indexed` (postings-index lexical
    * leg): the two engine paths must produce identical rows.
    */
  private lazy val hybridRrfSql: String =
    s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS word FROM documents),
              |tf AS (SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY 1, 2),
              |tfd AS (SELECT doc_id, word, tf, sum(tf) OVER (PARTITION BY doc_id) AS dl FROM tf),
              |ws AS (SELECT word, sum(tf) AS ctf, count(*) AS df FROM tf GROUP BY word),
              |q AS (SELECT word, df FROM (
              |        SELECT word, df, row_number() OVER (ORDER BY ctf DESC, word) AS qrank FROM ws)
              |      WHERE qrank > 5 AND qrank <= 10),
              |stats AS (SELECT (SELECT count(*)::DOUBLE FROM documents) AS n_docs,
              |        (SELECT sum(tf)::DOUBLE / count(DISTINCT doc_id) FROM tf) AS avgdl),
              |sc AS (SELECT t.doc_id,
              |        ln((n_docs - q.df + 0.5) / (q.df + 0.5) + 1.0)
              |          * (t.tf * (1.2 + 1.0))
              |          / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * t.dl / avgdl)) AS contrib
              |      FROM tfd t JOIN q USING (word) CROSS JOIN stats),
              |lexagg AS (SELECT doc_id, sum(contrib) AS lex_score FROM sc GROUP BY doc_id),
              |lex AS (SELECT doc_id, lex_rank FROM (
              |        SELECT doc_id, row_number() OVER (ORDER BY round(lex_score, 6) DESC, doc_id) AS lex_rank
              |        FROM lexagg) WHERE lex_rank <= 50),
              |p AS (SELECT embedding AS probe_vec FROM embeddings WHERE vec_id = 0),
              |vsc AS (SELECT vec_id AS doc_id, ${cosSql("embedding", "probe_vec")} AS vec_score
              |      FROM embeddings CROSS JOIN p WHERE vec_id <> 0),
              |vec AS (SELECT doc_id, vec_rank FROM (
              |        SELECT doc_id, row_number() OVER (ORDER BY round(vec_score, 6) DESC, doc_id) AS vec_rank
              |        FROM vsc) WHERE vec_rank <= 50),
              |f AS (SELECT doc_id, lex_rank, vec_rank,
              |        coalesce(1.0 / (60 + lex_rank), 0.0) + coalesce(1.0 / (60 + vec_rank), 0.0) AS rrf_raw
              |      FROM lex FULL OUTER JOIN vec USING (doc_id)),
              |r AS (SELECT doc_id, lex_rank, vec_rank, rrf_raw,
              |        row_number() OVER (ORDER BY round(rrf_raw, 6) DESC, doc_id) AS rnk FROM f)
              |SELECT doc_id, rnk, coalesce(lex_rank, 0) AS lex_rank,
              |  coalesce(vec_rank, 0) AS vec_rank, round(rrf_raw, 4) + 0 AS rrf_score
              |FROM r WHERE rnk <= 15 ORDER BY rnk""".stripMargin

  private val toksSql =
    """list_filter(string_split_regex(lower(text), '[ \t\n\r\f]+'), w -> w <> '')"""

  /** Shared by the batch window and the streamed keyed-state form —
    * the time-split staged replay makes them provably identical. */
  private val attributionSql =
    """WITH e AS (SELECT event_id, user_id, event_type, value,
      |    epoch_ms(ts) AS ms FROM events),
      |w AS (SELECT *,
      |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ms, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_id,
      |    last_value(CASE WHEN event_type = 'click' THEN ms END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ms, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_ms
      |  FROM e)
      |SELECT event_id AS purchase_id, user_id, value, click_id,
      |  ms - click_ms AS gap_ms,
      |  CASE WHEN click_id IS NOT NULL THEN 'click' ELSE 'organic' END AS src
      |FROM w WHERE event_type = 'purchase' ORDER BY purchase_id""".stripMargin

  /** DuckDB: distinct word n-gram shingles of the token list `ws`. */
  private def shinglesSql(n: Int): String =
    s"list_distinct(list_transform(generate_series(1, len(ws) - ${n - 1}), i -> array_to_string(ws[i:i+${n - 1}], ' ')))"

  /** DuckDB: double-precision cosine between two list<float> exprs —
    * identical op order to CosineSimilarityFloat.doGenCode.
    */
  private def cosSql(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"list_sum(list_transform(generate_series(1, len($a)), i -> $x[i]::DOUBLE * $y[i]::DOUBLE))"
    s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"
  }

  private def l2Sql(a: String): String =
    s"sqrt(list_sum(list_transform(generate_series(1, len($a)), i -> $a[i]::DOUBLE * $a[i]::DOUBLE)))"

  /** DuckDB oracle for [[SimilarityOps.annIvfKmeans]] with `iters`
    * Lloyd rounds: the per-round assign→refine CTE chain is unrolled
    * from the SAME iteration count the Spark side runs (moveEps = 0
    * disables the early stop), so the two sides cannot diverge on
    * round count.
    */
  private def kmeansOracleSql(iters: Int): String =
    s"WITH ${kmeansOracleCtes(iters)}\n" +
      "SELECT probe_id, rnk, vec_id, round(score, 4) + 0 AS score " +
      "FROM r2 WHERE rnk <= 10 ORDER BY probe_id, rnk"

  /** The CTE chain of [[kmeansOracleSql]] (ending at `r2`, the ranked
    * IVF result), without the WITH keyword or final SELECT — reusable
    * inside composite oracles (ann_recall_eval joins it against the
    * brute-force chain).
    */
  private def kmeansOracleCtes(iters: Int): String = {
    val sb = new StringBuilder
    sb.append("c0 AS (SELECT vec_id AS centroid_id, embedding AS cvec " +
      "FROM embeddings WHERE vec_id % 97 = 0 AND vec_id < 97 * 16),\n")
    for (i <- 0 until iters) {
      sb.append(s"s$i AS (SELECT e.vec_id, c.centroid_id, e.embedding, " +
        s"${cosSql("e.embedding", "c.cvec")} AS cscore FROM embeddings e CROSS JOIN c$i c),\n")
      sb.append(s"r$i AS (SELECT *, row_number() OVER (PARTITION BY vec_id " +
        s"ORDER BY round(cscore, 6) DESC, centroid_id) AS crank FROM s$i),\n")
      sb.append(s"a$i AS (SELECT vec_id, centroid_id, embedding FROM r$i WHERE crank = 1),\n")
      sb.append(s"e$i AS (SELECT centroid_id, embedding, " +
        s"unnest(generate_series(1, len(embedding))) AS pos FROM a$i),\n")
      sb.append(s"ref$i AS (SELECT centroid_id, pos, " +
        s"round(avg(embedding[pos]::DOUBLE), 4) AS m FROM e$i GROUP BY centroid_id, pos),\n")
      sb.append(s"c${i + 1} AS (SELECT centroid_id, list(m::FLOAT ORDER BY pos) AS cvec " +
        s"FROM ref$i GROUP BY centroid_id),\n")
    }
    sb.append(s"sf AS (SELECT e.vec_id, c.centroid_id, e.embedding, " +
      s"${cosSql("e.embedding", "c.cvec")} AS cscore FROM embeddings e CROSS JOIN c$iters c),\n")
    sb.append("rf AS (SELECT *, row_number() OVER (PARTITION BY vec_id " +
      "ORDER BY round(cscore, 6) DESC, centroid_id) AS crank FROM sf),\n")
    sb.append("assign AS (SELECT vec_id, centroid_id, embedding FROM rf WHERE crank = 1),\n")
    sb.append("pl AS (SELECT vec_id AS probe_id, centroid_id, embedding AS probe_vec " +
      "FROM rf WHERE vec_id < 10 AND crank <= 3),\n")
    sb.append(s"sc AS (SELECT pl.probe_id, a.vec_id, " +
      s"${cosSql("pl.probe_vec", "a.embedding")} AS score FROM pl " +
      "JOIN assign a ON pl.centroid_id = a.centroid_id WHERE a.vec_id <> pl.probe_id),\n")
    sb.append("r2 AS (SELECT probe_id, vec_id, score, row_number() OVER " +
      "(PARTITION BY probe_id ORDER BY round(score, 6) DESC, vec_id) AS rnk FROM sc)")
    sb.toString
  }

  /** DuckDB oracle for [[SimilarityOps.annIvfUpsert]]: the
    * [[kmeansOracleCtes]] chain with its TRAINING restricted to the
    * even-id corpus — seeds from even multiples of the (even)
    * centroidMod, one Lloyd assign→refine round over corpus rows only
    * — and the FINAL assignment over all of `embeddings` under the
    * frozen refined model. That final assignment is exactly what the
    * engine's corpus-write + batch-append produces on disk, so the
    * hash match proves append-maintenance == full index rebuild.
    * Constants generated from the same values the registry passes to
    * the engine ([[SimilarityOps.annIvfUpsert]] defaults: mod 98,
    * K 16, 1 iteration, nprobe 3, 10 probes, k 10).
    */
  private lazy val ivfUpsertOracleSql: String = ivfUpsertOracle("")

  /** [[graft.operators.SimilarityOps.annIvfUpsert]]'s from-scratch
    * replay; `neighborFilter` additionally restricts the searchable
    * corpus (the delete query's tombstone contract — probes still
    * query, deleted ids just can't be returned).
    */
  private def ivfUpsertOracle(neighborFilter: String): String = {
    val mod = 98; val numC = 16
    s"""WITH c0 AS (SELECT vec_id AS centroid_id, embedding AS cvec FROM embeddings
       |  WHERE vec_id % 2 = 0 AND vec_id % $mod = 0 AND vec_id < ${mod.toLong * numC}),
       |s0 AS (SELECT e.vec_id, c.centroid_id, e.embedding,
       |  ${cosSql("e.embedding", "c.cvec")} AS cscore
       |  FROM embeddings e CROSS JOIN c0 c WHERE e.vec_id % 2 = 0),
       |r0 AS (SELECT *, row_number() OVER (PARTITION BY vec_id
       |  ORDER BY round(cscore, 6) DESC, centroid_id) AS crank FROM s0),
       |a0 AS (SELECT vec_id, centroid_id, embedding FROM r0 WHERE crank = 1),
       |e0 AS (SELECT centroid_id, embedding,
       |  unnest(generate_series(1, len(embedding))) AS pos FROM a0),
       |ref0 AS (SELECT centroid_id, pos, round(avg(embedding[pos]::DOUBLE), 4) AS m
       |  FROM e0 GROUP BY centroid_id, pos),
       |c1 AS (SELECT centroid_id, list(m::FLOAT ORDER BY pos) AS cvec
       |  FROM ref0 GROUP BY centroid_id),
       |sf AS (SELECT e.vec_id, c.centroid_id, e.embedding,
       |  ${cosSql("e.embedding", "c.cvec")} AS cscore
       |  FROM embeddings e CROSS JOIN c1 c),
       |rf AS (SELECT *, row_number() OVER (PARTITION BY vec_id
       |  ORDER BY round(cscore, 6) DESC, centroid_id) AS crank FROM sf),
       |assign AS (SELECT vec_id, centroid_id, embedding FROM rf WHERE crank = 1),
       |pl AS (SELECT vec_id AS probe_id, centroid_id, embedding AS probe_vec
       |  FROM rf WHERE vec_id < 10 AND crank <= 3),
       |sc AS (SELECT pl.probe_id, a.vec_id,
       |  ${cosSql("pl.probe_vec", "a.embedding")} AS score FROM pl
       |  JOIN assign a ON pl.centroid_id = a.centroid_id
       |  WHERE a.vec_id <> pl.probe_id $neighborFilter),
       |r2 AS (SELECT probe_id, vec_id, score, row_number() OVER
       |  (PARTITION BY probe_id ORDER BY round(score, 6) DESC, vec_id) AS rnk FROM sc)
       |SELECT probe_id, rnk, vec_id, round(score, 4) + 0 AS score
       |FROM r2 WHERE rnk <= 10 ORDER BY probe_id, rnk""".stripMargin
  }

  /** DuckDB CTE `sigs(doc_id, simhash)` mirroring
    * [[DedupOps.simhash]] (`bits` = fingerprint width).
    */
  private def simhashSqlCte(bits: Int): String = {
    val bitTerms = (0 until bits).map { j =>
      s"(CASE WHEN list_sum(list_transform(hs, h -> ((h >> $j) & 1)*2 - 1)) > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" +\n  ")
    s"""WITH t AS (SELECT doc_id,
       |  list_transform($toksSql, w -> CAST(('0x' || substr(md5(w), 1, 15))::UBIGINT % 4294967291 AS BIGINT)) AS hs
       |FROM documents),
       |sigs AS (SELECT doc_id, CAST($bitTerms AS BIGINT) AS simhash
       |         FROM t WHERE len(hs) > 0)""".stripMargin
  }

  /** DuckDB CTE chain `f(doc_id, fp)` mirroring
    * [[TextAnalysisOps.winnowFingerprint]], generated from the shared
    * WinnowK/WinnowW constants.
    */
  private def winnowFpCte: String = {
    val k = TextAnalysisOps.WinnowK
    val w = TextAnalysisOps.WinnowW
    s"""WITH t AS (SELECT doc_id, $toksSql AS ws FROM documents),
       |g AS (SELECT doc_id, list_transform(generate_series(1, len(ws) - ${k - 1}),
       |        i -> array_to_string(ws[i:i+${k - 1}], ' ')) AS gs FROM t),
       |h AS (SELECT doc_id, list_transform(gs, g2 ->
       |        CAST(('0x' || substr(md5(g2), 1, 15))::UBIGINT AS BIGINT)) AS hs FROM g),
       |wn AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(hs) - ${w - 1}),
       |        i -> list_min(hs[i:i+${w - 1}]))) AS fps FROM h WHERE len(hs) >= $w),
       |f AS (SELECT doc_id, unnest(fps) AS fp FROM wn)""".stripMargin
  }

  /** DuckDB mirror of [[DedupOps.simhashDup]] — chunk-bucket candidate
    * join with the mega-bucket cap, generated from the SAME
    * `DedupOps.Simhash*` constants so engine and oracle cannot
    * silently diverge (chunk layout, hamming radius, cap).
    */
  private def simhashDupOracleSql: String = {
    val widths = DedupOps.SimhashChunkBits
    val offsets = widths.scanLeft(0)(_ + _)
    val chunkTerms = widths.zipWithIndex.map { case (w, c) =>
      s"'$c:' || (((simhash >> ${offsets(c)}) & ${(1L << w) - 1})::VARCHAR)"
    }.mkString(",\n    ")
    s"""${simhashSqlCte(32)},
       |chunks AS (
       |  SELECT doc_id, simhash, unnest([
       |    $chunkTerms]) AS ck
       |  FROM sigs),
       |bounded AS (
       |  SELECT doc_id, simhash, ck FROM (
       |    SELECT doc_id, simhash, ck,
       |           count(*) OVER (PARTITION BY ck) AS bn FROM chunks)
       |  WHERE bn <= ${DedupOps.SimhashMaxBucket})
       |SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
       |  bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
       |FROM bounded a JOIN bounded b ON a.ck = b.ck AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= ${DedupOps.SimhashMaxHamming}
       |ORDER BY a_id, b_id""".stripMargin
  }

  /** Shared by the Spark run and the DuckDB oracle of
    * `sql_lateral_topn` — both engines execute this exact text.
    * Ties are broken by custkey so the LIMIT cut is deterministic.
    */
  private val lateralTopNSql: String =
    """SELECT n_name, t.c_custkey, t.c_acctbal
      |FROM nation, LATERAL (
      |  SELECT c_custkey, c_acctbal FROM customer
      |  WHERE c_nationkey = n_nationkey
      |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
      |ORDER BY n_name, c_acctbal DESC, c_custkey""".stripMargin

  /** Shared by the Spark run and the DuckDB oracle of
    * `sql_recursive_series` — both engines execute this exact text
    * (Spark 4's `WITH RECURSIVE`). Linear recursion: one calendar row
    * per day, so the recursion depth equals the series length and the
    * per-step frame is a single row — the iterative-union plan Spark
    * lowers this to does one tiny batch per day. The calendar then
    * gap-fills a pushed-down quarter of `orders` (the recursive
    * counterpart of the `sequence()`-based `events_daily_gapfill`).
    * Dialect notes: `date + int` adds days and `CAST(date AS STRING)`
    * prints ISO `yyyy-MM-dd` in both engines.
    */
  private val recursiveSeriesSql: String =
    """WITH RECURSIVE cal (d) AS (
      |  SELECT DATE '1995-01-01'
      |  UNION ALL
      |  SELECT d + 1 FROM cal WHERE d < DATE '1995-03-31'
      |),
      |daily AS (
      |  SELECT o_orderdate AS d, count(*) AS n_orders,
      |         CAST(round(sum(CAST(o_totalprice AS DECIMAL(15,2))), 2) AS DOUBLE) AS revenue
      |  FROM orders
      |  WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate <= DATE '1995-03-31'
      |  GROUP BY o_orderdate
      |)
      |SELECT CAST(cal.d AS STRING) AS day,
      |       coalesce(daily.n_orders, 0) AS n_orders,
      |       round(coalesce(daily.revenue, 0.0), 2) AS revenue
      |FROM cal LEFT JOIN daily ON cal.d = daily.d
      |ORDER BY day""".stripMargin

  /** Shared by the Spark run and the DuckDB oracle of
    * `sql_recursive_chain`. Every customer walks the implicit
    * key-halving tree (`parent = floor(key / 2)`) to the root — a
    * hierarchy roll-up (depth + descendant count + balance sum per
    * ancestor) whose recursion is log-bounded: `depth <= log2(max
    * key)`, so rows-per-step only ever shrinks and UNION ALL
    * terminates without distinct-recursion support (which Spark 4.1
    * lacks: UNION inside a recursive CTE is
    * UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE). `floor(node / 2.0)` is
    * used instead of integer division because `/` on integers floors
    * in neither engine consistently (`div` vs `//` are dialect-local;
    * float division + floor is common text).
    */
  private val recursiveChainSql: String =
    """WITH RECURSIVE chain (leaf, node, depth, bal) AS (
      |  SELECT c_custkey, c_custkey, 0, c_acctbal FROM customer
      |  UNION ALL
      |  SELECT leaf, CAST(floor(node / 2.0) AS BIGINT), depth + 1, bal
      |  FROM chain WHERE node > 1
      |)
      |SELECT node AS ancestor, count(*) AS n_desc, max(depth) AS max_depth,
      |       CAST(round(sum(CAST(bal AS DECIMAL(15,2))), 2) AS DOUBLE) AS bal_sum
      |FROM chain
      |GROUP BY node
      |HAVING count(*) >= 8
      |ORDER BY ancestor""".stripMargin

  /** The `sql_udf_pricing` SELECT — runs on Spark against two SQL
    * scalar UDFs (`CREATE TEMPORARY FUNCTION ... RETURN expr`, the
    * Spark 4 SQL-UDF surface); the oracle inlines the UDF bodies
    * (DuckDB's equivalent would be CREATE MACRO — inlining keeps the
    * oracle dialect-free). Both UDFs fold into the same codegen'd
    * expressions as the hand-inlined q1 arithmetic: a SQL UDF is a
    * parse-time substitution, not a black-box call.
    */
  private val sqlUdfSelect: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(round(sum(CAST(%DISC% AS DECIMAL(18,4))), 2) AS DOUBLE) AS disc_rev,
      |  CAST(round(sum(CAST(%CHARGE% AS DECIMAL(20,6))), 2) AS DOUBLE) AS charge_rev
      |FROM lineitem
      |WHERE l_shipdate <= DATE '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Shared oracle of `cdc_apply` AND `streamed_cdc_apply`: replay
    * the synthesized changelog ([[graft.operators.RelationalOps
    * .cdcOps]]'s fixture convention) relationally — latest-op-per-key
    * over the full op set, one full-outer merge against the snapshot.
    * The streamed path must land on the exact same rows whatever its
    * micro-batch boundaries and delivery order.
    */
  private lazy val cdcApplySql: String = {
    val off = RelationalOps.CdcSeqOffset
    s"""WITH snap AS (SELECT o_orderkey AS key, o_totalprice AS price
       |  FROM orders WHERE o_orderkey % 10 <> 7),
       |gen AS (SELECT o_orderkey AS k, o_totalprice AS p
       |  FROM orders WHERE o_orderkey % 10 = 7),
       |ops AS (
       |  SELECT 'D' AS op, k - 1 AS key, CAST(NULL AS DOUBLE) AS new_price, k AS seq
       |  FROM gen WHERE k % 3 = 0
       |  UNION ALL
       |  SELECT 'U', k - 1, round(p + 10.0, 2), k FROM gen WHERE k % 3 = 1
       |  UNION ALL
       |  SELECT 'I', k, p, k FROM gen WHERE k % 3 = 2
       |  UNION ALL
       |  SELECT 'U', k - 1, round(p + 20.0, 2), k + $off FROM gen WHERE k % 60 = 7),
       |latest AS (SELECT op, key, new_price FROM (
       |  SELECT *, row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
       |  FROM ops) WHERE rn = 1),
       |m AS (SELECT coalesce(s.key, l.key) AS o_orderkey,
       |    CASE WHEN l.key IS NOT NULL THEN l.new_price ELSE s.price END AS price,
       |    CASE WHEN l.key IS NOT NULL THEN 'cdc' ELSE 'snap' END AS src,
       |    l.op AS op
       |  FROM snap s FULL OUTER JOIN latest l ON s.key = l.key)
       |SELECT o_orderkey, price, src FROM m WHERE op IS NULL OR op <> 'D'
       |ORDER BY o_orderkey""".stripMargin
  }

  val registry: Seq[(String, QueryDef)] = Seq(

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

    // ----- text analysis ----------------------------------------------
    "token_stats" -> QueryDef(
      (s, d) => TextAnalysisOps.tokenStats(Tables.documents(s, d)),
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS ws FROM documents)
              |SELECT doc_id, len(ws) AS n_tokens,
              |  round(list_sum(list_transform(ws, w -> length(w)))::DOUBLE / len(ws), 4) AS avg_token_len,
              |  CAST(list_max(list_transform(ws, w -> length(w))) AS BIGINT) AS max_token_len
              |FROM t WHERE len(ws) > 0 ORDER BY doc_id""".stripMargin)),

    // unigram Shannon entropy, folded over SORTED distinct words so
    // both engines sum in the same order; +0 normalizes IEEE -0.0
    "token_entropy" -> QueryDef(
      (s, d) => TextAnalysisOps.tokenEntropy(Tables.documents(s, d)),
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS ws FROM documents),
              |t2 AS (SELECT doc_id, ws, list_sort(list_distinct(ws)) AS dw
              |       FROM t WHERE len(ws) > 0)
              |SELECT doc_id, len(ws)::BIGINT AS n_tokens,
              |  len(dw)::BIGINT AS n_distinct,
              |  round(-list_sum(list_transform(dw, w ->
              |    (len(list_filter(ws, x -> x = w))::DOUBLE / len(ws)) *
              |    ln(len(list_filter(ws, x -> x = w))::DOUBLE / len(ws)))), 4) + 0
              |    AS entropy
              |FROM t2 ORDER BY doc_id""".stripMargin)),

    // bloom-gated incremental dedup: the broadcast-sketch fast path;
    // bit positions from the shared CmsHash family, so every probe —
    // including any false positive — is oracle-reproduced exactly
    "bloom_dedup" -> QueryDef(
      (s, d) => DedupOps.bloomDedup(Tables.documents(s, d)),
      Some {
        val p = graft.functions.expressions.CmsHash.P
        val k = DedupOps.BloomK
        val m = DedupOps.BloomMBits
        val bucket = (h: String) =>
          s"(((2 * j + 1) * ($h % $p) + j * j + 7) % $p) % $m"
        s"""WITH h AS (SELECT doc_id,
           |    CAST(('0x' || substr(md5(lower(text)), 1, 15))::UBIGINT AS BIGINT) AS h
           |  FROM documents),
           |corpus AS (SELECT DISTINCT h FROM h WHERE doc_id % 2 = 0),
           |bits AS (SELECT DISTINCT ${bucket("h")} AS b
           |  FROM corpus, LATERAL unnest(generate_series(0, ${k - 1})) t(j)),
           |batch AS (SELECT doc_id, h FROM h WHERE doc_id % 2 = 1),
           |probes AS (SELECT doc_id, h, ${bucket("h")} AS b
           |  FROM batch, LATERAL unnest(generate_series(0, ${k - 1})) t(j)),
           |flags AS (SELECT p.doc_id,
           |    CAST(min(CASE WHEN bits.b IS NULL THEN 0 ELSE 1 END) AS BIGINT)
           |      AS maybe_dup
           |  FROM probes p LEFT JOIN bits ON p.b = bits.b GROUP BY p.doc_id)
           |SELECT f.doc_id, f.maybe_dup,
           |  CAST(CASE WHEN c.h IS NULL THEN 0 ELSE 1 END AS BIGINT) AS is_dup
           |FROM flags f JOIN batch b ON f.doc_id = b.doc_id
           |  LEFT JOIN corpus c ON b.h = c.h
           |ORDER BY f.doc_id""".stripMargin
      }),

    // one BPE training round: adjacent char-pair frequencies off the
    // word-frequency table (vocabulary-sized explode, never corpus-
    // sized), total-ordered top-K
    "bpe_merge_pairs" -> QueryDef(
      (s, d) => TextAnalysisOps.bpeMergePairs(Tables.documents(s, d)),
      Some(s"""WITH wf AS (SELECT word, count(*) AS wf
              |  FROM (SELECT unnest($toksSql) AS word FROM documents)
              |  GROUP BY word HAVING length(word) >= 2),
              |pairs AS (SELECT substr(word, i, 2) AS pair, wf
              |  FROM wf, LATERAL unnest(generate_series(1, length(word) - 1)) t(i))
              |SELECT pair, sum(wf)::BIGINT AS cnt FROM pairs
              |GROUP BY pair ORDER BY cnt DESC, pair
              |LIMIT ${TextAnalysisOps.BpeMergeTopK}""".stripMargin)),

    // multi-round BPE training: the merge-list loop, oracle unrolled
    // per round from the SAME round constant (ann_ivf_kmeans2
    // precedent) — argmax pair then left-to-right non-overlapping
    // delimited-string replace, both sides identical
    "bpe_train_merges" -> QueryDef(
      (s, d) => TextAnalysisOps.bpeTrainMerges(Tables.documents(s, d)),
      Some(bpeTrainOracle)),

    // train -> ENCODE round trip: the corpus tokenized by the trained
    // merge list, reported as the subword vocabulary census; the
    // oracle replays the unrolled rounds AND the final-symbol census,
    // so a merge list that doesn't reproduce under application reds
    "bpe_vocab" -> QueryDef(
      (s, d) => TextAnalysisOps.bpeVocab(Tables.documents(s, d)),
      Some(bpeVocabOracle)),

    // the per-document leg of the same encode: subword budget per doc
    // under the trained merges (docs with no encodable word keep a
    // zero row) — the token-count accounting a pipeline runs before
    // packing; oracle replays rounds + the per-doc join from scratch
    "bpe_encode_docs" -> QueryDef(
      (s, d) => TextAnalysisOps.bpeEncodeDocs(Tables.documents(s, d)),
      Some(bpeEncodeDocsOracle)),

    "token_count_bpe" -> QueryDef(
      (s, d) => TextAnalysisOps.tokenCountBpe(Tables.documents(s, d)),
      Some("""SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 \t\n\r\f]'))::BIGINT AS n_bpe_tokens
             |FROM documents ORDER BY doc_id""".stripMargin)),

    "quality_score" -> QueryDef(
      (s, d) => TextAnalysisOps.qualityScore(Tables.documents(s, d)),
      Some {
        val stops = TextAnalysisOps.EnStopwords.map(w => s"'$w'").mkString(", ")
        s"""WITH t AS (SELECT doc_id, text, $toksSql AS ws FROM documents)
           |SELECT doc_id, len(ws) AS n_tokens,
           |  round(len(list_filter(ws, w -> w IN ($stops)))::DOUBLE / len(ws), 4) AS stopword_ratio,
           |  round(len(regexp_extract_all(lower(text), '[^a-z0-9 \t\n\r\f]'))::DOUBLE / length(text), 4) AS punct_ratio,
           |  round(list_sum(list_transform(ws, w -> length(w)))::DOUBLE / len(ws), 4) AS avg_word_len
           |FROM t WHERE len(ws) > 0 ORDER BY doc_id""".stripMargin
      }),

    // deterministic training-order shuffle: md5(seed+doc_id) order,
    // global rank via range partition + zipWithIndex — no
    // single-point sort; oracle is the independent row_number form
    "dataset_shuffle" -> QueryDef(
      (s, d) => PipelineOps.datasetShuffle(Tables.documents(s, d)),
      Some(s"""SELECT doc_id,
              |  CAST(row_number() OVER (ORDER BY
              |    md5('${PipelineOps.ShuffleSeed}' || doc_id::VARCHAR), doc_id)
              |    - 1 AS BIGINT) AS shuffle_rank
              |FROM documents ORDER BY shuffle_rank""".stripMargin)),

    // mixture reweighting: per-source sampling weights toward a
    // uniform target mix; totals ride the |sources|-row model table
    "source_mix_weights" -> QueryDef(
      (s, d) => PipelineOps.sourceMixWeights(Tables.documents(s, d)),
      Some("""WITH per_src AS (SELECT source, count(*) AS n_docs
             |  FROM documents GROUP BY source),
             |t AS (SELECT sum(n_docs) AS n_total, count(*) AS k_sources
             |  FROM per_src)
             |SELECT source, n_docs,
             |  floor(n_docs::DOUBLE / n_total * 1000000.0 + 0.5) / 1000000.0 AS actual_share,
             |  floor(1.0::DOUBLE / k_sources * 1000000.0 + 0.5) / 1000000.0 AS target_share,
             |  floor(n_total::DOUBLE / (k_sources * n_docs) * 1000000.0 + 0.5) / 1000000.0 AS mix_weight
             |FROM per_src CROSS JOIN t ORDER BY source""".stripMargin)),

    // deterministic curriculum interleave: stride schedule at rates
    // proportional to sqrt(n_src) (alpha=0.5 temperature); vtime is
    // sqrt + exact x2 + one IEEE int-ratio divide, bit-identical on
    // both engines, so the schedule ORDER can never diverge
    "mixture_schedule" -> QueryDef(
      (s, d) => PipelineOps.mixtureSchedule(Tables.documents(s, d)),
      Some("""WITH c AS (SELECT source, count(*) AS n_src
             |  FROM documents GROUP BY source),
             |r AS (SELECT doc_id, source,
             |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS src_rank
             |  FROM documents)
             |SELECT doc_id, r.source, src_rank,
             |  (2 * src_rank - 1)::DOUBLE / (2.0 * sqrt(n_src::DOUBLE)) AS vtime
             |FROM r JOIN c ON r.source = c.source
             |ORDER BY vtime, r.source, doc_id""".stripMargin)),

    // per-source (per-domain) quality cap: top-N docs per source by
    // stopword ratio — rank<=N rewrites to WindowGroupLimit so each
    // map task pre-prunes before the source shuffle (plan-pinned)
    "source_cap" -> QueryDef(
      (s, d) => PipelineOps.sourceCap(Tables.documents(s, d)),
      Some {
        val stops = TextAnalysisOps.EnStopwords.map(w => s"'$w'").mkString(", ")
        val q = TextAnalysisOps.det4Sql(
          s"len(list_filter(ws, w -> w IN ($stops)))::DOUBLE / len(ws)")
        s"""WITH t AS (SELECT doc_id, source, $toksSql AS ws FROM documents),
           |sc AS (SELECT doc_id, source,
           |    $q AS quality
           |  FROM t WHERE len(ws) > 0),
           |r AS (SELECT *, row_number() OVER (PARTITION BY source
           |        ORDER BY quality DESC, doc_id) AS rnk FROM sc)
           |SELECT doc_id, source, quality, CAST(rnk AS BIGINT) AS rnk
           |FROM r WHERE rnk <= ${PipelineOps.SourceCapN}
           |ORDER BY source, rnk""".stripMargin
      }),

    // fixed-weight logistic quality classifier: 4-decimal features
    // recovered into DECIMAL(10,4) exactly, dot product in EXACT
    // decimal arithmetic, logit cast to double only at the end — no
    // libm, no double round() of the logit (both failed a gate by
    // 1 ULP / one .00005 tie before this form)
    "quality_logreg" -> QueryDef(
      (s, d) => PipelineOps.qualityLogreg(Tables.documents(s, d)),
      Some {
        val stops = TextAnalysisOps.EnStopwords.map(w => s"'$w'").mkString(", ")
        import PipelineOps._
        def w(x: Double) = s"CAST($x AS DECIMAL(6,2))"
        def f4(e: String) = s"CAST(${TextAnalysisOps.det4Sql(e)} AS DECIMAL(10,4))"
        s"""WITH t AS (SELECT doc_id, text, $toksSql AS ws FROM documents),
           |f AS (SELECT doc_id,
           |    CAST(length(bin(len(ws)))::DOUBLE AS DECIMAL(10,4)) AS flog,
           |    ${f4(s"len(list_filter(ws, w -> w IN ($stops)))::DOUBLE / len(ws)")} AS fstop,
           |    ${f4("len(regexp_extract_all(lower(text), '[^a-z0-9 \t\n\r\f]'))::DOUBLE / length(text)")} AS fpunct,
           |    ${f4("list_sum(list_transform(ws, w -> length(w)))::DOUBLE / len(ws)")} AS flen
           |  FROM t WHERE len(ws) > 0),
           |z AS (SELECT doc_id, CAST(
           |    ${w(LogregBias)} + ${w(LogregWLogTokens)} * flog +
           |    ${w(LogregWStopword)} * fstop + ${w(LogregWPunct)} * fpunct +
           |    ${w(LogregWAvgLen)} * flen AS DOUBLE) AS quality_logit
           |  FROM f)
           |SELECT doc_id, quality_logit,
           |  CAST(quality_logit > 0.0 AS BIGINT) AS keep
           |FROM z ORDER BY doc_id""".stripMargin
      }),

    // PII injected deterministically from doc_id on both sides (the
    // fixture corpus has no digits, so scrubbing raw text would be
    // vacuous); the hash gate proves redaction of every injected span
    // AND byte-identity of the untouched 90%
    "pii_scrub" -> QueryDef(
      (s, d) => TextAnalysisOps.piiScrub(Tables.documents(s, d)),
      Some(s"""WITH raw AS (SELECT doc_id,
              |  CASE WHEN doc_id % 10 = 0
              |       THEN text || ' contact user' || doc_id::VARCHAR || '@example.com' ||
              |            ' or call 555-123-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
              |       ELSE text END AS raw FROM documents)
              |SELECT doc_id,
              |  regexp_replace(regexp_replace(raw, '${TextAnalysisOps.PiiEmailRe}', '<EMAIL>', 'g'),
              |                 '${TextAnalysisOps.PiiPhoneRe}', '<PHONE>', 'g') AS scrubbed,
              |  len(regexp_extract_all(raw, '${TextAnalysisOps.PiiEmailRe}'))::BIGINT AS n_email,
              |  len(regexp_extract_all(raw, '${TextAnalysisOps.PiiPhoneRe}'))::BIGINT AS n_phone
              |FROM raw ORDER BY doc_id""".stripMargin)),

    "lang_id" -> QueryDef(
      (s, d) => TextAnalysisOps.langId(Tables.documents(s, d)),
      Some {
        val langs = TextAnalysisOps.StopwordsByLang.map(_._1)
        val hitCols = TextAnalysisOps.StopwordsByLang.map { case (l, stops) =>
          val in = stops.map(w => s"'$w'").mkString(", ")
          s"len(list_filter(ws, w -> w IN ($in))) AS hits_$l"
        }.mkString(",\n  ")
        val cases = langs.init.map { l =>
          val conds = langs.filterNot(_ == l).map(o => s"hits_$l >= hits_$o").mkString(" AND ")
          s"WHEN $conds THEN '$l'"
        }.mkString("\n  ")
        s"""WITH t AS (SELECT doc_id, lang AS labeled_lang, $toksSql AS ws FROM documents),
           |h AS (SELECT doc_id, labeled_lang,
           |  $hitCols
           |FROM t)
           |SELECT doc_id, labeled_lang,
           |  CASE $cases ELSE '${langs.last}' END AS pred_lang
           |FROM h ORDER BY doc_id""".stripMargin
      }),

    "doc_fingerprint" -> QueryDef(
      (s, d) => TextAnalysisOps.docFingerprint(Tables.documents(s, d)),
      Some(s"""WITH t AS (SELECT doc_id, text, $toksSql AS ws FROM documents)
              |SELECT doc_id, md5(text) AS fp_md5,
              |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(ws, w -> CAST(7*length(w) + ascii(w) AS BIGINT))), (h, c) -> (31*h + c) % 1000000007) AS BIGINT) AS fp_roll
              |FROM t ORDER BY doc_id""".stripMargin)),

    // Gopher/C4-style repetition rule: duplicate n-gram fraction,
    // fully row-local
    "repetition_score" -> QueryDef(
      (s, d) => TextAnalysisOps.repetitionScore(Tables.documents(s, d)),
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS ws FROM documents),
              |g AS (SELECT doc_id, list_transform(generate_series(1, len(ws) - ${TextAnalysisOps.RepetitionNgramN - 1}),
              |        i -> array_to_string(ws[i:i+${TextAnalysisOps.RepetitionNgramN - 1}], ' ')) AS gs FROM t)
              |SELECT doc_id, CAST(len(gs) AS BIGINT) AS n_ngrams,
              |  CAST(len(list_distinct(gs)) AS BIGINT) AS n_distinct,
              |  round(1 - len(list_distinct(gs))::DOUBLE / len(gs), 4) AS dup_frac
              |FROM g WHERE len(gs) > 0 ORDER BY doc_id""".stripMargin)),

    // Gopher quality-rule gate (Rae et al. 2021): per-rule flag
    // columns + the conjunction, thresholds shared from the same
    // constants; det4 ratios so no boundary doc can flip engines
    "gopher_rules" -> QueryDef(
      (s, d) => TextAnalysisOps.gopherRules(Tables.documents(s, d)),
      Some {
        import TextAnalysisOps._
        val stops = EnStopwords.map(w => s"'$w'").mkString(", ")
        s"""WITH t AS (SELECT doc_id, $toksSql AS ws FROM documents),
           |f AS (SELECT doc_id,
           |    len(ws)::BIGINT AS n_tokens,
           |    ${det4Sql("list_sum(list_transform(ws, w -> length(w)))::DOUBLE / len(ws)")} AS mean_word_len,
           |    ${det4Sql("len(list_filter(ws, w -> regexp_matches(w, '[a-z]')))::DOUBLE / len(ws)")} AS alpha_ratio,
           |    len(list_intersect(list_distinct(ws), [$stops]))::BIGINT AS stop_hits
           |  FROM t WHERE len(ws) > 0),
           |g AS (SELECT *,
           |    CAST(n_tokens >= $GopherMinWords AND n_tokens <= $GopherMaxWords AS BIGINT) AS wc_ok,
           |    CAST(mean_word_len >= $GopherMinMeanLen AND mean_word_len <= $GopherMaxMeanLen AS BIGINT) AS mwl_ok,
           |    CAST(alpha_ratio >= $GopherMinAlphaRatio AS BIGINT) AS alpha_ok,
           |    CAST(stop_hits >= $GopherMinStopHits AS BIGINT) AS stop_ok
           |  FROM f)
           |SELECT doc_id, n_tokens, mean_word_len, alpha_ratio, stop_hits,
           |  wc_ok, mwl_ok, alpha_ok, stop_ok,
           |  CAST(wc_ok = 1 AND mwl_ok = 1 AND alpha_ok = 1 AND stop_ok = 1 AS BIGINT) AS passes
           |FROM g ORDER BY doc_id""".stripMargin
      }),

    // winnowing (MOSS): per-window minima over k-gram hashes; the
    // oracle reproduces the identical hash + window arithmetic from
    // the shared TextAnalysisOps.Winnow* constants
    "winnow_fingerprint" -> QueryDef(
      (s, d) => TextAnalysisOps.winnowFingerprint(Tables.documents(s, d)),
      Some(s"""$winnowFpCte
              |SELECT doc_id, fp FROM f ORDER BY doc_id, fp""".stripMargin)),

    // localized-overlap pairing on shared winnow fingerprints, with
    // the boilerplate cap mirrored from the same constant
    "winnow_overlap" -> QueryDef(
      (s, d) => TextAnalysisOps.winnowOverlap(Tables.documents(s, d)),
      Some(s"""$winnowFpCte,
              |bounded AS (SELECT doc_id, fp FROM (
              |    SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS nd FROM f)
              |  WHERE nd <= ${TextAnalysisOps.WinnowMaxDocFreq})
              |SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_shared
              |FROM bounded a JOIN bounded b ON a.fp = b.fp AND a.doc_id < b.doc_id
              |GROUP BY 1, 2 HAVING count(*) >= ${TextAnalysisOps.WinnowMinShared}
              |ORDER BY a_id, b_id""".stripMargin)),

    "ngram_freq" -> QueryDef(
      (s, d) => TextAnalysisOps.ngramFreq(Tables.documents(s, d)),
      Some(s"""WITH t AS (SELECT $toksSql AS ws FROM documents),
              |n AS (SELECT array_to_string(ws[i:i+1], ' ') AS ngram
              |      FROM t, LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i) g)
              |SELECT ngram, count(*) AS cnt FROM n
              |GROUP BY ngram ORDER BY cnt DESC, ngram LIMIT 30""".stripMargin)),

    // PMI collocations: over-represented word pairs from exact
    // corpus counts — vocabulary-grain joins only, min-count cut
    // before the joins, identical IEEE ln() sequence in both engines
    "pmi_collocations" -> QueryDef(
      (s, d) => TextAnalysisOps.pmiCollocations(Tables.documents(s, d)),
      Some {
        import TextAnalysisOps.{PmiMinCount, PmiTopK}
        s"""WITH t AS (SELECT $toksSql AS ws FROM documents),
           |toks AS (SELECT unnest(ws) AS word FROM t),
           |uni AS (SELECT word, count(*) AS c FROM toks GROUP BY word),
           |bgs AS (SELECT array_to_string(ws[i:i+1], ' ') AS bigram
           |        FROM t, LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i) g),
           |big AS (SELECT bigram, count(*) AS cb FROM bgs GROUP BY bigram
           |        HAVING count(*) >= $PmiMinCount),
           |tot AS (SELECT sum(len(ws))::DOUBLE AS total_tokens,
           |               sum(greatest(len(ws) - 1, 0))::DOUBLE AS total_bigrams FROM t),
           |j AS (SELECT bigram, cb, string_split(bigram, ' ')[1] AS w1,
           |             string_split(bigram, ' ')[2] AS w2 FROM big),
           |sc AS (SELECT bigram, cb,
           |         ln(cb::DOUBLE * total_tokens * total_tokens /
           |            (total_bigrams * u1.c * u2.c)) AS pmi_raw
           |       FROM j JOIN uni u1 ON j.w1 = u1.word
           |              JOIN uni u2 ON j.w2 = u2.word CROSS JOIN tot),
           |r AS (SELECT bigram, cb, pmi_raw,
           |        row_number() OVER (ORDER BY round(pmi_raw, 6) DESC, bigram) AS rnk FROM sc)
           |SELECT CAST(rnk AS BIGINT) AS rnk, bigram, cb, round(pmi_raw, 4) + 0 AS pmi
           |FROM r WHERE rnk <= $PmiTopK ORDER BY rnk""".stripMargin
      }),

    // bigram LM: P(w2|w1) with the head total and the rank as windows
    // over the one bigram aggregate (no self-join, no re-tokenize)
    "bigram_lm" -> QueryDef(
      (s, d) => TextAnalysisOps.bigramLm(Tables.documents(s, d)),
      Some(s"""WITH t AS (SELECT $toksSql AS ws FROM documents),
              |n AS (SELECT array_to_string(ws[i:i+1], ' ') AS bigram
              |      FROM t, LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i) g),
              |bg AS (SELECT bigram, count(*) AS cnt FROM n GROUP BY bigram),
              |h AS (SELECT bigram, cnt, string_split(bigram, ' ')[1] AS w1 FROM bg),
              |r AS (SELECT w1, bigram, cnt,
              |        CAST(sum(cnt) OVER (PARTITION BY w1) AS BIGINT) AS head_total,
              |        row_number() OVER (PARTITION BY w1 ORDER BY cnt DESC, bigram) AS rnk
              |      FROM h)
              |SELECT w1, CAST(rnk AS BIGINT) AS rnk, bigram, cnt,
              |  round(cnt::DOUBLE / head_total, 4) AS p
              |FROM r WHERE rnk <= 3 AND head_total >= 10
              |ORDER BY w1, rnk""".stripMargin)),

    "tfidf_topk" -> QueryDef(
      (s, d) => TextAnalysisOps.tfidfTopK(Tables.documents(s, d)),
      Some(s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS word FROM documents),
              |tf AS (SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY doc_id, word),
              |df AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
              |n AS (SELECT count(*) AS n FROM documents),
              |s AS (SELECT doc_id, word, tf,
              |        round(tf * ln(n.n::DOUBLE / df.df), 4) AS score,
              |        row_number() OVER (PARTITION BY doc_id
              |          ORDER BY round(tf * ln(n.n::DOUBLE / df.df), 6) DESC, word) AS rnk
              |      FROM tf JOIN df USING (word) CROSS JOIN n)
              |SELECT doc_id, rnk, word, tf, score FROM s WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin)),

    // Okapi BM25 against the deterministic mid-frequency query
    // (collection-frequency ranks 6-10): tf/dl/df are the
    // tfidf-family one-pass aggregates, the query is selected
    // in-plan by a distributed top-k over the SAME tf exchange the
    // postings use (AQE ReusedExchange — the corpus is tokenized
    // once), and the result cut is orderBy+limit.
    // The oracle mirrors the scoring expression token-for-token so
    // both engines run the identical IEEE operation sequence
    "bm25_topk" -> QueryDef(
      (s, d) => RetrievalOps.bm25TopK(Tables.documents(s, d)),
      Some(bm25Sql)),

    // the STEADY-STATE retrieval path: the same BM25 ranking served
    // from the persisted postings index — query planning reads the
    // vocab-sized lexicon, the probe scans only its terms' bucket
    // partitions (PartitionFilters, pinned in PlanAuditSpec), and no
    // tokenize pass or corpus aggregate runs at query time. Same
    // oracle as bm25_topk: the stored statistics are the same
    // one-pass aggregates, so the results must be identical
    "bm25_indexed" -> QueryDef(
      (s, d) => RetrievalOps.bm25Indexed(Tables.documents(s, d), d),
      Some(bm25Sql)),

    // the MAINTAINED index: built from the even-doc half, the odd
    // half folded in (postings append, lexicon delta merge, exact
    // long stats advance). Gated against the same full-corpus
    // oracle, so the gate proves fold == rebuild through the probe
    "incremental_bm25" -> QueryDef(
      (s, d) => RetrievalOps.incrementalBm25(Tables.documents(s, d), d),
      Some(bm25Sql)),

    // the DELETE leg: probes subtract the tombstone log, so a
    // deleted doc can never be returned, while scores keep the
    // index-wide STALE statistics until compaction (the deferred-
    // delete posture of every production engine) — the oracle keeps
    // full-corpus df/avgdl and ranks live docs only
    "bm25_after_delete" -> QueryDef(
      (s, d) => RetrievalOps.bm25AfterDelete(Tables.documents(s, d), d),
      Some(bm25SqlRanking(
        s"WHERE doc_id % ${RetrievalOps.DeleteMod} <> ${RetrievalOps.DeleteRes}"))),

    // the STREAM-MAINTAINED index: the odd half arrives as a real
    // checkpointed micro-batch stream (two source files -> at least
    // two folds), each batch folding into the persisted postings
    // inside foreachBatch. Probing the result against the full-
    // corpus oracle proves per-micro-batch folds compose to exactly
    // the batch rebuild, whatever the micro-batch boundaries
    "streamed_bm25_fold" -> QueryDef(
      (s, d) => {
        val dir = graft.streaming.EventStreams.streamedPostingsLayout(s, d)
        RetrievalOps.probePostings(s, s"$dir/index", 10)
      },
      Some(bm25Sql)),

    // the STEADY-STATE hybrid: the lexical leg served from the
    // persisted postings index (no query-time tokenize, |terms|
    // bucket partitions read), fused with the exact vector leg by
    // the same K-row RRF. Same oracle as hybrid_rrf — the indexed
    // lexical scores must be identical to the inline ones
    "hybrid_rrf_indexed" -> QueryDef(
      (s, d) => { VectorFunctions.register(s)
        RetrievalOps.hybridRrfIndexed(Tables.documents(s, d), Tables.embeddings(s, d), d) },
      Some(hybridRrfSql)),

    // hybrid retrieval: reciprocal-rank fusion of the BM25 leg and a
    // cosine leg against the designated probe vector (vec_id 0).
    // Each leg is a 50-row top-k cut; fusion is a full outer join of
    // the two K-row lists with a fixed two-term RRF expression (so
    // the float sum order is deterministic on both engines)
    "hybrid_rrf" -> QueryDef(
      (s, d) => { VectorFunctions.register(s)
        RetrievalOps.hybridRrf(Tables.documents(s, d), Tables.embeddings(s, d)) },
      Some(hybridRrfSql)),

    // ----- corpus pipelines --------------------------------------------
    // the composed cleaning run: quality gate + language consistency
    // + exact dedup as ONE plan (filters fuse ahead of the only
    // shuffle); the oracle recomputes every stage independently
    "corpus_clean_pipeline" -> QueryDef(
      (s, d) => PipelineOps.cleanCorpus(Tables.documents(s, d)),
      Some(cleanPipelineOracle)),

    // the composed cleaning run v2 — decontamination, substring
    // excision over the survivors, a surviving-length gate and exact
    // dedup on the CLEANED text, all one plan. Oracle chains the
    // decontaminate and excise CTE bodies (contamination CTEs
    // c-prefixed to keep the two chains' names apart); docs that
    // become identical only after excision must collapse in the final
    // group-by on both engines.
    "corpus_clean_pipeline2" -> QueryDef(
      (s, d) => PipelineOps.cleanCorpus2(Tables.documents(s, d)),
      Some {
        val L = DedupOps.SubstrRunLen
        val cap = DedupOps.SubstrDocFreqCap
        val P = PipelineOps.ProbeMaxId
        s"""WITH cw AS (SELECT doc_id, $toksSql AS ws FROM documents),
           |ct AS (SELECT doc_id, ${shinglesSql(8)} AS sh FROM cw),
           |cinv AS (SELECT doc_id, unnest(sh) AS s FROM ct WHERE len(sh) > 0),
           |cj AS (SELECT c.doc_id AS corpus_id, count(*) AS overlap
           |       FROM cinv c JOIN cinv p ON c.s = p.s
           |       WHERE p.doc_id < $P AND c.doc_id >= $P
           |       GROUP BY c.doc_id, p.doc_id),
           |bad AS (SELECT DISTINCT corpus_id FROM cj WHERE overlap >= 3),
           |surv AS (SELECT * FROM documents WHERE doc_id >= $P
           |         AND doc_id NOT IN (SELECT corpus_id FROM bad)),
           |t AS (SELECT doc_id, $toksSql AS ws FROM surv),
           |s AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - ${L - 1})) AS i
           |      FROM t WHERE len(ws) >= $L),
           |occ AS (SELECT doc_id, i, array_to_string(ws[i:i+${L - 1}], ' ') AS sh FROM s),
           |df AS (SELECT sh, count(DISTINCT doc_id) AS df, min(doc_id) AS owner
           |       FROM occ GROUP BY sh HAVING count(DISTINCT doc_id) BETWEEN 2 AND $cap),
           |rem AS (SELECT o.doc_id, o.i FROM occ o JOIN df ON o.sh = df.sh
           |        WHERE o.doc_id <> df.owner),
           |posd AS (SELECT DISTINCT doc_id, p FROM
           |           (SELECT doc_id, unnest(generate_series(i, i + ${L - 1})) AS p FROM rem)),
           |wsx AS (SELECT doc_id, unnest(generate_series(1, len(ws))) AS p, ws
           |        FROM t WHERE len(ws) > 0),
           |kept AS (SELECT w.doc_id, w.p, w.ws[w.p] AS tok
           |         FROM wsx w LEFT JOIN posd d ON w.doc_id = d.doc_id AND w.p = d.p
           |         WHERE d.doc_id IS NULL),
           |reb AS (SELECT doc_id, count(*) AS kept_tokens,
           |          string_agg(tok, ' ' ORDER BY p) AS clean_text
           |        FROM kept GROUP BY doc_id),
           |ex AS (SELECT t.doc_id,
           |         CAST(coalesce(reb.kept_tokens, 0) AS BIGINT) AS kept_tokens,
           |         coalesce(reb.clean_text, '') AS clean_text
           |       FROM t LEFT JOIN reb USING (doc_id) WHERE len(ws) > 0),
           |g AS (SELECT doc_id, md5(clean_text) AS fp FROM ex WHERE kept_tokens >= 5)
           |SELECT min(doc_id) AS keep_id, count(*) AS n_copies, fp
           |FROM g GROUP BY fp ORDER BY keep_id""".stripMargin
      }),

    // filter-cascade observability: per-rule first-failure drop
    // counts, one projection + one 6-counter aggregate; oracle
    // generated from the same PipelineOps.Funnel* constants
    "filter_funnel" -> QueryDef(
      (s, d) => PipelineOps.filterFunnel(Tables.documents(s, d)),
      Some(filterFunnelOracle)),

    // benchmark decontamination: corpus docs sharing >= 3 distinct
    // 8-gram shingles with any probe (benchmark) doc
    "contamination_check" -> QueryDef(
      (s, d) => PipelineOps.contaminationCheck(Tables.documents(s, d)),
      Some(s"""WITH w AS (SELECT doc_id, $toksSql AS ws FROM documents),
              |t AS (SELECT doc_id, ${shinglesSql(8)} AS sh FROM w),
              |inv AS (SELECT doc_id, unnest(sh) AS s FROM t WHERE len(sh) > 0),
              |j AS (SELECT c.doc_id AS corpus_id, p.doc_id AS probe_id, count(*) AS overlap
              |      FROM inv c JOIN inv p ON c.s = p.s
              |      WHERE p.doc_id < ${PipelineOps.ProbeMaxId} AND c.doc_id >= ${PipelineOps.ProbeMaxId}
              |      GROUP BY 1, 2)
              |SELECT corpus_id, probe_id, overlap FROM j
              |WHERE overlap >= 3 ORDER BY corpus_id, probe_id""".stripMargin)),

    // the decontaminated corpus itself: contamination_check's hit
    // list turned into the surviving doc set (drop any corpus doc
    // overlapping >= 3 shingles with any probe doc)
    "decontaminate" -> QueryDef(
      (s, d) => PipelineOps.decontaminate(Tables.documents(s, d)),
      Some(s"""WITH w AS (SELECT doc_id, $toksSql AS ws FROM documents),
              |t AS (SELECT doc_id, ${shinglesSql(8)} AS sh FROM w),
              |inv AS (SELECT doc_id, unnest(sh) AS s FROM t WHERE len(sh) > 0),
              |j AS (SELECT c.doc_id AS corpus_id, p.doc_id AS probe_id, count(*) AS overlap
              |      FROM inv c JOIN inv p ON c.s = p.s
              |      WHERE p.doc_id < ${PipelineOps.ProbeMaxId} AND c.doc_id >= ${PipelineOps.ProbeMaxId}
              |      GROUP BY 1, 2),
              |bad AS (SELECT DISTINCT corpus_id FROM j WHERE overlap >= 3)
              |SELECT doc_id, lang, source FROM documents
              |WHERE doc_id >= ${PipelineOps.ProbeMaxId}
              |  AND doc_id NOT IN (SELECT corpus_id FROM bad)
              |ORDER BY doc_id""".stripMargin)),

    // unigram-LM log-probability per document (perplexity proxy)
    "unigram_logprob" -> QueryDef(
      (s, d) => PipelineOps.unigramLogprob(Tables.documents(s, d)),
      Some(s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS word FROM documents),
              |tf AS (SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY 1, 2),
              |wcs AS (SELECT doc_id, tf, sum(tf) OVER (PARTITION BY word) AS wc FROM tf),
              |n AS (SELECT count(*)::DOUBLE AS total_tokens FROM toks)
              |SELECT doc_id, sum(tf)::BIGINT AS n_tokens,
              |  round(sum(tf::DOUBLE * ln(wc::DOUBLE / total_tokens)) / sum(tf)::DOUBLE, 4) AS avg_logprob
              |FROM wcs CROSS JOIN n GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // DSIR importance weights (Xie et al. 2023): hashed-unigram
    // log-ratio of target (probe docs) vs raw distributions, summed
    // per doc over the bucket-sorted contribution list (canonical FP
    // order); the 64-row model is the same md5 hash family
    "dsir_weights" -> QueryDef(
      (s, d) => PipelineOps.dsirWeights(Tables.documents(s, d)),
      Some {
        import PipelineOps.{DsirBuckets => B, DsirSmooth => Sm, ProbeMaxId => P}
        val smB = Sm * B
        s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS word FROM documents),
           |h AS (SELECT doc_id,
           |    CAST(('0x' || substr(md5(word), 1, 15))::UBIGINT % $B AS BIGINT) AS b
           |  FROM toks),
           |tgt AS (SELECT b, count(*) AS ct FROM h WHERE doc_id < $P GROUP BY b),
           |raw AS (SELECT b, count(*) AS cr FROM h WHERE doc_id >= $P GROUP BY b),
           |tot AS (SELECT
           |    sum(CASE WHEN doc_id < $P THEN 1 ELSE 0 END)::DOUBLE AS tt,
           |    sum(CASE WHEN doc_id >= $P THEN 1 ELSE 0 END)::DOUBLE AS tr FROM h),
           |spine AS (SELECT unnest(generate_series(0, ${B - 1}))::BIGINT AS b),
           |model AS (SELECT spine.b,
           |    ln(((coalesce(ct, 0) + $Sm) / (tt + $smB)) /
           |       ((coalesce(cr, 0) + $Sm) / (tr + $smB))) AS lr
           |  FROM spine LEFT JOIN tgt ON spine.b = tgt.b
           |    LEFT JOIN raw ON spine.b = raw.b CROSS JOIN tot),
           |tf AS (SELECT doc_id, b, count(*) AS tf FROM h
           |  WHERE doc_id >= $P GROUP BY doc_id, b)
           |SELECT doc_id, sum(tf)::BIGINT AS n_tokens,
           |  floor(list_sum(list(tf::DOUBLE * lr ORDER BY b)) * 10000.0 + 0.5) / 10000.0
           |    AS dsir_logweight
           |FROM tf JOIN model USING (b)
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin
      }),

    // bigram-LM quality score: frequency-weighted mean ln P(w2|w1),
    // both corpus stats as count windows over the per-doc bigram
    // aggregate (the unigram shape, one partition-key hop deeper)
    "bigram_logprob" -> QueryDef(
      (s, d) => PipelineOps.bigramLogprob(Tables.documents(s, d)),
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS ws FROM documents),
             |n AS (SELECT doc_id, array_to_string(ws[i:i+1], ' ') AS bg
             |      FROM t, LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i) g),
             |bf AS (SELECT doc_id, bg, count(*) AS bf FROM n GROUP BY 1, 2),
             |w AS (SELECT doc_id, bf,
             |        sum(bf) OVER (PARTITION BY bg) AS cbg,
             |        sum(bf) OVER (PARTITION BY string_split(bg, ' ')[1]) AS ch
             |      FROM bf)
             |SELECT doc_id, sum(bf)::BIGINT AS n_bigrams,
             |  round(sum(bf::DOUBLE * ln(cbg::DOUBLE / ch::DOUBLE)) / sum(bf)::DOUBLE, 4) AS avg_logprob
             |FROM w GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // deterministic hash-split: stable train/val/test assignment
    "dataset_split" -> QueryDef(
      (s, d) => PipelineOps.datasetSplit(Tables.documents(s, d)),
      Some("""WITH b AS (SELECT lang, n_chars,
             |            ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::UBIGINT % 100 AS bucket
             |          FROM documents)
             |SELECT lang,
             |  CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
             |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
             |FROM b GROUP BY 1, 2 ORDER BY lang, split""".stripMargin)),

    // language-balancing sample: every lang hash-capped at the
    // smallest lang's count; membership is row-local
    "stratified_sample" -> QueryDef(
      (s, d) => PipelineOps.stratifiedSample(Tables.documents(s, d)),
      Some("""WITH c AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY lang),
             |tgt AS (SELECT min(n_lang) AS target FROM c),
             |kept AS (SELECT d.lang, c.n_lang FROM documents d
             |         JOIN c USING (lang) CROSS JOIN tgt
             |         WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 15))::UBIGINT % 1000
             |               < (target * 1000) // n_lang)
             |SELECT lang, max(n_lang) AS n_total, count(*) AS n_sampled
             |FROM kept GROUP BY lang ORDER BY lang""".stripMargin)),

    // temperature-weighted (α=1/2) language balancing: per-lang
    // sqrt(n_min/n_l) keep rate, deterministic hash-bucket membership
    "temperature_sample" -> QueryDef(
      (s, d) => PipelineOps.temperatureSample(Tables.documents(s, d)),
      Some("""WITH c AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY lang),
             |m AS (SELECT lang, n_lang, min(n_lang) OVER () AS n_min FROM c),
             |t AS (SELECT lang, n_lang,
             |        CAST(floor(1000000 * sqrt(CAST(n_min AS DOUBLE) /
             |          CAST(n_lang AS DOUBLE))) AS BIGINT) AS threshold
             |      FROM m),
             |kept AS (SELECT d.lang, t.n_lang, t.threshold FROM documents d
             |         JOIN t USING (lang)
             |         WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 15))::UBIGINT
             |               % 1000000 < t.threshold)
             |SELECT lang, max(n_lang) AS n_total, count(*) AS n_kept,
             |  max(threshold) AS keep_per_million
             |FROM kept GROUP BY lang ORDER BY lang""".stripMargin)),

    // context-window chunking: ChunkSize-token windows every
    // ChunkStride tokens (overlap = size - stride), fully row-local
    "doc_chunks" -> QueryDef(
      (s, d) => PipelineOps.docChunks(Tables.documents(s, d)),
      Some(s"""WITH w AS (SELECT doc_id, $toksSql AS ws FROM documents),
              |t AS (SELECT doc_id, ws FROM w WHERE len(ws) > 0),
              |s AS (SELECT doc_id, ws,
              |        unnest(generate_series(1, len(ws), ${PipelineOps.ChunkStride})) AS start
              |      FROM t)
              |SELECT doc_id,
              |  ((start - 1) // ${PipelineOps.ChunkStride})::BIGINT AS chunk_id,
              |  len(ws[start:start + ${PipelineOps.ChunkSize - 1}])::BIGINT AS n_tokens,
              |  array_to_string(ws[start:start + ${PipelineOps.ChunkSize - 1}], ' ') AS chunk_text
              |FROM s ORDER BY doc_id, chunk_id""".stripMargin)),

    // shelf packing of chunks into PackCapacity-token bins via a
    // per-language prefix sum over the deterministic chunk order
    "chunk_packing" -> QueryDef(
      (s, d) => PipelineOps.chunkPacking(Tables.documents(s, d)),
      Some(s"""WITH w AS (SELECT doc_id, lang, $toksSql AS ws FROM documents),
              |t AS (SELECT doc_id, lang, ws FROM w WHERE len(ws) > 0),
              |s AS (SELECT doc_id, lang, ws,
              |        unnest(generate_series(1, len(ws), ${PipelineOps.ChunkStride})) AS start
              |      FROM t),
              |c AS (SELECT doc_id, lang,
              |        ((start - 1) // ${PipelineOps.ChunkStride})::BIGINT AS chunk_id,
              |        len(ws[start:start + ${PipelineOps.ChunkSize - 1}])::BIGINT AS n_tokens
              |      FROM s),
              |r AS (SELECT lang, n_tokens,
              |        sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id, chunk_id
              |                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              |      FROM c)
              |SELECT lang, ((cum - n_tokens) // ${PipelineOps.PackCapacity})::BIGINT AS bin_id,
              |  count(*) AS n_chunks, sum(n_tokens)::BIGINT AS bin_tokens
              |FROM r GROUP BY lang, bin_id ORDER BY lang, bin_id""".stripMargin)),

    // ----- dedup -------------------------------------------------------
    "exact_dedup" -> QueryDef(
      (s, d) => DedupOps.exactDedup(Tables.documents(s, d)),
      Some("""SELECT min(doc_id) AS keep_id, count(*) AS n_copies, md5(lower(text)) AS fp
             |FROM documents GROUP BY fp ORDER BY keep_id""".stripMargin)),

    // incremental dedup: dedup the incoming (odd-id) batch against
    // the already-ingested (even-id) corpus — batch collapses to one
    // row per digest before the left-anti join on fp
    "incremental_dedup" -> QueryDef(
      (s, d) => DedupOps.incrementalDedup(Tables.documents(s, d)),
      Some("""WITH b AS (SELECT md5(lower(text)) AS fp, min(doc_id) AS keep_id,
             |         count(*) AS n_copies
             |       FROM documents WHERE doc_id % 2 = 1 GROUP BY fp)
             |SELECT keep_id, n_copies, fp FROM b
             |WHERE NOT EXISTS (SELECT 1 FROM documents c
             |                  WHERE c.doc_id % 2 = 0
             |                    AND md5(lower(c.text)) = b.fp)
             |ORDER BY keep_id""".stripMargin)),

    // count-min heavy hitters: one pass builds the constant 4x256
    // grid, the exact top-20 words probe it row-locally; the oracle
    // rebuilds every bucket counter from the same affine hash family
    "cms_heavy_hitters" -> QueryDef(
      (s, d) => TextAnalysisOps.cmsHeavyHitters(Tables.documents(s, d)),
      Some(s"""WITH tok AS (SELECT unnest($toksSql) AS word FROM documents),
             |cnt AS (SELECT word, count(*) AS cnt,
             |        CAST(('0x' || substr(md5(word), 1, 15))::UBIGINT % ${graft.functions.expressions.CmsHash.P} AS BIGINT) AS xm
             |      FROM tok GROUP BY word),
             |hb AS (SELECT word, cnt, j,
             |        ((2*j + 1) * xm + j*j + 7) % ${graft.functions.expressions.CmsHash.P} % ${TextAnalysisOps.CmsW} AS b
             |      FROM cnt CROSS JOIN range(${TextAnalysisOps.CmsD}) t(j)),
             |bucket AS (SELECT j, b, sum(cnt) AS s FROM hb GROUP BY j, b),
             |est AS (SELECT word, min(s) AS e FROM hb JOIN bucket USING (j, b) GROUP BY word),
             |topk AS (SELECT word, cnt FROM cnt ORDER BY cnt DESC, word LIMIT ${TextAnalysisOps.CmsTopK})
             |SELECT t.word, t.cnt, CAST(e.e AS BIGINT) AS est_cnt
             |FROM topk t JOIN est e USING (word) ORDER BY word""".stripMargin)),

    "near_dedup_jaccard" -> QueryDef(
      (s, d) => DedupOps.nearDupJaccard(Tables.documents(s, d)),
      Some(jaccardOracle)),

    // minhash+LSH candidates are exact-verified, so at recall 1 the
    // result set IS the exact-jaccard result: same oracle.
    "near_dedup_minhash" -> QueryDef(
      (s, d) => DedupOps.nearDupMinhash(Tables.documents(s, d)),
      Some(jaccardOracle)),

    // steady-state LSH: the arriving (odd-id) batch probes the
    // PERSISTED corpus band index — the corpus is never re-banded or
    // self-joined. Candidates are exact-verified, so the result is
    // the exact-jaccard pair set restricted to >= 1 batch endpoint;
    // the oracle recomputes that restriction from scratch.
    "incremental_near_dedup" -> QueryDef(
      (s, d) => DedupOps.incrementalNearDedup(Tables.documents(s, d), d),
      Some(incrementalJaccardOracle)),

    // batch-agnosticism gate for the public batch APIs: a SECOND,
    // different arriving split (doc_id % 4 = 1) through the same
    // probe entry points the parity queries use. The pair universe is
    // corpus (even) + batch (mod-4-1) docs; mod-4-3 docs are in
    // neither and must not appear.
    "incremental_near_dedup_batch2" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        DedupOps.nearDedupBatch(
          docs.where(pmod(col("doc_id"), lit(4)) === 1), docs, d)
      },
      Some(s"""WITH $jaccardPairsBody
             |SELECT a_id, b_id, jac FROM pairs
             |WHERE (a_id % 4 = 1 OR b_id % 4 = 1)
             |  AND (a_id % 2 = 0 OR a_id % 4 = 1)
             |  AND (b_id % 2 = 0 OR b_id % 4 = 1)
             |ORDER BY a_id, b_id""".stripMargin)),

    // the dedup family's take-down leg: the probe after a
    // deleteFromLshIndex — tombstoned corpus docs can't pair, live
    // ones pair as before, and the cap math sees the LIVE population
    // (counts advanced at delete time). The oracle re-pairs the
    // post-delete universe from scratch, so a resurrected deleted doc
    // or a lost live one reds the hash.
    "near_dedup_after_delete" -> QueryDef(
      (s, d) => DedupOps.nearDedupAfterDelete(Tables.documents(s, d), d),
      Some(lshDeleteOracle)),

    "incremental_dedup_batch2" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        DedupOps.dedupBatch(
          docs.where(pmod(col("doc_id"), lit(4)) === 1), docs)
      },
      Some("""WITH b AS (SELECT md5(lower(text)) AS fp, min(doc_id) AS keep_id,
             |         count(*) AS n_copies
             |       FROM documents WHERE doc_id % 4 = 1 GROUP BY fp)
             |SELECT keep_id, n_copies, fp FROM b
             |WHERE NOT EXISTS (SELECT 1 FROM documents c
             |                  WHERE c.doc_id % 2 = 0
             |                    AND md5(lower(c.text)) = b.fp)
             |ORDER BY keep_id""".stripMargin)),

    // the STREAMING near-dedup path under the hash gate: the pairs
    // were landed by a real checkpointed micro-batch run (availableNow
    // foreachBatch probing the persisted band index); the oracle
    // recomputes exact Jaccard from the ORIGINAL documents table, so
    // a lost/duplicated micro-batch or a drifted index reds the row
    "streamed_ingest_pairs" -> QueryDef(
      (s, d) => {
        val dir = graft.streaming.EventStreams.streamedNearDedupLayout(s, d)
        s.read.parquet(dir)
          .select("a_id", "b_id", "jac")
          .orderBy("a_id", "b_id")
      },
      Some(incrementalJaccardOracle)),

    // transitive duplicate clusters: the engine's distributed
    // min-label propagation vs DuckDB's recursive-CTE fixpoint over
    // the SAME pair graph (jaccardPairsBody is shared text)
    "dup_components" -> QueryDef(
      (s, d) => DedupOps.dupComponents(Tables.documents(s, d), d),
      Some(s"""$componentsOracleBody
              |SELECT node AS doc_id, component FROM comp ORDER BY doc_id""".stripMargin)),

    // steady-state closure: persisted corpus labels + live convergence
    // of only the components the arriving (odd-id) batch touches; the
    // oracle recomputes the WHOLE closure from scratch, so the hash
    // match is the batch-incremental == full-rebuild proof
    "incremental_components" -> QueryDef(
      (s, d) => DedupOps.incrementalComponents(Tables.documents(s, d), d),
      Some(s"""$componentsOracleBody
              |SELECT node AS doc_id, component FROM comp ORDER BY doc_id""".stripMargin)),

    // integer-scaled PageRank over the customer–supplier trade graph:
    // ranks are longs in units of 1/1e15, every step exact integer
    // arithmetic (`div` / `//`), so the hash match needs no float
    // tolerance despite three rounds of damped summation. The oracle
    // unrolls PagerankIters=3 rounds as chained CTEs (the
    // ann_ivf_kmeans2 bounded-loop convention).
    "pagerank_trade" -> QueryDef(
      (s, d) => GraphOps.pagerankTrade(Tables.orders(s, d), Tables.lineitem(s, d)),
      Some {
        val scale = GraphOps.PagerankScale // 1e15
        val baseNum = GraphOps.PagerankScale *
          (GraphOps.DampDen - GraphOps.DampNum) / GraphOps.DampDen // 1.5e14
        def round(k: Int) =
          s"""r$k AS (
             |  SELECT a.dst AS node,
             |    $baseNum // (SELECT nn FROM n)
             |      + (${GraphOps.DampNum} * sum(p.rank // a.outdeg)) // ${GraphOps.DampDen} AS rank
             |  FROM arcs a JOIN r${k - 1} p ON a.src = p.node
             |  GROUP BY a.dst)""".stripMargin
        s"""WITH trade AS (
           |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
           |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
           |edges AS (
           |  SELECT c AS src, s AS dst FROM trade
           |  UNION ALL SELECT s AS src, c AS dst FROM trade),
           |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
           |arcs AS (SELECT e.src, e.dst, d.outdeg
           |         FROM edges e JOIN deg d ON e.src = d.src),
           |n AS (SELECT count(*) AS nn FROM deg),
           |r0 AS (SELECT src AS node, $scale // (SELECT nn FROM n) AS rank FROM deg),
           |${round(1)},
           |${round(2)},
           |${round(3)}
           |SELECT CASE WHEN node % 2 = 0 THEN 'c' || CAST(node // 2 AS VARCHAR)
           |            ELSE 's' || CAST((node - 1) // 2 AS VARCHAR) END AS entity,
           |  CAST(rank AS BIGINT) AS rank_val
           |FROM r3
           |ORDER BY rank_val DESC, entity LIMIT ${GraphOps.PagerankTopK}""".stripMargin
      }),

    // personalized PageRank from customer 1: restart mass at the
    // seed only, so ranks decay with graph distance — same integer
    // discipline, oracle unrolls the rounds with the seed-cased
    // restart term
    "ppr_trade" -> QueryDef(
      (s, d) => GraphOps.pprTrade(Tables.orders(s, d), Tables.lineitem(s, d)),
      Some {
        val scale = GraphOps.PagerankScale
        val restart = GraphOps.PagerankScale *
          (GraphOps.DampDen - GraphOps.DampNum) / GraphOps.DampDen
        val seed = GraphOps.PprSeedNode
        def round(k: Int) =
          s"""r$k AS MATERIALIZED (
             |  SELECT a.dst AS node,
             |    CASE WHEN a.dst = $seed THEN $restart ELSE 0 END
             |      + (${GraphOps.DampNum} * sum(p.rank // a.outdeg)) // ${GraphOps.DampDen} AS rank
             |  FROM arcs a JOIN r${k - 1} p ON a.src = p.node
             |  GROUP BY a.dst)""".stripMargin
        s"""WITH trade AS MATERIALIZED (
           |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
           |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
           |edges AS MATERIALIZED (
           |  SELECT c AS src, s AS dst FROM trade
           |  UNION ALL SELECT s AS src, c AS dst FROM trade),
           |deg AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
           |arcs AS MATERIALIZED (SELECT e.src, e.dst, d.outdeg
           |  FROM edges e JOIN deg d ON e.src = d.src),
           |r0 AS MATERIALIZED (
           |  SELECT src AS node,
           |    CASE WHEN src = $seed THEN $scale ELSE 0 END AS rank FROM deg),
           |${round(1)},
           |${round(2)},
           |${round(3)}
           |SELECT CASE WHEN node % 2 = 0 THEN 'c' || CAST(node // 2 AS VARCHAR)
           |            ELSE 's' || CAST((node - 1) // 2 AS VARCHAR) END AS entity,
           |  CAST(rank AS BIGINT) AS rank_val
           |FROM r3 WHERE rank > 0
           |ORDER BY rank_val DESC, entity LIMIT ${GraphOps.PagerankTopK}""".stripMargin
      }),

    // BFS shortest hop distances from customer 1 over the trade
    // graph, bounded rounds, exact integer distances (zero-tolerance
    // hash). Every dk CTE references d(k-1) twice (union + join), so
    // each round is MATERIALIZED — the exponential-inlining lesson
    "bfs_hops" -> QueryDef(
      (s, d) => GraphOps.bfsHops(Tables.orders(s, d), Tables.lineitem(s, d)),
      Some {
        def round(k: Int) =
          s"""d$k AS MATERIALIZED (
             |  SELECT node, min(dist) AS dist FROM (
             |    SELECT node, dist FROM d${k - 1}
             |    UNION ALL
             |    SELECT e.dst AS node, p.dist + 1 AS dist
             |    FROM edges e JOIN d${k - 1} p ON e.src = p.node)
             |  GROUP BY node)""".stripMargin
        s"""WITH trade AS MATERIALIZED (
           |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
           |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
           |edges AS MATERIALIZED (
           |  SELECT c AS src, s AS dst FROM trade
           |  UNION ALL SELECT s AS src, c AS dst FROM trade),
           |d0 AS (SELECT CAST(${GraphOps.PprSeedNode} AS BIGINT) AS node,
           |              CAST(0 AS BIGINT) AS dist),
           |${(1 to GraphOps.BfsMaxHops).map(round).mkString(",\n")}
           |SELECT CASE WHEN node % 2 = 0 THEN 'c' || CAST(node // 2 AS VARCHAR)
           |            ELSE 's' || CAST((node - 1) // 2 AS VARCHAR) END AS entity,
           |  dist
           |FROM d${GraphOps.BfsMaxHops}
           |ORDER BY dist, entity""".stripMargin
      }),

    // weighted SSSP (min-plus Bellman-Ford) over trade-multiplicity
    // edge costs — exact longs, per-round MATERIALIZED CTEs
    "sssp_weighted" -> QueryDef(
      (s, d) => GraphOps.ssspWeighted(Tables.orders(s, d), Tables.lineitem(s, d)),
      Some {
        def round(k: Int) =
          s"""d$k AS MATERIALIZED (
             |  SELECT node, min(dist) AS dist FROM (
             |    SELECT node, dist FROM d${k - 1}
             |    UNION ALL
             |    SELECT e.dst AS node, p.dist + e.w AS dist
             |    FROM edges e JOIN d${k - 1} p ON e.src = p.node)
             |  GROUP BY node)""".stripMargin
        s"""WITH trade AS MATERIALIZED (
           |  SELECT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s,
           |    count(DISTINCT o_orderkey) % 3 + 1 AS w
           |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
           |  GROUP BY 1, 2),
           |edges AS MATERIALIZED (
           |  SELECT c AS src, s AS dst, w FROM trade
           |  UNION ALL SELECT s, c, w FROM trade),
           |d0 AS (SELECT CAST(${GraphOps.PprSeedNode} AS BIGINT) AS node,
           |              CAST(0 AS BIGINT) AS dist),
           |${(1 to GraphOps.BfsMaxHops).map(round).mkString(",\n")}
           |SELECT CASE WHEN node % 2 = 0 THEN 'c' || CAST(node // 2 AS VARCHAR)
           |            ELSE 's' || CAST((node - 1) // 2 AS VARCHAR) END AS entity,
           |  dist
           |FROM d${GraphOps.BfsMaxHops}
           |ORDER BY dist, entity""".stripMargin
      }),

    // steady-state PageRank: persisted base-graph ranks (even
    // o_orderkey orders — the house parity convention) warm-started
    // with ONE damped round over the updated graph; the oracle
    // replays base cold rounds + warm round in the same integer
    // arithmetic, so the hash match proves warm-start == definition.
    // All CTEs MATERIALIZED (the mmr/triangles inlining lesson).
    "incremental_pagerank" -> QueryDef(
      (s, d) => GraphOps.incrementalPagerank(Tables.orders(s, d),
        Tables.lineitem(s, d), d),
      Some(incrementalPagerankOracle(""))),

    // batch-agnosticism proof for the warm-start API: the SAME
    // operator fed a DIFFERENT arriving batch (the mod-4 split, a
    // strict subset of the odd keys) against an independently
    // parameterized replay oracle — the dedup family's `_batch2`
    // discipline applied to the graph family.
    "incremental_pagerank_batch2" -> QueryDef(
      (s, d) => GraphOps.incrementalPagerankBatch(
        Tables.orders(s, d).where("o_orderkey % 4 = 1"),
        Tables.orders(s, d), Tables.lineitem(s, d), d),
      Some(incrementalPagerankOracle("OR o_orderkey % 4 = 1"))),

    // degree-ordered triangle counting on the part co-order graph:
    // all-integer, so exact; the oracle mirrors the orientation with
    // row-value (tuple) comparisons — DuckDB's `(a,b) < (c,d)` is the
    // same lexicographic order as Spark's struct comparison. Every
    // CTE is MATERIALIZED: `oriented` is referenced three times and
    // plain-CTE re-inlining expands its whole upstream join tree per
    // reference — at 10x the optimizer spilled >77 GB of temp on the
    // exploded tree before erroring, where the materialized chain
    // runs in seconds (the mmr_rerank lesson, repeated)
    "coorder_triangles" -> QueryDef(
      (s, d) => GraphOps.coorderTriangles(Tables.lineitem(s, d)),
      Some(coorderTrianglesOracle)),

    // the SAME triangle count over the WRITE-ONCE oriented edge-list
    // index: co-order projection + degree + orientation run at build
    // time, the query is a read + wedge/closing joins. Shares the
    // inline oracle verbatim — the hash match is the index == inline
    // proof (the bm25_indexed discipline for the graph family).
    "coorder_triangles_indexed" -> QueryDef(
      (s, d) => GraphOps.coorderTrianglesIndexed(Tables.lineitem(s, d), d),
      Some(coorderTrianglesOracle)),

    // BFS run to EMPTY-FRONTIER CONVERGENCE on a thinned
    // (o_orderkey % 37) trade graph whose eccentricity exceeds the
    // bounded queries' 4 rounds: the gate for the exhaustion loop the
    // bounded bfs/sssp rows document as the 100 TB posture. Oracle:
    // recursive CTE walking (node, dist) pairs, capped at the shared
    // FixpointMaxRounds (cycles extend dists forever under UNION
    // recursion; the Spark loop THROWS if it ever needs that many
    // rounds, so the cap is jointly certified), min-reduced per node.
    "bfs_hops_fixpoint" -> QueryDef(
      (s, d) => GraphOps.bfsHopsFixpoint(Tables.orders(s, d), Tables.lineitem(s, d)),
      Some(s"""WITH RECURSIVE trade AS MATERIALIZED (
             |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |  WHERE o_orderkey % ${GraphOps.FixpointSliceMod} = 0),
             |edges AS MATERIALIZED (
             |  SELECT c AS src, s AS dst FROM trade
             |  UNION ALL SELECT s AS src, c AS dst FROM trade),
             |seed AS (SELECT min(src) AS n FROM edges),
             |walk(node, dist) AS (
             |  SELECT n, CAST(0 AS BIGINT) FROM seed
             |  UNION
             |  SELECT e.dst, w.dist + 1 FROM walk w JOIN edges e ON e.src = w.node
             |  WHERE w.dist < ${GraphOps.FixpointMaxRounds}),
             |d AS (SELECT node, min(dist) AS dist FROM walk GROUP BY node)
             |SELECT CASE WHEN node % 2 = 0 THEN 'c' || CAST(node // 2 AS VARCHAR)
             |            ELSE 's' || CAST((node - 1) // 2 AS VARCHAR) END AS entity,
             |  dist
             |FROM d ORDER BY dist, entity""".stripMargin)),

    // the weighted fixpoint: min-plus Bellman-Ford to empty frontier
    // on the same slice — weighted relaxation re-improves settled
    // nodes, so the frontier RE-ENTRY leg runs to exhaustion too.
    // Cost-capped recursion on the oracle side (costs 1-3 per edge,
    // true shortest costs << 48 on this fixture)
    "sssp_fixpoint" -> QueryDef(
      (s, d) => GraphOps.ssspFixpoint(Tables.orders(s, d), Tables.lineitem(s, d)),
      Some(s"""WITH RECURSIVE trade AS MATERIALIZED (
             |  SELECT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s,
             |    count(DISTINCT o_orderkey) % 3 + 1 AS w
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |  WHERE o_orderkey % ${GraphOps.FixpointSliceMod} = 0
             |  GROUP BY 1, 2),
             |edges AS MATERIALIZED (
             |  SELECT c AS src, s AS dst, w FROM trade
             |  UNION ALL SELECT s, c, w FROM trade),
             |seed AS (SELECT min(src) AS n FROM edges),
             |walk(node, dist) AS (
             |  SELECT n, CAST(0 AS BIGINT) FROM seed
             |  UNION
             |  SELECT e.dst, w.dist + e.w FROM walk w JOIN edges e ON e.src = w.node
             |  WHERE w.dist + e.w <= ${GraphOps.FixpointMaxRounds}),
             |d AS (SELECT node, min(dist) AS dist FROM walk GROUP BY node)
             |SELECT CASE WHEN node % 2 = 0 THEN 'c' || CAST(node // 2 AS VARCHAR)
             |            ELSE 's' || CAST((node - 1) // 2 AS VARCHAR) END AS entity,
             |  dist
             |FROM d ORDER BY dist, entity""".stripMargin)),

    // 2-D box aggregate over the write-once Z-ORDERED lineitem layout
    // (cells = low 16 bits of partkey/suppkey, rows range-partitioned
    // by the Morton interleave): the hash match proves the layout
    // write+read round trip AND pins the 32-term interleave
    // arithmetic cross-engine (min/max zval inside the box); the
    // file-skipping benefit is measured in ZOrderSpec
    "zorder_box_scan" -> QueryDef(
      (s, d) => LayoutOps.zorderBoxScan(Tables.lineitem(s, d), d),
      Some {
        import LayoutOps._
        s"""WITH c AS (SELECT (l_partkey & $CellMask) AS cx,
           |                  (l_suppkey & $CellMask) AS cy, l_quantity
           |           FROM lineitem),
           |z AS (SELECT cx, cy, l_quantity,
           |        ${zValueSql("cx", "cy")} AS zval FROM c)
           |SELECT count(*) AS n_rows,
           |  CAST(coalesce(sum(CAST(l_quantity AS DECIMAL(18,2))), 0) AS DOUBLE) AS sum_qty,
           |  coalesce(min(zval), -1) AS min_zval,
           |  coalesce(max(zval), -1) AS max_zval
           |FROM z
           |WHERE cx BETWEEN $BoxXLo AND $BoxXHi
           |  AND cy BETWEEN $BoxYLo AND $BoxYHi""".stripMargin
      }),

    // Hilbert-curve layout companion to zorder_box_scan: connected
    // curve ranges => tighter per-file (cx, cy) envelopes; the oracle
    // replays the native expression's rotation walk level by level
    "hilbert_box_scan" -> QueryDef(
      (s, d) => LayoutOps.hilbertBoxScan(Tables.lineitem(s, d), d),
      Some(LayoutOps.hilbertBoxScanSql)),

    // weighted sample without replacement: top-PrioK priorities
    // (w·2^60/h — two IEEE ops, bit-identical cross-engine) per
    // source; the rank window is WindowGroupLimit-trimmed pre-shuffle
    "priority_sample_weighted" -> QueryDef(
      (s, d) => PipelineOps.prioritySample(Tables.documents(s, d)),
      Some(prioritySampleSql)),

    // the streamed front door: per-source top-(K+1) state folded per
    // micro-batch (versioned chain); top-K over union is associative,
    // so the final state replays the BATCH sampler's oracle verbatim
    "streamed_priority_sample" -> QueryDef(
      (s, d) => {
        val stateRoot = graft.streaming.EventStreams.streamedPrioLayout(s, d)
        val v = graft.streaming.EventStreams.latestCdcVersion(stateRoot)
        PipelineOps.prioritySampleFromState(s.read.parquet(s"$stateRoot/v$v"))
      },
      Some(prioritySampleSql)),

    // the estimator the sample exists for: Σ max(w, τ) per source in
    // integer micro-units (order-independent long sum) vs the truth
    "priority_sample_estimate" -> QueryDef(
      (s, d) => PipelineOps.prioritySampleEstimate(Tables.documents(s, d)),
      Some(s"""WITH h AS (SELECT source, doc_id, n_chars,
              |  ${PipelineOps.SamplePrioritySql} AS priority FROM documents),
              |r AS (SELECT *, row_number() OVER (PARTITION BY source
              |        ORDER BY priority DESC, doc_id) AS rnk FROM h),
              |tau AS (SELECT source, priority AS tau FROM r
              |        WHERE rnk = ${PipelineOps.PrioK + 1}),
              |est AS (SELECT r.source,
              |    CAST(sum(CAST(floor(least(greatest(CAST(n_chars AS DOUBLE),
              |      coalesce(tau.tau, 0.0)), ${PipelineOps.PrioEstimateCap})
              |      * 1000000.0 + 0.5) AS BIGINT))
              |      AS BIGINT) AS est_total_micro
              |  FROM r LEFT JOIN tau ON r.source = tau.source
              |  WHERE rnk <= ${PipelineOps.PrioK} GROUP BY r.source),
              |tot AS (SELECT source, count(*) AS n_docs,
              |    CAST(sum(n_chars) AS BIGINT) AS true_total
              |  FROM documents GROUP BY source)
              |SELECT source, n_docs, true_total, est_total_micro
              |FROM tot JOIN est USING (source) ORDER BY source""".stripMargin)),

    // the deduplicated corpus itself: cluster minima + untouched docs
    "dedup_survivors" -> QueryDef(
      (s, d) => DedupOps.dedupSurvivors(Tables.documents(s, d), d),
      Some(s"""$componentsOracleBody
              |SELECT d.doc_id, d.lang, d.source FROM documents d
              |WHERE d.doc_id NOT IN (SELECT node FROM comp WHERE component < node)
              |ORDER BY d.doc_id""".stripMargin)),

    "simhash_fingerprint" -> QueryDef(
      (s, d) => DedupOps.simhash(Tables.documents(s, d)),
      Some(s"""${simhashSqlCte(20)}
              |SELECT doc_id, simhash FROM sigs ORDER BY doc_id""".stripMargin)),

    // the oracle mirrors the engine's chunk-bucket candidate
    // generation INCLUDING the mega-bucket cap, generated from the
    // same DedupOps constants (the NtileBandSamplePct pattern) so the
    // hash gate holds at any SF. Below the cap the bucket filter is
    // inert and the formulation degenerates to all-pairs, so at gate
    // SFs a hash match still proves chunk-candidate recall is 1.
    "simhash_dup" -> QueryDef(
      (s, d) => DedupOps.simhashDup(Tables.documents(s, d)),
      Some(simhashDupOracleSql)),

    // substring-level dedup: cross-document repeated token runs and
    // per-doc excision coverage. Oracle generated from the SAME
    // DedupOps constants (run length, doc-freq cap); the position
    // arithmetic is 1-based in SQL vs 0-based in Spark, but coverage
    // is a distinct-count so the offset cancels.
    "substring_dedup" -> QueryDef(
      (s, d) => DedupOps.substringDedup(Tables.documents(s, d)),
      Some(substrCoverageOracle(docFilter = "", rowFilter = ""))),

    // steady-state substring dedup: the arriving (odd-id) batch
    // probes the PERSISTED corpus run index — the corpus is never
    // re-shingled. The oracle recomputes df/owner over corpus+batch
    // from scratch and restricts to batch rows, so the hash match is
    // the probe == full-rebuild proof (the run universe excludes
    // neither parity: combined df must count both sides).
    "incremental_substring_dedup" -> QueryDef(
      (s, d) => DedupOps.incrementalSubstringDedup(Tables.documents(s, d), d),
      Some(substrCoverageOracle(docFilter = "",
        rowFilter = "AND t.doc_id % 2 = 1"))),

    // the cleaned corpus itself: repeated runs excised, survivors
    // reassembled in token order (empty clean_text rows survive —
    // exact duplicates excise to nothing, and that must be visible).
    // Oracle rebuilds from 1-based positions, engine from 0-based;
    // both join on the SAME single-space rule, so the offset cancels
    // and the reassembled strings must match byte-for-byte.
    "substring_excise" -> QueryDef(
      (s, d) => DedupOps.substringExcise(Tables.documents(s, d)),
      Some {
        val L = DedupOps.SubstrRunLen
        val cap = DedupOps.SubstrDocFreqCap
        s"""WITH t AS (SELECT doc_id, $toksSql AS ws FROM documents),
           |s AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - ${L - 1})) AS i
           |      FROM t WHERE len(ws) >= $L),
           |occ AS (SELECT doc_id, i, array_to_string(ws[i:i+${L - 1}], ' ') AS sh FROM s),
           |df AS (SELECT sh, count(DISTINCT doc_id) AS df, min(doc_id) AS owner
           |       FROM occ GROUP BY sh HAVING count(DISTINCT doc_id) BETWEEN 2 AND $cap),
           |rem AS (SELECT o.doc_id, o.i FROM occ o JOIN df ON o.sh = df.sh
           |        WHERE o.doc_id <> df.owner),
           |posd AS (SELECT DISTINCT doc_id, p FROM
           |           (SELECT doc_id, unnest(generate_series(i, i + ${L - 1})) AS p FROM rem)),
           |wsx AS (SELECT doc_id, unnest(generate_series(1, len(ws))) AS p, ws
           |        FROM t WHERE len(ws) > 0),
           |kept AS (SELECT w.doc_id, w.p, w.ws[w.p] AS tok
           |         FROM wsx w LEFT JOIN posd d ON w.doc_id = d.doc_id AND w.p = d.p
           |         WHERE d.doc_id IS NULL),
           |reb AS (SELECT doc_id, count(*) AS kept_tokens,
           |          string_agg(tok, ' ' ORDER BY p) AS clean_text
           |        FROM kept GROUP BY doc_id)
           |SELECT t.doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
           |  CAST(coalesce(reb.kept_tokens, 0) AS BIGINT) AS kept_tokens,
           |  coalesce(reb.clean_text, '') AS clean_text
           |FROM t LEFT JOIN reb USING (doc_id) WHERE len(ws) > 0
           |ORDER BY t.doc_id""".stripMargin
      }),

    // ----- similarity search / embeddings ------------------------------
    // MMR diversity rerank of the probe's top-50 cosine candidates:
    // the oracle unrolls all 10 greedy picks as chained CTEs (the
    // pagerank_trade / ann_ivf_kmeans2 bounded-loop convention); every
    // score is det6-locked so the greedy argmax sequence is the exact
    // same double arithmetic in both engines
    "mmr_rerank" -> QueryDef(
      (s, d) => SimilarityOps.mmrRerank(Tables.embeddings(s, d)),
      Some {
        import graft.operators.TextAnalysisOps.det6Sql
        // every chained CTE is MATERIALIZED: DuckDB inlines plain
        // CTEs per reference, and sel{t} referencing sel{t-1} twice
        // makes naive inlining EXPONENTIAL in the round count (the
        // non-materialized form spun for minutes on 500 rows)
        val rounds = (2 to SimilarityOps.MmrK).map { t =>
          s"""m$t AS MATERIALIZED (
             |  SELECT c.vec_id, c.r6,
             |    0.5 * c.r6 - 0.5 * (
             |      SELECT max(${det6Sql(cosSql("c.embedding", "s.embedding"))})
             |      FROM cand s WHERE s.vec_id IN (SELECT vec_id FROM sel${t - 1})) AS mmr
             |  FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM sel${t - 1})),
             |p$t AS MATERIALIZED (SELECT $t AS rnk, vec_id, mmr AS mmr_val FROM m$t
             |        ORDER BY mmr DESC, vec_id LIMIT 1),
             |sel$t AS MATERIALIZED (SELECT vec_id FROM sel${t - 1} UNION ALL SELECT vec_id FROM p$t)"""
            .stripMargin
        }.mkString(",\n")
        s"""WITH pr AS (SELECT embedding AS probe_vec FROM embeddings WHERE vec_id = 0),
           |cand AS MATERIALIZED (
           |  SELECT vec_id, embedding, ${det6Sql(cosSql("embedding", "probe_vec"))} AS r6
           |  FROM embeddings CROSS JOIN pr WHERE vec_id <> 0
           |  ORDER BY r6 DESC, vec_id LIMIT ${SimilarityOps.MmrCandK}),
           |p1 AS MATERIALIZED (SELECT 1 AS rnk, vec_id, 0.5 * r6 AS mmr_val FROM cand
           |       ORDER BY r6 DESC, vec_id LIMIT 1),
           |sel1 AS MATERIALIZED (SELECT vec_id FROM p1),
           |$rounds
           |SELECT CAST(rnk AS BIGINT) AS rnk, vec_id, mmr_val FROM (
           |  SELECT * FROM p1
           |  ${(2 to SimilarityOps.MmrK).map(t => s"UNION ALL SELECT * FROM p$t").mkString("\n  ")})
           |ORDER BY rnk""".stripMargin
      }),

    "similarity_topk" -> QueryDef(
      (s, d) => { VectorFunctions.register(s); SimilarityOps.similarityTopK(Tables.embeddings(s, d)) },
      Some(s"""WITH p AS (SELECT vec_id AS probe_id, embedding AS probe_vec FROM embeddings WHERE vec_id < 10),
              |s AS (SELECT probe_id, vec_id, ${cosSql("probe_vec", "embedding")} AS score
              |      FROM embeddings CROSS JOIN p WHERE vec_id <> probe_id),
              |r AS (SELECT probe_id, vec_id, score,
              |        row_number() OVER (PARTITION BY probe_id ORDER BY round(score, 6) DESC, vec_id) AS rnk
              |      FROM s)
              |SELECT probe_id, rnk, vec_id, round(score, 4) + 0 AS score
              |FROM r WHERE rnk <= 10 ORDER BY probe_id, rnk""".stripMargin)),

    // k-NN classification: odd-id probes labeled by majority vote of
    // their 5 nearest even-id (labeled) reference vectors — the
    // similarity_topk scan-once/WindowGroupLimit shape plus a
    // probes×k-row vote aggregate; ties to the smallest label
    "knn_classify" -> QueryDef(
      (s, d) => { VectorFunctions.register(s); SimilarityOps.knnClassify(Tables.embeddings(s, d)) },
      Some {
        import SimilarityOps.{KnnProbes, KnnK}
        s"""WITH p AS (SELECT vec_id AS probe_id, embedding AS probe_vec FROM embeddings
           |           WHERE vec_id % 2 = 1 AND vec_id < ${2 * KnnProbes}),
           |s AS (SELECT probe_id, vec_id, label, ${cosSql("probe_vec", "embedding")} AS score
           |      FROM embeddings CROSS JOIN p WHERE vec_id % 2 = 0),
           |r AS (SELECT probe_id, vec_id, label,
           |        row_number() OVER (PARTITION BY probe_id ORDER BY round(score, 6) DESC, vec_id) AS rnk
           |      FROM s),
           |v AS (SELECT probe_id, label, count(*) AS votes FROM r WHERE rnk <= $KnnK GROUP BY probe_id, label),
           |b AS (SELECT probe_id, label, votes,
           |        row_number() OVER (PARTITION BY probe_id ORDER BY votes DESC, label ASC) AS vr FROM v)
           |SELECT probe_id, label AS pred_label, votes FROM b WHERE vr = 1 ORDER BY probe_id""".stripMargin
      }),

    "ann_ivf" -> QueryDef(
      (s, d) => { VectorFunctions.register(s); SimilarityOps.annIvf(Tables.embeddings(s, d)) },
      Some(ivfOracleSqlAt(3))),

    // one distributed Lloyd iteration in-plan; the oracle recomputes
    // the per-dimension means (round 4, cast float) and re-assigns.
    // pos is 0-based in Spark and 1-based in DuckDB — it only keys the
    // grouping and the rebuild order, so the groups and values match.
    // persisted-model form: Lloyd training runs once per (dataset,
    // params, fingerprint); the warm path loads the K-row centroid
    // parquet and only scores (oracle hash unchanged — the model is
    // deterministic)
    "ann_ivf_kmeans" -> QueryDef(
      (s, d) => { VectorFunctions.register(s)
        SimilarityOps.annIvfKmeans(Tables.embeddings(s, d), d,
          centroidMod = 97, numCentroids = 16, nprobe = 3, nProbes = 10,
          k = 10, iterations = 1, moveEps = 0.0) },
      Some(kmeansOracleSql(1))),

    // persisted INVERTED LISTS: the corpus assignment lives on disk
    // partitioned by centroid_id and the probe scans only its nprobe
    // list partitions (partition pruning, pinned in PlanAuditSpec).
    // Same deterministic assignment rule as ann_ivf_kmeans -> same
    // result -> same oracle; the hash match proves index == inline.
    "ann_ivf_indexed" -> QueryDef(
      (s, d) => { VectorFunctions.register(s)
        SimilarityOps.annIvfIndexed(Tables.embeddings(s, d), d,
          centroidMod = 97, numCentroids = 16, nprobe = 3, nProbes = 10,
          k = 10, iterations = 1, moveEps = 0.0) },
      Some(kmeansOracleSql(1))),

    // steady-state IVF maintenance: the arriving (odd-id) batch is
    // assigned under the FROZEN corpus-trained centroid model and
    // APPENDED into the persisted inverted-list partitions — no
    // retraining, no corpus re-assignment, no list rewrite. The probe
    // searches the upserted layout; the oracle retrains + reassigns
    // everything from scratch, so the hash match is the
    // append-maintenance == full-rebuild proof (the vector-index
    // member of the incremental family: LSH band index, digest index,
    // centroid model, and now the IVF lists themselves).
    "ann_ivf_upsert" -> QueryDef(
      (s, d) => { VectorFunctions.register(s)
        SimilarityOps.annIvfUpsert(Tables.embeddings(s, d), d) },
      Some(ivfUpsertOracleSql)),

    // the index lifecycle's DELETE leg: tombstones appended next to
    // the lists (never a rewrite), subtracted from the probe by a
    // broadcast anti join, applied physically at the next compaction
    // (IndexMaintenanceSpec). The oracle searches (corpus ∪ batch)
    // minus the delete slice from scratch under the same frozen
    // model, so a leaked tombstone — returned neighbor that should
    // be dead, or a live one dropped — reds the hash.
    "ann_ivf_delete" -> QueryDef(
      (s, d) => { VectorFunctions.register(s)
        SimilarityOps.annIvfDelete(Tables.embeddings(s, d), d) },
      Some(ivfUpsertOracle(s"AND a.vec_id % ${SimilarityOps.IvfDeleteMod} != ${SimilarityOps.IvfDeleteRes}"))),

    // ANN quality eval: recall@10 of the IVF index vs brute-force
    // ground truth as a 1-row metric; the oracle recomputes BOTH
    // searches from scratch and intersects them, so the hash match
    // re-proves both search paths and the metric arithmetic at once
    "ann_recall_eval" -> QueryDef(
      (s, d) => { VectorFunctions.register(s)
        SimilarityOps.annRecallEval(Tables.embeddings(s, d), d) },
      Some(s"""WITH p AS (SELECT vec_id AS probe_id, embedding AS probe_vec FROM embeddings WHERE vec_id < 10),
              |s AS (SELECT probe_id, vec_id, ${cosSql("probe_vec", "embedding")} AS score
              |      FROM embeddings CROSS JOIN p WHERE vec_id <> probe_id),
              |r AS (SELECT probe_id, vec_id, score,
              |        row_number() OVER (PARTITION BY probe_id ORDER BY round(score, 6) DESC, vec_id) AS rnk
              |      FROM s),
              |${kmeansOracleCtes(1)},
              |ex AS (SELECT probe_id, vec_id FROM r WHERE rnk <= 10),
              |ap AS (SELECT probe_id, vec_id FROM r2 WHERE rnk <= 10),
              |m AS (SELECT count(*) AS hits FROM ex JOIN ap USING (probe_id, vec_id)),
              |t AS (SELECT count(*) AS total FROM ex)
              |SELECT hits::BIGINT AS hits, total::BIGINT AS total,
              |  ${TextAnalysisOps.det4Sql("hits::DOUBLE / total")} AS recall
              |FROM m, t""".stripMargin)),

    // bounded multi-round Lloyd: the oracle unrolls the same fixed
    // round count (moveEps = 0 → the early stop can't desync the two
    // engines' round counts)
    "ann_ivf_kmeans2" -> QueryDef(
      (s, d) => { VectorFunctions.register(s)
        SimilarityOps.annIvfKmeans(Tables.embeddings(s, d), d,
          centroidMod = 97, numCentroids = 16, nprobe = 3, nProbes = 10,
          k = 10, iterations = 2, moveEps = 0.0) },
      Some(kmeansOracleSql(2))),

    "doc_embedding_join" -> QueryDef(
      (s, d) => { VectorFunctions.register(s)
        SimilarityOps.docEmbeddingJoin(Tables.documents(s, d), Tables.embeddings(s, d)) },
      Some(s"""SELECT d.doc_id, d.lang, e.label, d.n_chars, round(${l2Sql("e.embedding")}, 4) AS emb_norm
              |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id ORDER BY d.doc_id""".stripMargin)),

    // per-lang mean embedding: metadata join + dimension-wise avg.
    // `+ 0` normalizes IEEE -0.0: DuckDB's round() keeps the sign of a
    // tiny negative mean (round(-3e-5, 4) = -0.0) while Spark's
    // BigDecimal-based round always yields +0.0; the values are equal
    // but hash differently. Same guard on the similarity `score`
    // columns above, which also straddle zero.
    "lang_mean_embedding" -> QueryDef(
      (s, d) => SimilarityOps.langMeanEmbedding(Tables.documents(s, d), Tables.embeddings(s, d)),
      Some("""WITH j AS (SELECT d.lang, e.embedding
             |          FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
             |x AS (SELECT lang, unnest(generate_series(1, len(embedding))) AS pos, embedding
             |      FROM j)
             |SELECT lang, CAST(pos AS BIGINT) AS pos, count(*) AS n,
             |  round(avg(embedding[pos]::DOUBLE), 4) + 0 AS mean_v
             |FROM x GROUP BY lang, pos ORDER BY lang, pos""".stripMargin)),

    "embedding_lsh_dup" -> QueryDef(
      (s, d) => { VectorFunctions.register(s); SimilarityOps.embeddingLshDup(Tables.embeddings(s, d)) },
      Some {
        val keyExprs = (0 until 8).map { t =>
          val bits = (0 until 8).map { b =>
            s"(CASE WHEN embedding[${t * 8 + b + 1}] > 0 THEN ${1 << b} ELSE 0 END)"
          }.mkString(" + ")
          s"'$t' || ':' || ($bits)::VARCHAR"
        }.mkString(", ")
        s"""WITH k AS (SELECT vec_id, unnest([$keyExprs]) AS bkey FROM embeddings),
           |cand AS (SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
           |         FROM k a JOIN k b ON a.bkey = b.bkey AND a.vec_id < b.vec_id),
           |sc AS (SELECT a_id, b_id, round(${cosSql("ea.embedding", "eb.embedding")}, 4) AS score
           |       FROM cand JOIN embeddings ea ON ea.vec_id = a_id JOIN embeddings eb ON eb.vec_id = b_id)
           |SELECT a_id, b_id, score FROM sc WHERE score >= 0.5 ORDER BY a_id, b_id""".stripMargin
      }),

    // int8 scalar-quantized ANN + exact rerank: the 4x-footprint scan
    // pass; oracle reproduces the quantize/dequantize double math and
    // the rerank pool from SimilarityOps.Sq8RerankM
    "ann_sq8" -> QueryDef(
      (s, d) => { VectorFunctions.register(s)
        SimilarityOps.annSq8(Tables.embeddings(s, d), d,
          nProbes = 10, k = 10, rerankM = SimilarityOps.Sq8RerankM) },
      Some(sq8OracleSql)),

    // recall@10 of the SQ8 quantized path vs brute force — the
    // quality number next to the correctness gate (the
    // ann_recall_eval discipline for the quantized family); the
    // oracle nests the full quantized-search SQL as the approx side
    "ann_sq8_recall_eval" -> QueryDef(
      (s, d) => { VectorFunctions.register(s)
        SimilarityOps.annSq8RecallEval(Tables.embeddings(s, d), d) },
      Some(annRecallOracle(sq8OracleSql))),

    // product quantization with asymmetric scoring: codes = per-
    // subspace argmin centroid, reconstruction scored then exact
    // rerank; every constant from SimilarityOps.Pq*
    "ann_pq" -> QueryDef(
      (s, d) => { VectorFunctions.register(s)
        SimilarityOps.annPq(Tables.embeddings(s, d), d,
          nProbes = 10, k = 10, rerankM = SimilarityOps.PqRerankM) },
      Some(pqOracleSql)),

    // recall@10 of the PQ path vs brute force — same discipline as
    // ann_sq8_recall_eval for the 64x-compressed codes
    "ann_pq_recall_eval" -> QueryDef(
      (s, d) => { VectorFunctions.register(s)
        SimilarityOps.annPqRecallEval(Tables.embeddings(s, d), d) },
      Some(annRecallOracle(pqOracleSql))),

    // PQ over the one-Lloyd-round TRAINED codebook: same probe path
    // (annPqFrom + native reconstruction), better model — the oracle
    // replays the training round then the identical search body
    "ann_pq_trained" -> QueryDef(
      (s, d) => { VectorFunctions.register(s)
        SimilarityOps.annPqTrained(Tables.embeddings(s, d), d,
          nProbes = 10, k = 10, rerankM = SimilarityOps.PqRerankM) },
      Some(pqTrainedOracleSql)),

    // recall@10 of the trained-codebook PQ path — the measured
    // improvement the training round buys over ann_pq_recall_eval
    "ann_pq_trained_recall_eval" -> QueryDef(
      (s, d) => { VectorFunctions.register(s)
        SimilarityOps.annPqTrainedRecallEval(Tables.embeddings(s, d), d) },
      Some(annRecallOracle(pqTrainedOracleSql))),

    // the composed billion-vector index: IVF routing prunes the scan
    // to nprobe lists, PQ codes shrink the candidate payload, exact
    // rerank on the top PqRerankM — both halves the separately-gated
    // machines, composed unchanged
    "ann_ivfpq" -> QueryDef(
      (s, d) => { VectorFunctions.register(s)
        SimilarityOps.annIvfPq(Tables.embeddings(s, d)) },
      Some(ivfPqOracleSql)),

    // recall@10 of IVF-PQ vs brute force — routing miss x
    // quantization blur together, next to the per-half recall rows
    // (r16: trained codebook + IvfPqRerankM raised this 0.47 -> 0.63,
    // against the 0.68 routing cap)
    "ann_ivfpq_recall_eval" -> QueryDef(
      (s, d) => { VectorFunctions.register(s)
        SimilarityOps.annIvfPqRecallEval(Tables.embeddings(s, d)) },
      Some(annRecallOracle(ivfPqOracleSql))),

    // IVFADC — the residual-encoded composed index (route, subtract
    // the list centroid, PQ-encode the residual, score against
    // c + decode(r)): the standard billion-scale layout, gated here
    // as a first-class path so its recall row can be A/B'd against
    // ann_ivfpq at identical knobs
    "ann_ivfadc" -> QueryDef(
      (s, d) => { VectorFunctions.register(s)
        SimilarityOps.annIvfAdc(Tables.embeddings(s, d)) },
      Some(ivfAdcOracleSql)),

    // the A/B row: on THIS corpus (unit-norm near-uniform embeddings,
    // mean best-centroid cosine 0.175) residuals are 1.28x the raw
    // norm, so IVFADC measures BELOW raw encoding (0.53 vs 0.63) —
    // the row pins the precondition a deployment would check per
    // corpus before picking the encoding
    "ann_ivfadc_recall_eval" -> QueryDef(
      (s, d) => { VectorFunctions.register(s)
        SimilarityOps.annIvfAdcRecallEval(Tables.embeddings(s, d)) },
      Some(annRecallOracle(ivfAdcOracleSql))),

    // the tuning curve for the knob a deployment actually turns:
    // recall@10 at nprobe in {1,2,4,8} for IVF-flat AND composed
    // IVF-PQ, one gated multi-row metric; each leg's oracle replays
    // its search from scratch at that probe width
    "ann_recall_nprobe_sweep" -> QueryDef(
      (s, d) => { VectorFunctions.register(s)
        SimilarityOps.annRecallNprobeSweep(Tables.embeddings(s, d)) },
      Some {
        val legs = for {
          np <- Seq(1, 2, 4, 8)
          (method, leg) <- Seq(
            "ivf" -> ivfOracleSqlAt(np),
            "ivfpq" -> ivfPqOracleSqlAt(np))
        } yield
          s"""SELECT '$method' AS method, CAST($np AS BIGINT) AS nprobe,
             |  q.hits, q.total, q.recall
             |FROM (
             |${annRecallOracle(leg)}
             |) q""".stripMargin
        legs.mkString("", "\nUNION ALL\n", "\nORDER BY method, nprobe")
      }),

    // the SEVENTH index family: NSW-style graph ANN — persisted k-NN
    // adjacency (two overlapping seed-partitionings x top-G within
    // cluster, symmetrized) probed by a bounded best-first beam walk
    // with exact scoring; probe cost is O(beam*G*rounds) rows per
    // probe at ANY corpus size
    "ann_nsw" -> QueryDef(
      (s, d) => { VectorFunctions.register(s)
        SimilarityOps.annNsw(Tables.embeddings(s, d)) },
      Some(nswOracleSql)),

    // the persisted adjacency probed by the same walk — shares the
    // inline oracle verbatim (index == inline proof)
    "ann_nsw_indexed" -> QueryDef(
      (s, d) => { VectorFunctions.register(s)
        SimilarityOps.annNswIndexed(Tables.embeddings(s, d), d) },
      Some(nswOracleSql)),

    // recall@10 of the graph walk vs brute force: 0.81 at sf0.01 —
    // the best of the seven families, because the walk scores ~300
    // candidates EXACTLY (no routing cliff, no quantization blur)
    "ann_nsw_recall_eval" -> QueryDef(
      (s, d) => { VectorFunctions.register(s)
        SimilarityOps.annNswRecallEval(Tables.embeddings(s, d)) },
      Some(annRecallOracle(nswOracleSql))),

    // steady-state graph maintenance: the odd-id batch routes under
    // the frozen even-seeded partitionings and links to its top-G
    // CORPUS cluster members (append-only, no batch-batch links —
    // the documented contract); the oracle rebuilds that contract
    // from scratch, so the gate pins append == defined rebuild
    "ann_nsw_upsert" -> QueryDef(
      (s, d) => { VectorFunctions.register(s)
        SimilarityOps.annNswUpsert(Tables.embeddings(s, d), d) },
      Some(nswUpsertOracleSql(""))),

    // DELETE leg: the shared tombstone slice subtracted from the
    // SEARCHABLE vertex set — a dead vertex is neither returned nor
    // traversed (it cannot relay a walk); adjacency on disk untouched
    "ann_nsw_delete" -> QueryDef(
      (s, d) => { VectorFunctions.register(s)
        SimilarityOps.annNswDelete(Tables.embeddings(s, d), d) },
      Some(nswUpsertOracleSql(
        s"WHERE NOT (vec_id % ${SimilarityOps.IvfDeleteMod} = ${SimilarityOps.IvfDeleteRes})"))),

    // the streamed front door: arriving vectors link into the
    // adjacency per micro-batch (>= 2 real checkpointed batches);
    // batch edges are a pure function of (row, frozen corpus), so
    // stream == batch == defined rebuild through one oracle
    "streamed_nsw_upsert" -> QueryDef(
      (s, d) => { VectorFunctions.register(s)
        val edges = graft.streaming.EventStreams.streamedNswLayout(s, d)
        SimilarityOps.annNswOverEdges(Tables.embeddings(s, d),
          Tables.embeddings(s, d), s.read.parquet(edges)) },
      Some(nswUpsertOracleSql(""))),

    // the persisted form: coded lists on disk partitioned by
    // centroid (PqM ints per vector — what a real index keeps hot),
    // probe scans only its nprobe partitions and decodes stored
    // codes; decode == fused-encode bit-equality makes the inline
    // oracle shared verbatim (index == inline proof)
    "ann_ivfpq_indexed" -> QueryDef(
      (s, d) => { VectorFunctions.register(s)
        SimilarityOps.annIvfPqIndexed(Tables.embeddings(s, d), d) },
      Some(ivfPqOracleSql)),

    // steady-state coded-list maintenance: the odd-id batch encoded
    // AND routed under both corpus-frozen models (trained codebook +
    // trained centroids), appended in place; the oracle retrains both
    // from the corpus slice and rebuilds everything from scratch —
    // append == rebuild for the composed index
    "ann_ivfpq_upsert" -> QueryDef(
      (s, d) => { VectorFunctions.register(s)
        SimilarityOps.annIvfPqUpsert(Tables.embeddings(s, d), d) },
      Some(ivfPqUpsertOracle(""))),

    // the coded lifecycle's DELETE leg: id-only tombstone log
    // subtracted before decode, physical removal deferred to the
    // layout-agnostic compaction; oracle = rebuild minus the slice
    "ann_ivfpq_delete" -> QueryDef(
      (s, d) => { VectorFunctions.register(s)
        SimilarityOps.annIvfPqDelete(Tables.embeddings(s, d), d) },
      Some(ivfPqUpsertOracle(
        s"AND a.vec_id % ${SimilarityOps.IvfDeleteMod} != ${SimilarityOps.IvfDeleteRes}"))),

    // the streamed front door of the coded index: arriving vectors
    // fold into the list partitions per micro-batch (a REAL
    // checkpointed AvailableNow run, >= 2 batches); probe of the
    // stream-maintained layout shares the batch upsert's rebuild
    // oracle — stream == batch == rebuild through one hash
    "streamed_ivfpq_upsert" -> QueryDef(
      (s, d) => { VectorFunctions.register(s)
        val lists = s.read.parquet(
          graft.streaming.EventStreams.streamedIvfPqLayout(s, d))
        SimilarityOps.annIvfPqOverLists(Tables.embeddings(s, d), d, lists) },
      Some(ivfPqUpsertOracle(""))),

    // SemDeDup: within-cluster cosine pairs (the O(n²/K) candidate
    // generation; threshold + cluster cap from SimilarityOps
    // constants, cap inert at tested SFs)
    "semantic_pairs" -> QueryDef(
      (s, d) => { VectorFunctions.register(s); SimilarityOps.semanticPairs(Tables.embeddings(s, d)) },
      Some(s"""$semanticOracleBody
             |SELECT a_id, b_id, score FROM pairs ORDER BY a_id, b_id""".stripMargin)),

    // the semantic-dedup labeling: transitive closure of the pair
    // graph (recursive-CTE oracle, the dup_components pattern) +
    // survivor flag; downstream filter is WHERE is_survivor = 1
    "semantic_dedup" -> QueryDef(
      (s, d) => { VectorFunctions.register(s); SimilarityOps.semanticDedup(Tables.embeddings(s, d)) },
      Some(s"""$semanticOracleBody
             |SELECT a.vec_id, a.centroid_id,
             |  coalesce(cm.component, a.vec_id) AS component,
             |  CAST(coalesce(cm.component, a.vec_id) = a.vec_id AS BIGINT) AS is_survivor
             |FROM assign a LEFT JOIN comp cm ON cm.node = a.vec_id
             |ORDER BY a.vec_id""".stripMargin)),

    // steady-state SemDeDup: the arriving (odd-id) batch probes the
    // PERSISTED corpus centroid model — the corpus is never
    // re-clustered or self-joined. The oracle recomputes the model
    // from scratch (corpus-derived params, corpus-seeded centroids,
    // full assignment, combined-population cap) and restricts to
    // pairs with >= 1 batch endpoint.
    "incremental_semantic_dedup" -> QueryDef(
      (s, d) => { VectorFunctions.register(s); SimilarityOps.incrementalSemanticDedup(Tables.embeddings(s, d), d) },
      Some(s"""$incrementalSemanticOracleBody
             |SELECT a_id, b_id, score FROM pairs ORDER BY a_id, b_id""".stripMargin)),

    // the semantic family's DELETE leg, completing the take-down
    // vocabulary across all five index families: tombstoned corpus
    // labels are anti-joined out of the probe, cluster counts were
    // advanced eagerly (the cap sees the LIVE population — a vacated
    // cluster reopens immediately), and the frozen centroid model is
    // untouched. Oracle: same frozen model, assignment rows minus
    // the deleted slice, pairs with >= 1 batch endpoint
    "semantic_after_delete" -> QueryDef(
      (s, d) => { VectorFunctions.register(s); SimilarityOps.semanticAfterDelete(Tables.embeddings(s, d), d) },
      Some {
        import graft.operators.{SimilarityOps => S}
        s"""${incrementalSemanticOracle(
            s" AND NOT (vec_id % 2 = 0 AND vec_id % ${S.SemDeleteMod} = ${S.SemDeleteRes})")}
           |SELECT a_id, b_id, score FROM pairs ORDER BY a_id, b_id""".stripMargin
      }),

    // the STREAMING semantic-dedup path under the hash gate: the
    // pairs were landed by a real checkpointed micro-batch run
    // (availableNow foreachBatch probing the persisted centroid
    // model); the oracle recomputes the model and the batch-endpoint
    // restriction from the ORIGINAL embeddings table, so a lost or
    // duplicated micro-batch — or a drifted centroid model — reds
    // the row. Embedding-family sibling of streamed_ingest_pairs.
    "streamed_vector_pairs" -> QueryDef(
      (s, d) => { VectorFunctions.register(s)
        val dir = graft.streaming.EventStreams.streamedSemanticLayout(s, d)
        s.read.parquet(dir)
          .select("a_id", "b_id", "score")
          .orderBy("a_id", "b_id") },
      Some(s"""$incrementalSemanticOracleBody
             |SELECT a_id, b_id, score FROM pairs ORDER BY a_id, b_id""".stripMargin)),

    // ----- relational (the surface the reference lacks, SURVEY §2.2) ---
    "q1_pricing" -> QueryDef(
      (s, d) => RelationalOps.q1Pricing(Tables.lineitem(s, d)),
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
             |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(15,2))), 2) AS DOUBLE) AS sum_base_price,
             |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(15,2)) *
             |    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_disc_price,
             |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(15,2)) *
             |    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) *
             |    (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_charge,
             |  round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*), 4) AS avg_qty,
             |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) / count(*), 4) AS avg_price,
             |  round(CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*), 4) AS avg_disc,
             |  count(*) AS count_order
             |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
             |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    "q3_shipping" -> QueryDef(
      (s, d) => RelationalOps.q3Shipping(Tables.customer(s, d), Tables.orders(s, d), Tables.lineitem(s, d)),
      Some(s"""SELECT o_orderkey, o_orderdate, ${RelationalOps.RevenueExactSql} AS revenue
             |FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
             |  AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
             |GROUP BY o_orderkey, o_orderdate ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin)),

    "q5_region" -> QueryDef(
      (s, d) => RelationalOps.q5Region(Tables.region(s, d), Tables.nation(s, d),
        Tables.customer(s, d), Tables.orders(s, d), Tables.lineitem(s, d)),
      Some(s"""SELECT n_name, ${RelationalOps.RevenueExactSql} AS revenue, count(*) AS n_lineitems
             |FROM region JOIN nation ON n_regionkey = r_regionkey
             |  JOIN customer ON c_nationkey = n_nationkey
             |  JOIN orders ON o_custkey = c_custkey
             |  JOIN lineitem ON l_orderkey = o_orderkey
             |WHERE r_name = 'ASIA'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // TPC-H Q10 shape: returned-item revenue per customer, filter
    // pushed to the lineitem scan, nation broadcast, top-20 heap
    "q10_returns" -> QueryDef(
      (s, d) => RelationalOps.q10Returns(Tables.customer(s, d), Tables.orders(s, d),
        Tables.lineitem(s, d), Tables.nation(s, d)),
      Some(s"""SELECT c_custkey, c_name, n_name,
             |  ${RelationalOps.RevenueExactSql} AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN nation ON c_nationkey = n_nationkey
             |WHERE l_returnflag = 'R'
             |GROUP BY 1, 2, 3 ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)),

    "orders_window" -> QueryDef(
      (s, d) => RelationalOps.ordersWindow(Tables.orders(s, d)),
      Some("""WITH r AS (SELECT o_custkey, o_orderkey, o_totalprice,
             |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
             |  lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS prev_price
             |FROM orders)
             |SELECT o_custkey, CAST(rn AS BIGINT) AS rn, o_orderkey, o_totalprice, prev_price
             |FROM r WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin)),

    "orders_ntile" -> QueryDef(
      (s, d) => RelationalOps.ordersNtile(Tables.orders(s, d)),
      Some("""WITH t AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, o_totalprice,
             |  CAST(ntile(4) OVER (PARTITION BY year(o_orderdate)
             |    ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS quartile
             |FROM orders)
             |SELECT yr, quartile, count(*) AS n_orders,
             |  round(min(o_totalprice), 2) AS min_price,
             |  round(max(o_totalprice), 2) AS max_price,
             |  round(avg(o_totalprice), 4) AS avg_price
             |FROM t GROUP BY yr, quartile ORDER BY yr, quartile""".stripMargin)),

    // scale-safe ntile companion: deterministic 5% hash-sample, exact
    // quartile bounds on the sample, broadcast bounds, row-local
    // banding — no per-year total sort (the exact-ntile 100 TB wall)
    "orders_ntile_banded" -> QueryDef(
      (s, d) => RelationalOps.ordersNtileBanded(Tables.orders(s, d)),
      Some(s"""WITH base AS (SELECT o_orderkey, o_totalprice,
             |          CAST(year(o_orderdate) AS BIGINT) AS yr FROM orders),
             |s AS (SELECT yr, o_totalprice FROM base
             |      WHERE ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 15))::UBIGINT % 100 < ${RelationalOps.NtileBandSamplePct}),
             |b AS (SELECT yr, round(quantile_cont(o_totalprice, 0.25), 4) AS b1,
             |             round(quantile_cont(o_totalprice, 0.50), 4) AS b2,
             |             round(quantile_cont(o_totalprice, 0.75), 4) AS b3
             |      FROM s GROUP BY yr),
             |t AS (SELECT base.yr, o_totalprice,
             |        CASE WHEN o_totalprice < b1 THEN 1
             |             WHEN o_totalprice < b2 THEN 2
             |             WHEN o_totalprice < b3 THEN 3 ELSE 4 END AS band
             |      FROM base LEFT JOIN b ON base.yr = b.yr)
             |SELECT yr, CAST(band AS BIGINT) AS band, count(*) AS n_orders,
             |  round(min(o_totalprice), 2) AS min_price,
             |  round(max(o_totalprice), 2) AS max_price,
             |  round(avg(o_totalprice), 4) AS avg_price
             |FROM t GROUP BY yr, band ORDER BY yr, band""".stripMargin)),

    // constant-width histogram: row-local bucketing, one bounded agg
    "price_histogram" -> QueryDef(
      (s, d) => RelationalOps.priceHistogram(Tables.orders(s, d)),
      Some(s"""SELECT CAST(least(floor(o_totalprice / ${RelationalOps.HistogramWidth}), ${RelationalOps.HistogramMaxBucket}) AS BIGINT) AS bucket,
             |  count(*) AS n_orders,
             |  round(min(o_totalprice), 2) AS min_price,
             |  round(max(o_totalprice), 2) AS max_price
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // one-pass co-moment aggregates (corr / covar / stddev) per flag
    "lineitem_stats" -> QueryDef(
      (s, d) => RelationalOps.lineitemStats(Tables.lineitem(s, d)),
      Some("""SELECT l_returnflag, count(*) AS n,
             |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
             |  round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
             |  round(stddev_samp(l_quantity), 4) AS stddev_qty
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // histogram-sketch quantiles: constant-size mergeable buffer; the
    // oracle reproduces the identical bin + interpolation arithmetic
    // from the shared grid constants
    "lineitem_hist_quantiles" -> QueryDef(
      (s, d) => RelationalOps.lineitemHistQuantiles(Tables.lineitem(s, d)),
      Some {
        val lo = RelationalOps.HistQLo
        val hi = RelationalOps.HistQHi
        val bins = RelationalOps.HistQBins
        val w = (hi - lo) / bins
        s"""WITH b AS (SELECT l_returnflag,
           |    CASE WHEN l_extendedprice < $lo THEN 0
           |         WHEN l_extendedprice >= $hi THEN ${bins + 1}
           |         ELSE 1 + CAST(floor((l_extendedprice - $lo) / $w) AS INT) END AS bin,
           |    count(*) AS cnt
           |  FROM lineitem GROUP BY 1, 2),
           |c AS (SELECT l_returnflag, bin, cnt,
           |    sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY bin) AS cum,
           |    sum(cnt) OVER (PARTITION BY l_returnflag) AS n
           |  FROM b),
           |pp AS (SELECT l_returnflag, unnest([0.5, 0.9, 0.99]) AS p
           |       FROM (SELECT DISTINCT l_returnflag FROM b)),
           |hit AS (SELECT pp.l_returnflag, pp.p, min(c.bin) AS bin
           |        FROM pp JOIN c ON pp.l_returnflag = c.l_returnflag AND c.cum >= pp.p * c.n
           |        GROUP BY 1, 2),
           |est AS (SELECT h.l_returnflag, h.p,
           |    CASE WHEN h.bin = 0 THEN $lo
           |         WHEN h.bin = ${bins + 1} THEN $hi
           |         ELSE $lo + CAST(h.bin - 1 AS DOUBLE) * $w
           |              + $w * ((h.p * c.n - (c.cum - c.cnt)) / c.cnt) END AS v
           |  FROM hit h JOIN c ON h.l_returnflag = c.l_returnflag AND h.bin = c.bin)
           |SELECT l_returnflag,
           |  round(max(CASE WHEN p = 0.5 THEN v END), 4) AS p50,
           |  round(max(CASE WHEN p = 0.9 THEN v END), 4) AS p90,
           |  round(max(CASE WHEN p = 0.99 THEN v END), 4) AS p99
           |FROM est GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
      }),

    "lineitem_rollup" -> QueryDef(
      (s, d) => RelationalOps.lineitemRollup(Tables.lineitem(s, d)),
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS returnflag, coalesce(l_linestatus, 'ALL') AS linestatus,
             |  count(*) AS n, CAST(round(sum(CAST(l_quantity AS DECIMAL(15,2))), 2) AS DOUBLE) AS sum_qty
             |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
             |ORDER BY returnflag, linestatus""".stripMargin)),

    "set_ops" -> QueryDef(
      (s, d) => RelationalOps.setOps(Tables.customer(s, d), Tables.orders(s, d)),
      Some("""(SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
             | INTERSECT SELECT o_custkey FROM orders)
             |EXCEPT SELECT o_custkey FROM orders WHERE o_totalprice > 400000
             |ORDER BY custkey""".stripMargin)),

    // bag semantics: multiplicities survive INTERSECT/EXCEPT ALL
    "set_ops_all" -> QueryDef(
      (s, d) => RelationalOps.setOpsAll(Tables.orders(s, d)),
      Some("""WITH b AS (
             |  (SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
             |   INTERSECT ALL
             |   SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
             |  EXCEPT ALL
             |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
             |SELECT custkey, count(*) AS n FROM b
             |GROUP BY custkey ORDER BY custkey""".stripMargin)),

    "join_semi" -> QueryDef(
      (s, d) => RelationalOps.joinSemi(Tables.customer(s, d), Tables.orders(s, d)),
      Some("""SELECT c_custkey, c_name FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
             |ORDER BY c_custkey""".stripMargin)),

    "join_anti" -> QueryDef(
      (s, d) => RelationalOps.joinAnti(Tables.customer(s, d), Tables.orders(s, d)),
      Some("""SELECT c_custkey, c_acctbal FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
             |ORDER BY c_custkey""".stripMargin)),

    "join_left_outer" -> QueryDef(
      (s, d) => RelationalOps.custOrdersLeftOuter(Tables.customer(s, d), Tables.orders(s, d)),
      Some("""WITH po AS (SELECT o_custkey, count(*) AS n_orders, CAST(round(sum(CAST(o_totalprice AS DECIMAL(15,2))), 2) AS DOUBLE) AS total_spend
             |            FROM orders GROUP BY o_custkey)
             |SELECT c_custkey, c_mktsegment,
             |  coalesce(n_orders, 0) AS n_orders,
             |  coalesce(total_spend, 0.0) AS total_spend
             |FROM customer LEFT JOIN po ON c_custkey = o_custkey
             |ORDER BY c_custkey""".stripMargin)),

    "join_full_outer" -> QueryDef(
      (s, d) => RelationalOps.nationAccountsFullOuter(Tables.customer(s, d), Tables.supplier(s, d)),
      Some("""WITH c AS (SELECT c_nationkey AS nationkey, count(*) AS n_customers FROM customer GROUP BY 1),
             |     s AS (SELECT s_nationkey AS nationkey, count(*) AS n_suppliers FROM supplier GROUP BY 1)
             |SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
             |  coalesce(n_customers, 0) AS n_customers,
             |  coalesce(n_suppliers, 0) AS n_suppliers
             |FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
             |ORDER BY nationkey""".stripMargin)),

    // bucketed co-location under the correctness gate: both fact
    // tables are written bucketed+sorted by the order key, the join
    // reads bucket files pairwise with NO shuffle exchange (asserted
    // by BucketingSpec), and the aggregate runs on top — the way a
    // 100 TB fact-fact join is amortized across a query workload
    "bucketed_join_agg" -> QueryDef(
      (s, d) => graft.sources.Bucketing.bucketedJoinAgg(s, d),
      Some(s"""SELECT o_orderpriority,
             |  ${RelationalOps.RevenueExactSql} AS revenue,
             |  count(*) AS n_lines
             |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // date-partitioned layout + partition-pruned read: the day range
    // resolves against directory names at plan time (7 of 30
    // partitions opened — pinned by PlanAuditSpec); the oracle runs
    // the same range over the flat parquet, proving the partitioned
    // copy loses nothing
    "events_partition_pruned" -> QueryDef(
      (s, d) => graft.sources.Partitioning.eventsPartitionPruned(s, d),
      Some(s"""WITH e AS (SELECT strftime(CAST(date_trunc('day', ts) AS TIMESTAMP), '%Y-%m-%d') AS day,
             |    event_type, value FROM events)
             |SELECT day, event_type, count(*) AS n,
             |  round(sum(value), 4) AS sum_value
             |FROM e
             |WHERE day >= '${graft.sources.Partitioning.PruneDayFrom}'
             |  AND day <= '${graft.sources.Partitioning.PruneDayTo}'
             |GROUP BY day, event_type ORDER BY day, event_type""".stripMargin)),

    // the streaming path under the hash gate (round 10): day counts
    // read back from the write-once availableNow streamed partitioned
    // layout; the oracle computes from the ORIGINAL events table, so
    // a lost/duplicated micro-batch or a broken sink manifest reds
    // the row
    "streamed_day_counts" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.functions.{count, lit, round, sum}
        val dir = graft.streaming.EventStreams.streamedEventsLayout(s, d)
        val schema = Tables.events(s, d).schema
          .add("day", org.apache.spark.sql.types.StringType)
        s.read.schema(schema).parquet(dir)
          .groupBy("day")
          .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
          .orderBy("day")
      },
      Some("""WITH e AS (SELECT strftime(CAST(date_trunc('day', ts) AS TIMESTAMP), '%Y-%m-%d') AS day,
             |    value FROM events)
             |SELECT day, count(*) AS n, round(sum(value), 4) AS sum_value
             |FROM e GROUP BY day ORDER BY day""".stripMargin)),

    // WATERMARK semantics under the hash gate: the layout was landed
    // by two checkpointed availableNow runs (on-time bulk, then a
    // straggler slice resuming from the same checkpoint), so append-
    // mode window finalization, late-row dropping at the CHECKPOINTED
    // watermark, and watermark persistence across restart are all
    // facts the oracle recomputes from the original events table —
    // see EventStreams.streamedWatermarkLayout for the exact function
    "streamed_watermark_counts" -> QueryDef(
      (s, d) => {
        val dir = graft.streaming.EventStreams.streamedWatermarkLayout(s, d)
        s.read.parquet(dir)
          .select("hour", "event_type", "n")
          .orderBy("hour", "event_type")
      },
      Some(s"""WITH e AS (SELECT event_id, epoch_ms(ts) AS ms, event_type FROM events),
             |wm1 AS (SELECT max(ms) - $wmDelayMs AS w FROM e WHERE event_id % 5 != 0),
             |wm2 AS (SELECT max(ms) - $wmDelayMs AS w FROM e),
             |contrib AS (
             |  SELECT ms, event_type FROM e WHERE event_id % 5 != 0
             |  UNION ALL
             |  SELECT ms, event_type FROM e
             |  WHERE event_id % 5 = 0
             |    AND ms - ms % 3600000 + 3600000 > (SELECT w FROM wm1)),
             |agg AS (SELECT ms - ms % 3600000 AS hs, event_type, count(*) AS n
             |        FROM contrib GROUP BY 1, 2)
             |SELECT make_timestamp(hs * 1000) AS hour, event_type, CAST(n AS BIGINT) AS n
             |FROM agg WHERE hs + 3600000 <= (SELECT w FROM wm2)
             |ORDER BY hour, event_type""".stripMargin)),

    // EXACTLY-ONCE dedup under the hash gate: the layout was landed
    // by a two-phase replay whose second phase deliberately RE-SENDS
    // already-delivered rows (at-least-once upstream) — a re-send can
    // only land if dedup state was lost across the restart, a
    // straggler only if the late filter failed; the oracle recomputes
    // the keep rule (phase-1 rows + on-time first deliveries) from
    // the original events table. StreamingDedupSpec pins the corner
    // where only the late filter stands between an expired-state
    // re-send and a double delivery.
    "streamed_dedup_events" -> QueryDef(
      (s, d) => {
        val dir = graft.streaming.EventStreams.streamedDedupLayout(s, d)
        s.read.parquet(dir)
          .select("event_id", "ms")
          .orderBy("event_id")
      },
      Some(s"""WITH e AS (SELECT event_id, epoch_ms(ts) AS ms FROM events),
             |wm1 AS (SELECT max(ms) - $wmDelayMs AS w FROM e WHERE event_id % 5 != 0)
             |SELECT event_id, ms FROM e WHERE event_id % 5 != 0
             |UNION ALL
             |SELECT event_id, ms FROM e
             |WHERE event_id % 5 = 0 AND ms > (SELECT w FROM wm1)
             |ORDER BY event_id""".stripMargin)),

    // STREAM-STREAM JOIN under the hash gate: the watermarked
    // interval join replayed across a two-phase restart — the sink
    // is all predicate pairs minus those touching a late phase-2 row
    // (below WM1 = least of the two sides' column watermarks); a
    // pair lost across the restart or a late row that joined anyway
    // reds the hash
    "streamed_join_pairs" -> QueryDef(
      (s, d) => {
        val dir = graft.streaming.EventStreams.streamedJoinLayout(s, d)
        s.read.parquet(dir)
          .select("purchase_id", "user_id", "p_ms", "click_id", "c_ms")
          .orderBy("purchase_id", "click_id")
      },
      Some {
        import graft.streaming.EventStreams.{JoinIntervalMinutes, JoinWatermarkMs, JoinPurchaseMod}
        val intMs = JoinIntervalMinutes * 60000L
        s"""WITH e AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms FROM events),
           |p AS (SELECT event_id AS purchase_id, user_id, ms FROM e
           |      WHERE event_type = 'purchase' AND event_id % $JoinPurchaseMod = 1),
           |c AS (SELECT event_id AS click_id, user_id, ms FROM e WHERE event_type = 'click'),
           |wm1 AS (SELECT least(
           |    (SELECT max(ms) FROM p WHERE purchase_id % 5 != 0),
           |    (SELECT max(ms) FROM c WHERE click_id % 5 != 0)) - $JoinWatermarkMs AS w)
           |SELECT p.purchase_id, p.user_id, p.ms AS p_ms, c.click_id, c.ms AS c_ms
           |FROM p JOIN c ON p.user_id = c.user_id
           |  AND c.ms BETWEEN p.ms - $intMs AND p.ms
           |WHERE NOT (p.purchase_id % 5 = 0 AND p.ms < (SELECT w FROM wm1))
           |  AND NOT (c.click_id % 5 = 0 AND c.ms < (SELECT w FROM wm1))
           |ORDER BY purchase_id, click_id""".stripMargin
      }),

    // LEFT-OUTER stream-stream join under the hash gate: matched
    // rows = the inner set; a null-padded row lands iff its admitted
    // purchase found no non-late click AND its match window closed
    // under the final watermark (p_ms < WM2) — state eviction as an
    // oracle-checkable fact. Open purchases (p_ms >= WM2) are absent
    "streamed_join_unmatched" -> QueryDef(
      (s, d) => {
        val dir = graft.streaming.EventStreams.streamedOuterJoinLayout(s, d)
        s.read.parquet(dir)
          .select("purchase_id", "user_id", "p_ms", "click_id", "c_ms")
          .orderBy(col("purchase_id"), col("click_id").asc_nulls_first)
      },
      Some {
        import graft.streaming.EventStreams.{JoinIntervalMinutes, JoinWatermarkMs, JoinPurchaseMod}
        val intMs = JoinIntervalMinutes * 60000L
        s"""WITH e AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms FROM events),
           |p AS (SELECT event_id AS purchase_id, user_id, ms FROM e
           |      WHERE event_type = 'purchase' AND event_id % $JoinPurchaseMod = 1),
           |c AS (SELECT event_id AS click_id, user_id, ms FROM e WHERE event_type = 'click'),
           |wm1 AS (SELECT least(
           |    (SELECT max(ms) FROM p WHERE purchase_id % 5 != 0),
           |    (SELECT max(ms) FROM c WHERE click_id % 5 != 0)) - $JoinWatermarkMs AS w),
           |wm2 AS (SELECT least((SELECT max(ms) FROM p), (SELECT max(ms) FROM c))
           |          - $JoinWatermarkMs AS w),
           |adm AS (SELECT * FROM p
           |        WHERE NOT (purchase_id % 5 = 0 AND ms < (SELECT w FROM wm1))),
           |m AS (SELECT adm.purchase_id, adm.user_id, adm.ms AS p_ms, c.click_id, c.ms AS c_ms
           |      FROM adm JOIN c ON adm.user_id = c.user_id
           |        AND c.ms BETWEEN adm.ms - $intMs AND adm.ms
           |      WHERE NOT (c.click_id % 5 = 0 AND c.ms < (SELECT w FROM wm1)))
           |SELECT purchase_id, user_id, p_ms, click_id, c_ms FROM m
           |UNION ALL
           |SELECT adm.purchase_id, adm.user_id, adm.ms, NULL, NULL FROM adm
           |WHERE adm.ms < (SELECT w FROM wm2)
           |  AND NOT EXISTS (SELECT 1 FROM m WHERE m.purchase_id = adm.purchase_id)
           |ORDER BY purchase_id, click_id NULLS FIRST""".stripMargin
      }),

    // KEYED STATE under the hash gate: flatMapGroupsWithState
    // sessionization with event-time timeouts, landed by the same
    // two-phase replay — the sink holds exactly the sessions closed
    // by an observed gap or by the watermark timeout, and the oracle
    // recomputes that set from the original events table (phase-1
    // islands, both timeout cuts at WM1/WM2, and the junction
    // merge/break of surviving phase-2 rows into each user's open
    // tail). A lost state row, a timeout that failed to fire, a late
    // row reaching the state machine, or an open session leaking into
    // the sink all red the hash. Boundary rules pinned in
    // StreamingSessionSpec: both the late filter and the timeout
    // comparison are `<=`.
    "streamed_sessions" -> QueryDef(
      (s, d) => {
        val dir = graft.streaming.EventStreams.streamedSessionLayout(s, d)
        s.read.parquet(dir)
          .select("user_id", "session_start_ms", "n_events", "span_ms")
          .orderBy("user_id", "session_start_ms")
      },
      Some(streamedSessionsOracle)),

    // the SAME session state machine on Spark 4's transformWithState
    // (StatefulProcessor + named ValueState + explicit event-time
    // timers, RocksDB store) — gated by the SAME oracle text as
    // streamed_sessions: two stateful-operator generations, one
    // pinned semantics
    "streamed_sessions_tws" -> QueryDef(
      (s, d) => {
        val dir = graft.streaming.EventStreams.streamedSessionTwsLayout(s, d)
        s.read.parquet(dir)
          .select("user_id", "session_start_ms", "n_events", "span_ms")
          .orderBy("user_id", "session_start_ms")
      },
      Some(streamedSessionsOracle)),

    // dynamic partition pruning: the day set comes from a runtime
    // dim aggregate (days with a high-value purchase), so the fact
    // scan prunes via a dynamicpruning subquery instead of a literal
    // range (mechanism pinned in RuntimeFilterSpec)
    "events_dpp_join" -> QueryDef(
      (s, d) => graft.sources.Partitioning.eventsDppJoin(s, d),
      Some(s"""WITH e AS (SELECT strftime(CAST(date_trunc('day', ts) AS TIMESTAMP), '%Y-%m-%d') AS day,
             |    event_type, value FROM events),
             |hot AS (SELECT DISTINCT day FROM e
             |        WHERE event_type = 'purchase' AND value > ${graft.sources.Partitioning.DppHotValue})
             |SELECT day, count(*) AS n, round(sum(value), 4) AS sum_value
             |FROM e JOIN hot USING (day)
             |GROUP BY day ORDER BY day""".stripMargin)),

    "part_topk" -> QueryDef(
      (s, d) => RelationalOps.partTopk(Tables.part(s, d)),
      Some("""WITH r AS (SELECT p_brand, p_partkey, p_retailprice,
             |  row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS brand_rank
             |FROM part)
             |SELECT p_brand, CAST(brand_rank AS BIGINT) AS brand_rank, p_partkey, p_retailprice
             |FROM r WHERE brand_rank <= 3 ORDER BY p_brand, brand_rank""".stripMargin)),

    "lineitem_quantiles" -> QueryDef(
      (s, d) => RelationalOps.lineitemQuantiles(Tables.lineitem(s, d)),
      Some("""SELECT l_returnflag,
             |  round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
             |  round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
             |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price,
             |  count(*) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // exercises the SQL layer (views + parser + scalar subquery)
    // inside the driver's correctness gate
    "sql_orders_above_avg" -> QueryDef(
      (s, d) => {
        Catalog.registerViews(s, d)
        s.sql("""SELECT o_orderkey, o_custkey, o_totalprice
                |FROM orders
                |WHERE o_totalprice > (SELECT 1.5 * avg(o_totalprice) FROM orders)
                |ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
             |FROM orders
             |WHERE o_totalprice > (SELECT 1.5 * avg(o_totalprice) FROM orders)
             |ORDER BY o_orderkey""".stripMargin)),

    // pushdown probe: all three predicates must reach the parquet scan
    "q6_forecast" -> QueryDef(
      (s, d) => RelationalOps.q6Forecast(Tables.lineitem(s, d)),
      Some("""SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(15,2)) * CAST(l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue, count(*) AS n_lines
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
             |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
             |  AND l_discount BETWEEN 0.05 AND 0.07
             |  AND l_quantity < 24""".stripMargin)),

    "orders_pivot" -> QueryDef(
      (s, d) => RelationalOps.ordersPivot(Tables.orders(s, d)),
      Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
             |  count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
             |  count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
             |  count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // the inverse surface: unpivot/melt back to long form — a
    // row-local Expand over the |years|-row rollup (DuckDB runs its
    // native UNPIVOT over the identical pivot CTE)
    "orders_unpivot" -> QueryDef(
      (s, d) => RelationalOps.ordersUnpivot(Tables.orders(s, d)),
      Some("""WITH p AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
             |  count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
             |  count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
             |  count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
             |FROM orders GROUP BY 1)
             |SELECT yr, status, n_orders
             |FROM (UNPIVOT p ON "F", "O", "P" INTO NAME status VALUE n_orders)
             |ORDER BY yr, status""".stripMargin)),

    // correlated LATERAL subquery with ORDER BY + LIMIT through the
    // SQL layer: per-nation top-2 customers by balance. Catalyst
    // decorrelates the limited subquery into a rank window over the
    // customer side (no per-nation re-scan); DuckDB executes the
    // identical text natively — the hash match proves the
    // decorrelation preserves LATERAL semantics
    "sql_lateral_topn" -> QueryDef(
      (s, d) => {
        Catalog.registerViews(s, d)
        s.sql(lateralTopNSql)
      },
      Some(lateralTopNSql)),

    // RANGE-frame window: value-based frame (orders within $100
    // below, same year+priority) over exact integer cents — the
    // frame-semantics counterpart of the positional ROWS ma7
    "orders_price_band" -> QueryDef(
      (s, d) => RelationalOps.ordersPriceBand(Tables.orders(s, d)),
      Some("""WITH o AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
             |    o_orderpriority, o_orderkey,
             |    CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
             |  FROM orders)
             |SELECT yr, o_orderpriority, o_orderkey, cents,
             |  count(*) OVER (PARTITION BY yr, o_orderpriority ORDER BY cents
             |    RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS n_band
             |FROM o ORDER BY yr, o_orderpriority, cents, o_orderkey""".stripMargin)),

    // data-quality audit: per-table rules fused into single-scan
    // conditional aggregates + an FK anti join; exact-long verdicts,
    // zero = a passing (still recomputed) check
    "dq_audit" -> QueryDef(
      (s, d) => RelationalOps.dqAudit(Tables.orders(s, d),
        Tables.lineitem(s, d), Tables.customer(s, d)),
      Some("""SELECT rule, CAST(n_violations AS BIGINT) AS n_violations FROM (
             |  SELECT 'orders_null_custkey' AS rule,
             |    count(*) FILTER (WHERE o_custkey IS NULL) AS n_violations FROM orders
             |  UNION ALL SELECT 'orders_nonpositive_price',
             |    count(*) FILTER (WHERE o_totalprice <= 0) FROM orders
             |  UNION ALL SELECT 'orders_price_outlier',
             |    count(*) FILTER (WHERE o_totalprice > 400000) FROM orders
             |  UNION ALL SELECT 'lineitem_nonpositive_qty',
             |    count(*) FILTER (WHERE l_quantity <= 0) FROM lineitem
             |  UNION ALL SELECT 'lineitem_discount_range',
             |    count(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.1) FROM lineitem
             |  UNION ALL SELECT 'lineitem_late_shipdate',
             |    count(*) FILTER (WHERE l_shipdate >= TIMESTAMP '1998-10-01 00:00:00') FROM lineitem
             |  UNION ALL SELECT 'orders_orphan_custkey', count(*) FROM orders o
             |    WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
             |  UNION ALL SELECT 'orders_duplicate_pk', coalesce(sum(k - 1), 0)
             |    FROM (SELECT count(*) AS k FROM orders GROUP BY o_orderkey))
             |ORDER BY rule""".stripMargin)),

    // raw-blob directory ingestion through the binaryFile source:
    // the oracle re-derives every file's byte count and hex-md5
    // digest from the documents table the fixture was written from
    "binaryfile_scan" -> QueryDef(
      (s, d) => graft.sources.BinarySource.binaryInventory(s, d),
      Some(s"""SELECT doc_id,
              |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
              |  md5(hex(encode(text))) AS content_md5
              |FROM documents WHERE doc_id % ${graft.sources.BinarySource.SampleMod} = 0
              |ORDER BY doc_id""".stripMargin)),

    // k-anonymity audit over the (nation, segment, balance-band)
    // quasi-identifier: group sizes under k and the rows at risk
    "k_anonymity" -> QueryDef(
      (s, d) => RelationalOps.kAnonymity(Tables.customer(s, d)),
      Some(s"""WITH g AS (SELECT c_nationkey, c_mktsegment,
              |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band, count(*) AS n
              |  FROM customer GROUP BY 1, 2, 3)
              |SELECT CAST(count(*) AS BIGINT) AS n_groups,
              |  CAST(count(*) FILTER (WHERE n < ${RelationalOps.KAnonK}) AS BIGINT) AS n_small_groups,
              |  CAST(coalesce(sum(n) FILTER (WHERE n < ${RelationalOps.KAnonK}), 0) AS BIGINT) AS n_rows_at_risk,
              |  CAST(min(n) AS BIGINT) AS min_group_n
              |FROM g""".stripMargin)),

    // snapshot diff: one full-outer join classifies every key as
    // added/removed/changed/unchanged; the revised snapshot is
    // derived deterministically so the oracle replays the whole diff
    "table_diff" -> QueryDef(
      (s, d) => RelationalOps.tableDiff(Tables.orders(s, d)),
      Some {
        val off = RelationalOps.Scd2InsertOffset
        s"""WITH base AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
           |rev AS (
           |  SELECT o_orderkey AS r_key,
           |    CASE WHEN o_orderkey % 9 = 4 THEN round(o_totalprice + 1.0, 2)
           |         ELSE o_totalprice END AS r_price,
           |    o_orderstatus AS r_status
           |  FROM base WHERE o_orderkey % 17 != 2
           |  UNION ALL
           |  SELECT o_orderkey + $off, o_totalprice, o_orderstatus
           |  FROM base WHERE o_orderkey % 19 = 3),
           |j AS (SELECT
           |    CASE WHEN b.o_orderkey IS NULL THEN 'added'
           |         WHEN r.r_key IS NULL THEN 'removed'
           |         WHEN b.o_totalprice <> r.r_price OR b.o_orderstatus <> r.r_status
           |           THEN 'changed'
           |         ELSE 'unchanged' END AS verdict
           |  FROM base b FULL OUTER JOIN rev r ON b.o_orderkey = r.r_key)
           |SELECT verdict, count(*) AS n FROM j GROUP BY verdict ORDER BY verdict""".stripMargin
      }),

    // SCD Type-2 dimension merge: one full-outer join on the dim key
    // + row-local version fan-out; changed rows close v1 and open v2,
    // byte-identical batch rows are no-ops, new keys insert as v1
    "scd2_customer_merge" -> QueryDef(
      (s, d) => RelationalOps.scd2CustomerMerge(Tables.customer(s, d)),
      Some {
        val off = RelationalOps.Scd2InsertOffset
        s"""WITH dim AS (SELECT c_custkey, c_mktsegment, c_acctbal FROM customer),
           |batch AS (
           |  SELECT c_custkey, 'SEG_' || (c_custkey % 5) AS u_seg,
           |         round(c_acctbal + 100.0, 2) AS u_bal
           |  FROM customer WHERE c_custkey % 7 = 3
           |  UNION ALL
           |  SELECT c_custkey, c_mktsegment, c_acctbal FROM customer WHERE c_custkey % 7 = 2
           |  UNION ALL
           |  SELECT c_custkey + $off, 'SEG_' || ((c_custkey + $off) % 5), c_acctbal
           |  FROM customer WHERE c_custkey % 13 = 6),
           |j AS (SELECT coalesce(d.c_custkey, b.c_custkey) AS c_custkey,
           |        d.c_mktsegment, d.c_acctbal, b.u_seg, b.u_bal,
           |        (b.u_seg IS NOT NULL AND d.c_mktsegment IS NOT NULL AND
           |         (b.u_seg <> d.c_mktsegment OR b.u_bal <> d.c_acctbal)) AS changed
           |      FROM dim d FULL OUTER JOIN batch b ON d.c_custkey = b.c_custkey)
           |SELECT * FROM (
           |  SELECT c_custkey, CAST(1 AS BIGINT) AS version, c_mktsegment AS seg,
           |    c_acctbal AS bal, CAST(0 AS BIGINT) AS valid_from,
           |    CAST(CASE WHEN changed THEN 1 END AS BIGINT) AS valid_to,
           |    CAST(CASE WHEN changed THEN 0 ELSE 1 END AS BIGINT) AS is_current
           |  FROM j WHERE c_mktsegment IS NOT NULL
           |  UNION ALL
           |  SELECT c_custkey, 2, u_seg, u_bal, 1, NULL, 1 FROM j WHERE changed
           |  UNION ALL
           |  SELECT c_custkey, 1, u_seg, u_bal, 1, NULL, 1 FROM j WHERE c_mktsegment IS NULL)
           |ORDER BY c_custkey, version""".stripMargin
      }),

    // distribution-rank windows, filtered on the ROUNDED cume_dist so
    // a boundary order cannot flip between engines
    "orders_pricerank" -> QueryDef(
      (s, d) => RelationalOps.ordersPriceRank(Tables.orders(s, d)),
      Some("""WITH r AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
             |    o_orderkey, o_totalprice,
             |    round(percent_rank() OVER (PARTITION BY year(o_orderdate) ORDER BY o_totalprice), 6) AS pr,
             |    round(cume_dist() OVER (PARTITION BY year(o_orderdate) ORDER BY o_totalprice), 6) AS cd
             |  FROM orders)
             |SELECT yr, o_orderkey, o_totalprice, pr, cd
             |FROM r WHERE cd >= 0.99 ORDER BY yr, o_orderkey""".stripMargin)),

    // scale-safe pricerank companion: deterministic 5% hash-sample,
    // exact per-year P99 on the sample, broadcast threshold,
    // row-local top-band filter — no per-year total sort (the exact
    // percent_rank/cume_dist 100 TB wall)
    "orders_pricerank_banded" -> QueryDef(
      (s, d) => RelationalOps.ordersPriceRankBanded(Tables.orders(s, d)),
      Some(s"""WITH base AS (SELECT o_orderkey, o_totalprice,
             |          CAST(year(o_orderdate) AS BIGINT) AS yr FROM orders),
             |samp AS (SELECT yr, o_totalprice FROM base
             |      WHERE ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 15))::UBIGINT % 100 < ${RelationalOps.NtileBandSamplePct}),
             |b AS (SELECT yr, round(quantile_cont(o_totalprice, 0.99), 4) AS p99
             |      FROM samp GROUP BY yr),
             |t AS (SELECT base.yr, o_totalprice, p99
             |      FROM base LEFT JOIN b ON base.yr = b.yr
             |      WHERE p99 IS NULL OR o_totalprice >= p99)
             |SELECT yr, round(max(p99), 4) AS p99_threshold,
             |  count(*) AS n_top,
             |  round(min(o_totalprice), 2) AS min_price,
             |  round(max(o_totalprice), 2) AS max_price,
             |  round(avg(o_totalprice), 4) AS avg_price
             |FROM t GROUP BY yr ORDER BY yr""".stripMargin)),

    // RFM segmentation: decimal monetary sum so the fixed band edges
    // are summation-order-independent at any SF
    "customer_rfm" -> QueryDef(
      (s, d) => RelationalOps.customerRfm(Tables.orders(s, d)),
      Some("""WITH per AS (SELECT o_custkey,
             |    strftime(max(o_orderdate), '%Y-%m-%d') AS last_order,
             |    count(*) AS frequency,
             |    sum(CAST(o_totalprice AS DECIMAL(15,2))) AS monetary
             |  FROM orders GROUP BY o_custkey),
             |b AS (SELECT
             |    CASE WHEN frequency >= 20 THEN 'F3'
             |         WHEN frequency >= 10 THEN 'F2' ELSE 'F1' END AS f_band,
             |    CASE WHEN monetary >= 2000000 THEN 'M3'
             |         WHEN monetary >= 500000 THEN 'M2' ELSE 'M1' END AS m_band,
             |    last_order FROM per)
             |SELECT f_band, m_band, count(*) AS n_customers,
             |  max(last_order) AS latest_order
             |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // scale-adaptive RFM companion: tercile cutoffs derived from a
    // deterministic hash-sample of the per-customer aggregate,
    // broadcast as a 1-row bound table — bands stay meaningful at
    // any SF (the fixed-threshold form is fixture-calibrated)
    "customer_rfm_banded" -> QueryDef(
      (s, d) => RelationalOps.customerRfmBanded(Tables.orders(s, d)),
      Some(s"""WITH per AS (SELECT o_custkey,
             |    strftime(max(o_orderdate), '%Y-%m-%d') AS last_order,
             |    count(*) AS frequency,
             |    sum(CAST(o_totalprice AS DECIMAL(15,2))) AS monetary
             |  FROM orders GROUP BY o_custkey),
             |s AS (SELECT * FROM per
             |  WHERE ('0x' || substr(md5(o_custkey::VARCHAR), 1, 15))::UBIGINT % 100 < ${RelationalOps.NtileBandSamplePct}),
             |b AS (SELECT round(quantile_cont(frequency, 0.33), 4) AS f1,
             |             round(quantile_cont(frequency, 0.67), 4) AS f2,
             |             round(quantile_cont(CAST(monetary AS DOUBLE), 0.33), 4) AS m1,
             |             round(quantile_cont(CAST(monetary AS DOUBLE), 0.67), 4) AS m2
             |      FROM s)
             |SELECT f_band, m_band, count(*) AS n_customers,
             |  max(last_order) AS latest_order
             |FROM (SELECT
             |    CASE WHEN f2 IS NULL OR frequency >= f2 THEN 'F3'
             |         WHEN frequency >= f1 THEN 'F2' ELSE 'F1' END AS f_band,
             |    CASE WHEN m2 IS NULL OR monetary >= m2 THEN 'M3'
             |         WHEN monetary >= m1 THEN 'M2' ELSE 'M1' END AS m_band,
             |    last_order FROM per LEFT JOIN b ON TRUE)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // customer order-count distribution (TPC-H Q13 shape): outer
    // join keeps zero-order customers; second agg keys on the tiny
    // order-count domain
    "q13_custdist" -> QueryDef(
      (s, d) => RelationalOps.q13Custdist(Tables.customer(s, d), Tables.orders(s, d)),
      Some("""WITH per AS (SELECT c_custkey, count(o_orderkey) AS c_count
             |  FROM customer LEFT JOIN orders
             |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
             |  GROUP BY c_custkey)
             |SELECT c_count, count(*) AS custdist
             |FROM per GROUP BY c_count
             |ORDER BY custdist DESC, c_count DESC""".stripMargin)),

    // large-volume orders (TPC-H Q18 shape): decimal-exact HAVING
    // tail broadcast into the orders/customer join under AQE
    "q18_large_orders" -> QueryDef(
      (s, d) => RelationalOps.q18LargeOrders(Tables.customer(s, d),
        Tables.orders(s, d), Tables.lineitem(s, d)),
      Some("""WITH big AS (SELECT l_orderkey,
             |    sum(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
             |  FROM lineitem GROUP BY l_orderkey
             |  HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 210)
             |SELECT c_name, c_custkey, o_orderkey,
             |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
             |  o_totalprice, CAST(total_qty AS DOUBLE) AS total_qty
             |FROM orders JOIN big ON o_orderkey = l_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)),

    // conditional-aggregation join (TPC-H Q12 shape): one pass, one
    // shuffle, the priority split as in-aggregate CASE sums
    "q12_priority_mix" -> QueryDef(
      (s, d) => RelationalOps.q12PriorityMix(Tables.orders(s, d), Tables.lineitem(s, d)),
      Some("""SELECT l_linestatus,
             |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
             |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
             |      THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |  AND l_shipdate < TIMESTAMP '1997-01-01'
             |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin)),

    // promo revenue share (TPC-H Q14 shape): conditional numerator +
    // unconditional denominator in ONE aggregate over the part join
    "q14_promo_share" -> QueryDef(
      (s, d) => RelationalOps.q14PromoShare(Tables.part(s, d), Tables.lineitem(s, d)),
      Some("""SELECT round(100.0 *
             |  CAST(sum(CASE WHEN p_type = 'PROMO'
             |    THEN CAST(l_extendedprice AS DECIMAL(15,2)) *
             |         (1 - CAST(l_discount AS DECIMAL(15,2)))
             |    ELSE CAST(0 AS DECIMAL(15,2)) END) AS DOUBLE) /
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2)) *
             |         (1 - CAST(l_discount AS DECIMAL(15,2)))) AS DOUBLE), 4)
             |  AS promo_revenue_pct
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE l_shipdate >= TIMESTAMP '1997-03-01'
             |  AND l_shipdate < TIMESTAMP '1997-04-01'""".stripMargin)),

    // correlated scalar subquery, decorrelated (TPC-H Q17 shape):
    // per-part avg joined back on the same key it aggregates on
    "q17_small_qty" -> QueryDef(
      (s, d) => RelationalOps.q17SmallQty(Tables.part(s, d), Tables.lineitem(s, d)),
      Some("""WITH branded AS (
             |  SELECT l_partkey, l_quantity, l_extendedprice
             |  FROM lineitem JOIN part ON l_partkey = p_partkey
             |  WHERE p_brand = 'Brand#3'),
             |a AS (SELECT l_partkey AS a_partkey,
             |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*)
             |      AS avg_qty
             |  FROM branded GROUP BY l_partkey)
             |SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(15,2))), 2)
             |  AS DOUBLE) AS small_qty_revenue
             |FROM branded JOIN a ON l_partkey = a_partkey
             |WHERE l_quantity < 0.5 * avg_qty""".stripMargin)),

    // global scalar threshold + date-scoped anti join (TPC-H Q22
    // shape, churn variant: lapsed since 1998)
    "q22_untapped" -> QueryDef(
      (s, d) => RelationalOps.q22Untapped(Tables.customer(s, d), Tables.orders(s, d)),
      Some("""WITH t AS (SELECT
             |    CAST(sum(CAST(c_acctbal AS DECIMAL(15,2))) AS DOUBLE) / count(*)
             |      AS avg_bal
             |  FROM customer WHERE c_acctbal > 0)
             |SELECT c_mktsegment, count(*) AS numcust,
             |  CAST(round(sum(CAST(c_acctbal AS DECIMAL(15,2))), 2) AS DOUBLE)
             |    AS totacctbal
             |FROM customer, t
             |WHERE c_acctbal > avg_bal
             |  AND NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey
             |                    AND o_orderdate >= TIMESTAMP '1998-01-01')
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // correlated EXISTS with a non-equi lateness predicate (TPC-H Q4
    // shape): left-semi on the order key, no DISTINCT, no explosion
    "q4_late_orders" -> QueryDef(
      (s, d) => RelationalOps.q4LateOrders(Tables.orders(s, d), Tables.lineitem(s, d)),
      Some("""SELECT o_orderpriority, count(*) AS order_count
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
             |  AND o_orderdate < TIMESTAMP '1996-10-01'
             |  AND EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey
             |                AND l_shipdate > o_orderdate + INTERVAL 180 DAY)
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // bidirectional nation-pair volume (TPC-H Q7 shape): bounded dims
    // broadcast, one big-big shuffle, 4-row output
    "q7_volume" -> QueryDef(
      (s, d) => RelationalOps.q7Volume(Tables.nation(s, d), Tables.customer(s, d),
        Tables.supplier(s, d), Tables.orders(s, d), Tables.lineitem(s, d)),
      Some("""SELECT supp_nation, cust_nation, l_year,
             |  CAST(round(sum(vol), 2) AS DOUBLE) AS revenue
             |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             |        CAST(year(l_shipdate) AS BIGINT) AS l_year,
             |        CAST(l_extendedprice AS DECIMAL(15,2)) *
             |          (1 - CAST(l_discount AS DECIMAL(15,2))) AS vol
             |      FROM lineitem
             |        JOIN supplier ON l_suppkey = s_suppkey
             |        JOIN nation n1 ON s_nationkey = n1.n_nationkey
             |        JOIN orders ON l_orderkey = o_orderkey
             |        JOIN customer ON o_custkey = c_custkey
             |        JOIN nation n2 ON c_nationkey = n2.n_nationkey
             |      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |        AND l_shipdate < TIMESTAMP '1998-01-01'
             |        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') OR
             |             (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')))
             |GROUP BY supp_nation, cust_nation, l_year
             |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)),

    // national market share in one region (TPC-H Q8 shape):
    // conditional numerator + denominator in ONE aggregate over the
    // 6-table join
    "q8_market_share" -> QueryDef(
      (s, d) => RelationalOps.q8MarketShare(Tables.region(s, d), Tables.nation(s, d),
        Tables.customer(s, d), Tables.supplier(s, d), Tables.orders(s, d),
        Tables.lineitem(s, d), Tables.part(s, d)),
      Some("""SELECT o_year,
             |  floor(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN vol
             |                 ELSE CAST(0 AS DECIMAL(15,2)) END) AS DOUBLE) /
             |        CAST(sum(vol) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
             |    AS mkt_share
             |FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             |        n1.n_name AS supp_nation,
             |        CAST(l_extendedprice AS DECIMAL(15,2)) *
             |          (1 - CAST(l_discount AS DECIMAL(15,2))) AS vol
             |      FROM lineitem
             |        JOIN part ON l_partkey = p_partkey
             |        JOIN supplier ON l_suppkey = s_suppkey
             |        JOIN nation n1 ON s_nationkey = n1.n_nationkey
             |        JOIN orders ON l_orderkey = o_orderkey
             |        JOIN customer ON o_custkey = c_custkey
             |        JOIN nation n2 ON c_nationkey = n2.n_nationkey
             |        JOIN region ON n2.n_regionkey = r_regionkey
             |      WHERE p_type = 'ECONOMY' AND r_name = 'ASIA') t
             |GROUP BY o_year ORDER BY o_year""".stripMargin)),

    // top revenue supplier (TPC-H Q15 shape): per-supplier quarter
    // rollup, 1-row max, scalar-like join back — no window, no
    // second lineitem pass
    "q15_top_supplier" -> QueryDef(
      (s, d) => RelationalOps.q15TopSupplier(Tables.supplier(s, d), Tables.lineitem(s, d)),
      Some("""WITH revenue AS (
             |  SELECT l_suppkey, sum(CAST(l_extendedprice AS DECIMAL(15,2)) *
             |    (1 - CAST(l_discount AS DECIMAL(15,2)))) AS total_rev
             |  FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |    AND l_shipdate < TIMESTAMP '1996-04-01'
             |  GROUP BY l_suppkey)
             |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
             |FROM revenue JOIN supplier ON l_suppkey = s_suppkey
             |WHERE total_rev = (SELECT max(total_rev) FROM revenue)
             |ORDER BY s_suppkey""".stripMargin)),

    // disjunctive brand/size/quantity bands (TPC-H Q19 shape): CNF
    // pushdown puts the lineitem-only OR into the scan (plan-pinned)
    "q19_disjunctive" -> QueryDef(
      (s, d) => RelationalOps.q19Disjunctive(Tables.part(s, d), Tables.lineitem(s, d)),
      Some(s"""SELECT ${RelationalOps.RevenueExactSql} AS revenue, count(*) AS n_lines
              |FROM lineitem JOIN part ON l_partkey = p_partkey
              |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
              |       AND l_quantity BETWEEN 1 AND 11)
              |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
              |       AND l_quantity BETWEEN 10 AND 20)
              |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
              |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin)),

    // product-type profit per nation and year (TPC-H Q9 shape,
    // synthetic 60%-of-retail supply cost; decimal-exact amounts)
    "q9_profit" -> QueryDef(
      (s, d) => RelationalOps.q9Profit(Tables.nation(s, d), Tables.supplier(s, d),
        Tables.part(s, d), Tables.orders(s, d), Tables.lineitem(s, d)),
      Some("""SELECT nation, o_year,
             |  CAST(round(sum(amount), 2) AS DOUBLE) AS sum_profit
             |FROM (SELECT n_name AS nation,
             |        CAST(year(o_orderdate) AS BIGINT) AS o_year,
             |        CAST(l_extendedprice AS DECIMAL(15,2)) *
             |          (1 - CAST(l_discount AS DECIMAL(15,2))) -
             |        CAST(p_retailprice AS DECIMAL(15,2)) * CAST(0.60 AS DECIMAL(3,2)) *
             |          CAST(l_quantity AS DECIMAL(12,2)) AS amount
             |      FROM lineitem
             |        JOIN part ON l_partkey = p_partkey
             |        JOIN supplier ON l_suppkey = s_suppkey
             |        JOIN nation ON s_nationkey = n_nationkey
             |        JOIN orders ON l_orderkey = o_orderkey
             |      WHERE p_type = 'STANDARD') t
             |GROUP BY nation, o_year
             |ORDER BY nation, o_year DESC""".stripMargin)),

    // min-cost supplier per part (TPC-H Q2 shape): decorrelated min
    // over the derived partsupp, both sides share the ps CTE
    "q2_min_cost" -> QueryDef(
      (s, d) => RelationalOps.q2MinCost(Tables.region(s, d), Tables.nation(s, d),
        Tables.supplier(s, d), Tables.part(s, d), RelationalOps.partsuppTable(s, d)),
      Some(s"""WITH ${RelationalOps.PartsuppDerivedSql},
              |rs AS (SELECT s_suppkey, s_name, s_acctbal, n_name
              |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
              |    JOIN region ON n_regionkey = r_regionkey
              |  WHERE r_name = 'EUROPE'),
              |offers AS (SELECT ps.*, p_partkey, p_brand, s_acctbal, s_name, n_name
              |  FROM ps JOIN part ON ps_partkey = p_partkey
              |    JOIN rs ON ps_suppkey = s_suppkey
              |  WHERE p_size = ${RelationalOps.Q2PartSize}),
              |mc AS (SELECT ps_partkey AS m_partkey, min(ps_supplycost) AS min_cost
              |  FROM offers GROUP BY ps_partkey)
              |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, ps_supplycost
              |FROM offers JOIN mc ON ps_partkey = m_partkey
              |  AND ps_supplycost = min_cost
              |ORDER BY s_acctbal DESC, p_partkey, s_name LIMIT 100""".stripMargin)),

    // important stock (TPC-H Q11 shape): fraction-of-total HAVING via
    // an exact decimal multiply against a window-form global total
    "q11_important_stock" -> QueryDef(
      (s, d) => RelationalOps.q11ImportantStock(Tables.nation(s, d),
        Tables.supplier(s, d), RelationalOps.partsuppTable(s, d)),
      Some(s"""WITH ${RelationalOps.PartsuppDerivedSql},
              |ns AS (SELECT s_suppkey FROM supplier
              |  JOIN nation ON s_nationkey = n_nationkey
              |  WHERE n_name = 'NATION_7'),
              |pp AS (SELECT ps_partkey,
              |    sum(CAST(ps_supplycost AS DECIMAL(10,2)) *
              |        CAST(ps_availqty AS DECIMAL(8,0))) AS stock_value
              |  FROM ps JOIN ns ON ps_suppkey = s_suppkey
              |  GROUP BY ps_partkey),
              |w AS (SELECT ps_partkey, stock_value,
              |    sum(stock_value) OVER () AS total FROM pp)
              |SELECT ps_partkey, CAST(stock_value AS DOUBLE) AS stock_value
              |FROM w WHERE stock_value * ${RelationalOps.Q11Fraction} > total
              |ORDER BY stock_value DESC, ps_partkey""".stripMargin)),

    // excess availability (TPC-H Q20 shape): nested IN as semi joins,
    // the threshold compare as an exact decimal multiply
    "q20_excess_suppliers" -> QueryDef(
      (s, d) => RelationalOps.q20ExcessSuppliers(Tables.nation(s, d),
        Tables.supplier(s, d), Tables.lineitem(s, d), RelationalOps.partsuppTable(s, d)),
      Some(s"""WITH ${RelationalOps.PartsuppDerivedSql},
              |shipped AS (SELECT l_partkey AS q_partkey, l_suppkey AS q_suppkey,
              |    sum(CAST(l_quantity AS DECIMAL(12,2))) AS shipped_qty
              |  FROM lineitem
              |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              |    AND l_shipdate < TIMESTAMP '1998-01-01'
              |  GROUP BY 1, 2),
              |excess AS (SELECT DISTINCT ps_suppkey
              |  FROM ps JOIN shipped ON ps_partkey = q_partkey
              |    AND ps_suppkey = q_suppkey
              |  WHERE CAST(ps_availqty AS DECIMAL(12,2)) * 2 > shipped_qty)
              |SELECT s_suppkey, s_name
              |FROM supplier JOIN nation ON s_nationkey = n_nationkey
              |WHERE n_name = 'NATION_9'
              |  AND s_suppkey IN (SELECT ps_suppkey FROM excess)
              |ORDER BY s_suppkey""".stripMargin)),

    // supplier-relationship count (TPC-H Q16 shape): one-pass
    // distinct aggregate + NOT-IN anti join on the complaint list
    "q16_supplier_cnt" -> QueryDef(
      (s, d) => RelationalOps.q16SupplierCnt(Tables.supplier(s, d),
        Tables.part(s, d), Tables.lineitem(s, d)),
      Some(s"""SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
              |FROM lineitem
              |  JOIN part ON l_partkey = p_partkey
              |WHERE p_type <> 'PROMO'
              |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
              |                        WHERE s_acctbal < 0)
              |GROUP BY p_brand, p_size
              |ORDER BY supplier_cnt DESC, p_brand, p_size
              |LIMIT ${RelationalOps.Q16TopK}""".stripMargin)),

    // sole-late-supplier count (TPC-H Q21 shape): semi + anti
    // self-joins on the order key, all riding one partitioning
    "q21_waiting" -> QueryDef(
      (s, d) => RelationalOps.q21Waiting(Tables.nation(s, d), Tables.supplier(s, d),
        Tables.orders(s, d), Tables.lineitem(s, d)),
      Some("""SELECT s_name, count(*) AS numwait
             |FROM lineitem l1
             |  JOIN supplier ON l1.l_suppkey = s_suppkey
             |  JOIN nation ON s_nationkey = n_nationkey
             |  JOIN orders ON l1.l_orderkey = o_orderkey
             |WHERE n_name = 'NATION_5' AND o_orderstatus = 'F'
             |  AND l1.l_shipdate > o_orderdate + INTERVAL 365 DAY
             |  AND EXISTS (SELECT 1 FROM lineitem l2
             |              WHERE l2.l_orderkey = l1.l_orderkey
             |                AND l2.l_suppkey <> l1.l_suppkey)
             |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
             |                  WHERE l3.l_orderkey = l1.l_orderkey
             |                    AND l3.l_suppkey <> l1.l_suppkey
             |                    AND l3.l_shipdate > o_orderdate + INTERVAL 365 DAY)
             |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin)),

    // correlated EXISTS / NOT EXISTS through the SQL layer (plans as
    // a left-semi + left-anti join pair)
    "sql_exists_anti" -> QueryDef(
      (s, d) => {
        Catalog.registerViews(s, d)
        s.sql("""SELECT c_custkey, c_name FROM customer
                |WHERE EXISTS (SELECT 1 FROM orders
                |              WHERE o_custkey = c_custkey AND o_totalprice > 300000)
                |  AND NOT EXISTS (SELECT 1 FROM orders
                |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
                |ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |              WHERE o_custkey = c_custkey AND o_totalprice > 300000)
             |  AND NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
             |ORDER BY c_custkey""".stripMargin)),

    // the oracle is the INDEPENDENT unbinned theta-join formulation —
    // a hash match proves the bin+refine decomposition loses no pairs
    "range_join_binned" -> QueryDef(
      (s, d) => RelationalOps.rangeJoinBinned(Tables.part(s, d), Tables.lineitem(s, d)),
      Some("""WITH b AS (SELECT p_partkey, p_brand,
             |            p_retailprice * 0.9 AS lo, p_retailprice * 1.1 AS hi
             |          FROM part WHERE p_size = 1)
             |SELECT p_partkey, p_brand, count(*) AS n_in_band,
             |  round(avg(l_extendedprice), 4) AS avg_band_price
             |FROM b JOIN lineitem ON l_extendedprice >= lo AND l_extendedprice <= hi
             |GROUP BY p_partkey, p_brand ORDER BY p_partkey""".stripMargin)),

    "orders_monthly" -> QueryDef(
      (s, d) => RelationalOps.ordersMonthly(Tables.orders(s, d)),
      Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, CAST(month(o_orderdate) AS BIGINT) AS mo,
             |  count(*) AS n_orders, CAST(round(sum(CAST(o_totalprice AS DECIMAL(15,2))), 2) AS DOUBLE) AS revenue, round(avg(o_totalprice), 4) AS avg_price
             |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // YoY growth: lag window over the |years|x12-row aggregate, never
    // the fact table; growth on the rounded revenues both sides
    "orders_yoy" -> QueryDef(
      (s, d) => RelationalOps.ordersYoy(Tables.orders(s, d)),
      Some("""WITH m AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
             |            CAST(month(o_orderdate) AS BIGINT) AS mo,
             |            CAST(round(sum(CAST(o_totalprice AS DECIMAL(15,2))), 2) AS DOUBLE) AS revenue
             |          FROM orders GROUP BY 1, 2),
             |l AS (SELECT yr, mo, revenue,
             |        lag(revenue) OVER (PARTITION BY mo ORDER BY yr) AS prev_revenue
             |      FROM m)
             |SELECT yr, mo, revenue, prev_revenue,
             |  round(revenue / prev_revenue - 1.0, 4) AS yoy
             |FROM l WHERE prev_revenue IS NOT NULL ORDER BY yr, mo""".stripMargin)),

    // ----- events ------------------------------------------------------
    // date-spine resample: the complete (type, day) grid zero-filled
    // — a plain groupBy DROPS empty days and corrupts moving
    // averages; the rollup localCheckpoints (model-sized) so the
    // fact table is scanned once across its three references
    "events_daily_gapfill" -> QueryDef(
      (s, d) => EventsOps.dailyGapfill(Tables.events(s, d)),
      Some("""WITH daily AS (SELECT event_type, date_trunc('day', ts)::DATE AS day,
             |    count(*) AS n, round(sum(value), 4) AS sum_value
             |  FROM events GROUP BY 1, 2),
             |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
             |spine AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE
             |    AS day FROM b),
             |types AS (SELECT DISTINCT event_type FROM daily)
             |SELECT t.event_type, strftime(s.day, '%Y-%m-%d') AS day,
             |  coalesce(n, 0) AS n, coalesce(sum_value, 0.0) AS sum_value
             |FROM spine s CROSS JOIN types t
             |  LEFT JOIN daily d ON d.event_type = t.event_type AND d.day = s.day
             |ORDER BY t.event_type, s.day""".stripMargin)),

    // one-pass multi-DISTINCT: Expand + two-level aggregate, never a
    // per-DISTINCT corpus re-scan (plan-pinned)
    "events_multi_distinct" -> QueryDef(
      (s, d) => EventsOps.multiDistinct(Tables.events(s, d)),
      Some("""SELECT event_type,
             |  count(DISTINCT user_id) AS n_users,
             |  count(DISTINCT strftime(date_trunc('day', ts), '%Y-%m-%d')) AS n_days,
             |  count(*) AS n_events
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    "events_hourly" -> QueryDef(
      (s, d) => EventsOps.hourly(Tables.events(s, d)),
      Some("""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
             |  count(*) AS n, round(sum(value), 4) AS sum_value
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // oracle works at the distinct-(user, ms) grain: a session
    // boundary can only fall BETWEEN distinct timestamps (equal-ms
    // rows always share a session), and deduping first makes every
    // window total-ordered — order-insensitive even if the fixture
    // carries fully duplicated rows, where a per-row two-pass window
    // could order a tie group differently in each pass and split it
    // across sessions (the engine's single-sort window plan cannot)
    "events_sessionize" -> QueryDef(
      (s, d) => EventsOps.sessionize(Tables.events(s, d)),
      Some("""WITH e AS (SELECT user_id, epoch_ms(ts) AS ms FROM events),
             |d AS (SELECT user_id, ms, count(*) AS n FROM e GROUP BY 1, 2),
             |f AS (SELECT user_id, ms, n,
             |  CASE WHEN lag(ms, 1) OVER (PARTITION BY user_id ORDER BY ms) IS NULL
             |         OR ms - lag(ms, 1) OVER (PARTITION BY user_id ORDER BY ms) > 1800000
             |       THEN 1 ELSE 0 END AS new_session
             |FROM d),
             |g AS (SELECT user_id, ms, n,
             |  sum(new_session) OVER (PARTITION BY user_id ORDER BY ms
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
             |FROM f),
             |s AS (SELECT user_id, session_id, CAST(sum(n) AS BIGINT) AS n_events,
             |        max(ms) - min(ms) AS span_ms
             |      FROM g GROUP BY user_id, session_id)
             |SELECT user_id, count(*) AS n_sessions,
             |  round(avg(n_events), 4) AS avg_events_per_session,
             |  CAST(max(span_ms) AS BIGINT) AS max_span_ms
             |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // session-grain records (user-grain sessionize one level up);
    // same tie-safe distinct-(user, ms) oracle grain as above —
    // boundaries fall only between distinct timestamps, so start/
    // count/span per session are order-insensitive
    "session_records" -> QueryDef(
      (s, d) => EventsOps.sessionRecords(Tables.events(s, d)),
      Some("""WITH e AS (SELECT user_id, epoch_ms(ts) AS ms FROM events),
             |d AS (SELECT user_id, ms, count(*) AS n FROM e GROUP BY 1, 2),
             |f AS (SELECT user_id, ms, n,
             |  CASE WHEN lag(ms, 1) OVER (PARTITION BY user_id ORDER BY ms) IS NULL
             |         OR ms - lag(ms, 1) OVER (PARTITION BY user_id ORDER BY ms) > 1800000
             |       THEN 1 ELSE 0 END AS new_session
             |FROM d),
             |g AS (SELECT user_id, ms, n,
             |  sum(new_session) OVER (PARTITION BY user_id ORDER BY ms
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
             |FROM f)
             |SELECT user_id, min(ms) AS session_start_ms,
             |  CAST(sum(n) AS BIGINT) AS n_events,
             |  max(ms) - min(ms) AS span_ms
             |FROM g GROUP BY user_id, session_id
             |ORDER BY user_id, session_start_ms""".stripMargin)),

    // the same session records through Spark's BUILT-IN session_window
    // merging aggregate (one user_id exchange) — pairs with the
    // lag+cumsum form the way the KMV window/UDAF pair does, sharing
    // one oracle
    "session_window_records" -> QueryDef(
      (s, d) => EventsOps.sessionRecordsViaSessionWindow(Tables.events(s, d)),
      Some("""WITH e AS (SELECT user_id, epoch_ms(ts) AS ms FROM events),
             |d AS (SELECT user_id, ms, count(*) AS n FROM e GROUP BY 1, 2),
             |f AS (SELECT user_id, ms, n,
             |  CASE WHEN lag(ms, 1) OVER (PARTITION BY user_id ORDER BY ms) IS NULL
             |         OR ms - lag(ms, 1) OVER (PARTITION BY user_id ORDER BY ms) > 1800000
             |       THEN 1 ELSE 0 END AS new_session
             |FROM d),
             |g AS (SELECT user_id, ms, n,
             |  sum(new_session) OVER (PARTITION BY user_id ORDER BY ms
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
             |FROM f)
             |SELECT user_id, min(ms) AS session_start_ms,
             |  CAST(sum(n) AS BIGINT) AS n_events,
             |  max(ms) - min(ms) AS span_ms
             |FROM g GROUP BY user_id, session_id
             |ORDER BY user_id, session_start_ms""".stripMargin)),

    "events_json" -> QueryDef(
      (s, d) => EventsOps.jsonProps(Tables.events(s, d)),
      Some("""SELECT event_type, count(*) AS n,
             |  round(avg(CAST(regexp_extract(props, '"k"\s*:\s*([0-9]+)', 1) AS BIGINT)), 4) AS avg_k
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    "events_asof_join" -> QueryDef(
      (s, d) => EventsOps.asofPurchaseClick(Tables.events(s, d)),
      Some("""WITH e AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms FROM events),
             |f AS (SELECT event_id, user_id, event_type, ms,
             |  LAST_VALUE(CASE WHEN event_type = 'click' THEN ms END IGNORE NULLS) OVER (
             |    PARTITION BY user_id ORDER BY ms, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ms
             |FROM e)
             |SELECT event_id, user_id, ms AS purchase_ms, last_click_ms, ms - last_click_ms AS gap_ms
             |FROM f WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin)),

    "events_cube" -> QueryDef(
      (s, d) => EventsOps.cubeDaily(Tables.events(s, d)),
      Some("""WITH e AS (SELECT event_type, strftime(CAST(date_trunc('day', ts) AS TIMESTAMP), '%Y-%m-%d') AS day, value FROM events)
             |SELECT coalesce(event_type, 'ALL') AS event_type, coalesce(day, 'ALL') AS day,
             |  count(*) AS n, round(sum(value), 4) AS sum_value
             |FROM e GROUP BY CUBE(event_type, day) ORDER BY event_type, day""".stripMargin)),

    // explicit grouping sets (the general form cube/rollup sugar over)
    "events_grouping_sets" -> QueryDef(
      (s, d) => EventsOps.groupingSetsDaily(Tables.events(s, d)),
      Some("""WITH e AS (SELECT event_type, strftime(CAST(date_trunc('day', ts) AS TIMESTAMP), '%Y-%m-%d') AS day, value FROM events)
             |SELECT coalesce(event_type, 'ALL') AS event_type, coalesce(day, 'ALL') AS day,
             |  count(*) AS n, round(sum(value), 4) AS sum_value
             |FROM e GROUP BY GROUPING SETS ((event_type), (day), ())
             |ORDER BY event_type, day""".stripMargin)),

    // HLL++ sketch values are implementation-specific: rows-only check
    // 7-day moving average over the daily rollup — the window rides
    // the |types|x|days| aggregate, never the event stream
    "events_moving_avg" -> QueryDef(
      (s, d) => EventsOps.movingAvgDaily(Tables.events(s, d)),
      Some("""WITH daily AS (SELECT event_type,
             |    strftime(CAST(date_trunc('day', ts) AS TIMESTAMP), '%Y-%m-%d') AS day,
             |    count(*) AS n, round(sum(value), 4) AS sum_value
             |  FROM events GROUP BY 1, 2)
             |SELECT event_type, day, n, sum_value,
             |  round(avg(sum_value) OVER (PARTITION BY event_type ORDER BY day
             |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS ma7
             |FROM daily ORDER BY event_type, day""".stripMargin)),

    // approximate distinct users, re-expressed over the DETERMINISTIC
    // KMV sketch (was HLL / rows-only): same estimator class, but
    // reproducible bit-for-bit, so it is hash-gated like every other
    // row. The HLL form stays as EventsOps.approxDistinctUsers,
    // error-bounded against the exact count in EventsSpec.
    "events_approx_users" -> QueryDef(
      (s, d) => EventsOps.kmvDistinctUsers(Tables.events(s, d)),
      Some("""WITH h AS (SELECT DISTINCT event_type,
             |    (('0x' || substr(md5(user_id::VARCHAR), 1, 15))::UBIGINT)::DOUBLE AS h
             |  FROM events),
             |r AS (SELECT event_type, h,
             |        row_number() OVER (PARTITION BY event_type ORDER BY h) AS rnk
             |      FROM h),
             |t AS (SELECT event_type, max(h) AS theta, count(*) AS m
             |      FROM r WHERE rnk <= 64 GROUP BY event_type)
             |SELECT event_type,
             |  CAST(CASE WHEN m < 64 THEN m
             |       ELSE round(63.0 / (theta / 1152921504606846976.0)) END AS BIGINT) AS approx_users
             |FROM t ORDER BY event_type""".stripMargin)),

    // the deterministic sketch: KMV over md5 hashes — every bit
    // reproducible, so unlike HLL this sketch is hash-gated
    "events_kmv_sketch" -> QueryDef(
      (s, d) => EventsOps.kmvDistinctEvents(Tables.events(s, d)),
      Some("""WITH h AS (SELECT DISTINCT event_type,
             |    (('0x' || substr(md5(event_id::VARCHAR), 1, 15))::UBIGINT)::DOUBLE AS h
             |  FROM events),
             |r AS (SELECT event_type, h,
             |        row_number() OVER (PARTITION BY event_type ORDER BY h) AS rnk
             |      FROM h),
             |t AS (SELECT event_type, max(h) AS theta, count(*) AS m
             |      FROM r WHERE rnk <= 64 GROUP BY event_type)
             |SELECT event_type,
             |  CAST(CASE WHEN m < 64 THEN m
             |       ELSE round(63.0 / (theta / 1152921504606846976.0)) END AS BIGINT) AS est_events
             |FROM t ORDER BY event_type""".stripMargin)),

    // the SAME sketch through the custom TypedImperativeAggregate
    // (UDAF surface): one exchange instead of distinct + window; the
    // result is bit-identical, so the same hash-gate applies
    "events_kmv_udaf" -> QueryDef(
      (s, d) => EventsOps.kmvDistinctEventsAgg(Tables.events(s, d)),
      Some("""WITH h AS (SELECT DISTINCT event_type,
             |    (('0x' || substr(md5(event_id::VARCHAR), 1, 15))::UBIGINT)::DOUBLE AS h
             |  FROM events),
             |r AS (SELECT event_type, h,
             |        row_number() OVER (PARTITION BY event_type ORDER BY h) AS rnk
             |      FROM h),
             |t AS (SELECT event_type, max(h) AS theta, count(*) AS m
             |      FROM r WHERE rnk <= 64 GROUP BY event_type)
             |SELECT event_type,
             |  CAST(CASE WHEN m < 64 THEN m
             |       ELSE round(63.0 / (theta / 1152921504606846976.0)) END AS BIGINT) AS est_events
             |FROM t ORDER BY event_type""".stripMargin)),

    // z-score outliers: |event types|-row moment table broadcast,
    // scoring row-local, filter on the ROUNDED z both sides
    "events_zscore" -> QueryDef(
      (s, d) => EventsOps.zscoreOutliers(Tables.events(s, d)),
      Some(s"""WITH s AS (SELECT event_type, avg(value) AS mean_v, stddev_samp(value) AS sd_v
             |          FROM events GROUP BY event_type),
             |z AS (SELECT event_id, e.event_type, value,
             |        round((value - mean_v) / sd_v, 4) AS z
             |      FROM events e JOIN s USING (event_type))
             |SELECT event_id, event_type, round(value, 4) AS value, z
             |FROM z WHERE abs(z) > ${EventsOps.ZscoreThreshold} ORDER BY event_id""".stripMargin)),

    // first-order Markov transitions per user sequence: one user_id
    // window exchange + a |types|^2-bounded aggregate
    "user_transitions" -> QueryDef(
      (s, d) => EventsOps.userTransitions(Tables.events(s, d)),
      Some("""WITH e AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms FROM events),
             |t AS (SELECT event_type AS from_type,
             |        lead(event_type) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS to_type
             |      FROM e)
             |SELECT from_type, to_type, count(*) AS n FROM t WHERE to_type IS NOT NULL
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ordered conversion funnel: stage-k events must follow the
    // user's first stage-(k-1) conversion
    "event_funnel" -> QueryDef(
      (s, d) => EventsOps.funnel(Tables.events(s, d)),
      Some("""WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
             |v AS (SELECT user_id, min(ms) AS v_ms FROM e WHERE event_type = 'view' GROUP BY user_id),
             |c AS (SELECT e.user_id, min(ms) AS c_ms FROM e JOIN v USING (user_id)
             |      WHERE event_type = 'click' AND ms >= v_ms GROUP BY e.user_id),
             |p AS (SELECT e.user_id, min(ms) AS p_ms FROM e JOIN c USING (user_id)
             |      WHERE event_type = 'purchase' AND ms >= c_ms GROUP BY e.user_id)
             |SELECT (SELECT count(*) FROM v) AS n_view,
             |       (SELECT count(*) FROM c) AS n_view_click,
             |       (SELECT count(*) FROM p) AS n_full_funnel""".stripMargin)),

    // cohort = first active day; (user, day) deduped before any
    // counting so no count-distinct runs downstream
    "cohort_retention" -> QueryDef(
      (s, d) => EventsOps.cohortRetention(Tables.events(s, d)),
      Some("""WITH d AS (SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events),
             |f AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY user_id)
             |SELECT cohort_day, CAST(day - cohort_day AS BIGINT) AS offset_days, count(*) AS n_users
             |FROM d JOIN f USING (user_id)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    "events_topusers" -> QueryDef(
      (s, d) => EventsOps.topUsers(Tables.events(s, d)),
      Some("""SELECT user_id, round(sum(value), 4) AS total_value, count(*) AS n_purchases
             |FROM events WHERE event_type = 'purchase'
             |GROUP BY user_id ORDER BY total_value DESC, user_id LIMIT 10""".stripMargin)),

    "events_distinct_users" -> QueryDef(
      (s, d) => EventsOps.distinctUsersSalted(Tables.events(s, d)),
      Some("""SELECT event_type, count(DISTINCT user_id) AS n_users
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // the reference's coded-shuffle research metric, simulated with
    // the *intended* (bug-fixed) semantics. Round-10: the rank-zip
    // pairing policy (a maximum matching on the per-encoder class
    // path L1—R1—L2—R2, see CodedShuffleSim) makes every counter a
    // closed form over cross-engine md5 topology hashes, so the row
    // is fully hash-gated — no more rows-only entries in the registry
    "coded_shuffle_sim" -> QueryDef(
      (s, d) => graft.plans.CodedShuffleSim.asDataFrame(Tables.documents(s, d)),
      Some(s"""WITH tok AS (SELECT source, unnest($toksSql) AS word FROM documents),
              |sw AS (SELECT source, word, count(*) AS cnt FROM tok GROUP BY source, word),
              |pw AS (SELECT CAST(('0x' || substr(md5(source),1,15))::UBIGINT % 4294967291 % 3 AS BIGINT) AS p,
              |         word FROM sw),
              |pt AS (SELECT p, word,
              |         CAST(('0x' || substr(md5(word),1,15))::UBIGINT % 4294967291 % 3 AS BIGINT) AS tgt,
              |         CASE WHEN ('0x' || substr(md5(word),1,15))::UBIGINT % 4294967291 % 2 = 0
              |              THEN p ELSE (p+1)%3 END AS enc
              |       FROM (SELECT p, word FROM pw GROUP BY p, word)),
              |cc AS (SELECT enc,
              |         count(*) FILTER (WHERE p=(enc+2)%3 AND tgt=enc)       AS l1,
              |         count(*) FILTER (WHERE p=(enc+2)%3 AND tgt=(enc+1)%3) AS l2,
              |         count(*) FILTER (WHERE p=enc       AND tgt=(enc+2)%3) AS r1,
              |         count(*) FILTER (WHERE p=enc       AND tgt=enc)       AS r2
              |       FROM pt GROUP BY enc),
              |x AS (SELECT enc, least(l2, r2) AS x22,
              |        least(l2 - least(l2, r2), r1) AS x21,
              |        least(l1, r1 - least(l2 - least(l2, r2), r1)) AS x11 FROM cc),
              |tot AS (SELECT coalesce(sum(x22 + x21 + x11), 0) AS encoded FROM x),
              |nv AS (SELECT count(*) AS naive FROM pt)
              |SELECT CAST(naive AS BIGINT) AS naive_packets,
              |       CAST(naive - encoded AS BIGINT) AS packets_sent,
              |       CAST(encoded AS BIGINT) AS encoded_packets,
              |       floor(CAST(naive - encoded AS DOUBLE) / naive * 10000 + 0.5) / 10000 AS load_ratio,
              |       TRUE AS decoded_ok
              |FROM nv, tot""".stripMargin)),

    // ----- multimodal --------------------------------------------------
    // NOTE: the oracles mirror the pixel math with character functions
    // (ascii / per-char codepoint sum), which is equivalent only for
    // ASCII text — verified true for all fixtures; a non-ASCII corpus
    // would need a byte-level oracle.
    //
    // The image stages ride a GENUINE container round trip: text bytes
    // become grayscale pixels of a real BMP (file+info headers, 8-bit
    // palette or 24-bit BGR per doc_id, rows stored BOTTOM-UP and
    // padded to 4-byte stride — widths 17/23/29/35 keep the pad rule
    // always live) and every feature is parsed back out of those bytes
    // by BmpCodec. The oracle predicts the features from the source
    // text and the doc_id-derived geometry, so a decoder that misreads
    // stride, vertical flip, or palette reds the row. Grayscale
    // payload pixels make luma == source byte at both depths.

    // resize: decode the pixel grid, then nearest-neighbor keep of
    // every 2nd row and column (top-down reading order)
    "multimodal_resize" -> QueryDef(
      (s, d) => MultimodalOps.resize(Tables.documents(s, d)),
      Some("""WITH p AS (SELECT doc_id, text, 17 + (doc_id % 4) * 6 AS w,
             |    octet_length(CAST(text AS BLOB)) AS len FROM documents),
             |d AS (SELECT doc_id, text, w, len, (len + w - 1) // w AS h FROM p),
             |r AS (SELECT doc_id, w, len, text, unnest(generate_series(0, h - 1, 2)) AS rw
             |      FROM d WHERE h > 0),
             |c AS (SELECT doc_id, len, text, rw, w, unnest(generate_series(0, w - 1, 2)) AS cl
             |      FROM r),
             |v AS (SELECT doc_id, CASE WHEN rw * w + cl < len
             |        THEN ascii(substring(text, rw * w + cl + 1, 1)) ELSE 0 END AS px
             |      FROM c),
             |s AS (SELECT doc_id, count(*) AS kept, sum(px) AS sm FROM v GROUP BY doc_id)
             |SELECT d.doc_id,
             |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
             |  CAST((w + 1) // 2 AS BIGINT) AS new_w,
             |  CAST((h + 1) // 2 AS BIGINT) AS new_h,
             |  CAST(coalesce(kept, 0) AS BIGINT) AS kept_px,
             |  CAST(coalesce(sm, 0) % 65521 AS BIGINT) AS resized_checksum
             |FROM d LEFT JOIN s USING (doc_id) ORDER BY d.doc_id""".stripMargin)),

    // band sampling: decode the pixel grid, split into 8-row top-down
    // bands, keep every 2nd band; band sums include zero pad pixels
    "multimodal_frame_sample" -> QueryDef(
      (s, d) => MultimodalOps.frameSample(Tables.documents(s, d)),
      Some {
        val B = MultimodalOps.BandRows
        val E = MultimodalOps.BandEvery
        s"""WITH p AS (SELECT doc_id, text, 17 + (doc_id % 4) * 6 AS w,
           |    octet_length(CAST(text AS BLOB)) AS len FROM documents),
           |d AS (SELECT doc_id, text, w, len, (len + w - 1) // w AS h FROM p),
           |b AS (SELECT doc_id, w, h, text,
           |    unnest(generate_series(0, (h + $B - 1) // $B - 1)) AS band
           |  FROM d WHERE h > 0),
           |k AS (SELECT doc_id, band, least($B, h - band * $B) AS n_rows,
           |    substring(text, band * $B * w + 1, least($B, h - band * $B) * w) AS chunk
           |  FROM b WHERE band % $E = 0)
           |SELECT doc_id, CAST(band AS BIGINT) AS band_idx,
           |  CAST(n_rows AS BIGINT) AS n_rows,
           |  CAST(coalesce(list_sum(list_transform(string_split(chunk, ''),
           |    c -> ascii(c))), 0) % 65521 AS BIGINT) AS band_sum
           |FROM k ORDER BY doc_id, band_idx""".stripMargin
      }),

    // image quarantine: deterministically corrupted containers
    // (doc_id % 3 = 2, flipped 'BM' magic) become quarantined rows,
    // never job failures; the rest decode to their pixel count
    "multimodal_bmp_quarantine" -> QueryDef(
      (s, d) => MultimodalOps.bmpQuarantine(Tables.documents(s, d)),
      Some("""WITH p AS (SELECT doc_id, text, 17 + (doc_id % 4) * 6 AS w,
             |    octet_length(CAST(text AS BLOB)) AS len FROM documents)
             |SELECT doc_id,
             |  CAST(CASE WHEN doc_id % 3 = 2 THEN 0 ELSE 1 END AS BIGINT) AS decoded_ok,
             |  CAST(CASE WHEN doc_id % 3 = 2 THEN -1
             |    ELSE w * ((len + w - 1) // w) END AS BIGINT) AS n_pixels,
             |  CASE WHEN doc_id % 3 = 2 THEN 'rejected' ELSE '' END AS err_class
             |FROM p ORDER BY doc_id""".stripMargin)),

    // the GENUINE binary decode: text bytes → real RIFF/WAVE container
    // (fmt + odd-sized LIST + PCM16 data chunks) → features parsed
    // back out of the actual bytes by WavCodec.decode's chunk walker.
    // The oracle predicts each feature from the source text and the
    // doc_id-derived encoding parameters, so any header-parse error
    // (LE field order, pad-byte rule, block-align math) reds the row.
    // sample = (byte - 128) * 256; frames zero-pad to a channel
    // multiple; char==byte holds on the ASCII fixture
    "multimodal_wav_decode" -> QueryDef(
      (s, d) => MultimodalOps.wavFeatures(Tables.documents(s, d)),
      Some("""WITH p AS (SELECT doc_id, text,
             |    8000 + (doc_id % 3) * 4000 AS sample_rate,
             |    1 + doc_id % 2 AS n_channels,
             |    octet_length(CAST(text AS BLOB)) AS n_bytes
             |  FROM documents),
             |f AS (SELECT doc_id, text, sample_rate, n_channels,
             |    (n_bytes + n_channels - 1) // n_channels AS n_frames
             |  FROM p),
             |a AS (SELECT doc_id,
             |    coalesce(list_max(list_transform(string_split(text, ''),
             |      c -> abs((ascii(c) - 128) * 256))), 0) AS peak_amp,
             |    coalesce(list_sum(list_transform(string_split(text, ''),
             |      c -> abs((ascii(c) - 128) * 256))), 0) AS sum_abs
             |  FROM f WHERE length(text) > 0)
             |SELECT f.doc_id,
             |  CAST(sample_rate AS BIGINT) AS sample_rate,
             |  CAST(n_channels AS BIGINT) AS n_channels,
             |  CAST(16 AS BIGINT) AS bits_per_sample,
             |  CAST(n_frames AS BIGINT) AS n_frames,
             |  CAST(n_frames * 1000 // sample_rate AS BIGINT) AS duration_ms,
             |  CAST(coalesce(peak_amp, 0) AS BIGINT) AS peak_amp,
             |  CAST(CASE WHEN n_frames > 0
             |    THEN coalesce(sum_abs, 0) // (n_frames * n_channels)
             |    ELSE 0 END AS BIGINT) AS mean_abs_amp
             |FROM f LEFT JOIN a ON f.doc_id = a.doc_id
             |ORDER BY f.doc_id""".stripMargin)),

    // segment-level decode of the same real WAV containers: per
    // 25-frame window, peak/mean |amplitude| from the parsed PCM.
    // Last window may be short; zero-pad samples (stereo frame
    // alignment) contribute 0 to sum and peak, and the mean divides
    // by frames*channels INCLUDING pads — mirrored exactly below
    "multimodal_wav_segments" -> QueryDef(
      (s, d) => MultimodalOps.wavSegments(Tables.documents(s, d)),
      Some {
        val F = MultimodalOps.WavSegFrames
        s"""WITH p AS (SELECT doc_id, text,
           |    1 + doc_id % 2 AS ch,
           |    octet_length(CAST(text AS BLOB)) AS len
           |  FROM documents),
           |f AS (SELECT doc_id, text, ch, len, (len + ch - 1) // ch AS n_frames
           |  FROM p),
           |s AS (SELECT doc_id, text, ch, n_frames,
           |    unnest(generate_series(0, (n_frames + $F - 1) // $F - 1)) AS seg_idx
           |  FROM f WHERE n_frames > 0),
           |seg AS (SELECT doc_id, seg_idx, ch,
           |    least($F, n_frames - seg_idx * $F) AS seg_frames,
           |    substring(text, seg_idx * $F * ch + 1,
           |              least($F, n_frames - seg_idx * $F) * ch) AS chunk
           |  FROM s),
           |a AS (SELECT doc_id, seg_idx, ch, seg_frames,
           |    list_transform(string_split(chunk, ''),
           |      c -> abs((ascii(c) - 128) * 256)) AS amps
           |  FROM seg)
           |SELECT doc_id, CAST(seg_idx AS BIGINT) AS seg_idx,
           |  CAST(seg_frames AS BIGINT) AS n_frames,
           |  CAST(coalesce(list_max(amps), 0) AS BIGINT) AS peak_amp,
           |  CAST(coalesce(list_sum(amps), 0) // (seg_frames * ch) AS BIGINT)
           |    AS mean_abs_amp
           |FROM a ORDER BY doc_id, seg_idx""".stripMargin
      }),

    // decode quarantine: deterministically corrupted containers (odd
    // doc_ids, flipped RIFF magic) become quarantined rows, never job
    // failures; even doc_ids decode to their frame count (mono: one
    // frame per byte, since corruption hits exactly the stereo docs)
    "multimodal_wav_quarantine" -> QueryDef(
      (s, d) => MultimodalOps.wavQuarantine(Tables.documents(s, d)),
      Some("""SELECT doc_id,
             |  CAST(CASE WHEN doc_id % 2 = 1 THEN 0 ELSE 1 END AS BIGINT) AS decoded_ok,
             |  CAST(CASE WHEN doc_id % 2 = 1 THEN -1
             |    ELSE octet_length(CAST(text AS BLOB)) END AS BIGINT) AS n_frames,
             |  CASE WHEN doc_id % 2 = 1 THEN 'rejected' ELSE '' END AS err_class
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // full-feature image decode: geometry + luma stats parsed out of
    // the real container; top_row_sum pins the bottom-up→top-down flip
    // (the top image row is the LAST stored row)
    // the COMPRESSED-image leg: features decoded through a real PNG
    // round trip (BE chunk framing, CRC-32 per chunk, full filter
    // suite, zlib inflate, split IDATs); the oracle recomputes every
    // feature from the source text and the doc_id-derived geometry
    "multimodal_png_features" -> QueryDef(
      (s, d) => MultimodalOps.pngFeatures(Tables.documents(s, d)),
      Some("""WITH p AS (SELECT doc_id, text, 19 + (doc_id % 4) * 8 AS w,
             |    CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 2 END AS colour,
             |    octet_length(CAST(text AS BLOB)) AS len FROM documents),
             |d AS (SELECT doc_id, text, w, colour, len, (len + w - 1) // w AS h FROM p),
             |a AS (SELECT doc_id,
             |    coalesce(list_max(list_transform(string_split(text, ''), c -> ascii(c))), 0) AS peak,
             |    coalesce(list_sum(list_transform(string_split(text, ''), c -> ascii(c))), 0) AS sm,
             |    coalesce(list_sum(list_transform(string_split(substring(text, 1, w), ''),
             |      c -> ascii(c))), 0) AS toprow
             |  FROM d WHERE len > 0)
             |SELECT d.doc_id,
             |  CAST(w AS BIGINT) AS width,
             |  CAST(h AS BIGINT) AS height,
             |  CAST(colour AS BIGINT) AS colour_type,
             |  CAST(w * h AS BIGINT) AS n_pixels,
             |  CAST(coalesce(peak, 0) AS BIGINT) AS peak_px,
             |  CAST(CASE WHEN h > 0 THEN coalesce(sm, 0) // (w * h) ELSE 0 END AS BIGINT) AS mean_px,
             |  CAST(coalesce(toprow, 0) AS BIGINT) AS top_row_sum
             |FROM d LEFT JOIN a USING (doc_id)
             |ORDER BY d.doc_id""".stripMargin)),

    // PNG quarantine: the corruption is INSIDE the compressed stream,
    // so only a decoder that verifies chunk CRCs rejects it — magic
    // checks can't see it, and skipping the check would decode
    // garbage pixels instead of quarantining the row
    "multimodal_png_quarantine" -> QueryDef(
      (s, d) => MultimodalOps.pngQuarantine(Tables.documents(s, d)),
      Some("""WITH p AS (SELECT doc_id, 19 + (doc_id % 4) * 8 AS w,
             |    octet_length(CAST(text AS BLOB)) AS len FROM documents)
             |SELECT doc_id,
             |  CAST(CASE WHEN doc_id % 3 = 2 THEN 0 ELSE 1 END AS BIGINT) AS decoded_ok,
             |  CAST(CASE WHEN doc_id % 3 = 2 THEN -1
             |       ELSE w * ((len + w - 1) // w) END AS BIGINT) AS n_pixels,
             |  CASE WHEN doc_id % 3 = 2 THEN 'rejected' ELSE '' END AS err_class
             |FROM p ORDER BY doc_id""".stripMargin)),

    // the VIDEO leg of the multimodal seam: text bytes split into
    // w×h grayscale frames of a real AVI container (nested RIFF
    // lists, avih/strh/strf headers, odd-length strn exercising the
    // pad rule, bottom-up stride-padded paletted DIB frames, idx1
    // index with movi-relative offsets) and the summary is parsed
    // back out of those bytes — geometry/timing from LE header
    // fields, frame count cross-checked against three declarations
    "multimodal_avi_decode" -> QueryDef(
      (s, d) => MultimodalOps.aviDecode(Tables.documents(s, d)),
      Some("""WITH p AS (SELECT doc_id,
             |    9 + (doc_id % 3) * 5 AS w, 6 + (doc_id % 4) * 3 AS h,
             |    10 + (doc_id % 3) * 5 AS fps,
             |    octet_length(CAST(text AS BLOB)) AS len FROM documents),
             |f AS (SELECT doc_id, w, h, fps,
             |    (len + w * h - 1) // (w * h) AS nf FROM p)
             |SELECT doc_id,
             |  CAST(w AS BIGINT) AS width,
             |  CAST(h AS BIGINT) AS height,
             |  CAST(fps AS BIGINT) AS fps,
             |  CAST(nf AS BIGINT) AS n_frames,
             |  CAST(nf * w * h AS BIGINT) AS total_px
             |FROM f ORDER BY doc_id""".stripMargin)),

    // video frame sampling over the SAME parsed containers: every
    // 3rd decoded frame reports its luma sum and peak; the lumas
    // come out of bottom-up stride-padded paletted DIB chunks, so a
    // skipped flip/stride/palette scrambles every statistic. The
    // last frame's zero padding is invisible to both sides (adds 0
    // to the sum, never raises the peak)
    "multimodal_avi_frames" -> QueryDef(
      (s, d) => MultimodalOps.aviFrames(Tables.documents(s, d)),
      Some {
        val E = MultimodalOps.FrameEvery
        s"""WITH p AS (SELECT doc_id, text,
           |    9 + (doc_id % 3) * 5 AS w, 6 + (doc_id % 4) * 3 AS h,
           |    octet_length(CAST(text AS BLOB)) AS len FROM documents),
           |f AS (SELECT doc_id, text, w * h AS fb,
           |    (len + w * h - 1) // (w * h) AS nf FROM p),
           |e AS (SELECT doc_id, fb, text,
           |    unnest(generate_series(0, nf - 1)) AS fi
           |  FROM f WHERE nf > 0),
           |k AS (SELECT doc_id, fi,
           |    substring(text, fi * fb + 1, fb) AS chunk
           |  FROM e WHERE fi % $E = 0)
           |SELECT doc_id, CAST(fi AS BIGINT) AS frame_idx,
           |  CAST(coalesce(list_sum(list_transform(string_split(chunk, ''),
           |    c -> ascii(c))), 0) % 65521 AS BIGINT) AS frame_sum,
           |  CAST(coalesce(list_max(list_transform(string_split(chunk, ''),
           |    c -> ascii(c))), 0) AS BIGINT) AS frame_peak
           |FROM k ORDER BY doc_id, frame_idx""".stripMargin
      }),

    // video quarantine: the corruption flips the MIDDLE frame's
    // chunk size field — invisible to magic sniffs, caught only by
    // the movi walk's structural checks (size overruns the list or
    // misses the declared frame size). A frameless container (empty
    // text) has nothing to corrupt and stays decodable
    "multimodal_avi_quarantine" -> QueryDef(
      (s, d) => MultimodalOps.aviQuarantine(Tables.documents(s, d)),
      Some("""WITH p AS (SELECT doc_id,
             |    9 + (doc_id % 3) * 5 AS w, 6 + (doc_id % 4) * 3 AS h,
             |    octet_length(CAST(text AS BLOB)) AS len FROM documents),
             |f AS (SELECT doc_id,
             |    (len + w * h - 1) // (w * h) AS nf FROM p),
             |v AS (SELECT doc_id, nf,
             |    (doc_id % 5 = 3 AND nf > 0) AS corrupt FROM f)
             |SELECT doc_id,
             |  CAST(CASE WHEN corrupt THEN 0 ELSE 1 END AS BIGINT) AS decoded_ok,
             |  CAST(CASE WHEN corrupt THEN -1 ELSE nf END AS BIGINT) AS n_frames,
             |  CASE WHEN corrupt THEN 'rejected' ELSE '' END AS err_class
             |FROM v ORDER BY doc_id""".stripMargin)),

    // perceptual image dedup: integer-DCT pHash over the genuinely
    // decoded BMP grid (8x8 block means -> T = C·P·Cᵀ with the
    // StrictMath-derived integer basis inlined below as literals ->
    // above-median AC bits), then the simhash chunk-bucket pairing
    // (8x8-bit chunks, pigeonhole recall 1 at hamming <= 6) with the
    // popcount verify ahead of the pair distinct
    "image_phash_dup" -> QueryDef(
      (s, d) => MultimodalOps.imagePhashDup(Tables.documents(s, d)),
      Some {
        val coefRows = (for (k <- 0 until 8; n <- 0 until 8)
          yield s"($k, $n, ${MultimodalOps.PhashDct(k)(n)})").mkString(", ")
        val hm = MultimodalOps.PhashMaxHamming
        val cap = MultimodalOps.PhashMaxBucket
        s"""WITH prm AS (SELECT doc_id, text, 17 + (doc_id % 4) * 6 AS w,
           |    octet_length(CAST(text AS BLOB)) AS len FROM documents),
           |el AS (SELECT doc_id, text, w, len, (len + w - 1) // w AS h
           |  FROM prm WHERE len >= 7 * w + 1),
           |pr AS (SELECT doc_id, w, h, len, text,
           |    unnest(generate_series(0, h - 1)) AS r FROM el),
           |pc AS (SELECT doc_id, w, h, r, len, text,
           |    unnest(generate_series(0, w - 1)) AS c FROM pr),
           |cells AS (SELECT doc_id, (r * 8) // h AS i, (c * 8) // w AS j,
           |    CASE WHEN r * w + c < len
           |      THEN ascii(substring(text, r * w + c + 1, 1)) ELSE 0 END AS v
           |  FROM pc),
           |cm AS MATERIALIZED (SELECT doc_id, i, j,
           |    CAST(sum(v) AS BIGINT) // count(*) AS p
           |  FROM cells GROUP BY doc_id, i, j),
           |coef AS (SELECT * FROM (VALUES $coefRows) t(k, n, c)),
           |tt AS MATERIALIZED (SELECT m.doc_id, cu.k AS u, cv.k AS v,
           |    CAST(sum(cu.c * cv.c * m.p) AS BIGINT) AS t
           |  FROM cm m JOIN coef cu ON cu.n = m.i JOIN coef cv ON cv.n = m.j
           |  GROUP BY m.doc_id, cu.k, cv.k),
           |md AS (SELECT doc_id, median(t) AS med FROM tt
           |  WHERE NOT (u = 0 AND v = 0) GROUP BY doc_id),
           |hs AS MATERIALIZED (SELECT tt.doc_id,
           |    CAST(sum(CASE WHEN NOT (u = 0 AND v = 0) AND t > med
           |      THEN 1::BIGINT << (u * 8 + v - 1) ELSE 0 END) AS BIGINT) AS ph
           |  FROM tt JOIN md ON tt.doc_id = md.doc_id GROUP BY tt.doc_id),
           |ckd AS MATERIALIZED (SELECT doc_id, ph,
           |    q::VARCHAR || ':' || ((ph >> (q * 8)) & 255)::VARCHAR AS ck
           |  FROM hs, (SELECT unnest(generate_series(0, ${MultimodalOps.PhashChunks - 1})) AS q) qs),
           |bounded AS (SELECT doc_id, ph, ck FROM (
           |    SELECT doc_id, ph, ck, count(*) OVER (PARTITION BY ck) AS bn FROM ckd)
           |  WHERE bn <= $cap),
           |pairs AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
           |    CAST(bit_count(xor(a.ph, b.ph)) AS BIGINT) AS hamming
           |  FROM bounded a JOIN bounded b ON a.ck = b.ck AND a.doc_id < b.doc_id
           |  WHERE bit_count(xor(a.ph, b.ph)) <= $hm)
           |SELECT a_id, b_id, hamming FROM pairs ORDER BY a_id, b_id""".stripMargin
      }),

    "multimodal_features" -> QueryDef(
      (s, d) => MultimodalOps.imageFeatures(Tables.documents(s, d)),
      Some("""WITH p AS (SELECT doc_id, text, 17 + (doc_id % 4) * 6 AS w,
             |    CASE WHEN doc_id % 2 = 0 THEN 8 ELSE 24 END AS bits,
             |    octet_length(CAST(text AS BLOB)) AS len FROM documents),
             |d AS (SELECT doc_id, text, w, bits, len, (len + w - 1) // w AS h FROM p),
             |a AS (SELECT doc_id,
             |    coalesce(list_max(list_transform(string_split(text, ''), c -> ascii(c))), 0) AS peak,
             |    coalesce(list_sum(list_transform(string_split(text, ''), c -> ascii(c))), 0) AS sm,
             |    coalesce(list_sum(list_transform(string_split(substring(text, 1, w), ''),
             |      c -> ascii(c))), 0) AS toprow
             |  FROM d WHERE len > 0)
             |SELECT d.doc_id,
             |  CAST(w AS BIGINT) AS width,
             |  CAST(h AS BIGINT) AS height,
             |  CAST(bits AS BIGINT) AS bits_per_pixel,
             |  CAST(w * h AS BIGINT) AS n_pixels,
             |  CAST(coalesce(peak, 0) AS BIGINT) AS peak_px,
             |  CAST(CASE WHEN h > 0 THEN coalesce(sm, 0) // (w * h) ELSE 0 END AS BIGINT) AS mean_px,
             |  CAST(coalesce(toprow, 0) AS BIGINT) AS top_row_sum
             |FROM d LEFT JOIN a USING (doc_id)
             |ORDER BY d.doc_id""".stripMargin)),

    // ----- Spark-4 SQL-engine surfaces (round 13) --------------------
    // WITH RECURSIVE through the SQL layer — shared text, both
    // engines execute it verbatim. Linear calendar recursion (one row
    // per step) + pushed-down quarter of orders.
    "sql_recursive_series" -> QueryDef(
      (s, d) => { Catalog.registerViews(s, d); s.sql(recursiveSeriesSql) },
      Some(recursiveSeriesSql)),

    // log-bounded tree roll-up. The default 1M-row recursion guard is
    // raised because the working set is |customer| x log2(max key)
    // rows BY CONSTRUCTION (each step strictly shrinks: rows retire
    // at node <= 1) — ~31M rows at the 100x gate, not unbounded.
    "sql_recursive_chain" -> QueryDef(
      (s, d) => {
        Catalog.registerViews(s, d)
        // Raise the recursion row guard for THIS query only: the limit
        // is read at physical planning (first action), so the plan must
        // be forced (eager localCheckpoint) before the previous value is
        // restored — otherwise every later query on the shared session
        // would run with a 200x weakened recursion guard.
        val key = "spark.sql.cteRecursionRowLimit"
        val prev = s.conf.getOption(key)
        s.conf.set(key, "200000000")
        try s.sql(recursiveChainSql).localCheckpoint(true)
        finally prev match {
          case Some(v) => s.conf.set(key, v)
          case None    => s.conf.unset(key)
        }
      },
      Some(recursiveChainSql)),

    // SQL scalar UDFs (CREATE TEMPORARY FUNCTION ... RETURN expr),
    // including a UDF-calls-UDF body: both are parse-time inlined by
    // Spark, so the aggregate runs the same whole-stage-codegen'd
    // arithmetic as hand-inlined q1 — the oracle states that by
    // textually inlining the bodies (left-associative, same op order).
    "sql_udf_pricing" -> QueryDef(
      (s, d) => {
        Catalog.registerViews(s, d)
        s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_disc_rev(p DOUBLE, d DOUBLE)
                |RETURNS DOUBLE RETURN p * (1.0 - d)""".stripMargin)
        s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_charge(p DOUBLE, d DOUBLE, t DOUBLE)
                |RETURNS DOUBLE RETURN graft_disc_rev(p, d) * (1.0 + t)""".stripMargin)
        s.sql(sqlUdfSelect
          .replace("%DISC%", "graft_disc_rev(l_extendedprice, l_discount)")
          .replace("%CHARGE%", "graft_charge(l_extendedprice, l_discount, l_tax)"))
      },
      Some(sqlUdfSelect
        .replace("%DISC%", "l_extendedprice * (1.0 - l_discount)")
        .replace("%CHARGE%", "(l_extendedprice * (1.0 - l_discount)) * (1.0 + l_tax)"))),

    // SQL TABLE function (UDTF): per-brand top-3 by retail price,
    // invoked directly with literal arguments. Deliberately NOT the
    // LATERAL form: Spark 4.1.2 mis-decorrelates a LIMIT inside a SQL
    // UDTF under LATERAL (the limit is applied globally, returning
    // the first rows of the table joined to their own correlation
    // key — reproduced on this dataset), while direct invocation
    // plans the ordinary TopK-per-call and matches the oracle.
    "sql_udtf_brand_top" -> QueryDef(
      (s, d) => {
        Catalog.registerViews(s, d)
        s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_brand_top(b STRING)
                |RETURNS TABLE (pk BIGINT, price DOUBLE)
                |RETURN SELECT p_partkey, p_retailprice FROM part
                |       WHERE p_brand = b
                |       ORDER BY p_retailprice DESC, p_partkey LIMIT 3""".stripMargin)
        s.sql("""SELECT 'Brand#11' AS brand, pk, price FROM graft_brand_top('Brand#11')
                |UNION ALL
                |SELECT 'Brand#22' AS brand, pk, price FROM graft_brand_top('Brand#22')
                |UNION ALL
                |SELECT 'Brand#33' AS brand, pk, price FROM graft_brand_top('Brand#33')
                |ORDER BY brand, price DESC, pk""".stripMargin)
      },
      Some("""SELECT brand, pk, price FROM (
             |  SELECT 'Brand#11' AS brand, p_partkey AS pk, p_retailprice AS price
             |  FROM part WHERE p_brand = 'Brand#11'
             |  ORDER BY p_retailprice DESC, p_partkey LIMIT 3)
             |UNION ALL
             |SELECT brand, pk, price FROM (
             |  SELECT 'Brand#22' AS brand, p_partkey AS pk, p_retailprice AS price
             |  FROM part WHERE p_brand = 'Brand#22'
             |  ORDER BY p_retailprice DESC, p_partkey LIMIT 3)
             |UNION ALL
             |SELECT brand, pk, price FROM (
             |  SELECT 'Brand#33' AS brand, p_partkey AS pk, p_retailprice AS price
             |  FROM part WHERE p_brand = 'Brand#33'
             |  ORDER BY p_retailprice DESC, p_partkey LIMIT 3)
             |ORDER BY brand, price DESC, pk""".stripMargin)),

    // VARIANT semi-structured path (parse_json -> variant_get): the
    // oracle reproduces the semantics relationally (regex extraction
    // + typed columns); n_absent pins try_variant_get's missing-path
    // -> NULL contract (no per-row error), constant 0 on this corpus.
    "events_variant" -> QueryDef(
      (s, d) => EventsOps.variantProps(Tables.events(s, d)),
      Some("""SELECT event_type, count(*) AS n,
             |  CAST(sum(CAST(regexp_extract(props, '"k"\s*:\s*([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
             |  max(user_id) AS max_u,
             |  round(sum(value * 2), 4) AS sum_x2,
             |  CAST(0 AS BIGINT) AS n_absent
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // CDC changelog apply (lakehouse upsert/delete): snapshot +
    // sequenced I/U/D ops -> post-apply table; latest-op-per-key via
    // one keyed window, apply via one full-outer join on the key
    "cdc_apply" -> QueryDef(
      (s, d) => RelationalOps.cdcApply(Tables.orders(s, d)),
      Some(cdcApplySql)),

    // the same apply, but the changelog arrives as a checkpointed
    // micro-batch stream folding into versioned keyed state — with
    // the higher-sequenced wave delivered FIRST, so the seq guard
    // (not batch order) decides every double-updated key. One oracle
    // text gates both paths: streamed state == one-batch apply.
    "streamed_cdc_apply" -> QueryDef(
      (s, d) => {
        val root = graft.streaming.EventStreams.streamedCdcLayout(s, d)
        val stateRoot = s"$root/state"
        val v = graft.streaming.EventStreams.latestCdcVersion(stateRoot)
        s.read.parquet(s"$stateRoot/v$v")
          .where(col("src") =!= "del")
          .select(col("key").as("o_orderkey"), col("price"), col("src"))
          .orderBy("o_orderkey")
      },
      Some(cdcApplySql)),

    // state GC between folds: fold wave 1, COMPACT tombstones at the
    // wave-1 sequence horizon, fold wave 2 — the same oracle text
    // proves compaction is invisible to later folds and readers
    "cdc_apply_compacted" -> QueryDef(
      (s, d) => RelationalOps.cdcApplyCompacted(Tables.orders(s, d)),
      Some(cdcApplySql)),

    // TIME TRAVEL on the version chain — the reason truncation is
    // opt-in: v1 is the state after the FIRST delivered micro-batch,
    // which the layout forces to be the file holding every op with
    // seq >= CdcSeqOffset (explicit mtimes, maxFilesPerTrigger=1), so
    // the as-of oracle replays exactly that SUBSET of the changelog —
    // an oracle no full-changelog replay can match by accident. At
    // the driver SFs the subset is only the double-update arm; at the
    // 10x/skew fixtures shifted order keys exceed the offset, pulling
    // shifted-copy primary I/U/D ops into the same file — the oracle
    // derives the subset from the seq split itself, never from which
    // arms it "should" contain (the r14 10x gate caught the
    // arm-enumerating version of this text).
    "streamed_cdc_asof" -> QueryDef(
      (s, d) => {
        val root = graft.streaming.EventStreams.streamedCdcLayout(s, d)
        s.read.parquet(s"$root/state/v1")
          .where(col("src") =!= "del")
          .select(col("key").as("o_orderkey"), col("price"), col("src"))
          .orderBy("o_orderkey")
      },
      Some {
        val off = RelationalOps.CdcSeqOffset
        s"""WITH snap AS (SELECT o_orderkey AS key, o_totalprice AS price
           |  FROM orders WHERE o_orderkey % 10 <> 7),
           |gen AS (SELECT o_orderkey AS k, o_totalprice AS p
           |  FROM orders WHERE o_orderkey % 10 = 7),
           |ops AS (
           |  SELECT 'D' AS op, k - 1 AS key, CAST(NULL AS DOUBLE) AS new_price, k AS seq
           |  FROM gen WHERE k % 3 = 0
           |  UNION ALL
           |  SELECT 'U', k - 1, round(p + 10.0, 2), k FROM gen WHERE k % 3 = 1
           |  UNION ALL
           |  SELECT 'I', k, p, k FROM gen WHERE k % 3 = 2
           |  UNION ALL
           |  SELECT 'U', k - 1, round(p + 20.0, 2), k + $off FROM gen WHERE k % 60 = 7),
           |w2 AS (SELECT * FROM ops WHERE seq >= $off),
           |latest AS (SELECT op, key, new_price FROM (
           |  SELECT *, row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
           |  FROM w2) WHERE rn = 1),
           |m AS (SELECT coalesce(s.key, l.key) AS o_orderkey,
           |    CASE WHEN l.key IS NOT NULL THEN l.new_price ELSE s.price END AS price,
           |    CASE WHEN l.key IS NOT NULL THEN 'cdc' ELSE 'snap' END AS src,
           |    l.op AS op
           |  FROM snap s FULL OUTER JOIN latest l ON s.key = l.key)
           |SELECT o_orderkey, price, src FROM m WHERE op IS NULL OR op <> 'D'
           |ORDER BY o_orderkey""".stripMargin
      }),

    // state GC on the streamed chain: the version chain truncated to
    // ONE compacted tombstone-free version; reading it matches the
    // same oracle as the live chain — compaction == history, proven
    "streamed_cdc_compacted" -> QueryDef(
      (s, d) => {
        val root = graft.streaming.EventStreams.streamedCdcCompactedLayout(s, d)
        val stateRoot = s"$root/state"
        val v = graft.streaming.EventStreams.latestCdcVersion(stateRoot)
        s.read.parquet(s"$stateRoot/v$v")
          .where(col("src") =!= "del")
          .select(col("key").as("o_orderkey"), col("price"), col("src"))
          .orderBy("o_orderkey")
      },
      Some(cdcApplySql)),

    // incremental MV maintenance: persisted even-half daily rollup +
    // odd-half batch, merged as partials; oracle = full recompute
    // over ALL events, so a stale/double-applied MV reds the gate
    "incremental_daily_counts" -> QueryDef(
      (s, d) => EventsOps.incrementalDailyCounts(s, d),
      Some("""SELECT event_type,
             |  strftime(CAST(date_trunc('day', ts) AS TIMESTAMP), '%Y-%m-%d') AS day,
             |  count(*) AS n,
             |  round(CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) / 100.0, 2) AS sum_value
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // null-safe equality join (<=>): NULL keys match each other —
    // the semantics plain = can never express (its NULL comparisons
    // drop rows). Keys are nulled deterministically; the oracle is
    // IS NOT DISTINCT FROM. The null bucket is a genuine skew key at
    // scale — counted here so a silent null-dropping regression or a
    // null-key explosion both move the gated numbers.
    "join_null_safe" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.functions.{coalesce, count, when => swhen}
        val o = Tables.orders(s, d)
        val a = o.where(col("o_orderkey") % 4 === 0)
          .select(swhen(col("o_orderkey") % 20 === 0, lit(null))
            .otherwise(col("o_custkey") % 50).as("ka"))
        val b = o.where(col("o_orderkey") % 4 === 2)
          .select(swhen(col("o_orderkey") % 20 === 2, lit(null))
            .otherwise(col("o_custkey") % 50).as("kb"))
        a.join(b, col("ka") <=> col("kb"))
          .groupBy(coalesce(col("ka"), lit(-1L)).as("k"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy("k")
      },
      Some("""WITH a AS (SELECT CASE WHEN o_orderkey % 20 = 0 THEN NULL
             |    ELSE o_custkey % 50 END AS ka
             |  FROM orders WHERE o_orderkey % 4 = 0),
             |b AS (SELECT CASE WHEN o_orderkey % 20 = 2 THEN NULL
             |    ELSE o_custkey % 50 END AS kb
             |  FROM orders WHERE o_orderkey % 4 = 2)
             |SELECT coalesce(ka, -1) AS k, count(*) AS n_pairs
             |FROM a JOIN b ON ka IS NOT DISTINCT FROM kb
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // EXECUTE IMMEDIATE over a statement held in a session variable —
    // completes the SQL-scripting triad (parameter markers, session
    // variables, dynamic execution)
    "sql_execute_immediate" -> QueryDef(
      (s, d) => {
        Catalog.registerViews(s, d)
        s.sql("DECLARE OR REPLACE VARIABLE graft_stmt STRING")
        s.sql("""SET VAR graft_stmt =
                |  'SELECT p_brand, count(*) AS n, CAST(max(p_size) AS BIGINT) AS max_size
                |   FROM part WHERE p_size >= 40 GROUP BY p_brand ORDER BY p_brand'""".stripMargin)
        s.sql("EXECUTE IMMEDIATE graft_stmt")
      },
      Some("""SELECT p_brand, count(*) AS n, CAST(max(p_size) AS BIGINT) AS max_size
             |FROM part WHERE p_size >= 40 GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    // dynamic partition overwrite: one day restated in place; the
    // oracle checks BOTH directions (delta on the restated day,
    // byte-identity everywhere else), so a static-mode truncation or
    // a double restatement reds the gate
    "dynamic_overwrite_daily" -> QueryDef(
      (s, d) => graft.sources.Partitioning.eventsRestatedDaily(s, d),
      Some {
        val day = graft.sources.Partitioning.RestateDay
        val delta = graft.sources.Partitioning.RestateDelta
        s"""WITH e AS (SELECT strftime(CAST(date_trunc('day', ts) AS TIMESTAMP), '%Y-%m-%d') AS day, value FROM events),
           |r AS (SELECT day, CASE WHEN day = '$day' THEN value + $delta ELSE value END AS value FROM e)
           |SELECT day, count(*) AS n,
           |  round(CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) / 100.0, 2) AS sum_value
           |FROM r GROUP BY day ORDER BY day""".stripMargin
      }),

    // mergeSchema over two file generations (additive column +
    // partition column): old files null-fill the new column; the
    // oracle re-derives generation membership from key parity
    "schema_evolution_scan" -> QueryDef(
      (s, d) => graft.sources.Partitioning.schemaEvolutionScan(s, d),
      Some("""WITH t AS (SELECT o_orderkey, o_totalprice,
             |    CASE WHEN o_orderkey % 2 = 1 THEN o_orderstatus END AS status_raw,
             |    CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 2 END AS gen FROM orders)
             |SELECT CAST(gen AS BIGINT) AS gen,
             |  coalesce(status_raw, 'LEGACY') AS status, count(*) AS n,
             |  round(CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) / 100.0, 2) AS revenue
             |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // typed Aggregator UDAF (the public custom-aggregate API, next
    // to the sketches' TypedImperativeAggregate): geometric mean in
    // log space, constant two-double buffer, partial-agg mergeable
    "events_geomean_udaf" -> QueryDef(
      (s, d) => {
        graft.functions.AggregatorFunctions.register(s)
        EventsOps.geoMeanByType(Tables.events(s, d))
      },
      Some("""SELECT event_type, count(*) AS n,
             |  round(exp(avg(ln(value))), 4) AS geomean
             |FROM events WHERE value > 0
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // EWMA: seed-at-first-observation exponential smoothing as a
    // LEFT FOLD over an ordered window collect_list (recurrences
    // aren't window sums); list size capped by the calendar, both
    // engines fold the identical sequence -> bit-equal doubles.
    // DuckDB list_reduce's first-element-accumulator convention IS
    // the EWMA seed.
    "events_ewma" -> QueryDef(
      (s, d) => EventsOps.ewmaDaily(Tables.events(s, d)),
      Some("""WITH daily AS (SELECT event_type,
             |    strftime(CAST(date_trunc('day', ts) AS TIMESTAMP), '%Y-%m-%d') AS day,
             |    CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS x
             |  FROM events GROUP BY 1, 2),
             |l AS (SELECT event_type, day, x,
             |    list(x) OVER (PARTITION BY event_type ORDER BY day
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS xs
             |  FROM daily)
             |SELECT event_type, day, round(x, 2) AS sum_value,
             |  round(list_reduce(xs, (acc, v) -> acc * 0.75 + v * 0.25), 4) AS ewma
             |FROM l ORDER BY event_type, day""".stripMargin)),

    // Holt level+trend double-exponential smoothing: the recurrence
    // replayed as a recursive CTE over the per-type day index (NOT
    // list_reduce — DuckDB's struct accumulator updates fields
    // sequentially, so the trend expression would read the
    // already-overwritten level; measured, documented in EventsOps)
    "events_holt_trend" -> QueryDef(
      (s, d) => EventsOps.holtDaily(Tables.events(s, d)),
      Some("""WITH RECURSIVE daily AS (SELECT event_type,
             |    strftime(CAST(date_trunc('day', ts) AS TIMESTAMP), '%Y-%m-%d') AS day,
             |    CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS x
             |  FROM events GROUP BY 1, 2),
             |seq AS MATERIALIZED (SELECT event_type, day, x,
             |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS i
             |  FROM daily),
             |rec AS (
             |  SELECT event_type, day, x, i, x AS l, 0.0::DOUBLE AS b
             |  FROM seq WHERE i = 1
             |  UNION ALL
             |  SELECT s.event_type, s.day, s.x, s.i,
             |    s.x * 0.5 + (r.l + r.b) * 0.5 AS l,
             |    (s.x * 0.5 + (r.l + r.b) * 0.5 - r.l) * 0.25 + r.b * 0.75 AS b
             |  FROM rec r JOIN seq s ON s.event_type = r.event_type AND s.i = r.i + 1)
             |SELECT event_type, day, round(x, 2) AS sum_value,
             |  round(l, 4) AS level, round(b, 4) AS trend,
             |  round(l + b, 4) AS forecast_next
             |FROM rec ORDER BY event_type, day""".stripMargin)),

    // robust outliers: median/MAD over exact integer cents (exact
    // percentile buffers bounded by the distinct-cents domain; the
    // even-count midpoint is exact binary, so counts carry zero
    // tolerance)
    "events_mad_outliers" -> QueryDef(
      (s, d) => EventsOps.madOutliers(Tables.events(s, d)),
      Some("""WITH c AS (SELECT event_type, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c FROM events),
             |m AS (SELECT event_type, median(c) AS med FROM c GROUP BY 1),
             |d AS (SELECT c.event_type, c.c, m.med, abs(c.c - m.med) AS adev
             |      FROM c JOIN m USING (event_type)),
             |md AS (SELECT event_type, median(adev) AS mad FROM d GROUP BY 1)
             |SELECT d.event_type, count(*) AS n,
             |  min(d.med) / 100.0 AS median_value,
             |  min(md.mad) / 100.0 AS mad_value,
             |  CAST(sum(CASE WHEN d.adev > md.mad * 3.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
             |FROM d JOIN md USING (event_type)
             |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin)),

    // parameterized SQL (named parameter markers): the statement is
    // compiled with :lo/:hi placeholders and literal ARGUMENTS bound
    // at execution — the injection-safe programmatic SQL surface.
    // The oracle inlines the same literals.
    "sql_param_markers" -> QueryDef(
      (s, d) => {
        Catalog.registerViews(s, d)
        s.sql(
          """SELECT o_orderpriority, count(*) AS n,
            |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(15,2))), 2) AS DOUBLE) AS revenue
            |FROM orders
            |WHERE o_orderdate >= :lo AND o_orderdate < :hi
            |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
          Map("lo" -> java.time.LocalDate.parse("1996-01-01"),
            "hi" -> java.time.LocalDate.parse("1997-01-01")))
      },
      Some("""SELECT o_orderpriority, count(*) AS n,
             |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(15,2))), 2) AS DOUBLE) AS revenue
             |FROM orders
             |WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // SQL session variables (DECLARE / SET VAR) + the IDENTIFIER()
    // clause resolving a table name from a variable — the scripting
    // surface. The oracle inlines both the threshold and the name.
    "sql_session_vars" -> QueryDef(
      (s, d) => {
        Catalog.registerViews(s, d)
        s.sql("DECLARE OR REPLACE VARIABLE graft_min_bal DOUBLE")
        s.sql("SET VAR graft_min_bal = 9000.0")
        s.sql("DECLARE OR REPLACE VARIABLE graft_tbl STRING")
        s.sql("SET VAR graft_tbl = 'customer'")
        s.sql(
          """SELECT c_mktsegment, count(*) AS n_rich,
            |  round(avg(c_acctbal), 4) AS avg_bal
            |FROM IDENTIFIER(graft_tbl)
            |WHERE c_acctbal >= graft_min_bal
            |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
      },
      Some("""SELECT c_mktsegment, count(*) AS n_rich,
             |  round(avg(c_acctbal), 4) AS avg_bal
             |FROM customer
             |WHERE c_acctbal >= 9000.0
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // 2-D strict-dominance pareto frontier via the distributed
    // prefix-min scan (ScanOps): per-x min, range-partitioned scan
    // stitched by a constant-size per-partition summary — no
    // all-pairs join, no single-partition window. The oracle states
    // the same per-x + exclusive-prefix-min semantics with a window
    // (fine at oracle scale; the engine side must not plan that).
    "part_skyline" -> QueryDef(
      (s, d) => ScanOps.partSkyline(Tables.part(s, d)),
      Some("""WITH t AS (SELECT p_partkey, p_brand, p_retailprice,
             |    CAST(p_size AS BIGINT) AS p_size,
             |    -CAST(p_size AS DOUBLE) AS negsize FROM part),
             |a AS (SELECT p_retailprice AS x, min(negsize) AS ymin FROM t GROUP BY 1),
             |s AS (SELECT x, ymin, min(ymin) OVER (ORDER BY x
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior FROM a),
             |k AS (SELECT x, ymin FROM s WHERE prior IS NULL OR ymin < prior)
             |SELECT t.p_partkey, t.p_brand, t.p_retailprice, t.p_size
             |FROM t JOIN k ON t.p_retailprice = k.x AND t.negsize = k.ymin
             |ORDER BY t.p_retailprice, t.p_partkey""".stripMargin)),

    // Johnson–Lindenstrauss sparse ±1 projection, row-local unrolled
    // sums; the oracle regenerates the SAME deterministic matrix and
    // op order from SimilarityOps.jlWeight
    "embedding_projection" -> QueryDef(
      (s, d) => SimilarityOps.embeddingProjection(Tables.embeddings(s, d)),
      Some(jlProjectionSql())),

    // ---- round 14: entity resolution, attribution, time-series fill,
    // path mining, SCD2 point-in-time, OPTIMIZE/compaction ----

    // blocked edit-distance record linkage: DISTINCT -> block on the
    // UNION of first-token and last-token keys -> dedupe candidates
    // -> levenshtein verify once per pair. Never an all-pairs theta
    // join; both engines compute the same classic DP distance, so the
    // pair set is exact. The union's recall vs the unblocked truth is
    // itself gated (fuzzy_recall_eval).
    "fuzzy_join_parts" -> QueryDef(
      (s, d) => ResolutionOps.fuzzyPartPairs(Tables.part(s, d)),
      Some(s"""$fuzzyCandCtes
             |SELECT name_a, name_b,
             |  CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
             |FROM cand
             |WHERE levenshtein(name_a, name_b) <= ${ResolutionOps.MaxEditDistance}
             |ORDER BY name_a, name_b""".stripMargin)),

    // one resolution round: every name folds onto the lexicographic
    // min of its matched neighborhood (itself included), and the fact
    // table aggregates on the canonical key; the price sum is exact
    // decimal cents (the revenueExact discipline)
    "fuzzy_canonical_parts" -> QueryDef(
      (s, d) => ResolutionOps.fuzzyCanonicalParts(Tables.part(s, d)),
      Some(s"""$fuzzyCandCtes,
             |m AS (SELECT name_a, name_b FROM cand
             |  WHERE levenshtein(name_a, name_b) <= ${ResolutionOps.MaxEditDistance}),
             |neigh AS (SELECT name_a AS p_name, name_b AS other FROM m
             |  UNION ALL SELECT name_b, name_a FROM m
             |  UNION ALL SELECT p_name, p_name FROM names),
             |cn AS (SELECT p_name, min(other) AS canon FROM neigh GROUP BY p_name)
             |SELECT canon, count(DISTINCT p.p_name) AS n_names,
             |  count(*) AS n_parts,
             |  CAST(round(sum(CAST(p_retailprice AS DECIMAL(15,2))), 2) AS DOUBLE) AS sum_price
             |FROM part p JOIN cn USING (p_name)
             |GROUP BY canon ORDER BY canon""".stripMargin)),

    // blocking-recall eval (the ann_recall_eval discipline applied to
    // record linkage): unblocked banded-levenshtein truth over the
    // distinct-name domain vs what each blocking strategy can reach —
    // the measured number behind the first∪last union key
    "fuzzy_recall_eval" -> QueryDef(
      (s, d) => ResolutionOps.fuzzyRecallEval(Tables.part(s, d)),
      Some {
        val sset = (c: String) =>
          s"array_to_string(list_sort(list_distinct(string_split($c, ' '))), ' ')"
        s"""WITH names AS (SELECT DISTINCT p_name FROM part),
           |t AS (SELECT a.p_name AS na, b.p_name AS nb
           |  FROM names a JOIN names b ON a.p_name < b.p_name
           |  WHERE levenshtein(a.p_name, b.p_name) <= ${ResolutionOps.MaxEditDistance}),
           |f AS (SELECT count(*) AS truth,
           |  coalesce(sum(CASE WHEN split_part(na, ' ', 1) = split_part(nb, ' ', 1)
           |    THEN 1 ELSE 0 END), 0) AS f1,
           |  coalesce(sum(CASE WHEN split_part(na, ' ', 1) = split_part(nb, ' ', 1)
           |      OR string_split(na, ' ')[-1] = string_split(nb, ' ')[-1]
           |    THEN 1 ELSE 0 END), 0) AS fu,
           |  coalesce(sum(CASE WHEN split_part(na, ' ', 1) = split_part(nb, ' ', 1)
           |      OR string_split(na, ' ')[-1] = string_split(nb, ' ')[-1]
           |      OR ${sset("na")} = ${sset("nb")}
           |    THEN 1 ELSE 0 END), 0) AS fs
           |  FROM t),
           |rv AS (SELECT p_name AS na,
           |    array_to_string(list_reverse(string_split(p_name, ' ')), ' ') AS nb
           |  FROM names),
           |r AS (SELECT count(*) AS rtruth,
           |  coalesce(sum(CASE WHEN split_part(na, ' ', 1) = split_part(nb, ' ', 1)
           |      OR string_split(na, ' ')[-1] = string_split(nb, ' ')[-1]
           |    THEN 1 ELSE 0 END), 0) AS rfu,
           |  count(*) AS rfs
           |  FROM rv WHERE na <> nb)
           |SELECT 'first_last_union' AS strategy, 'reorder' AS pair_class,
           |  CAST(rfu AS BIGINT) AS found, CAST(rtruth AS BIGINT) AS truth,
           |  ${TextAnalysisOps.det4Sql("rfu::DOUBLE / rtruth")} AS recall FROM r
           |UNION ALL
           |SELECT 'first_last_union', 'typo', CAST(fu AS BIGINT),
           |  CAST(truth AS BIGINT),
           |  ${TextAnalysisOps.det4Sql("fu::DOUBLE / truth")} FROM f
           |UNION ALL
           |SELECT 'first_token', 'typo', CAST(f1 AS BIGINT), CAST(truth AS BIGINT),
           |  ${TextAnalysisOps.det4Sql("f1::DOUBLE / truth")} FROM f
           |UNION ALL
           |SELECT 'sorted_set_union', 'reorder', CAST(rfs AS BIGINT),
           |  CAST(rtruth AS BIGINT),
           |  ${TextAnalysisOps.det4Sql("rfs::DOUBLE / rtruth")} FROM r
           |UNION ALL
           |SELECT 'sorted_set_union', 'typo', CAST(fs AS BIGINT),
           |  CAST(truth AS BIGINT),
           |  ${TextAnalysisOps.det4Sql("fs::DOUBLE / truth")} FROM f
           |ORDER BY strategy, pair_class""".stripMargin
      }),

    // the reorder-robust RESOLUTION leg: every multi-token catalog
    // name reversed plays the incoming dirty record (the class's
    // deterministic worst case), blocked by the same 3-key union
    // (equi-join only) and verified by token-set Jaccard >= 0.5 —
    // the edit-distance verifier reports -1 on nearly every resolved
    // row, which is the measured point: this class is invisible to it
    "fuzzy_reorder_resolve" -> QueryDef(
      (s, d) => ResolutionOps.fuzzyReorderResolve(Tables.part(s, d)),
      Some {
        val sset = (c: String) =>
          s"array_to_string(list_sort(list_distinct(string_split($c, ' '))), ' ')"
        val keys = (c: String) =>
          s"""list_distinct(['f:' || split_part($c, ' ', 1),
             |    'l:' || string_split($c, ' ')[-1],
             |    's:' || ${sset(c)}])""".stripMargin
        s"""WITH names AS (SELECT DISTINCT p_name FROM part),
           |dn AS (SELECT array_to_string(list_reverse(string_split(p_name, ' ')), ' ')
           |    AS dirty_name, p_name FROM names),
           |dirty AS (SELECT dirty_name, unnest(${keys("dirty_name")}) AS blk
           |  FROM dn WHERE dirty_name <> p_name),
           |catalog AS (SELECT p_name AS resolved_name,
           |    unnest(${keys("p_name")}) AS blk FROM names),
           |cand2 AS (SELECT DISTINCT dirty_name, resolved_name
           |  FROM dirty JOIN catalog USING (blk)),
           |j AS (SELECT dirty_name, resolved_name,
           |    len(list_intersect(list_distinct(string_split(dirty_name, ' ')),
           |                       list_distinct(string_split(resolved_name, ' '))))::DOUBLE
           |    / len(list_distinct(string_split(dirty_name, ' ') || string_split(resolved_name, ' ')))::DOUBLE
           |      AS jaccard
           |  FROM cand2)
           |SELECT dirty_name, resolved_name, round(jaccard, 4) AS jaccard,
           |  CAST(CASE WHEN levenshtein(dirty_name, resolved_name) <= ${ResolutionOps.MaxEditDistance}
           |    THEN levenshtein(dirty_name, resolved_name) ELSE -1 END AS BIGINT) AS dist
           |FROM j WHERE jaccard >= ${ResolutionOps.JaccardMinSim}
           |ORDER BY dirty_name, resolved_name""".stripMargin
      }),

    // last-touch attribution: each purchase credited to the user's
    // most recent preceding click via ONE conditional-last window —
    // no purchases-x-clicks self-join
    "attribution_last_touch" -> QueryDef(
      (s, d) => EventsOps.attributionLastTouch(Tables.events(s, d)),
      Some(attributionSql)),

    // the streaming form: per-user keyed state carries the latest
    // click across micro-batches AND a checkpointed restart; the
    // time-split staged replay delivers each user's rows in global
    // event order, so the sink is gated by the SAME oracle as the
    // batch window — a lost state store, a dropped micro-batch, or a
    // click that failed to carry across the restart all red the hash
    "streamed_attribution" -> QueryDef(
      (s, d) => {
        val dir = graft.streaming.EventStreams.streamedAttributionLayout(s, d)
        s.read.parquet(dir)
          .select("purchase_id", "user_id", "value", "click_id", "gap_ms", "src")
          .orderBy("purchase_id")
      },
      Some(attributionSql)),

    // linear interpolation over the per-user daily series (nearest
    // edge outside the observed range); daily partial agg first, then
    // one window pass carries the neighbor observations
    "events_interpolate" -> QueryDef(
      (s, d) => EventsOps.interpolateDaily(Tables.events(s, d)),
      Some("""WITH daily AS (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             |    CAST(floor(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) * 100.0
             |      / count(*) + 0.5) AS BIGINT) AS o4
             |  FROM events GROUP BY 1, 2),
             |bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
             |spine AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day FROM bounds),
             |grid AS (SELECT u.user_id, s.day, d.o4,
             |    CAST(date_diff('day', DATE '2024-01-01', s.day) AS DOUBLE) AS dd
             |  FROM spine s CROSS JOIN (SELECT DISTINCT user_id FROM daily) u
             |  LEFT JOIN daily d ON d.user_id = u.user_id AND d.day = s.day),
             |n AS (SELECT *,
             |    last_value(o4 IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             |    last_value(CASE WHEN o4 IS NOT NULL THEN dd END IGNORE NULLS)
             |      OVER (PARTITION BY user_id ORDER BY day
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
             |    first_value(o4 IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
             |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             |    first_value(CASE WHEN o4 IS NOT NULL THEN dd END IGNORE NULLS)
             |      OVER (PARTITION BY user_id ORDER BY day
             |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
             |  FROM grid)
             |SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
             |  CAST(floor(CASE WHEN o4 IS NOT NULL THEN o4
             |    WHEN pv IS NULL THEN nv
             |    WHEN nv IS NULL THEN pv
             |    ELSE pv + (nv - pv) * (dd - pd) / (nd - pd) + 0.5 END) AS BIGINT) AS val_e4,
             |  CASE WHEN o4 IS NOT NULL THEN 'obs' ELSE 'interp' END AS src
             |FROM n ORDER BY user_id, day""".stripMargin)),

    // sequential pattern mining: length-3 event-type path counts via
    // lag x2 — row-local path extraction, |types|^3 result domain
    "event_trigram_paths" -> QueryDef(
      (s, d) => EventsOps.trigramPaths(Tables.events(s, d)),
      Some("""WITH e AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms FROM events),
             |w AS (SELECT event_type AS t3,
             |    lag(event_type, 2) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS t1,
             |    lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS t2
             |  FROM e)
             |SELECT t1, t2, t3, count(*) AS n FROM w WHERE t1 IS NOT NULL
             |GROUP BY 1, 2, 3 ORDER BY n DESC, t1, t2, t3""".stripMargin)),

    // point-in-time (as-of) fact->SCD2 lookup: each order reads the
    // version current at its own epoch — the query the SCD2 history
    // exists to serve; equi-join on the key, validity as a row-local
    // post-filter
    "scd2_point_in_time" -> QueryDef(
      (s, d) => RelationalOps.scd2PointInTime(Tables.customer(s, d), Tables.orders(s, d)),
      Some {
        val off = RelationalOps.Scd2InsertOffset
        s"""WITH dim AS (SELECT c_custkey, c_mktsegment, c_acctbal FROM customer),
           |batch AS (
           |  SELECT c_custkey, 'SEG_' || (c_custkey % 5) AS u_seg,
           |         round(c_acctbal + 100.0, 2) AS u_bal
           |  FROM customer WHERE c_custkey % 7 = 3
           |  UNION ALL
           |  SELECT c_custkey, c_mktsegment, c_acctbal FROM customer WHERE c_custkey % 7 = 2
           |  UNION ALL
           |  SELECT c_custkey + $off, 'SEG_' || ((c_custkey + $off) % 5), c_acctbal
           |  FROM customer WHERE c_custkey % 13 = 6),
           |j AS (SELECT coalesce(d.c_custkey, b.c_custkey) AS c_custkey,
           |        d.c_mktsegment, d.c_acctbal, b.u_seg, b.u_bal,
           |        (b.u_seg IS NOT NULL AND d.c_mktsegment IS NOT NULL AND
           |         (b.u_seg <> d.c_mktsegment OR b.u_bal <> d.c_acctbal)) AS changed
           |      FROM dim d FULL OUTER JOIN batch b ON d.c_custkey = b.c_custkey),
           |hist AS (
           |  SELECT c_custkey, c_mktsegment AS seg, 0 AS valid_from,
           |    CASE WHEN changed THEN 1 END AS valid_to
           |  FROM j WHERE c_mktsegment IS NOT NULL
           |  UNION ALL
           |  SELECT c_custkey, u_seg, 1, NULL FROM j WHERE changed
           |  UNION ALL
           |  SELECT c_custkey, u_seg, 1, NULL FROM j WHERE c_mktsegment IS NULL),
           |o AS (SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
           |        o_orderkey % 2 AS epoch FROM orders)
           |SELECT seg, CAST(epoch AS BIGINT) AS epoch, count(*) AS n_orders,
           |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(15,2))), 2) AS DOUBLE) AS sum_price
           |FROM o JOIN hist USING (c_custkey)
           |WHERE valid_from <= epoch AND (valid_to IS NULL OR valid_to > epoch)
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
      }),

    // OPTIMIZE/compaction: the small-files ingest layout rewritten as
    // few shipdate-clustered files; the date-ranged read over the
    // compacted layout must match the raw table exactly — compaction
    // is invisible to readers (file-count/clustering pinned in spec)
    "compacted_scan" -> QueryDef(
      (s, d) => LayoutOps.compactedScan(Tables.lineitem(s, d), d),
      Some(s"""SELECT l_returnflag, count(*) AS n,
             |  ${RelationalOps.RevenueExactSql} AS revenue
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // rolling DAU/WAU: distinct (user, day) first, then the trailing
    // 7-day distinct via the contribute-forward explode — an
    // equi-aggregation, never a day-range self-join or a
    // single-partition count(distinct) window
    "rolling_active_users" -> QueryDef(
      (s, d) => EventsOps.rollingActiveUsers(Tables.events(s, d)),
      Some("""WITH pairs AS (SELECT DISTINCT user_id,
             |    CAST(date_trunc('day', ts) AS DATE) AS day FROM events),
             |dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM pairs GROUP BY day),
             |wau AS (SELECT t.day, count(DISTINCT p.user_id) AS wau
             |  FROM (SELECT DISTINCT day FROM pairs) t JOIN pairs p
             |    ON p.day BETWEEN t.day - 6 AND t.day
             |  GROUP BY t.day)
             |SELECT strftime(d.day, '%Y-%m-%d') AS day, d.dau, w.wau
             |FROM dau d JOIN wau w USING (day) ORDER BY day""".stripMargin)),

    // the sketch twin of rolling_active_users: trailing-7-day
    // distinct users per day via the deterministic KMV UDAF — one
    // exchange carrying <=k values per day, the shape that survives
    // when the window's distinct cardinality is too wide to count
    // exactly; bit-reproducible, so hash-gated like the other KMV rows
    "rolling_active_kmv" -> QueryDef(
      (s, d) => EventsOps.rollingActiveKmv(Tables.events(s, d)),
      Some("""WITH pairs AS (SELECT DISTINCT user_id,
             |    CAST(date_trunc('day', ts) AS DATE) AS day FROM events),
             |h AS (SELECT DISTINCT t.day,
             |    (('0x' || substr(md5(p.user_id::VARCHAR), 1, 15))::UBIGINT)::DOUBLE AS h
             |  FROM (SELECT DISTINCT day FROM pairs) t
             |  JOIN pairs p ON p.day BETWEEN t.day - 6 AND t.day),
             |r AS (SELECT day, h,
             |        row_number() OVER (PARTITION BY day ORDER BY h) AS rnk FROM h),
             |t AS (SELECT day, max(h) AS theta, count(*) AS m
             |      FROM r WHERE rnk <= 64 GROUP BY day)
             |SELECT strftime(day, '%Y-%m-%d') AS day,
             |  CAST(CASE WHEN m < 64 THEN m
             |       ELSE round(63.0 / (theta / 1152921504606846976.0)) END AS BIGINT) AS wau_est
             |FROM t ORDER BY day""".stripMargin)),

    // corpus-composition diagnostic: vocabulary Jaccard between every
    // source pair; DISTINCT (word, source) first so the self-join is
    // vocab-bounded with constant |sources| fan-out per word
    "source_vocab_overlap" -> QueryDef(
      (s, d) => TextAnalysisOps.sourceVocabOverlap(Tables.documents(s, d)),
      Some(s"""WITH vocab AS (SELECT DISTINCT source, word FROM (
             |    SELECT source, unnest($toksSql) AS word FROM documents)),
             |sizes AS (SELECT source, count(*) AS n FROM vocab GROUP BY source),
             |inter AS (SELECT a.source AS source_a, b.source AS source_b,
             |    count(*) AS n_common
             |  FROM vocab a JOIN vocab b USING (word)
             |  WHERE a.source < b.source GROUP BY 1, 2)
             |SELECT source_a, source_b, sa.n AS n_a, sb.n AS n_b, n_common,
             |  round(n_common / (sa.n + sb.n - n_common), 4) AS jaccard
             |FROM inter
             |JOIN sizes sa ON sa.source = source_a
             |JOIN sizes sb ON sb.source = source_b
             |ORDER BY source_a, source_b""".stripMargin))
  )

  /** DuckDB mirror of [[graft.operators.SimilarityOps
    * .embeddingProjection]]: the same Achlioptas matrix
    * (SimilarityOps.jlWeight — shared code, not a copied table), the
    * same ascending-j left-associative summation (`a - b + c` parses
    * left-assoc, and IEEE `a + (-b)` == `a - b`), the same scale
    * constant (Scala's shortest-round-trip Double print re-parses to
    * the identical double in DuckDB).
    */
  private def jlProjectionSql(dims: Int = 64): String = {
    import graft.operators.SimilarityOps.{jlWeight, JlOutDims}
    val scale = math.sqrt(3.0 / JlOutDims)
    val cols = (0 until JlOutDims).map { k =>
      val terms = (0 until dims).flatMap { j =>
        jlWeight(j, k) match {
          case 1  => Some(s"+ embedding[${j + 1}]::DOUBLE")
          case -1 => Some(s"- embedding[${j + 1}]::DOUBLE")
          case _  => None
        }
      }
      val e = terms.mkString(" ").stripPrefix("+ ")
      s"round(($e) * $scale, 4) AS p$k"
    }
    s"SELECT vec_id, ${cols.mkString(",\n  ")}\nFROM embeddings ORDER BY vec_id"
  }

  /** DuckDB recomputation of [[graft.operators.PipelineOps.cleanCorpus]]:
    * token/punct quality gate, stopword-profile language agreement
    * (same hit columns + argmax CASE chain as the lang_id oracle),
    * then keep-min-doc_id exact dedup via arg_min.
    */
  private lazy val cleanPipelineOracle: String = {
    val langs = graft.operators.TextAnalysisOps.StopwordsByLang.map(_._1)
    val hitCols = graft.operators.TextAnalysisOps.StopwordsByLang.map { case (l, stops) =>
      val in = stops.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(ws, w -> w IN ($in))) AS hits_$l"
    }.mkString(",\n  ")
    val cases = langs.init.map { l =>
      val conds = langs.filterNot(_ == l).map(o => s"hits_$l >= hits_$o").mkString(" AND ")
      s"WHEN $conds THEN '$l'"
    }.mkString("\n  ")
    s"""WITH t AS (SELECT doc_id, lang, text, $toksSql AS ws FROM documents),
       |q AS (SELECT doc_id, lang, text, ws, len(ws)::BIGINT AS n_tokens
       |      FROM t
       |      WHERE len(ws) >= 5
       |        AND len(regexp_extract_all(lower(text), '[^a-z0-9 \t\n\r\f]'))::DOUBLE / length(text) <= 0.20),
       |h AS (SELECT doc_id, lang, text, n_tokens,
       |  $hitCols
       |FROM q),
       |p AS (SELECT doc_id, lang, text, n_tokens,
       |        CASE $cases ELSE '${langs.last}' END AS pred
       |      FROM h),
       |f AS (SELECT doc_id, lang, n_tokens, md5(lower(text)) AS fp FROM p WHERE pred = lang)
       |SELECT arg_min(doc_id, doc_id) AS doc_id, arg_min(lang, doc_id) AS lang,
       |  arg_min(n_tokens, doc_id) AS n_tokens, count(*) AS n_copies
       |FROM f GROUP BY fp ORDER BY doc_id""".stripMargin
  }

  /** DuckDB funnel oracle: the same five sequential gates with
    * first-failing-rule attribution, thresholds generated from
    * [[graft.operators.PipelineOps]]'s Funnel* constants. Gates
    * coalesce to FALSE (matching the Spark side) so no row ever
    * vanishes from the funnel bookkeeping.
    */
  private lazy val filterFunnelOracle: String = {
    import graft.operators.{PipelineOps => P, TextAnalysisOps => T}
    val langs = T.StopwordsByLang.map(_._1)
    val hitCols = T.StopwordsByLang.map { case (l, stops) =>
      val in = stops.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(ws, w -> w IN ($in))) AS hits_$l"
    }.mkString(",\n  ")
    val cases = langs.init.map { l =>
      val conds = langs.filterNot(_ == l).map(o => s"hits_$l >= hits_$o").mkString(" AND ")
      s"WHEN $conds THEN '$l'"
    }.mkString("\n  ")
    val n = T.RepetitionNgramN
    val gramsSql =
      s"list_transform(generate_series(1, len(ws) - ${n - 1}), i -> array_to_string(ws[i:i+${n - 1}], ' '))"
    s"""WITH t AS (SELECT doc_id, lang, text, $toksSql AS ws FROM documents),
       |h AS (SELECT *, $hitCols FROM t),
       |g AS (SELECT
       |  coalesce(len(ws) >= ${P.FunnelMinTokens}, false) AS g1,
       |  coalesce(len(regexp_extract_all(lower(text), '[^a-z0-9 \t\n\r\f]'))::DOUBLE
       |           / NULLIF(length(text), 0) <= ${P.FunnelMaxPunct}, false) AS g2,
       |  coalesce(list_sum(list_transform(ws, w -> length(w)))::DOUBLE / NULLIF(len(ws), 0)
       |           BETWEEN ${P.FunnelMinAvgWordLen} AND ${P.FunnelMaxAvgWordLen}, false) AS g3,
       |  coalesce((CASE $cases ELSE '${langs.last}' END) = lang, false) AS g4,
       |  coalesce(1.0 - len(list_distinct($gramsSql))::DOUBLE
       |           / NULLIF(len($gramsSql), 0) <= ${P.FunnelMaxDupFrac}, false) AS g5
       |FROM h),
       |agg AS (SELECT count(*)::BIGINT AS total,
       |  sum(CASE WHEN NOT g1 THEN 1 ELSE 0 END)::BIGINT AS d1,
       |  sum(CASE WHEN g1 AND NOT g2 THEN 1 ELSE 0 END)::BIGINT AS d2,
       |  sum(CASE WHEN g1 AND g2 AND NOT g3 THEN 1 ELSE 0 END)::BIGINT AS d3,
       |  sum(CASE WHEN g1 AND g2 AND g3 AND NOT g4 THEN 1 ELSE 0 END)::BIGINT AS d4,
       |  sum(CASE WHEN g1 AND g2 AND g3 AND g4 AND NOT g5 THEN 1 ELSE 0 END)::BIGINT AS d5
       |FROM g)
       |SELECT 1::BIGINT AS stage, 'min_tokens' AS rule, total AS docs_in, d1 AS docs_dropped, total - d1 AS docs_out FROM agg
       |UNION ALL SELECT 2, 'max_punct', total - d1, d2, total - d1 - d2 FROM agg
       |UNION ALL SELECT 3, 'word_len', total - d1 - d2, d3, total - d1 - d2 - d3 FROM agg
       |UNION ALL SELECT 4, 'lang_agreement', total - d1 - d2 - d3, d4, total - d1 - d2 - d3 - d4 FROM agg
       |UNION ALL SELECT 5, 'repetition', total - d1 - d2 - d3 - d4, d5, total - d1 - d2 - d3 - d4 - d5 FROM agg
       |ORDER BY stage""".stripMargin
  }

  /** Exact word-5-gram Jaccard near-dup pairs (threshold 0.8) — the
    * oracle for both the inverted-index join and the MinHash+LSH
    * variant (whose exact verification makes them set-equal).
    */
  /** Shared CTE body producing the J >= 0.8 pair set as `pairs` —
    * the single source for the near-dup pair oracle AND the
    * components/survivors oracles built on top of it (the shared-
    * constant rule applied to a whole subquery: the graph the
    * recursive CTE walks is definitionally the graph the pair query
    * returns).
    */
  private lazy val jaccardPairsBody: String = jaccardPairsBodyWhere("")

  /** The exact-Jaccard pair CTE chain over a filtered doc universe
    * (`docFilter` e.g. "WHERE doc_id % 10 != 6" — the take-down
    * oracle's live corpus).
    */
  private def jaccardPairsBodyWhere(docFilter: String): String =
    s"""w AS (SELECT doc_id, $toksSql AS ws FROM documents $docFilter),
       |t AS (SELECT doc_id, ${shinglesSql(DedupOps.ShingleN)} AS sh FROM w),
       |t2 AS (SELECT doc_id, sh FROM t WHERE len(sh) > 0),
       |inv AS (SELECT doc_id, unnest(sh) AS s FROM t2),
       |cand AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
       |         FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
       |         GROUP BY a.doc_id, b.doc_id),
       |cnt AS (SELECT doc_id, len(sh)::BIGINT AS n FROM t2),
       |pairs AS (SELECT a_id, b_id, round(inter::DOUBLE / (ca.n + cb.n - inter), 4) AS jac
       |          FROM cand JOIN cnt ca ON ca.doc_id = a_id JOIN cnt cb ON cb.doc_id = b_id
       |          WHERE round(inter::DOUBLE / (ca.n + cb.n - inter), 4) >= 0.8)""".stripMargin

  private lazy val jaccardOracle: String =
    s"""WITH $jaccardPairsBody
       |SELECT a_id, b_id, jac FROM pairs ORDER BY a_id, b_id""".stripMargin

  /** [[jaccardOracle]] restricted to pairs with >= 1 batch (odd-id)
    * endpoint — the ground truth for both the batch incremental LSH
    * probe and the streamed ingest pairs it feeds.
    */
  private lazy val incrementalJaccardOracle: String =
    s"""WITH $jaccardPairsBody
       |SELECT a_id, b_id, jac FROM pairs
       |WHERE a_id % 2 = 1 OR b_id % 2 = 1
       |ORDER BY a_id, b_id""".stripMargin

  /** [[incrementalJaccardOracle]] over the post-take-down universe:
    * the deleted corpus slice is excluded from pairing entirely.
    */
  private lazy val lshDeleteOracle: String = {
    val m = DedupOps.LshDeleteMod; val r = DedupOps.LshDeleteRes
    s"""WITH ${jaccardPairsBodyWhere(s"WHERE doc_id % $m != $r")}
       |SELECT a_id, b_id, jac FROM pairs
       |WHERE a_id % 2 = 1 OR b_id % 2 = 1
       |ORDER BY a_id, b_id""".stripMargin
  }

  /** Min-label fixpoint of the pair graph as a recursive CTE: `walk`
    * accumulates every (node, smaller-id label) pair reachable by
    * paths that only ever forward labels below the receiving node's
    * id — the component minimum m satisfies m < x for every other
    * member x, so m survives the pruning along every path and
    * min(label) per node is exactly the component id the engine's
    * propagation loop converges to. The WHERE prune keeps the walk
    * relation near pair-count-sized instead of full reachability.
    * `sym AS MATERIALIZED`: DuckDB inlines CTEs referenced from
    * inside a recursive member, which re-evaluates the entire
    * shingle-join pair chain on EVERY fixpoint iteration — ~linear
    * cost at gate SFs but ruinous at the 100x replica (one chain
    * evaluation is ~7 min there). Materializing the edge list pins
    * the chain to exactly one evaluation with identical results.
    */
  /** Shared CTE body for the SemDeDup oracles: the nearest-centroid
    * assignment (identical to the ann_ivf oracle's `assign`), the
    * capped within-cluster pair graph, and its min-label components
    * via the same recursive walk as [[componentsOracleBody]]. All
    * thresholds generated from [[graft.operators.SimilarityOps]]
    * constants.
    */
  private lazy val semanticOracleBody: String = {
    import graft.operators.{SimilarityOps => S}
    s"""WITH RECURSIVE
       |params AS (SELECT CAST(greatest(${S.SemMinK}, ceil(sqrt(count(*)))) AS BIGINT) AS k,
       |                  count(*) AS n FROM embeddings),
       |p2 AS (SELECT k, greatest(1, n // k) AS stride FROM params),
       |c AS (SELECT vec_id AS centroid_id, embedding AS cvec FROM embeddings, p2
       |      WHERE (vec_id + 7) % ${graft.functions.expressions.CmsHash.P} % stride = 0
       |      QUALIFY row_number() OVER (ORDER BY vec_id) <= k),
       |ps AS (SELECT e.vec_id, c.centroid_id, e.embedding, ${cosSql("e.embedding", "c.cvec")} AS cscore
       |       FROM embeddings e CROSS JOIN c),
       |r AS (SELECT *, row_number() OVER (PARTITION BY vec_id
       |        ORDER BY round(cscore, 6) DESC, centroid_id) AS crank FROM ps),
       |assign AS (SELECT vec_id, centroid_id, embedding FROM r WHERE crank = 1),
       |cap AS (SELECT * FROM assign
       |        QUALIFY count(*) OVER (PARTITION BY centroid_id) <= ${S.SemMaxCluster}),
       |pairs AS (SELECT * FROM (
       |            SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       |              round(${cosSql("a.embedding", "b.embedding")}, 4) + 0 AS score
       |            FROM cap a JOIN cap b
       |              ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id)
       |          WHERE score >= ${S.SemThreshold}),
       |sym AS MATERIALIZED (SELECT a_id AS u, b_id AS v FROM pairs
       |        UNION ALL SELECT b_id, a_id FROM pairs),
       |walk(node, label) AS (
       |  SELECT DISTINCT u, u FROM sym
       |  UNION
       |  SELECT s.u, k.label FROM walk k JOIN sym s ON s.v = k.node
       |  WHERE k.label < s.u),
       |comp AS (SELECT node, min(label) AS component FROM walk GROUP BY node)""".stripMargin
  }

  /** The incremental-semantic-dedup oracle body: same structure as
    * [[semanticOracleBody]] but the model derives from the CORPUS
    * half only (params from the even-id count, centroids seeded from
    * even ids) while assignment and the combined-population cap run
    * over the full table — exactly the population the persisted index
    * plus the arriving batch sees — and `pairs` keeps only pairs with
    * at least one odd (batch) endpoint.
    */
  private lazy val incrementalSemanticOracleBody: String =
    incrementalSemanticOracle("")

  /** [[incrementalSemanticOracleBody]] with an optional extra
    * predicate on the assignment rows — the delete-leg oracle drops
    * the tombstoned corpus vectors BEFORE the mega-cluster cap (the
    * engine advances its stored counts eagerly on delete, so the cap
    * sees the live population) while the centroid MODEL stays the
    * frozen pre-delete one (deletion never retrains).
    */
  private def incrementalSemanticOracle(liveAnd: String): String = {
    import graft.operators.{SimilarityOps => S}
    s"""WITH
       |params AS (SELECT CAST(greatest(${S.SemMinK}, ceil(sqrt(count(*)))) AS BIGINT) AS k,
       |                  count(*) AS n FROM embeddings WHERE vec_id % 2 = 0),
       |p2 AS (SELECT k, greatest(1, n // k) AS stride FROM params),
       |c AS (SELECT vec_id AS centroid_id, embedding AS cvec FROM embeddings, p2
       |      WHERE vec_id % 2 = 0
       |        AND (vec_id + 7) % ${graft.functions.expressions.CmsHash.P} % stride = 0
       |      QUALIFY row_number() OVER (ORDER BY vec_id) <= k),
       |ps AS (SELECT e.vec_id, c.centroid_id, e.embedding, ${cosSql("e.embedding", "c.cvec")} AS cscore
       |       FROM embeddings e CROSS JOIN c),
       |r AS (SELECT *, row_number() OVER (PARTITION BY vec_id
       |        ORDER BY round(cscore, 6) DESC, centroid_id) AS crank FROM ps),
       |assign AS (SELECT vec_id, centroid_id, embedding FROM r WHERE crank = 1$liveAnd),
       |cap AS (SELECT * FROM assign
       |        QUALIFY count(*) OVER (PARTITION BY centroid_id) <= ${S.SemMaxCluster}),
       |pairs AS (SELECT * FROM (
       |            SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       |              round(${cosSql("a.embedding", "b.embedding")}, 4) + 0 AS score
       |            FROM cap a JOIN cap b
       |              ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
       |            WHERE a.vec_id % 2 = 1 OR b.vec_id % 2 = 1)
       |          WHERE score >= ${S.SemThreshold})""".stripMargin
  }

  /** The multi-round BPE oracle: [[TextAnalysisOps.bpeTrainMerges]]
    * unrolled round by round — each round's argmax pair (count desc,
    * pair asc) feeds a delimited-string `replace` into the next
    * round's word table. DuckDB's `replace` is left-to-right
    * non-overlapping, same as Spark's, and the `(x)(y)` delimiters
    * keep a pair pattern from matching across symbol boundaries.
    */
  /** Replay oracle for the warm-start PageRank family: base cold
    * rounds on the even-key graph, then ONE damped round over the
    * updated graph — same scaled-long integer arithmetic as the
    * engine. `extraBatch` widens the updated graph's filter beyond
    * the base split (empty = the full-table parity batch of
    * `incremental_pagerank`; an `OR ...` clause = an arbitrary batch
    * for the `_batch2` gate). All CTEs MATERIALIZED (the
    * mmr/triangles exponential-inlining lesson).
    */
  private def incrementalPagerankOracle(extraBatch: String): String = {
    val scale = graft.operators.GraphOps.PagerankScale
    val baseNum = graft.operators.GraphOps.PagerankScale *
      (graft.operators.GraphOps.DampDen - graft.operators.GraphOps.DampNum) /
      graft.operators.GraphOps.DampDen
    val updatedFilter =
      if (extraBatch.isEmpty) "" else s"WHERE o_orderkey % 2 = 0 $extraBatch"
    def graphCtes(sfx: String, filter: String) =
      s"""trade$sfx AS MATERIALIZED (
         |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey $filter),
         |edges$sfx AS MATERIALIZED (
         |  SELECT c AS src, s AS dst FROM trade$sfx
         |  UNION ALL SELECT s AS src, c AS dst FROM trade$sfx),
         |deg$sfx AS MATERIALIZED (
         |  SELECT src, count(*) AS outdeg FROM edges$sfx GROUP BY src),
         |arcs$sfx AS MATERIALIZED (SELECT e.src, e.dst, d.outdeg
         |  FROM edges$sfx e JOIN deg$sfx d ON e.src = d.src),
         |n$sfx AS MATERIALIZED (SELECT count(*) AS nn FROM deg$sfx)"""
        .stripMargin
    def round(sfx: String, k: Int, prev: String) =
      s"""r$sfx$k AS MATERIALIZED (
         |  SELECT a.dst AS node,
         |    $baseNum // (SELECT nn FROM n$sfx)
         |      + (${graft.operators.GraphOps.DampNum} * sum(p.rank // a.outdeg)) // ${graft.operators.GraphOps.DampDen} AS rank
         |  FROM arcs$sfx a JOIN $prev p ON a.src = p.node
         |  GROUP BY a.dst)""".stripMargin
    s"""WITH ${graphCtes("b", "WHERE o_orderkey % 2 = 0")},
       |${graphCtes("f", updatedFilter)},
       |rb0 AS MATERIALIZED (
       |  SELECT src AS node, $scale // (SELECT nn FROM nb) AS rank FROM degb),
       |${round("b", 1, "rb0")},
       |${round("b", 2, "rb1")},
       |${round("b", 3, "rb2")},
       |seeds AS MATERIALIZED (
       |  SELECT d.src AS node,
       |    coalesce(r.rank, $scale // (SELECT nn FROM nf)) AS rank
       |  FROM degf d LEFT JOIN rb3 r ON d.src = r.node),
       |${round("f", 1, "seeds").replace("rf1", "warm")}
       |SELECT CASE WHEN node % 2 = 0 THEN 'c' || CAST(node // 2 AS VARCHAR)
       |            ELSE 's' || CAST((node - 1) // 2 AS VARCHAR) END AS entity,
       |  CAST(rank AS BIGINT) AS rank_val
       |FROM warm
       |ORDER BY rank_val DESC, entity LIMIT ${graft.operators.GraphOps.PagerankTopK}""".stripMargin
  }

  /** `streamed_sessions`' oracle: replay the two-phase
    * event-time-timeout session state machine as a pure function of
    * the data and the split. Rules (StreamingSessionSpec): phase-1
    * rows form gap islands; every non-tail island closed in batch;
    * the tail closes at WM1 if `last + gap <= WM1`, else stays open;
    * phase-2 rows survive iff `ms > WM1`; a surviving user's first
    * row MERGES into the open tail iff within the gap (else the tail
    * closes as-is); post-merge islands close in batch except each
    * user's new tail, which closes at WM2 under the same `<=` rule —
    * still-open sessions are withheld. The merged tail's last-event
    * ms is the island's max batch ms (the engine overwrites lastMs
    * with each processed row), which the `rlast` column mirrors.
    */
  private lazy val streamedSessionsOracle: String = {
    val G = 1800000L // 30-min gap, the events_sessionize convention
    s"""WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ms FROM events),
       |p1 AS (SELECT user_id, ms FROM e WHERE event_id % 5 != 0),
       |wm1 AS (SELECT max(ms) - $wmDelayMs AS w FROM p1),
       |wm2 AS (SELECT max(ms) - $wmDelayMs AS w FROM e),
       |b1 AS (SELECT user_id, ms,
       |        CASE WHEN lag(ms) OVER (PARTITION BY user_id ORDER BY ms) IS NULL
       |              OR ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms) > $G
       |             THEN 1 ELSE 0 END AS brk
       |       FROM p1),
       |s1 AS (SELECT user_id, ms, sum(brk) OVER (PARTITION BY user_id ORDER BY ms
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM b1),
       |g1 AS (SELECT user_id, sid, min(ms) AS start, max(ms) AS last,
       |         count(*) AS n FROM s1 GROUP BY user_id, sid),
       |last1 AS (SELECT user_id, max(sid) AS sid FROM g1 GROUP BY user_id),
       |closed1 AS (
       |  SELECT g.user_id, g.start, g.n, g.last FROM g1 g
       |  LEFT JOIN last1 l ON g.user_id = l.user_id AND g.sid = l.sid
       |  WHERE l.user_id IS NULL
       |  UNION ALL
       |  SELECT g.user_id, g.start, g.n, g.last FROM g1 g JOIN last1 l
       |    ON g.user_id = l.user_id AND g.sid = l.sid
       |  WHERE g.last + $G <= (SELECT w FROM wm1)),
       |open1 AS (SELECT g.user_id, g.start, g.n, g.last FROM g1 g JOIN last1 l
       |    ON g.user_id = l.user_id AND g.sid = l.sid
       |  WHERE g.last + $G > (SELECT w FROM wm1)),
       |p2 AS (SELECT user_id, ms FROM e
       |       WHERE event_id % 5 = 0 AND ms > (SELECT w FROM wm1)),
       |b2 AS (SELECT p.user_id, p.ms,
       |        CASE WHEN lag(p.ms) OVER (PARTITION BY p.user_id ORDER BY p.ms) IS NULL
       |             THEN CASE WHEN o.last IS NOT NULL AND p.ms - o.last <= $G
       |                       THEN 0 ELSE 1 END
       |             ELSE CASE WHEN p.ms - lag(p.ms) OVER (PARTITION BY p.user_id ORDER BY p.ms) > $G
       |                       THEN 1 ELSE 0 END END AS brk
       |       FROM p2 p LEFT JOIN open1 o USING (user_id)),
       |s2 AS (SELECT user_id, ms, sum(brk) OVER (PARTITION BY user_id ORDER BY ms
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM b2),
       |g2 AS (SELECT user_id, sid, min(ms) AS rstart, max(ms) AS rlast,
       |         count(*) AS rn FROM s2 GROUP BY user_id, sid),
       |g2m AS (SELECT g.user_id, g.sid,
       |          CASE WHEN g.sid = 0 THEN o.start ELSE g.rstart END AS start,
       |          g.rlast AS last,
       |          CASE WHEN g.sid = 0 THEN o.n + g.rn ELSE g.rn END AS n
       |        FROM g2 g LEFT JOIN open1 o USING (user_id)),
       |users2 AS (SELECT DISTINCT user_id FROM p2),
       |jclosed AS (SELECT o.user_id, o.start, o.n, o.last FROM open1 o
       |            JOIN users2 USING (user_id)
       |            WHERE NOT EXISTS (SELECT 1 FROM g2
       |                              WHERE g2.user_id = o.user_id AND g2.sid = 0)),
       |last2 AS (SELECT user_id, max(sid) AS sid FROM g2m GROUP BY user_id),
       |closed2 AS (SELECT g.user_id, g.start, g.n, g.last FROM g2m g
       |            LEFT JOIN last2 l ON g.user_id = l.user_id AND g.sid = l.sid
       |            WHERE l.user_id IS NULL),
       |hold AS (SELECT g.user_id, g.start, g.n, g.last FROM g2m g JOIN last2 l
       |           ON g.user_id = l.user_id AND g.sid = l.sid
       |         UNION ALL
       |         SELECT o.user_id, o.start, o.n, o.last FROM open1 o
       |         WHERE o.user_id NOT IN (SELECT user_id FROM users2)),
       |timed2 AS (SELECT user_id, start, n, last FROM hold
       |           WHERE last + $G <= (SELECT w FROM wm2)),
       |fin AS (SELECT * FROM closed1 UNION ALL SELECT * FROM jclosed
       |        UNION ALL SELECT * FROM closed2 UNION ALL SELECT * FROM timed2)
       |SELECT user_id, CAST(start AS BIGINT) AS session_start_ms,
       |  CAST(n AS BIGINT) AS n_events, CAST(last - start AS BIGINT) AS span_ms
       |FROM fin ORDER BY user_id, session_start_ms""".stripMargin
  }

  /** Substring-dedup coverage oracle, generated from the DedupOps
    * constants. `docFilter` restricts the run UNIVERSE (which docs
    * participate in df/owner at all); `rowFilter` restricts only the
    * OUTPUT rows (the full df/owner stats still see every universe
    * doc) — the incremental probe's contract. Position arithmetic is
    * 1-based here vs 0-based in Spark; coverage is a distinct count,
    * so the offset cancels.
    */
  private def substrCoverageOracle(docFilter: String, rowFilter: String): String = {
    val L = graft.operators.DedupOps.SubstrRunLen
    val cap = graft.operators.DedupOps.SubstrDocFreqCap
    s"""WITH t AS (SELECT doc_id, $toksSql AS ws FROM documents $docFilter),
       |s AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - ${L - 1})) AS i
       |      FROM t WHERE len(ws) >= $L),
       |occ AS (SELECT doc_id, i, array_to_string(ws[i:i+${L - 1}], ' ') AS sh FROM s),
       |df AS (SELECT sh, count(DISTINCT doc_id) AS df, min(doc_id) AS owner
       |       FROM occ GROUP BY sh HAVING count(DISTINCT doc_id) BETWEEN 2 AND $cap),
       |rem AS (SELECT o.doc_id, o.i FROM occ o JOIN df ON o.sh = df.sh
       |        WHERE o.doc_id <> df.owner),
       |cov AS (SELECT doc_id, count(DISTINCT pos) AS dup_tokens FROM
       |          (SELECT doc_id, unnest(generate_series(i, i + ${L - 1})) AS pos FROM rem)
       |        GROUP BY doc_id)
       |SELECT t.doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
       |  CAST(coalesce(cov.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       |  round((len(ws) - coalesce(cov.dup_tokens, 0))::DOUBLE / len(ws), 4) AS keep_ratio
       |FROM t LEFT JOIN cov USING (doc_id) WHERE len(ws) > 0 $rowFilter
       |ORDER BY t.doc_id""".stripMargin
  }

  /** The per-round unrolled BPE CTE chain, shared by the train and
    * vocab oracles: s1..s{R+1} word tables (s{r+1} = s{r} rewritten by
    * round r's argmax merge b{r}).
    */
  private def bpeRoundCtes(R: Int): Seq[String] = {
    val ctes = scala.collection.mutable.ArrayBuffer(
      s"tok AS (SELECT unnest($toksSql) AS word FROM documents)",
      s"""wf AS (SELECT word, count(*) AS wf FROM tok
         |      WHERE length(word) >= 2 AND regexp_matches(word, '^[a-z0-9]+$$')
         |      GROUP BY word)""".stripMargin,
      "s1 AS (SELECT regexp_replace(word, '(.)', '(\\1)', 'g') AS wstr, wf FROM wf)")
    for (r <- 1 to R) {
      ctes += s"""p$r AS (SELECT syms[i] AS x, syms[i+1] AS y, sum(wf) AS cnt
         |  FROM (SELECT regexp_extract_all(wstr, '\\(([^)]*)\\)', 1) AS syms, wf FROM s$r),
         |       LATERAL unnest(generate_series(1, len(syms) - 1)) t(i)
         |  GROUP BY x, y)""".stripMargin
      ctes += s"b$r AS (SELECT $r AS round, x, y, cnt FROM p$r ORDER BY cnt DESC, x, y LIMIT 1)"
      ctes += s"""s${r + 1} AS (SELECT replace(wstr, '(' || b.x || ')(' || b.y || ')',
         |  '(' || b.x || b.y || ')') AS wstr, wf FROM s$r, b$r b)""".stripMargin
    }
    ctes.toSeq
  }

  private lazy val bpeTrainOracle: String = {
    val R = graft.operators.TextAnalysisOps.BpeTrainRounds
    val union = (1 to R)
      .map(r => s"SELECT CAST(round AS BIGINT) AS round, x AS left_sym, y AS right_sym, CAST(cnt AS BIGINT) AS cnt FROM b$r")
      .mkString("\nUNION ALL\n")
    s"WITH ${bpeRoundCtes(R).mkString(",\n")}\n$union\nORDER BY round"
  }

  /** [[graft.operators.TextAnalysisOps.bpeVocab]]'s oracle: replay the
    * unrolled rounds, then census the FINAL word table's symbols.
    */
  private lazy val bpeVocabOracle: String = {
    val R = graft.operators.TextAnalysisOps.BpeTrainRounds
    val K = graft.operators.TextAnalysisOps.BpeVocabTopK
    s"""WITH ${bpeRoundCtes(R).mkString(",\n")},
       |census AS (SELECT sym, CAST(sum(wf) AS BIGINT) AS cnt
       |  FROM (SELECT unnest(regexp_extract_all(wstr, '\\(([^)]*)\\)', 1)) AS sym, wf
       |        FROM s${R + 1})
       |  GROUP BY sym)
       |SELECT sym, cnt FROM census ORDER BY cnt DESC, sym LIMIT $K""".stripMargin
  }

  /** [[graft.operators.TextAnalysisOps.bpeEncodeDocs]]'s oracle:
    * replay the unrolled rounds, reconstruct each word from its final
    * symbol string, and sum subword counts over every doc's encodable
    * word occurrences.
    */
  private lazy val bpeEncodeDocsOracle: String = {
    val R = graft.operators.TextAnalysisOps.BpeTrainRounds
    s"""WITH ${bpeRoundCtes(R).mkString(",\n")},
       |ws AS (SELECT regexp_replace(wstr, '\\(([^)]*)\\)', '\\1', 'g') AS word,
       |         len(regexp_extract_all(wstr, '\\(([^)]*)\\)', 1)) AS n_syms
       |       FROM s${R + 1}),
       |occ AS (SELECT doc_id, unnest($toksSql) AS word FROM documents),
       |f AS (SELECT doc_id, word FROM occ
       |      WHERE length(word) >= 2 AND regexp_matches(word, '^[a-z0-9]+$$')),
       |pd AS (SELECT doc_id, count(*) AS n_enc_words, sum(n_syms) AS n_subwords
       |       FROM f JOIN ws USING (word) GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(n_enc_words, 0)::BIGINT AS n_enc_words,
       |  coalesce(n_subwords, 0)::BIGINT AS n_subwords
       |FROM (SELECT doc_id FROM documents) d LEFT JOIN pd USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** Full DuckDB replay of the SQ8 quantized search ([[graft.operators.SimilarityOps.annSq8]]):
    * per-dimension min/max bounds, quantize/dequantize double math,
    * quantized rank to the rerank pool, exact-cosine rerank. Shared
    * verbatim by the `ann_sq8` gate and (nested as the approx side)
    * `ann_sq8_recall_eval`.
    */
  private lazy val sq8OracleSql: String =
    s"""WITH dx AS (SELECT vec_id, embedding,
       |    unnest(generate_series(1, len(embedding))) AS pos FROM embeddings),
       |b AS (SELECT pos, min(embedding[pos]::DOUBLE) AS lo,
       |             max(embedding[pos]::DOUBLE) AS hi FROM dx GROUP BY pos),
       |qx AS (SELECT vec_id, pos,
       |    coalesce(round((embedding[pos]::DOUBLE - lo) * 254.0 / NULLIF(hi - lo, 0.0), 0) - 127.0,
       |             0.0) AS code, lo, hi
       |  FROM dx JOIN b USING (pos)),
       |q AS (SELECT vec_id,
       |    list((lo + (code + 127.0) * (hi - lo) / 254.0)::FLOAT ORDER BY pos) AS dq
       |  FROM qx GROUP BY vec_id),
       |p AS (SELECT vec_id AS probe_id, dq AS pdq FROM q WHERE vec_id < 10),
       |s AS (SELECT probe_id, q.vec_id, ${cosSql("pdq", "dq")} AS score_q
       |      FROM q CROSS JOIN p WHERE q.vec_id <> probe_id),
       |r AS (SELECT probe_id, vec_id, score_q,
       |        row_number() OVER (PARTITION BY probe_id
       |          ORDER BY round(score_q, 6) DESC, vec_id) AS rnk_q FROM s),
       |cand AS (SELECT probe_id, vec_id, score_q FROM r WHERE rnk_q <= ${SimilarityOps.Sq8RerankM}),
       |x AS (SELECT probe_id, cand.vec_id, score_q,
       |        ${cosSql("pe.embedding", "e.embedding")} AS score
       |      FROM cand JOIN embeddings e ON cand.vec_id = e.vec_id
       |        JOIN embeddings pe ON pe.vec_id = probe_id),
       |r2 AS (SELECT probe_id, vec_id, score, score_q,
       |         row_number() OVER (PARTITION BY probe_id
       |           ORDER BY round(score, 6) DESC, vec_id) AS rnk FROM x)
       |SELECT probe_id, CAST(rnk AS BIGINT) AS rnk, vec_id,
       |  round(score, 4) + 0 AS score, round(score_q, 4) + 0 AS score_q
       |FROM r2 WHERE rnk <= 10 ORDER BY probe_id, rnk""".stripMargin

  /** The PQ search CTE chain + final SELECT — everything downstream
    * of the codebook: per-subspace argmin encode, concatenated
    * reconstruction, asymmetric quantized score, exact rerank. It
    * references a `cb(j, c)` CTE the caller's WITH-prefix must
    * define, so the seed ([[pqOracleSql]]) and the one-round-trained
    * ([[pqTrainedOracleSql]]) oracles share the search body
    * literally — the same probe-path-unchanged guarantee the Spark
    * side gets from reusing `annPqFrom`.
    */
  private lazy val pqSearchSql: String = {
    val m = SimilarityOps.PqM; val sub = SimilarityOps.PqSub
    val rr = SimilarityOps.PqRerankM
    s"""mm AS (SELECT unnest(generate_series(0, ${m - 1})) AS m),
       |enc AS (SELECT e.vec_id, mm.m, cb.j,
       |    list_sum(list_transform(generate_series(1, $sub), i ->
       |      cb.c[mm.m*$sub+i]::DOUBLE * cb.c[mm.m*$sub+i]::DOUBLE))
       |  - 2 * list_sum(list_transform(generate_series(1, $sub), i ->
       |      e.embedding[mm.m*$sub+i]::DOUBLE * cb.c[mm.m*$sub+i]::DOUBLE)) AS d
       |  FROM embeddings e CROSS JOIN mm CROSS JOIN cb),
       |best AS (SELECT vec_id, m, j FROM (
       |    SELECT vec_id, m, j, row_number() OVER (
       |      PARTITION BY vec_id, m ORDER BY d, j) AS rn FROM enc)
       |  WHERE rn = 1),
       |rx AS (SELECT b.vec_id, b.m, ii.i, cb.c[b.m*$sub+ii.i]::FLOAT AS x
       |  FROM best b JOIN cb USING (j)
       |  CROSS JOIN (SELECT unnest(generate_series(1, $sub)) AS i) ii),
       |recon AS (SELECT vec_id, list(x ORDER BY m, i) AS rc
       |  FROM rx GROUP BY vec_id),
       |p AS (SELECT vec_id AS probe_id, embedding AS pv
       |  FROM embeddings WHERE vec_id < 10),
       |sq AS (SELECT probe_id, r.vec_id, ${cosSql("pv", "rc")} AS score_q
       |  FROM recon r CROSS JOIN p WHERE r.vec_id <> probe_id),
       |rq AS (SELECT probe_id, vec_id, score_q, row_number() OVER (
       |    PARTITION BY probe_id
       |    ORDER BY round(score_q, 6) DESC, vec_id) AS rnk_q FROM sq),
       |cand AS (SELECT probe_id, vec_id, score_q FROM rq WHERE rnk_q <= $rr),
       |x AS (SELECT probe_id, cand.vec_id, score_q,
       |    ${cosSql("pe.embedding", "e.embedding")} AS score
       |  FROM cand JOIN embeddings e ON cand.vec_id = e.vec_id
       |    JOIN embeddings pe ON pe.vec_id = probe_id),
       |r2 AS (SELECT probe_id, vec_id, score, score_q, row_number() OVER (
       |    PARTITION BY probe_id
       |    ORDER BY round(score, 6) DESC, vec_id) AS rnk FROM x)
       |SELECT probe_id, CAST(rnk AS BIGINT) AS rnk, vec_id,
       |  round(score, 4) + 0 AS score, round(score_q, 4) + 0 AS score_q
       |FROM r2 WHERE rnk <= 10 ORDER BY probe_id, rnk""".stripMargin
  }

  /** Full DuckDB replay of the PQ search ([[graft.operators.SimilarityOps.annPq]])
    * over the SEED codebook (cb[j] = j-th smallest-vec_id embedding).
    * Shared by `ann_pq` and `ann_pq_recall_eval`.
    */
  private lazy val pqOracleSql: String =
    s"""WITH cb AS (SELECT vec_id AS j, embedding AS c
       |  FROM embeddings WHERE vec_id < ${SimilarityOps.PqK}),
       |$pqSearchSql""".stripMargin

  /** Full DuckDB replay of [[graft.operators.SimilarityOps.annPqTrained]]:
    * the one-Lloyd-round codebook training (assign every vector's
    * m-th subvector to its nearest seed slice by the same asymmetric
    * L2 argmin, recenter each (m, j) slice on the per-dimension
    * round(avg, 4)::FLOAT mean, empty slices keep their seed values)
    * followed by the UNCHANGED [[pqSearchSql]] body over the trained
    * `cb`. Training CTEs are t-prefixed so they can't shadow the
    * search chain's names.
    */
  private lazy val pqTrainedOracleSql: String =
    s"""WITH ${pqTrainedCbCtes("embeddings", "embedding", 1)},
       |$pqSearchSql""".stripMargin

  /** The one-Lloyd-round codebook training CTE chain ending in
    * `cb(j, c)` — shared verbatim by the trained-PQ oracle (over raw
    * embeddings), the composed IVF-PQ oracle (same input, nested
    * after the routing CTEs) and the IVFADC oracle (over the `res`
    * residual CTE): seeds are the stride-th id slice, every vector's
    * m-th subvector joins its nearest seed slice by the asymmetric-L2
    * argmin, slices recenter on round(avg, 4)::FLOAT means, empty
    * slices keep seeds. `rel`/`vcol` name the training relation and
    * its vector column so the chain is input-agnostic.
    */
  private def pqTrainedCbCtes(rel: String, vcol: String,
                              seedStride: Int): String = {
    val m = SimilarityOps.PqM; val sub = SimilarityOps.PqSub
    val kk = SimilarityOps.PqK
    val seedW =
      if (seedStride == 1) s"vec_id < $kk"
      else s"vec_id % $seedStride = 0 AND vec_id < ${seedStride * kk}"
    s"""scb AS (SELECT vec_id AS j, $vcol AS c
       |  FROM $rel WHERE $seedW),
       |tmm AS (SELECT unnest(generate_series(0, ${m - 1})) AS m),
       |tii AS (SELECT unnest(generate_series(1, $sub)) AS i),
       |tenc AS (SELECT e.vec_id, tmm.m, scb.j,
       |    list_sum(list_transform(generate_series(1, $sub), i ->
       |      scb.c[tmm.m*$sub+i]::DOUBLE * scb.c[tmm.m*$sub+i]::DOUBLE))
       |  - 2 * list_sum(list_transform(generate_series(1, $sub), i ->
       |      e.$vcol[tmm.m*$sub+i]::DOUBLE * scb.c[tmm.m*$sub+i]::DOUBLE)) AS d
       |  FROM $rel e CROSS JOIN tmm CROSS JOIN scb),
       |tbest AS (SELECT vec_id, m, j FROM (
       |    SELECT vec_id, m, j, row_number() OVER (
       |      PARTITION BY vec_id, m ORDER BY d, j) AS rn FROM tenc)
       |  WHERE rn = 1),
       |tref AS (SELECT b.m, b.j, tii.i,
       |    round(avg(e.$vcol[b.m*$sub+tii.i]::DOUBLE), 4) AS mv
       |  FROM tbest b JOIN $rel e USING (vec_id) CROSS JOIN tii
       |  GROUP BY b.m, b.j, tii.i),
       |tgrid AS (SELECT scb.j, tmm.m, tii.i,
       |    scb.c[tmm.m*$sub+tii.i]::DOUBLE AS seedv
       |  FROM scb CROSS JOIN tmm CROSS JOIN tii),
       |cb AS MATERIALIZED (SELECT j, list(coalesce(mv, seedv)::FLOAT ORDER BY m, i) AS c
       |  FROM tgrid LEFT JOIN tref USING (m, j, i) GROUP BY j)""".stripMargin
  }

  /** Full DuckDB replay of [[graft.operators.SimilarityOps.annIvfPq]]:
    * the `ann_ivf` routing CTEs (seed centroids, max-cosine
    * assignment, nprobe probe lists) composed with the TRAINED
    * codebook's encode/reconstruct CTEs (the `ann_pq_trained` model,
    * shared via [[pqTrainedCbCtes]]); candidate scoring joins the
    * probe's lists to the PQ reconstruction instead of either half's
    * all-pairs scan, then exact-reranks the top IvfPqRerankM (the
    * composed family's deeper rerank — its pool is already
    * list-pruned).
    */
  /** The seed-centroid IVF-flat search at a given probe width —
    * `ann_ivf`'s oracle, parameterized on nprobe so the sweep row
    * can replay every setting from the same chain.
    */
  private def ivfOracleSqlAt(nprobe: Int): String =
    s"""WITH c AS (SELECT vec_id AS centroid_id, embedding AS cvec FROM embeddings WHERE vec_id % 97 = 0 AND vec_id < 97 * 16),
       |ps AS (SELECT e.vec_id, c.centroid_id, e.embedding, ${cosSql("e.embedding", "c.cvec")} AS cscore
       |       FROM embeddings e CROSS JOIN c),
       |r AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY round(cscore, 6) DESC, centroid_id) AS crank FROM ps),
       |assign AS (SELECT vec_id, centroid_id, embedding FROM r WHERE crank = 1),
       |pl AS (SELECT vec_id AS probe_id, centroid_id, embedding AS probe_vec FROM r WHERE vec_id < 10 AND crank <= $nprobe),
       |sc AS (SELECT pl.probe_id, a.vec_id, ${cosSql("pl.probe_vec", "a.embedding")} AS score
       |       FROM pl JOIN assign a ON pl.centroid_id = a.centroid_id WHERE a.vec_id <> pl.probe_id),
       |r2 AS (SELECT probe_id, vec_id, score,
       |         row_number() OVER (PARTITION BY probe_id ORDER BY round(score, 6) DESC, vec_id) AS rnk
       |       FROM sc)
       |SELECT probe_id, rnk, vec_id, round(score, 4) + 0 AS score
       |FROM r2 WHERE rnk <= 10 ORDER BY probe_id, rnk""".stripMargin

  private lazy val ivfPqOracleSql: String = ivfPqOracleSqlAt(3)

  private def ivfPqOracleSqlAt(nprobe: Int): String = {
    val m = SimilarityOps.PqM; val sub = SimilarityOps.PqSub
    val rr = SimilarityOps.IvfPqRerankM
    s"""WITH ${pqTrainedCbCtes("embeddings", "embedding", 1)},
       |mm AS (SELECT unnest(generate_series(0, ${m - 1})) AS m),
       |enc AS (SELECT e.vec_id, mm.m, cb.j,
       |    list_sum(list_transform(generate_series(1, $sub), i ->
       |      cb.c[mm.m*$sub+i]::DOUBLE * cb.c[mm.m*$sub+i]::DOUBLE))
       |  - 2 * list_sum(list_transform(generate_series(1, $sub), i ->
       |      e.embedding[mm.m*$sub+i]::DOUBLE * cb.c[mm.m*$sub+i]::DOUBLE)) AS d
       |  FROM embeddings e CROSS JOIN mm CROSS JOIN cb),
       |best AS (SELECT vec_id, m, j FROM (
       |    SELECT vec_id, m, j, row_number() OVER (
       |      PARTITION BY vec_id, m ORDER BY d, j) AS rn FROM enc)
       |  WHERE rn = 1),
       |rx AS (SELECT b.vec_id, b.m, ii.i, cb.c[b.m*$sub+ii.i]::FLOAT AS x
       |  FROM best b JOIN cb USING (j)
       |  CROSS JOIN (SELECT unnest(generate_series(1, $sub)) AS i) ii),
       |recon AS (SELECT vec_id, list(x ORDER BY m, i) AS rc
       |  FROM rx GROUP BY vec_id),
       |c AS (SELECT vec_id AS centroid_id, embedding AS cvec
       |  FROM embeddings WHERE vec_id % 97 = 0 AND vec_id < 97 * 16),
       |ps AS (SELECT e.vec_id, c.centroid_id, e.embedding,
       |    ${cosSql("e.embedding", "c.cvec")} AS cscore
       |  FROM embeddings e CROSS JOIN c),
       |r AS (SELECT *, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY round(cscore, 6) DESC, centroid_id) AS crank FROM ps),
       |assign AS (SELECT vec_id, centroid_id FROM r WHERE crank = 1),
       |pl AS (SELECT vec_id AS probe_id, centroid_id, embedding AS probe_vec
       |  FROM r WHERE vec_id < 10 AND crank <= $nprobe),
       |sq AS (SELECT pl.probe_id, a.vec_id, ${cosSql("pl.probe_vec", "rn.rc")} AS score_q
       |  FROM pl JOIN assign a ON pl.centroid_id = a.centroid_id
       |    JOIN recon rn ON rn.vec_id = a.vec_id
       |  WHERE a.vec_id <> pl.probe_id),
       |rq AS (SELECT probe_id, vec_id, score_q, row_number() OVER (
       |    PARTITION BY probe_id
       |    ORDER BY round(score_q, 6) DESC, vec_id) AS rnk_q FROM sq),
       |cand AS (SELECT probe_id, vec_id, score_q FROM rq WHERE rnk_q <= $rr),
       |x AS (SELECT probe_id, cand.vec_id, score_q,
       |    ${cosSql("pe.embedding", "e.embedding")} AS score
       |  FROM cand JOIN embeddings e ON cand.vec_id = e.vec_id
       |    JOIN embeddings pe ON pe.vec_id = probe_id),
       |r2 AS (SELECT probe_id, vec_id, score, score_q, row_number() OVER (
       |    PARTITION BY probe_id
       |    ORDER BY round(score, 6) DESC, vec_id) AS rnk FROM x)
       |SELECT probe_id, CAST(rnk AS BIGINT) AS rnk, vec_id,
       |  round(score, 4) + 0 AS score, round(score_q, 4) + 0 AS score_q
       |FROM r2 WHERE rnk <= 10 ORDER BY probe_id, rnk""".stripMargin
  }

  /** From-scratch replay of [[graft.operators.SimilarityOps.annIvfPqUpsert]]:
    * BOTH frozen models retrained from the even-id corpus slice —
    * the PQ codebook (stride-2 seeds, one Lloyd round over corpus
    * vectors only) and the IVF centroids (the [[ivfUpsertOracle]]
    * chain, mod 98) — then EVERY vector (corpus ∪ batch) re-encoded
    * and re-routed under them, searched list-restricted with the PQ
    * screen + exact rerank. The hash match is the coded-layout
    * append == rebuild proof; `neighborFilter` is the delete leg's
    * searchable-corpus restriction.
    */
  /** Full DuckDB replay of [[graft.operators.SimilarityOps.annIvfAdc]]
    * (IVFADC): routing first (the residual needs the assignment),
    * then the per-vector residual `x − c(list)` in
    * double-subtract-then-float arithmetic, the SAME training chain
    * as the composed oracle run over the residuals
    * ([[pqTrainedCbCtes]] with rel = res), encode/decode of the
    * residual, reconstruction `c + decode(r)` (double-add-then-
    * float), and the identical search tail. Only the encoding input
    * differs from [[ivfPqOracleSql]] — which is the point of the
    * gated A/B.
    */
  private lazy val ivfAdcOracleSql: String = {
    val m = SimilarityOps.PqM; val sub = SimilarityOps.PqSub
    val rr = SimilarityOps.IvfPqRerankM
    val dim = m * sub
    s"""WITH c AS (SELECT vec_id AS centroid_id, embedding AS cvec
       |  FROM embeddings WHERE vec_id % 97 = 0 AND vec_id < 97 * 16),
       |ps AS (SELECT e.vec_id, c.centroid_id, e.embedding,
       |    ${cosSql("e.embedding", "c.cvec")} AS cscore
       |  FROM embeddings e CROSS JOIN c),
       |r AS MATERIALIZED (SELECT *, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY round(cscore, 6) DESC, centroid_id) AS crank FROM ps),
       |assign AS MATERIALIZED (SELECT vec_id, centroid_id FROM r WHERE crank = 1),
       |pl AS (SELECT vec_id AS probe_id, centroid_id, embedding AS probe_vec
       |  FROM r WHERE vec_id < 10 AND crank <= 3),
       |res AS MATERIALIZED (SELECT a.vec_id, a.centroid_id,
       |    list_transform(generate_series(1, $dim), d ->
       |      (e.embedding[d]::DOUBLE - c.cvec[d]::DOUBLE)::FLOAT) AS rvec
       |  FROM assign a JOIN embeddings e USING (vec_id)
       |    JOIN c ON a.centroid_id = c.centroid_id),
       |${pqTrainedCbCtes("res", "rvec", 1)},
       |mm AS (SELECT unnest(generate_series(0, ${m - 1})) AS m),
       |enc AS (SELECT e.vec_id, mm.m, cb.j,
       |    list_sum(list_transform(generate_series(1, $sub), i ->
       |      cb.c[mm.m*$sub+i]::DOUBLE * cb.c[mm.m*$sub+i]::DOUBLE))
       |  - 2 * list_sum(list_transform(generate_series(1, $sub), i ->
       |      e.rvec[mm.m*$sub+i]::DOUBLE * cb.c[mm.m*$sub+i]::DOUBLE)) AS d
       |  FROM res e CROSS JOIN mm CROSS JOIN cb),
       |best AS (SELECT vec_id, m, j FROM (
       |    SELECT vec_id, m, j, row_number() OVER (
       |      PARTITION BY vec_id, m ORDER BY d, j) AS rn FROM enc)
       |  WHERE rn = 1),
       |rx AS (SELECT b.vec_id, b.m, ii.i, cb.c[b.m*$sub+ii.i]::FLOAT AS x
       |  FROM best b JOIN cb USING (j)
       |  CROSS JOIN (SELECT unnest(generate_series(1, $sub)) AS i) ii),
       |reconr AS (SELECT vec_id, list(x ORDER BY m, i) AS rcr
       |  FROM rx GROUP BY vec_id),
       |recon AS (SELECT rr0.vec_id,
       |    list_transform(generate_series(1, $dim), d ->
       |      (c.cvec[d]::DOUBLE + rr0.rcr[d]::DOUBLE)::FLOAT) AS rc
       |  FROM reconr rr0 JOIN assign a USING (vec_id)
       |    JOIN c ON a.centroid_id = c.centroid_id),
       |sq AS (SELECT pl.probe_id, a.vec_id, ${cosSql("pl.probe_vec", "rn.rc")} AS score_q
       |  FROM pl JOIN assign a ON pl.centroid_id = a.centroid_id
       |    JOIN recon rn ON rn.vec_id = a.vec_id
       |  WHERE a.vec_id <> pl.probe_id),
       |rq AS (SELECT probe_id, vec_id, score_q, row_number() OVER (
       |    PARTITION BY probe_id
       |    ORDER BY round(score_q, 6) DESC, vec_id) AS rnk_q FROM sq),
       |cand AS (SELECT probe_id, vec_id, score_q FROM rq WHERE rnk_q <= $rr),
       |x AS (SELECT probe_id, cand.vec_id, score_q,
       |    ${cosSql("pe.embedding", "e.embedding")} AS score
       |  FROM cand JOIN embeddings e ON cand.vec_id = e.vec_id
       |    JOIN embeddings pe ON pe.vec_id = probe_id),
       |r2 AS (SELECT probe_id, vec_id, score, score_q, row_number() OVER (
       |    PARTITION BY probe_id
       |    ORDER BY round(score, 6) DESC, vec_id) AS rnk FROM x)
       |SELECT probe_id, CAST(rnk AS BIGINT) AS rnk, vec_id,
       |  round(score, 4) + 0 AS score, round(score_q, 4) + 0 AS score_q
       |FROM r2 WHERE rnk <= 10 ORDER BY probe_id, rnk""".stripMargin
  }

  /** One partitioning leg of the NSW graph oracle: seed centroids
    * from `seedRel` under `mod`, max-cosine assignment of `rel`, and
    * (when `pairRel` is given) the top-G within-cluster neighbor
    * edges of rel's vectors among pairRel's — the exact
    * [[graft.operators.SimilarityOps.nswTopG]] chain. CTE names are
    * `tag`-suffixed so two legs coexist in one WITH.
    */
  private def nswLegCtes(tag: String, mod: Int, rel: String,
                         seedRel: String, pairA: String,
                         pairB: String): String = {
    val g = SimilarityOps.NswG
    s"""c$tag AS (SELECT vec_id AS cid, embedding AS cvec FROM $seedRel
       |  WHERE vec_id % $mod = 0 AND vec_id < ${mod * 16}),
       |a$tag AS MATERIALIZED (SELECT vec_id, cid, embedding FROM (
       |    SELECT e.vec_id, c.cid, e.embedding, row_number() OVER (
       |      PARTITION BY e.vec_id
       |      ORDER BY round(${cosSql("e.embedding", "c.cvec")}, 6) DESC, c.cid) AS crank
       |    FROM $rel e CROSS JOIN c$tag c) WHERE crank = 1),
       |g$tag AS (SELECT vec_id AS src, dst FROM (
       |    SELECT a.vec_id, b.vec_id AS dst, row_number() OVER (
       |      PARTITION BY a.vec_id
       |      ORDER BY round(${cosSql("a.embedding", "b.embedding")}, 6) DESC, b.vec_id) AS rn
       |    FROM $pairA a JOIN $pairB b
       |      ON a.cid = b.cid AND b.vec_id <> a.vec_id) WHERE rn <= $g)""".stripMargin
  }

  /** The bounded best-first beam search of the NSW oracles, unrolled
    * [[graft.operators.SimilarityOps.NswRounds]] rounds over an
    * `edges` CTE the caller's WITH-prefix must define: v0 = scored
    * entry vertices, then per round beam → distinct unseen neighbors
    * → exact-scored union, every vN MATERIALIZED (the frontier-loop
    * oracle discipline). `liveWhere` restricts the SEARCHABLE
    * vertices (delete leg); probes always come from the full corpus.
    */
  private def nswSearchSql(liveWhere: String): String = {
    val b = SimilarityOps.NswBeam; val rounds = SimilarityOps.NswRounds
    val ent = SimilarityOps.NswEntries
    val roundCtes = (1 to rounds).map { r =>
      s"""b${r - 1} AS (SELECT probe_id, vec_id FROM (
         |    SELECT probe_id, vec_id, row_number() OVER (PARTITION BY probe_id
         |      ORDER BY round(score, 6) DESC, vec_id) AS rn FROM v${r - 1})
         |  WHERE rn <= $b),
         |n$r AS (SELECT DISTINCT b.probe_id, ed.dst AS vec_id
         |  FROM b${r - 1} b JOIN edges ed ON b.vec_id = ed.src
         |  WHERE ed.dst <> b.probe_id),
         |u$r AS (SELECT n.probe_id, n.vec_id FROM n$r n
         |  LEFT JOIN v${r - 1} v ON n.probe_id = v.probe_id AND n.vec_id = v.vec_id
         |  WHERE v.vec_id IS NULL),
         |v$r AS MATERIALIZED (SELECT * FROM v${r - 1} UNION ALL
         |  SELECT u.probe_id, u.vec_id, ${cosSql("p.pv", "w.embedding")} AS score
         |  FROM u$r u JOIN p ON u.probe_id = p.probe_id
         |    JOIN verts w ON u.vec_id = w.vec_id)""".stripMargin
    }.mkString(",\n")
    s"""verts AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings $liveWhere),
       |p AS (SELECT vec_id AS probe_id, embedding AS pv FROM embeddings WHERE vec_id < 10),
       |v0 AS MATERIALIZED (SELECT p.probe_id, w.vec_id,
       |    ${cosSql("p.pv", "w.embedding")} AS score
       |  FROM p CROSS JOIN verts w
       |  WHERE w.vec_id < $ent AND w.vec_id <> p.probe_id),
       |$roundCtes
       |SELECT probe_id, CAST(rnk AS BIGINT) AS rnk, vec_id,
       |  round(score, 4) + 0 AS score
       |FROM (SELECT probe_id, vec_id, score, row_number() OVER (
       |    PARTITION BY probe_id ORDER BY round(score, 6) DESC, vec_id) AS rnk
       |  FROM v$rounds)
       |WHERE rnk <= 10 ORDER BY probe_id, rnk""".stripMargin
  }

  /** Full DuckDB replay of [[graft.operators.SimilarityOps.annNsw]]:
    * both partitioning legs' within-cluster top-G edges, symmetrized
    * and deduped, then the unrolled beam walk. Shared verbatim by
    * `ann_nsw` and `ann_nsw_indexed` (index == inline proof) and
    * nested by the recall row.
    */
  private lazy val nswOracleSql: String = {
    val Seq(mA, mB) = SimilarityOps.NswMods
    s"""WITH ${nswLegCtes("A", mA, "embeddings", "embeddings", "aA", "aA")},
       |${nswLegCtes("B", mB, "embeddings", "embeddings", "aB", "aB")},
       |edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
       |  SELECT src, dst FROM gA UNION ALL SELECT dst, src FROM gA
       |  UNION ALL SELECT src, dst FROM gB UNION ALL SELECT dst, src FROM gB)),
       |${nswSearchSql("")}""".stripMargin
  }

  /** From-scratch replay of the NSW upsert CONTRACT
    * ([[graft.operators.SimilarityOps.nswAppendBatch]]): corpus
    * adjacency over the even-id slice under even-seeded
    * partitionings, batch vectors routed under the SAME frozen seeds
    * and linked to their top-G corpus cluster members (no
    * batch-batch links — the documented append semantics), all
    * symmetrized into one edge set, then the shared walk.
    * `liveWhere` is the delete leg's searchable-vertex restriction.
    */
  private def nswUpsertOracleSql(liveWhere: String): String = {
    val Seq(mA, mB) = SimilarityOps.NswUpsertMods
    s"""WITH ecorp AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 0),
       |obatch AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 1),
       |${nswLegCtes("A", mA, "ecorp", "ecorp", "aA", "aA")},
       |${nswLegCtes("BA", mA, "obatch", "ecorp", "aBA", "aA")},
       |${nswLegCtes("B", mB, "ecorp", "ecorp", "aB", "aB")},
       |${nswLegCtes("BB", mB, "obatch", "ecorp", "aBB", "aB")},
       |edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
       |  SELECT src, dst FROM gA UNION ALL SELECT dst, src FROM gA
       |  UNION ALL SELECT src, dst FROM gB UNION ALL SELECT dst, src FROM gB
       |  UNION ALL SELECT src, dst FROM gBA UNION ALL SELECT dst, src FROM gBA
       |  UNION ALL SELECT src, dst FROM gBB UNION ALL SELECT dst, src FROM gBB)),
       |${nswSearchSql(liveWhere)}""".stripMargin
  }

  private def ivfPqUpsertOracle(neighborFilter: String): String = {
    val m = SimilarityOps.PqM; val sub = SimilarityOps.PqSub
    val rr = SimilarityOps.IvfPqRerankM
    val mod = 98; val numC = 16
    s"""WITH ecorp AS (SELECT vec_id, embedding FROM embeddings
       |  WHERE vec_id % 2 = 0),
       |${pqTrainedCbCtes("ecorp", "embedding", 2)},
       |c0 AS (SELECT vec_id AS centroid_id, embedding AS cvec FROM embeddings
       |  WHERE vec_id % 2 = 0 AND vec_id % $mod = 0 AND vec_id < ${mod.toLong * numC}),
       |s0 AS (SELECT e.vec_id, c.centroid_id, e.embedding,
       |  ${cosSql("e.embedding", "c.cvec")} AS cscore
       |  FROM embeddings e CROSS JOIN c0 c WHERE e.vec_id % 2 = 0),
       |r0 AS (SELECT *, row_number() OVER (PARTITION BY vec_id
       |  ORDER BY round(cscore, 6) DESC, centroid_id) AS crank FROM s0),
       |a0 AS (SELECT vec_id, centroid_id, embedding FROM r0 WHERE crank = 1),
       |e0 AS (SELECT centroid_id, embedding,
       |  unnest(generate_series(1, len(embedding))) AS pos FROM a0),
       |ref0 AS (SELECT centroid_id, pos, round(avg(embedding[pos]::DOUBLE), 4) AS cm
       |  FROM e0 GROUP BY centroid_id, pos),
       |c1 AS (SELECT centroid_id, list(cm::FLOAT ORDER BY pos) AS cvec
       |  FROM ref0 GROUP BY centroid_id),
       |sf AS (SELECT e.vec_id, c.centroid_id, e.embedding,
       |  ${cosSql("e.embedding", "c.cvec")} AS cscore
       |  FROM embeddings e CROSS JOIN c1 c),
       |rf AS (SELECT *, row_number() OVER (PARTITION BY vec_id
       |  ORDER BY round(cscore, 6) DESC, centroid_id) AS crank FROM sf),
       |assign AS (SELECT vec_id, centroid_id FROM rf WHERE crank = 1),
       |pl AS (SELECT vec_id AS probe_id, centroid_id, embedding AS probe_vec
       |  FROM rf WHERE vec_id < 10 AND crank <= 3),
       |mm AS (SELECT unnest(generate_series(0, ${m - 1})) AS m),
       |enc AS (SELECT e.vec_id, mm.m, cb.j,
       |    list_sum(list_transform(generate_series(1, $sub), i ->
       |      cb.c[mm.m*$sub+i]::DOUBLE * cb.c[mm.m*$sub+i]::DOUBLE))
       |  - 2 * list_sum(list_transform(generate_series(1, $sub), i ->
       |      e.embedding[mm.m*$sub+i]::DOUBLE * cb.c[mm.m*$sub+i]::DOUBLE)) AS d
       |  FROM embeddings e CROSS JOIN mm CROSS JOIN cb),
       |best AS (SELECT vec_id, m, j FROM (
       |    SELECT vec_id, m, j, row_number() OVER (
       |      PARTITION BY vec_id, m ORDER BY d, j) AS rn FROM enc)
       |  WHERE rn = 1),
       |rx AS (SELECT b.vec_id, b.m, ii.i, cb.c[b.m*$sub+ii.i]::FLOAT AS x
       |  FROM best b JOIN cb USING (j)
       |  CROSS JOIN (SELECT unnest(generate_series(1, $sub)) AS i) ii),
       |recon AS (SELECT vec_id, list(x ORDER BY m, i) AS rc
       |  FROM rx GROUP BY vec_id),
       |sq AS (SELECT pl.probe_id, a.vec_id, ${cosSql("pl.probe_vec", "rn2.rc")} AS score_q
       |  FROM pl JOIN assign a ON pl.centroid_id = a.centroid_id
       |    JOIN recon rn2 ON rn2.vec_id = a.vec_id
       |  WHERE a.vec_id <> pl.probe_id $neighborFilter),
       |rq AS (SELECT probe_id, vec_id, score_q, row_number() OVER (
       |    PARTITION BY probe_id
       |    ORDER BY round(score_q, 6) DESC, vec_id) AS rnk_q FROM sq),
       |cand AS (SELECT probe_id, vec_id, score_q FROM rq WHERE rnk_q <= $rr),
       |x AS (SELECT probe_id, cand.vec_id, score_q,
       |    ${cosSql("pe.embedding", "e.embedding")} AS score
       |  FROM cand JOIN embeddings e ON cand.vec_id = e.vec_id
       |    JOIN embeddings pe ON pe.vec_id = probe_id),
       |r2 AS (SELECT probe_id, vec_id, score, score_q, row_number() OVER (
       |    PARTITION BY probe_id
       |    ORDER BY round(score, 6) DESC, vec_id) AS rnk FROM x)
       |SELECT probe_id, CAST(rnk AS BIGINT) AS rnk, vec_id,
       |  round(score, 4) + 0 AS score, round(score_q, 4) + 0 AS score_q
       |FROM r2 WHERE rnk <= 10 ORDER BY probe_id, rnk""".stripMargin
  }

  /** Recall@10 oracle: brute-force exact top-10 vs `approxSql` (a
    * complete search SELECT, nested as a subquery — its inner CTEs
    * shadow the outer ones), intersected and reduced to the 1-row
    * (hits, total, recall) metric — the ann_recall_eval shape, shared
    * by the SQ8/PQ recall rows.
    */
  private def annRecallOracle(approxSql: String): String =
    s"""WITH p AS (SELECT vec_id AS probe_id, embedding AS probe_vec FROM embeddings WHERE vec_id < 10),
       |s AS (SELECT probe_id, vec_id, ${cosSql("probe_vec", "embedding")} AS score
       |      FROM embeddings CROSS JOIN p WHERE vec_id <> probe_id),
       |r AS (SELECT probe_id, vec_id,
       |        row_number() OVER (PARTITION BY probe_id ORDER BY round(score, 6) DESC, vec_id) AS rnk
       |      FROM s),
       |ex AS (SELECT probe_id, vec_id FROM r WHERE rnk <= 10),
       |ap AS (SELECT probe_id, vec_id FROM ($approxSql) aq),
       |m AS (SELECT count(*) AS hits FROM ex JOIN ap USING (probe_id, vec_id)),
       |t AS (SELECT count(*) AS total FROM ex)
       |SELECT hits::BIGINT AS hits, total::BIGINT AS total,
       |  ${TextAnalysisOps.det4Sql("hits::DOUBLE / total")} AS recall
       |FROM m, t""".stripMargin

  /** Degree-ordered triangle oracle, shared verbatim by the inline
    * and the persisted-index triangle queries (index == inline proof).
    * Row-value (tuple) comparisons mirror Spark's struct ordering;
    * every CTE MATERIALIZED (the exponential-inlining lesson).
    */
  private lazy val coorderTrianglesOracle: String =
    s"""WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
             |edges AS MATERIALIZED (SELECT DISTINCT a.pk AS u, b.pk AS v
             |          FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk),
             |deg AS MATERIALIZED (SELECT p, count(*) AS deg FROM (
             |          SELECT u AS p FROM edges UNION ALL SELECT v FROM edges)
             |        GROUP BY p),
             |oriented AS MATERIALIZED (
             |  SELECT CASE WHEN (du, u) < (dv, v) THEN u ELSE v END AS src,
             |         CASE WHEN (du, u) < (dv, v) THEN v ELSE u END AS dst,
             |         CASE WHEN (du, u) < (dv, v) THEN dv ELSE du END AS ddeg
             |  FROM (SELECT e.u, e.v, du.deg AS du, dv.deg AS dv
             |        FROM edges e JOIN deg du ON e.u = du.p JOIN deg dv ON e.v = dv.p)),
             |tri AS MATERIALIZED (
             |  SELECT w.tu, w.tv, w.tw FROM (
             |    SELECT e1.src AS tu, e1.dst AS tv, e2.dst AS tw
             |    FROM oriented e1 JOIN oriented e2
             |    ON e1.src = e2.src AND (e1.ddeg, e1.dst) < (e2.ddeg, e2.dst)) w
             |  JOIN oriented o ON w.tv = o.src AND w.tw = o.dst),
             |nodes AS (SELECT tu AS p FROM tri UNION ALL
             |          SELECT tv FROM tri UNION ALL SELECT tw FROM tri)
             |SELECT p AS l_partkey, count(*) AS n_tri FROM nodes GROUP BY p
             |ORDER BY n_tri DESC, l_partkey LIMIT ${GraphOps.TriangleTopK}""".stripMargin

  /** Shared blocked-candidate CTEs of the fuzzy-resolution family:
    * distinct names exploded to position-tagged first/last-token
    * block keys ([[graft.operators.ResolutionOps.fuzzyPartPairs]]),
    * candidate pairs deduped across blocks.
    */
  private lazy val fuzzyCandCtes: String =
    """WITH names AS (SELECT DISTINCT p_name FROM part),
      |blocks AS (SELECT p_name, unnest(list_distinct([
      |    'f:' || split_part(p_name, ' ', 1),
      |    'l:' || string_split(p_name, ' ')[-1],
      |    's:' || array_to_string(list_sort(list_distinct(string_split(p_name, ' '))), ' ')])) AS blk
      |  FROM names),
      |cand AS (SELECT DISTINCT a.p_name AS name_a, b.p_name AS name_b
      |  FROM blocks a JOIN blocks b USING (blk)
      |  WHERE a.p_name < b.p_name)""".stripMargin

  private lazy val componentsOracleBody: String =
    s"""WITH RECURSIVE $jaccardPairsBody,
       |sym AS MATERIALIZED (SELECT a_id AS u, b_id AS v FROM pairs
       |        UNION ALL SELECT b_id, a_id FROM pairs),
       |walk(node, label) AS (
       |  SELECT DISTINCT u, u FROM sym
       |  UNION
       |  SELECT s.u, k.label FROM walk k JOIN sym s ON s.v = k.node
       |  WHERE k.label < s.u),
       |comp AS (SELECT node, min(label) AS component FROM walk GROUP BY node)""".stripMargin

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, v) => k -> v.run }.toMap

  lazy val oracleSql: Map[String, String] =
    registry.flatMap { case (k, v) => v.oracle.map(k -> _) }.toMap
}
