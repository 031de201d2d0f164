package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, pmod}

import graft.functions.VectorFunctions
import graft.operators._

import graft.operators.{SimilarityOps, TextAnalysisOps, GraphOps, EventsOps}

/** Shared oracle-SQL builders of the query registry: tokenization,
  * vector math, the model-training CTE chains, and every multi-query
  * SQL body two or more registry families reference. Pure string
  * generation — splitting it from the per-family registries keeps
  * each reviewable without touching a single oracle byte (the split
  * is hash-neutral by construction: the composed registry Seq is the
  * same values in the same order).
  */
private[graft] trait QueriesOracleHelpers {

  /** Watermark delay (ms) of the streamed watermark layout — the
    * oracle must apply the same horizon the stream ran with.
    */
  protected val wmDelayMs = graft.streaming.EventStreams.WatermarkDelayMs

  /** Shared oracle of `priority_sample_weighted` AND
    * `streamed_priority_sample`: the streamed fold's final state must
    * replay the batch sampler over the whole corpus row for row
    * (top-K over union is associative), so one SQL text gates both.
    */
  protected lazy val prioritySampleSql =
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
  protected lazy val bm25Sql = bm25SqlRanking("")

  /** [[bm25Sql]] with an optional WHERE on the ranked set — the
    * delete-leg oracle ranks only LIVE documents while keeping the
    * full-corpus statistics (the stale-stats deferred-delete
    * semantics the tombstoned index implements).
    */
  protected def bm25SqlRanking(rankWhere: String): String =
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
  protected lazy val hybridRrfSql: String =
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

  protected val toksSql =
    """list_filter(string_split_regex(lower(text), '[ \t\n\r\f]+'), w -> w <> '')"""

  /** Shared by the batch window and the streamed keyed-state form —
    * the time-split staged replay makes them provably identical. */
  protected val attributionSql =
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
  protected def shinglesSql(n: Int): String =
    s"list_distinct(list_transform(generate_series(1, len(ws) - ${n - 1}), i -> array_to_string(ws[i:i+${n - 1}], ' ')))"

  /** DuckDB: double-precision cosine between two list<float> exprs —
    * identical op order to CosineSimilarityFloat.doGenCode.
    */
  protected def cosSql(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"list_sum(list_transform(generate_series(1, len($a)), i -> $x[i]::DOUBLE * $y[i]::DOUBLE))"
    s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"
  }

  protected def l2Sql(a: String): String =
    s"sqrt(list_sum(list_transform(generate_series(1, len($a)), i -> $a[i]::DOUBLE * $a[i]::DOUBLE)))"

  /** DuckDB oracle for [[SimilarityOps.annIvfKmeans]] with `iters`
    * Lloyd rounds: the per-round assign→refine CTE chain is unrolled
    * from the SAME iteration count the Spark side runs (moveEps = 0
    * disables the early stop), so the two sides cannot diverge on
    * round count.
    */
  protected def kmeansOracleSql(iters: Int): String =
    s"WITH ${kmeansOracleCtes(iters)}\n" +
      "SELECT probe_id, rnk, vec_id, round(score, 4) + 0 AS score " +
      "FROM r2 WHERE rnk <= 10 ORDER BY probe_id, rnk"

  /** The CTE chain of [[kmeansOracleSql]] (ending at `r2`, the ranked
    * IVF result), without the WITH keyword or final SELECT — reusable
    * inside composite oracles (ann_recall_eval joins it against the
    * brute-force chain).
    */
  protected def kmeansOracleCtes(iters: Int): String = {
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
  protected lazy val ivfUpsertOracleSql: String = ivfUpsertOracle("")

  /** [[graft.operators.SimilarityOps.annIvfUpsert]]'s from-scratch
    * replay; `neighborFilter` additionally restricts the searchable
    * corpus (the delete query's tombstone contract — probes still
    * query, deleted ids just can't be returned).
    */
  protected def ivfUpsertOracle(neighborFilter: String): String = {
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
  protected def simhashSqlCte(bits: Int): String = {
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
  protected def winnowFpCte: String = {
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
  protected def simhashDupOracleSql: String = {
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
  protected val lateralTopNSql: String =
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
  protected val recursiveSeriesSql: String =
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
  protected val recursiveChainSql: String =
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
  protected val sqlUdfSelect: String =
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
  protected lazy val cdcApplySql: String = {
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


  /** DuckDB mirror of [[graft.operators.SimilarityOps
    * .embeddingProjection]]: the same Achlioptas matrix
    * (SimilarityOps.jlWeight — shared code, not a copied table), the
    * same ascending-j left-associative summation (`a - b + c` parses
    * left-assoc, and IEEE `a + (-b)` == `a - b`), the same scale
    * constant (Scala's shortest-round-trip Double print re-parses to
    * the identical double in DuckDB).
    */
  protected def jlProjectionSql(dims: Int = 64): String = {
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
  protected lazy val cleanPipelineOracle: String = {
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
  protected lazy val filterFunnelOracle: String = {
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
  protected lazy val jaccardPairsBody: String = jaccardPairsBodyWhere("")

  /** The exact-Jaccard pair CTE chain over a filtered doc universe
    * (`docFilter` e.g. "WHERE doc_id % 10 != 6" — the take-down
    * oracle's live corpus).
    */
  protected def jaccardPairsBodyWhere(docFilter: String): String =
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

  protected lazy val jaccardOracle: String =
    s"""WITH $jaccardPairsBody
       |SELECT a_id, b_id, jac FROM pairs ORDER BY a_id, b_id""".stripMargin

  /** [[jaccardOracle]] restricted to pairs with >= 1 batch (odd-id)
    * endpoint — the ground truth for both the batch incremental LSH
    * probe and the streamed ingest pairs it feeds.
    */
  protected lazy val incrementalJaccardOracle: String =
    s"""WITH $jaccardPairsBody
       |SELECT a_id, b_id, jac FROM pairs
       |WHERE a_id % 2 = 1 OR b_id % 2 = 1
       |ORDER BY a_id, b_id""".stripMargin

  /** [[incrementalJaccardOracle]] over the post-take-down universe:
    * the deleted corpus slice is excluded from pairing entirely.
    */
  protected lazy val lshDeleteOracle: String = {
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
  protected lazy val semanticOracleBody: String = {
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
  protected lazy val incrementalSemanticOracleBody: String =
    incrementalSemanticOracle("")

  /** [[incrementalSemanticOracleBody]] with an optional extra
    * predicate on the assignment rows — the delete-leg oracle drops
    * the tombstoned corpus vectors BEFORE the mega-cluster cap (the
    * engine advances its stored counts eagerly on delete, so the cap
    * sees the live population) while the centroid MODEL stays the
    * frozen pre-delete one (deletion never retrains).
    */
  protected def incrementalSemanticOracle(liveAnd: String): String = {
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
  protected def incrementalPagerankOracle(extraBatch: String): String = {
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
  protected lazy val streamedSessionsOracle: String = {
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
  protected def substrCoverageOracle(docFilter: String, rowFilter: String): String = {
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
  protected def bpeRoundCtes(R: Int): Seq[String] = {
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

  protected lazy val bpeTrainOracle: String = {
    val R = graft.operators.TextAnalysisOps.BpeTrainRounds
    val union = (1 to R)
      .map(r => s"SELECT CAST(round AS BIGINT) AS round, x AS left_sym, y AS right_sym, CAST(cnt AS BIGINT) AS cnt FROM b$r")
      .mkString("\nUNION ALL\n")
    s"WITH ${bpeRoundCtes(R).mkString(",\n")}\n$union\nORDER BY round"
  }

  /** [[graft.operators.TextAnalysisOps.bpeVocab]]'s oracle: replay the
    * unrolled rounds, then census the FINAL word table's symbols.
    */
  protected lazy val bpeVocabOracle: String = {
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
  protected lazy val bpeEncodeDocsOracle: String = {
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
  protected lazy val sq8OracleSql: String =
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
  protected lazy val pqSearchSql: String = {
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
  protected lazy val pqOracleSql: String =
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
  protected lazy val pqTrainedOracleSql: String =
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
  protected def pqTrainedCbCtes(rel: String, vcol: String,
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
  protected def ivfOracleSqlAt(nprobe: Int): String =
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

  protected lazy val ivfPqOracleSql: String = ivfPqOracleSqlAt(3)

  protected def ivfPqOracleSqlAt(nprobe: Int): String = {
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
  protected lazy val ivfAdcOracleSql: String = {
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

  /** One partitioning leg of the NSW graph oracle: ADAPTIVE-K
    * hash-spread seed centroids from `seedRel` under offset `mod`
    * (K = max(SemMinK, ceil(sqrt n)), stride = n // k — the exact
    * [[graft.operators.SimilarityOps.semAdaptiveParams]] +
    * nswSeedCentroids formula, derived from count(*) with the same
    * greatest/ceil/sqrt/integer-division ops so both engines always
    * land on the same cluster layout), max-cosine assignment of
    * `rel`, and the top-G within-cluster neighbor edges of rel's
    * vectors among pairRel's — the exact
    * [[graft.operators.SimilarityOps.nswTopG]] chain. CTE names are
    * `tag`-suffixed so two legs coexist in one WITH.
    */
  protected def nswLegCtes(tag: String, mod: Int, rel: String,
                         seedRel: String, pairA: String,
                         pairB: String): String = {
    val g = SimilarityOps.NswG
    val p = graft.functions.expressions.CmsHash.P
    s"""pk$tag AS (SELECT CAST(greatest(${SimilarityOps.SemMinK}, ceil(sqrt(count(*)))) AS BIGINT) AS k,
       |    count(*) AS n FROM $seedRel),
       |pp$tag AS (SELECT k, greatest(1, n // k) AS stride FROM pk$tag),
       |c$tag AS (SELECT vec_id AS cid, embedding AS cvec FROM $seedRel, pp$tag
       |  WHERE (vec_id + $mod) % $p % stride = 0
       |  QUALIFY row_number() OVER (ORDER BY vec_id) <= k),
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
  protected def nswSearchSql(liveWhere: String): String = {
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
  protected lazy val nswOracleSql: String = {
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
  protected def nswUpsertOracleSql(liveWhere: String): String = {
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

  protected def ivfPqUpsertOracle(neighborFilter: String): String = {
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
  protected def annRecallOracle(approxSql: String): String =
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
  protected lazy val coorderTrianglesOracle: String =
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
  protected lazy val fuzzyCandCtes: String =
    """WITH names AS (SELECT DISTINCT p_name FROM part),
      |blocks AS (SELECT p_name, unnest(list_distinct([
      |    'f:' || split_part(p_name, ' ', 1),
      |    'l:' || string_split(p_name, ' ')[-1],
      |    's:' || array_to_string(list_sort(list_distinct(string_split(p_name, ' '))), ' ')])) AS blk
      |  FROM names),
      |cand AS (SELECT DISTINCT a.p_name AS name_a, b.p_name AS name_b
      |  FROM blocks a JOIN blocks b USING (blk)
      |  WHERE a.p_name < b.p_name)""".stripMargin

  protected lazy val componentsOracleBody: String =
    s"""WITH RECURSIVE $jaccardPairsBody,
       |sym AS MATERIALIZED (SELECT a_id AS u, b_id AS v FROM pairs
       |        UNION ALL SELECT b_id, a_id FROM pairs),
       |walk(node, label) AS (
       |  SELECT DISTINCT u, u FROM sym
       |  UNION
       |  SELECT s.u, k.label FROM walk k JOIN sym s ON s.v = k.node
       |  WHERE k.label < s.u),
       |comp AS (SELECT node, min(label) AS component FROM walk GROUP BY node)""".stripMargin

}
