package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, pmod}

import graft.functions.VectorFunctions
import graft.operators._

import graft.operators.{SimilarityOps, TextAnalysisOps, GraphOps, EventsOps}

/** Oracle-SQL builders of the text-analysis / retrieval / pipeline
  * families (BM25, RRF, BPE, the cleaning funnel, priority sampling).
  * Split next to [[QueriesTextAnalysis]]/[[QueriesPipelines]]; pure
  * code motion, hash-neutral. */
private[graft] trait OracleHelpersText { this: OracleHelpersCore =>


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

}
