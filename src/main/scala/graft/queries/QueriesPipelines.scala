package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, pmod}

import graft.functions.VectorFunctions
import graft.operators._

/** Registry slice: corpus pipelines (mixing, sampling, curriculum). */
private[graft] trait QueriesPipelines extends QueriesOracleHelpers {

  protected lazy val pipelinesRegistry: Seq[(String, QueryDef)] = Seq(

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
  )
}
