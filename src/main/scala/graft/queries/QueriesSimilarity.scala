package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, pmod}

import graft.functions.VectorFunctions
import graft.operators._

/** Registry slice: similarity search / embeddings. */
private[graft] trait QueriesSimilarity extends QueriesOracleHelpers {

  protected lazy val similarityRegistry: Seq[(String, QueryDef)] = Seq(

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

    // recall@10 of the graph walk vs brute force: 0.73 at sf0.01
    // under the adaptive-K (~n^1.5) build — still the best of the
    // seven families, because the walk scores ~300 candidates
    // EXACTLY (no routing cliff, no quantization blur). The approx
    // side walks the persisted adjacency (index == inline is
    // hash-proven by ann_nsw_indexed), so the eval never re-pays
    // the build
    "ann_nsw_recall_eval" -> QueryDef(
      (s, d) => { VectorFunctions.register(s)
        SimilarityOps.annNswRecallEval(Tables.embeddings(s, d), d) },
      Some(annRecallOracle(nswOracleSql))),

    // the graph family's tuning curve (the nprobe-sweep discipline
    // on the entries knob): recall@10 of the SAME persisted
    // adaptive-K adjacency walked from 4/8/16 entry vertices — the
    // measured price list for recovering the adaptive-K recall loss
    // without any rebuild; each leg's oracle replays the whole
    // build + walk from scratch at that entry count
    "ann_nsw_entry_sweep" -> QueryDef(
      (s, d) => { VectorFunctions.register(s)
        SimilarityOps.annNswEntrySweep(Tables.embeddings(s, d), d) },
      Some {
        val legs = SimilarityOps.NswEntrySweep.map { e =>
          s"""SELECT CAST($e AS BIGINT) AS entries,
             |  q.hits, q.total, q.recall
             |FROM (
             |${annRecallOracle(nswOracleSqlAt(e))}
             |) q""".stripMargin
        }
        legs.mkString("", "\nUNION ALL\n", "\nORDER BY entries")
      }),

    // the graph family's SECOND no-rebuild knob (r18 verdict #7 —
    // the lever the entry-sweep doc promised to price): recall@10 of
    // the same persisted adjacency walked at beam ∈ {8, 16, 32};
    // entries widens the walk's start, beam widens every subsequent
    // round, probe cost linear in beam, corpus-size-independent;
    // each leg's oracle replays build + walk at that beam width
    "ann_nsw_beam_sweep" -> QueryDef(
      (s, d) => { VectorFunctions.register(s)
        SimilarityOps.annNswBeamSweep(Tables.embeddings(s, d), d) },
      Some {
        val legs = SimilarityOps.NswBeamSweep.map { b =>
          s"""SELECT CAST($b AS BIGINT) AS beam,
             |  q.hits, q.total, q.recall
             |FROM (
             |${annRecallOracle(nswOracleSqlAt(beam = b))}
             |) q""".stripMargin
        }
        legs.mkString("", "\nUNION ALL\n", "\nORDER BY beam")
      }),

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

    // the graph lifecycle's COMPACT leg: every edge touching a
    // tombstoned vertex physically dropped, lists rewritten as
    // NswCompactFiles whole files, published by rename; the probe
    // over the compacted layout is gated by the SAME from-scratch
    // oracle as the delete leg — compaction is invisible to search
    "ann_nsw_compacted" -> QueryDef(
      (s, d) => { VectorFunctions.register(s)
        SimilarityOps.annNswCompacted(Tables.embeddings(s, d), d) },
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
  )
}
