package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, pmod}

import graft.functions.VectorFunctions
import graft.operators._

import graft.operators.{SimilarityOps, TextAnalysisOps, GraphOps, EventsOps}

/** Oracle-SQL builders of the vector-index family (kmeans, IVF, PQ,
  * IVF-PQ, IVFADC, SQ8, NSW, the recall evaluator). Split out of the
  * former single-file QueriesOracleHelpers next to
  * [[QueriesSimilarity]]; pure code motion, hash-neutral. */
private[graft] trait OracleHelpersSimilarity { this: OracleHelpersCore =>


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
    *
    * DISK-BOUNDED formulation, third generation (r19; the r17
    * list-carrying form exhausted >75 GB of DuckDB temp and the r18
    * staged-narrow-CTE form still hit the 59 GiB cap at the 100×
    * fixture — MATERIALIZED pair CTEs live for the whole query and
    * the ranking windows sort the full ~10⁸–10⁹-row pair volume).
    * This form never materializes or globally sorts the big
    * intermediates at all:
    *
    *  - ASSIGNMENT is a single streaming hash aggregate: the n×K
    *    scored cross join flows into `arg_max(cid, val)` per vector,
    *    with (rs, -cid) encoded into ONE BIGINT
    *    (`round(rs·10⁶)·2⁴² − cid` — rs is already 6-dp rounded, so
    *    the scaled term is an exact integer and the encoding is a
    *    strictly monotone map of the (rs DESC, cid ASC) ranking;
    *    2⁴² > any vec_id, guarded loudly in c$tag). ~n groups of
    *    fixed-width state, zero temp, replacing an n×K MATERIALIZED
    *    CTE + window sort (duckdb 1.0 has no arg_max top-n or struct
    *    comparators, hence the scalar encoding).
    *  - TOP-G pairing never gives the optimizer an unbounded build
    *    side: each leg materializes its assignment WITH the d-columns
    *    once (`aw$tag` = a$tag ⋈ emb64, n wide rows, ~105 MB at the
    *    100× fixture), so a slice is ONE self-join of two bounded
    *    n-row CTE scans. The profiled failure mode this removes:
    *    with per-slice `JOIN emb64 ea/eb` chains, DuckDB 1.0's
    *    misestimated join order BUILT hash tables on the multi-
    *    million-row wide pair side (measured ~10 s and gigabytes per
    *    build, 16 of them → external joins spilling 130-double rows,
    *    ~76 G RSS + 56 G temp for two legs).
    *  - Slicing by cluster (`a.cid % NswOracleSlices`) into per-slice
    *    MATERIALIZED CTEs: a vector belongs to exactly ONE cluster
    *    per leg, so per-slice row_number windows are globally
    *    correct. DuckDB schedules the slice pipelines concurrently,
    *    which is now FINE because a slice's working set is bounded
    *    (~0.6 GB at the 100× fixture: one n-row build, a ~P/slices-
    *    group agg, a narrow window); what a slice persists is only
    *    its top-G edge rows (≤ n·G/slices). Do NOT "serialize" the
    *    slices with scalar-subquery dependencies — measured: DuckDB
    *    plans `(SELECT count(*) FROM sl_{i-1}) >= 0` as a
    *    BLOCKWISE_NL_JOIN that BUFFERS the wide multi-million-row
    *    pair stream per slice (~70 GB across 15 deps, 1.7 GB/s of
    *    temp until the cap).
    *  - The score reaches the window through an identity hash
    *    aggregate (GROUP BY (src, dst) with max(rs): every group is
    *    a single row) so the window's buffered input is the narrow
    *    (src, dst, rs) triple, never the join's wide rows, and the
    *    slice filter pushes into the pair join so total cosine work
    *    stays 1×.
    *
    * All relations are [[emb64Cte]] slices (scalar d1..d64 + staged
    * nrm, never the float list); scores come from [[cos64ColsSql]],
    * bit-identical to the list form (see its doc). g$tag stays
    * MATERIALIZED — it is model-sized (≤ n·G rows) and the upsert
    * oracle references each leg twice.
    */
  protected def nswLegCtes(tag: String, mod: Int, rel: String,
                         seedRel: String, pairA: String,
                         pairB: String): String = {
    val g = SimilarityOps.NswG
    val p = graft.functions.expressions.CmsHash.P
    val slices = NswOracleSlices
    require(pairA.startsWith("a") && pairB.startsWith("a"),
      s"pair relations must be a-prefixed assignment CTEs: $pairA, $pairB")
    val (pA, pB) = ("aw" + pairA.stripPrefix("a"), "aw" + pairB.stripPrefix("a"))
    val sliceCtes = (0 until slices).map { i =>
      s"""sl${tag}_$i AS MATERIALIZED (
         |  SELECT src, dst FROM (
         |    SELECT src, dst, row_number() OVER (
         |      PARTITION BY src ORDER BY rs DESC, dst) AS rn
         |    FROM (SELECT a.vec_id AS src, b.vec_id AS dst,
         |        max(round(${cos64ColsSql("a", "b")}, 6)) AS rs
         |      FROM $pA a JOIN $pB b
         |        ON a.cid = b.cid AND b.vec_id <> a.vec_id
         |      WHERE a.cid % $slices = $i
         |      GROUP BY a.vec_id, b.vec_id)) WHERE rn <= $g)""".stripMargin
    }.mkString(",\n")
    val sliceUnion = (0 until slices)
      .map(i => s"  SELECT src, dst FROM sl${tag}_$i")
      .mkString("\nUNION ALL\n")
    val dcols = (1 to 64).map(i => s"e.d$i").mkString(", ")
    s"""pk$tag AS (SELECT CAST(greatest(${SimilarityOps.SemMinK}, ceil(sqrt(count(*)))) AS BIGINT) AS k,
       |    count(*) AS n FROM $seedRel),
       |pp$tag AS (SELECT k, greatest(1, n // k) AS stride FROM pk$tag),
       |c$tag AS (SELECT * FROM (SELECT * FROM $seedRel, pp$tag
       |  WHERE (vec_id + $mod) % $p % stride = 0
       |  QUALIFY row_number() OVER (ORDER BY vec_id) <= k)
       |  WHERE CASE WHEN vec_id BETWEEN 0 AND 4398046511103 THEN true
       |        ELSE error('centroid id outside [0, 2^42) breaks the argmax encoding and the modulo slicing') END),
       |a$tag AS MATERIALIZED (SELECT e.vec_id,
       |    arg_max(c.vec_id,
       |      CAST(round(round(${cos64ColsSql("e", "c")}, 6) * 1000000) AS BIGINT)
       |        * 4398046511104 - c.vec_id) AS cid
       |  FROM $rel e CROSS JOIN c$tag c
       |  GROUP BY e.vec_id),
       |aw$tag AS MATERIALIZED (SELECT a.vec_id, a.cid, $dcols, e.nrm
       |  FROM a$tag a JOIN emb64 e ON e.vec_id = a.vec_id),
       |$sliceCtes,
       |g$tag AS MATERIALIZED (
       |$sliceUnion)""".stripMargin
  }

  /** Cluster hash-slices per leg of the NSW build oracles' top-G
    * pairing — bounds each ranking window's buffered input to
    * ~1/slices of the pair volume. Correct at ANY value ≥ 1 (slicing
    * by cluster partitions the srcs); 16 keeps the per-slice buffer
    * under ~2 GB at the 100× fixture's measured pair skew.
    */
  protected val NswOracleSlices: Int = 16


  /** The bounded best-first beam search of the NSW oracles, unrolled
    * [[graft.operators.SimilarityOps.NswRounds]] rounds over an
    * `edges` CTE the caller's WITH-prefix must define: v0 = scored
    * entry vertices, then per round beam → distinct unseen neighbors
    * → exact-scored union, every vN MATERIALIZED (the frontier-loop
    * oracle discipline). `liveWhere` restricts the SEARCHABLE
    * vertices (delete leg); probes always come from the full corpus.
    */
  protected def nswSearchSql(liveWhere: String,
                             ent: Int = SimilarityOps.NswEntries,
                             beam: Int = SimilarityOps.NswBeam): String = {
    val b = beam; val rounds = SimilarityOps.NswRounds
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
         |  SELECT u.probe_id, u.vec_id, ${cos64Sql("p.pv", "w.embedding")} AS score
         |  FROM u$r u JOIN p ON u.probe_id = p.probe_id
         |    JOIN verts w ON u.vec_id = w.vec_id)""".stripMargin
    }.mkString(",\n")
    s"""verts AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings $liveWhere),
       |p AS (SELECT vec_id AS probe_id, embedding AS pv FROM embeddings WHERE vec_id < 10),
       |v0 AS MATERIALIZED (SELECT p.probe_id, w.vec_id,
       |    ${cos64Sql("p.pv", "w.embedding")} AS score
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
  protected lazy val nswOracleSql: String = nswOracleSqlAt()

  /** [[nswOracleSql]] with the walk seeded from `ent` entry vertices
    * and expanding `beam` per round — the ann_nsw_entry_sweep /
    * ann_nsw_beam_sweep legs' per-knob replay (the graph build CTEs
    * are identical at every ent/beam).
    */
  protected def nswOracleSqlAt(
      ent: Int = SimilarityOps.NswEntries,
      beam: Int = SimilarityOps.NswBeam): String = {
    val Seq(mA, mB) = SimilarityOps.NswMods
    s"""WITH ${emb64Cte("emb64")},
       |${nswLegCtes("A", mA, "emb64", "emb64", "aA", "aA")},
       |${nswLegCtes("B", mB, "emb64", "emb64", "aB", "aB")},
       |edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
       |  SELECT src, dst FROM gA UNION ALL SELECT dst, src FROM gA
       |  UNION ALL SELECT src, dst FROM gB UNION ALL SELECT dst, src FROM gB)),
       |${nswSearchSql("", ent, beam)}""".stripMargin
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
    s"""WITH ${emb64Cte("emb64")},
       |ecorp AS (SELECT * FROM emb64 WHERE vec_id % 2 = 0),
       |obatch AS (SELECT * FROM emb64 WHERE vec_id % 2 = 1),
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

}
