package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, pmod}

import graft.functions.VectorFunctions
import graft.operators._

/** Registry slice: deduplication. */
private[graft] trait QueriesDedup extends QueriesOracleHelpers {

  protected lazy val dedupRegistry: Seq[(String, QueryDef)] = Seq(

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
  )
}
