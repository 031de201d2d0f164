package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, pmod}

import graft.functions.VectorFunctions
import graft.operators._

import graft.operators.{SimilarityOps, TextAnalysisOps, GraphOps, EventsOps}

/** Oracle-SQL builders of the dedup family (minhash/jaccard, LSH
  * lifecycle, simhash, winnowing, substring coverage, semantic dedup,
  * min-label components). Split next to [[QueriesDedup]]; pure code
  * motion, hash-neutral. */
private[graft] trait OracleHelpersDedup { this: OracleHelpersCore =>


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
