package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, pmod}

import graft.functions.VectorFunctions
import graft.operators._

import graft.operators.{SimilarityOps, TextAnalysisOps, GraphOps, EventsOps}

/** Oracle-SQL builders of the relational / events / streaming
  * families (CDC, attribution, sessions, recursive CTEs, PageRank,
  * triangles, fuzzy blocking). Split next to [[QueriesRelational]]/
  * [[QueriesEvents]]; pure code motion, hash-neutral. */
private[graft] trait OracleHelpersRelational { this: OracleHelpersCore =>


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

}
