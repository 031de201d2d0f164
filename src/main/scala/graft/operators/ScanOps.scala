package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed ordered-scan operators — computations that look like
  * "a running value over the globally sorted data" but must NOT be
  * planned as a single-partition window (the one plan shape that can
  * never scale). The pattern: range-partition on the scan key, run
  * the scan independently per partition, stitch partitions with a
  * CONSTANT-size per-partition summary collected to the driver — the
  * same two-pass prefix discipline `dataset_shuffle` uses for total
  * order (PipelineOps) applied to prefix aggregation.
  */
object ScanOps {

  /** 2-D strict-dominance skyline (pareto frontier), minimizing both
    * `xCol` and `yCol`: rows for which no other row is <= in both
    * dimensions and < in at least one. Returns the surviving rows of
    * `df` with their original columns.
    *
    * Shape (never all-pairs, never a global one-partition sort):
    *  1. per-x minimum y — ONE keyed shuffle with partial
    *     aggregation (|distinct x| rows survive);
    *  2. prefix-strict-min scan over x order: range-partition the
    *     per-x table on x, per-partition sorted scan keeping rows
    *     with `y < min(y of all smaller x)`; partitions stitch via a
    *     collected per-partition min array (#partitions values —
    *     constant-size driver state, the probed-centroid collect
    *     convention) broadcast back as exclusive prefix minima;
    *  3. join the (x, ymin) survivors back to the input to emit
    *     original rows — the frontier is small, AQE broadcasts it.
    *
    * Strictness at ties falls out of the construction: among equal
    * x only the minimal y survives stage 1 (greater y is dominated
    * strictly in y), among equal minima across x only the smallest
    * x survives the strict `<` (later x is dominated strictly in x),
    * and exact duplicate (x, y) rows all survive the join back (no
    * strict difference, so neither dominates the other).
    *
    * The scan costs two passes over the RANGED per-x table (the
    * persist covers both: the survivor pass is forced eagerly —
    * localCheckpoint — while the cache is still live, so the returned
    * join never recomputes the range shuffle, and the broadcast
    * prefix array can never face a re-sampled partitioning; at
    * warehouse scale the per-x table is tiny next to the fact table,
    * and the range layout would be reused storage).
    */
  def skyline(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val perX = df
      .select(col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
      .groupBy("x").agg(min(col("y")).as("ymin"))
    val partitions = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = perX
      .repartitionByRange(partitions, col("x"))
      .sortWithinPartitions("x")
      .as[(Double, Double)]
      .persist()
    try {
      // pass 1: per-partition min(ymin) — #partitions doubles
      val partMins: Map[Int, Double] = ranged.rdd
        .mapPartitionsWithIndex { (pid, it) =>
          Iterator.single(pid -> it.foldLeft(Double.PositiveInfinity)((m, r) => math.min(m, r._2)))
        }.collect().toMap
      // exclusive prefix min: everything in strictly-earlier ranges
      val prefix: Array[Double] = {
        val arr = Array.fill(partitions + 1)(Double.PositiveInfinity)
        var run = Double.PositiveInfinity
        for (p <- 0 until partitions) {
          arr(p) = run
          run = math.min(run, partMins.getOrElse(p, Double.PositiveInfinity))
        }
        arr
      }
      val bcPrefix = spark.sparkContext.broadcast(prefix)
      // eager: materialize the (small) frontier while `ranged` is still
      // cached — the pass must not be deferred past the unpersist below
      val survivors = ranged.rdd
        .mapPartitionsWithIndex { (pid, it) =>
          var m = bcPrefix.value(pid)
          it.filter { case (_, y) =>
            val keep = y < m
            if (keep) m = y
            keep
          }
        }
        .toDF("x", "ymin")
        .localCheckpoint(true)
      df.join(survivors,
        df(xCol).cast("double") === col("x") &&
          df(yCol).cast("double") === col("ymin"))
        .drop("x", "ymin")
    } finally ranged.unpersist()
  }

  /** Pareto frontier of `part`: the parts no other part beats on
    * (cheaper-or-equal retail price, larger-or-equal size) with at
    * least one strict — minimize price, maximize size (fed to
    * [[skyline]] as minimizing the negated size).
    */
  def partSkyline(part: DataFrame): DataFrame = {
    val prepared = part
      .select(col("p_partkey"), col("p_brand"), col("p_retailprice"),
        col("p_size").cast("long").as("p_size"),
        (-col("p_size")).cast("double").as("negsize"))
    skyline(prepared, "p_retailprice", "negsize")
      .select(col("p_partkey"), col("p_brand"), col("p_retailprice"), col("p_size"))
      .orderBy("p_retailprice", "p_partkey")
  }
}
