package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every registered query at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line (driver contract).
  * An untimed warmup pass first touches every table and runs one
  * tiny aggregate, so the first timed query doesn't absorb JIT,
  * codegen-compiler, and parquet-footer costs.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    // optional trailing query names restrict the run (the scale-
    // timing records at the 10x/100x fixtures); no names = the full
    // registry, the driver contract, with artifacts written to the
    // usual BENCH_FULL/BENCH_SUMMARY paths. Subset runs keep their
    // full map ONLY on the printed line so they can never clobber
    // the committed full-registry artifacts.
    val only = args.toSet
    // fail fast on unknown names: a typo'd subset would otherwise run
    // empty and print a plausible-looking value-0 summary
    val unknown = only.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty,
      s"unknown query name(s): ${unknown.toSeq.sorted.mkString(", ")}")
    // Serialize with every other heavy job + loadavg pre-flight
    // (VERDICT r19 ask #2): the r19 driver bench co-ran with something
    // heavy and its two sibling artifacts disagreed per-query by 5-7x
    // in both directions. Now ANY Bench invocation — driver's direct
    // java path included — blocks on the gate chain's lock, waits
    // (bounded) for the host to idle, and stamps the start loadavg
    // into every artifact so a contended number can never again read
    // as a clean one.
    val lockMode = HeavyLock.acquire()
    val startLoad = HeavyLock.awaitIdle()
    def selected(name: String): Boolean = only.isEmpty || only(name)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup (untimed): table footers + one codegen'd aggregate each
    Tables.all.foreach { t =>
      try Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    try Tables.events(spark, sfDir).count() catch { case _: Throwable => () }

    // a failed query reports -1.0, never a normal-looking tiny time.
    // Between queries (UNtimed): drop leftover caches/checkpoints and
    // force a GC so a heavy query's heap aftermath (the r13
    // coorder_triangles cluster) can't bleed into its alphabetic
    // neighbors' timed spans.
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => selected(q._1)).map { case (name, fn) =>
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
      }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    // The driver keeps only the LAST ~2000 chars of stdout, so a
    // registry-sized per-query map on the summary line gets its head
    // truncated and parses to nothing (BENCH_r11 regression). Split
    // the contract: the FULL per-query map goes to BENCH_FULL.json
    // next to the repo, and the one printed JSON line stays compact —
    // totals plus a fixed headline subset — so it always survives the
    // tail window and machine-parses.
    def qjson(rs: Seq[(String, Double)]): String = rs
      .map { case (k, v) => "\"" + k + "\":" + (math.round(v * 1000) / 1000.0) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // One run_id stamped into stdout + both artifacts: the r19 verdict
    // found BENCH_r19.json and BENCH_SUMMARY.json were two DIFFERENT
    // runs minutes apart — now any pair of artifacts from the same run
    // carries the same id and a mismatch is self-evident. Writes are
    // temp-file + atomic rename so a killed run never leaves a
    // truncated artifact shadowing an older complete one.
    val runId = f"${System.nanoTime()}%x"
    val contended = startLoad > 8.0
    val provenance =
      s""""run_id":"$runId","lock":"$lockMode","load1_start":$startLoad,"contended":$contended"""
    def atomicWrite(path: String, content: String): Unit = {
      val p = java.nio.file.Paths.get(path)
      val tmp = java.nio.file.Paths.get(path + ".tmp")
      java.nio.file.Files.writeString(tmp, content)
      java.nio.file.Files.move(tmp, p,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    if (only.isEmpty) atomicWrite("BENCH_FULL.json",
      s"""{"metric":"total","value":$total,"unit":"sec",$provenance,"queries":${qjson(results)},"sf":"$sfDir"}""")
    val headline = Set(
      "wordcount", "wordcount_per_source", "coded_shuffle_sim",
      "q1_pricing", "q9_profit", "q18_large_orders",
      "events_sessionize", "events_hourly",
      "exact_dedup", "near_dedup_minhash", "incremental_near_dedup",
      "substring_dedup", "semantic_dedup", "incremental_semantic_dedup",
      "ann_ivf_indexed", "ann_pq", "tfidf_topk", "lang_id",
      "dataset_shuffle", "mixture_schedule", "bpe_train_merges",
      "multimodal_features", "multimodal_wav_segments", "streamed_day_counts",
      "ann_ivf_upsert", "substring_excise", "corpus_clean_pipeline2",
      "decontaminate", "streamed_vector_pairs",
      "streamed_watermark_counts", "bpe_vocab",
      "incremental_substring_dedup", "ann_ivf_delete",
      "near_dedup_after_delete", "bpe_encode_docs",
      "streamed_dedup_events", "streamed_sessions",
      "multimodal_png_features",
      "multimodal_avi_frames", "bm25_topk", "hybrid_rrf",
      "bm25_indexed", "incremental_bm25", "streamed_bm25_fold",
      "semantic_after_delete")
    val perQ = math.round(total / math.max(1, results.count(_._2 >= 0)) * 1000) / 1000.0
    val shown = if (only.isEmpty) results.filter(r => headline(r._1)) else results
    // a subset run never refreshes BENCH_FULL.json, so pointing at it
    // from the subset summary would cite a stale artifact — only the
    // full-registry run carries the pointer
    val fullRef = if (only.isEmpty) "\"full\":\"BENCH_FULL.json\"," else ""
    val summary = s"""{"metric":"total","value":${math.round(total * 1000) / 1000.0},"unit":"sec","n_queries":${results.size},"sec_per_query":$perQ,$provenance,$fullRef"queries":${qjson(shown)},"sf":"$sfDir"}"""
    // belt-and-braces for the driver's stdout-tail parse: the same
    // summary line also lands in a file next to BENCH_FULL.json
    if (only.isEmpty) atomicWrite("BENCH_SUMMARY.json", summary)
    println(summary)
    spark.stop()
  }
}
