package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Hash-gate stability audit: every query whose output carries
  * rounded floating-point aggregates must produce BIT-identical
  * results no matter how the input is split or how many reducers the
  * shuffle uses — otherwise the driver's oracle hash-compare (and any
  * 100 TB re-run) can flip on summation order. Each query runs under
  * two adversarial physical configs — one giant scan partition with a
  * single reducer vs many tiny scan splits with 64 reducers — and the
  * results are compared on raw IEEE bit patterns, which catches
  * -0.0 vs 0.0 (the actual round-4 `lang_mean_embedding` failure
  * mode) that plain value equality hides.
  */
class RoundingStabilitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val hashGated = Seq(
    "q1_pricing", "q3_shipping", "q5_region", "q6_forecast",
    "orders_monthly", "events_hourly", "events_sessionize",
    "quality_score", "token_stats", "unigram_logprob",
    "lang_mean_embedding", "lineitem_quantiles", "events_topusers",
    "similarity_topk", "tfidf_topk",
    // round-7 additions with FP aggregates or ratio columns
    "lineitem_stats", "price_histogram", "repetition_score",
    "events_zscore", "orders_yoy", "lineitem_hist_quantiles",
    "q10_returns",
    // round-8: distribution-rank windows filter on a rounded ratio
    "orders_pricerank",
    // round-9: sampled percentile bounds, frame-window average,
    // conditional-LM log mean, partitioned-read value sums
    "orders_pricerank_banded", "customer_rfm_banded",
    "events_moving_avg", "bigram_logprob",
    "events_partition_pruned", "events_dpp_join",
    // round-9 waves 6-9: decimal-exact revenues/profit/ratios, the
    // decimal-dot logit, int-ratio mix weights, min-cost window
    "q7_volume", "q8_market_share", "q9_profit", "q14_promo_share",
    "q15_top_supplier", "q17_small_qty", "quality_logreg",
    "source_cap", "source_mix_weights", "q2_min_cost",
    "q11_important_stock", "token_entropy", "bpe_merge_pairs",
    // the distributed global rank must not depend on partitioning
    "dataset_shuffle",
    // round-11: the stride schedule's vtime doubles and per-source
    // ranks must not depend on partitioning (rank table comes from
    // range-partition + zipWithIndex); dsir's model log-ratios ride
    // a canonical bucket-sorted fold; the WAV family is integer-only
    // but its mapPartitions fan-out must still be partition-invariant
    "mixture_schedule", "dsir_weights", "gopher_rules",
    "multimodal_wav_decode", "multimodal_wav_segments",
    // round-15 wave C: the sample's hash-derived priorities are
    // row-local doubles and the estimator sums integer micro-units,
    // but the rank windows must not depend on partitioning
    "priority_sample_weighted", "priority_sample_estimate",
    // round-17/18 additions (r17 verdict #7): the Holt/Holt-Winters
    // ordered prefix folds emit round-4 doubles from a sequential
    // recurrence — any partition-order leak flips the whole suffix;
    // the PNG pHash rows carry the corrupt-row quarantine path whose
    // decode/verdict must be row-local; the fuzzy rows rank/round
    // prices and ratio off the hash-sampled truth; the NSW walk and
    // its entries sweep rank round-6 scores across beam rounds
    "events_holt_trend", "events_holt_winters",
    "image_phash_dup_png", "image_phash_dup_png_quarantined",
    "fuzzy_multikey_pairs", "fuzzy_recall_eval", "fuzzy_reorder_resolve",
    "ann_nsw", "ann_nsw_entry_sweep",
    // round-19: the beam sweep ranks round-6 scores at three beam
    // widths over the same persisted adjacency
    "ann_nsw_beam_sweep")

  private def canon(r: Row): Seq[Any] = r.toSeq.map {
    case d: Double => java.lang.Double.doubleToRawLongBits(d)
    case f: Float  => java.lang.Float.floatToRawIntBits(f)
    case x         => x
  }

  private def runWith(name: String, shufflePartitions: Int,
                      maxPartitionBytes: String): Array[Seq[Any]] = {
    val conf = spark.conf
    val prevShuffle = conf.get("spark.sql.shuffle.partitions")
    val prevBytes = conf.get("spark.sql.files.maxPartitionBytes")
    try {
      conf.set("spark.sql.shuffle.partitions", shufflePartitions.toString)
      conf.set("spark.sql.files.maxPartitionBytes", maxPartitionBytes)
      Queries.registry.toMap.apply(name).run(spark, TestSpark.Sf0001)
        .collect().map(canon)
    } finally {
      conf.set("spark.sql.shuffle.partitions", prevShuffle)
      conf.set("spark.sql.files.maxPartitionBytes", prevBytes)
    }
  }

  hashGated.foreach { name =>
    test(s"$name is bit-stable under repartitioning") {
      val a = runWith(name, 1, "1g")
      val b = runWith(name, 64, "16k")
      assert(a.length === b.length, s"$name row count differs between physical plans")
      a.zip(b).zipWithIndex.foreach { case ((ra, rb), i) =>
        assert(ra === rb, s"$name row $i differs between physical plans")
      }
    }
  }
}
