package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy entity resolution: blocked edit-distance matching over the
  * part-name catalog. The reference's engine has no analog; this is
  * the record-linkage surface every catalog/training-data pipeline
  * needs (merge near-identical product names, author strings, URLs).
  *
  * == Scale shape ==
  * Edit distance is not hashable, so the naive form is an O(n²)
  * cross join — never acceptable. The standard shape is
  * DISTINCT → BLOCK → verify:
  *
  *  1. collapse the table to its distinct names first (the entity
  *     domain is orders of magnitude smaller than the fact table —
  *     dedup cost is one hash aggregate);
  *  2. equi-join on a cheap blocking key (here the first token —
  *     two names whose first token already differs are not the same
  *     entity under any small edit budget that matters);
  *  3. run the expensive `levenshtein` verifier only inside blocks.
  *
  * The join is a plain equi-join on the block key, so the shuffle is
  * bounded by the entity domain, never the fact volume; skewed blocks
  * split under AQE like any other hash join. At 100 TB the same plan
  * holds with the blocking key swapped for something
  * distribution-aware (soundex, length band, minhash band).
  */
object ResolutionOps {

  /** Maximum edit distance for two names to be the same entity. */
  val MaxEditDistance = 3

  private def distinctNames(part: DataFrame): DataFrame =
    part.select(col("p_name")).distinct()
      .withColumn("blk", split(col("p_name"), " ").getItem(0))

  /** All near-duplicate name pairs (a < b) within a block, with their
    * edit distance. The verifier runs only on in-block pairs.
    */
  def fuzzyPartPairs(part: DataFrame): DataFrame = {
    val a = distinctNames(part).select(col("blk"), col("p_name").as("name_a"))
    val b = distinctNames(part).select(col("blk"), col("p_name").as("name_b"))
    // the 3-arg (banded) levenshtein computes only a 2k+1 diagonal
    // stripe and early-exits to -1 past the threshold: O(k·n) per
    // pair instead of O(n²) — the difference that matters when the
    // verifier runs billions of in-block comparisons
    a.join(b, Seq("blk"))
      .where(col("name_a") < col("name_b"))
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b"), MaxEditDistance))
      .where(col("dist") >= 0)
      .select(col("name_a"), col("name_b"), col("dist").cast("long").as("dist"))
      .orderBy("name_a", "name_b")
  }

  /** One resolution round: every name maps to the lexicographically
    * smallest name within [[MaxEditDistance]] of it in its block
    * (itself included), and the fact table folds onto the canonical
    * key. Single-round min-label is deterministic and cheap (one
    * block join + one agg); chains that need full transitive closure
    * reuse the [[DedupOps]] component machinery — this surface is the
    * per-batch resolution step.
    */
  def fuzzyCanonicalParts(part: DataFrame): DataFrame = {
    val names = distinctNames(part)
    val cand = names.select(col("blk"), col("p_name"))
      .join(names.select(col("blk"), col("p_name").as("other")), Seq("blk"))
      .where(levenshtein(col("p_name"), col("other"), MaxEditDistance) >= 0)
      .groupBy(col("p_name")).agg(min(col("other")).as("canon"))
    part.join(cand, Seq("p_name"))
      .groupBy(col("canon"))
      .agg(countDistinct(col("p_name")).as("n_names"),
        count(lit(1)).as("n_parts"),
        round(sum(col("p_retailprice")), 2).as("sum_price"))
      .orderBy("canon")
  }
}
