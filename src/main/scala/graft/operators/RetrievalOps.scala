package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{NativeText, VectorFunctions}

/** Retrieval scoring over the corpus: Okapi BM25 lexical ranking and
  * reciprocal-rank-fusion hybrid (lexical + embedding) search — the
  * query-side surface a training-data pipeline needs for corpus
  * exploration, contamination auditing, and RAG-style eval-set
  * construction.
  *
  * Scale shape: tf/df/doclen are the same one-exchange aggregates the
  * TF-IDF path uses ([[TextAnalysisOps.tfidfTopK]]); the query-term
  * set is selected IN-PLAN via a distributed top-k
  * (TakeOrderedAndProject, never a global sort) and broadcast to the
  * posting rows; every ranking cut is orderBy+limit (top-k heap per
  * partition + driver merge of K rows), so no stage materializes or
  * globally sorts a corpus-sized set. At 100 TB the postings shuffle
  * once on `word` and once on `doc_id` — both already needed by the
  * statistics — and the fused legs join on doc_id over K-row inputs.
  *
  * Reference scope note: the reference pipeline has no retrieval
  * surface; this extends the engine's training-data operators.
  */
object RetrievalOps {

  /** Okapi BM25 parameters (the standard Robertson/Lucene values). */
  val K1 = 1.2
  val B = 0.75

  /** The deterministic query: corpus words ranked [[QuerySkip]]+1 ..
    * [[QuerySkip]]+[[QueryTerms]] by collection frequency (total
    * occurrences desc, word asc) — mid-frequency terms, past the
    * stopword head, that are guaranteed to exist at every scale.
    * Shared with the oracle.
    */
  val QuerySkip = 5
  val QueryTerms = 5

  /** RRF dampening constant (the value from the original Cormack et
    * al. paper and every production implementation).
    */
  val RrfK = 60

  /** Candidate-list depth per leg for the hybrid fusion. */
  val LegDepth = 50

  /** Per-(doc, query-term) BM25 contributions with document length
    * and collection statistics attached: tf and dl come from one
    * tokenize pass (dl as a window over the tf table's doc
    * partition), df from a word-partition aggregate whose top rows
    * also FORM the query (selected by a distributed top-k and
    * broadcast back to the postings), N and avgdl from a one-row
    * aggregate cross-joined in.
    */
  private def bm25Scored(docs: DataFrame): DataFrame = {
    NativeText.register(docs.sparkSession)
    val tf = docs
      .select(col("doc_id"), explode(NativeText.tokens(col("text"))).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      .withColumn("dl", sum(col("tf")).over(Window.partitionBy(col("doc_id"))))
    // ranking terms by COLLECTION frequency (sum of tf) rather than
    // bare document frequency is deliberate plan engineering: sum(tf)
    // CONSUMES the tf column, which keeps the upstream aggregate's
    // count function alive, so this branch's shuffle canonicalizes
    // identically to the postings' tf exchange and AQE inserts a
    // ReusedExchange — the corpus is tokenized ONCE. Ranking by
    // count(*) (or count(tf): NullPropagation folds it back to
    // count(1)) lets column pruning rewrite the aggregate to a
    // keys-only distinct, the canonical forms diverge, and the whole
    // scan+tokenize runs twice — verified in the executed plan
    // (Explain run:bm25_topk). df still rides along for the idf.
    val wordStats = tf.groupBy("word")
      .agg(sum(col("tf")).as("ctf"), count(lit(1)).as("df"))
    // distributed top-k, then a (QuerySkip+QueryTerms)-row window
    val qcand = wordStats
      .orderBy(col("ctf").desc, col("word").asc)
      .limit(QuerySkip + QueryTerms)
    val qrankW = Window.orderBy(col("ctf").desc, col("word").asc)
    val query = qcand
      .withColumn("qrank", row_number().over(qrankW))
      .where(col("qrank") > QuerySkip)
      .select(col("word"), col("df"))
    val nAvg = tf
      .agg((sum(col("tf")) / countDistinct(col("doc_id"))).as("avgdl"))
      .crossJoin(docs.agg(count(lit(1)).cast("double").as("n_docs")))
    tf
      .join(broadcast(query), "word")
      .crossJoin(broadcast(nAvg))
      .withColumn("idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("contrib",
        col("idf") * (col("tf") * lit(K1 + 1.0)) /
          (col("tf") + lit(K1) * (lit(1.0) - B + lit(B) * col("dl") / col("avgdl"))))
  }

  /** BM25 document scores against the deterministic query: one row
    * per scored document, descending. `n_hits` counts the query terms
    * present. Emitted ranking is a K-row cut (orderBy+limit), ranked
    * by the rounded score with doc_id as the total-order tiebreak.
    */
  def bm25TopK(docs: DataFrame, k: Int = 10): DataFrame = {
    val byDoc = bm25Scored(docs)
      .groupBy("doc_id")
      .agg(sum(col("contrib")).as("score_raw"), count(lit(1)).as("n_hits"))
    val top = byDoc
      .orderBy(round(col("score_raw"), 6).desc, col("doc_id").asc)
      .limit(k)
    val rnkW = Window.orderBy(round(col("score_raw"), 6).desc, col("doc_id").asc)
    top
      .withColumn("rnk", row_number().over(rnkW).cast("long"))
      .select(col("doc_id"), col("rnk"), col("n_hits"),
        round(col("score_raw"), 4).as("score"))
      .orderBy("rnk")
  }

  /** One ranked candidate leg: (doc_id, rank) for the top
    * [[LegDepth]] rows of `scored` by `(round(score,6) desc, doc_id)`
    * — an orderBy+limit top-k heap, then a row_number over the K
    * surviving rows only.
    */
  private def leg(scored: DataFrame, scoreCol: String, rankName: String): DataFrame = {
    val cut = scored
      .orderBy(round(col(scoreCol), 6).desc, col("doc_id").asc)
      .limit(LegDepth)
    val w = Window.orderBy(round(col(scoreCol), 6).desc, col("doc_id").asc)
    cut.withColumn(rankName, row_number().over(w).cast("long"))
      .select(col("doc_id"), col(rankName))
  }

  /** Hybrid retrieval by reciprocal-rank fusion: the lexical leg is
    * the BM25 ranking against the deterministic term query; the
    * vector leg ranks documents by embedding cosine against the
    * designated probe vector (`vec_id = probeId`, broadcast as a
    * one-row cross join). Each leg keeps its top [[LegDepth]]
    * candidates; fusion is a full outer join of the two K-row lists
    * with `rrf = Σ 1/(RrfK + rank)` over the legs that returned the
    * doc (a fixed two-term expression, so the float sum order is
    * deterministic on both engines). Missing-leg ranks surface as 0.
    */
  def hybridRrf(docs: DataFrame, emb: DataFrame, k: Int = 15,
      probeId: Long = 0L): DataFrame = {
    VectorFunctions.register(docs.sparkSession)
    val lexScores = bm25Scored(docs)
      .groupBy("doc_id").agg(sum(col("contrib")).as("lex_score"))
    val lex = leg(lexScores, "lex_score", "lex_rank")

    val probe = emb.where(col("vec_id") === probeId)
      .select(col("embedding").as("probe_vec"))
    val vecScores = emb.where(col("vec_id") =!= probeId)
      .crossJoin(broadcast(probe))
      .select(col("vec_id").as("doc_id"),
        VectorFunctions.cosine(col("embedding"), col("probe_vec")).as("vec_score"))
    val vec = leg(vecScores, "vec_score", "vec_rank")

    val fused = lex.join(vec, Seq("doc_id"), "full_outer")
      .withColumn("rrf_raw",
        coalesce(lit(1.0) / (lit(RrfK) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("vec_rank")), lit(0.0)))
    val rnkW = Window.orderBy(round(col("rrf_raw"), 6).desc, col("doc_id").asc)
    fused
      .orderBy(round(col("rrf_raw"), 6).desc, col("doc_id").asc)
      .limit(k)
      .withColumn("rnk", row_number().over(rnkW).cast("long"))
      .select(col("doc_id"), col("rnk"),
        coalesce(col("lex_rank"), lit(0L)).as("lex_rank"),
        coalesce(col("vec_rank"), lit(0L)).as("vec_rank"),
        round(col("rrf_raw"), 4).as("rrf_score"))
      .orderBy("rnk")
  }
}
