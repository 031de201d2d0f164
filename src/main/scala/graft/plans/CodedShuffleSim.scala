package graft.plans

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** Faithful simulation of the reference's coded-shuffle *intended*
  * semantics (SURVEY.md §0/§4): trade map redundancy for shuffle
  * packets by XOR-combining two partial aggregates addressed to
  * different reducers into one multicast packet.
  *
  * Reference mapping:
  *  - topology: 3 nodes, replication 2, hard-coded
  *    (`WordCount.java:141,174`) — here: each source is stored on the
  *    node pair `{p, (p+1)%3}` with `p = hash(source) % 3`;
  *  - partial aggregates per (node-set, word) = the combiner output
  *    (`WordCount.java:94-103`);
  *  - encoder: two cached partials whose node sets overlap in
  *    EXACTLY one node and whose words hash to different reducers
  *    are XOR'd and multicast as ONE packet
  *    (`WordCount.java:135-139,142-183`: same-set pairs — overlap 2 —
  *    are rejected); each partial is encoded at exactly one of its
  *    two replica nodes;
  *  - decode: each reducer strips the half it already knows from
  *    its own map phase — implemented against the CORRECT key,
  *    fixing the reference's wrong-key lookup (§0.1.2,
  *    `WordCount.java:255-258`) and its cross-JVM static-map side
  *    channel (§0.1.1);
  *  - counters `PACKETS_SENT` / `ENCODED_PACKETS_SENT`
  *    (`WordCountDriver.java:17-20`) = LongAccumulators.
  *
  * This is observability, not a physical shuffle replacement: the
  * real engine lets HashAggregateExec partial/final modes +
  * ShuffleExchangeExec move the data (SURVEY §0). The distributed
  * part (tokenize + two-level aggregation) scales like wordcount;
  * only the per-node packet accounting — O(#nodes x vocabulary) —
  * is driver-side.
  */
object CodedShuffleSim {

  final case class Result(
      naivePackets: Long,      // partial aggregates, uncoded unicast
      packetsSent: Long,       // with coding: coded pairs count once
      encodedPackets: Long,    // packets that carried 2 words
      decodedOk: Boolean)      // decode reproduces true counts

  private val Nodes = 3

  /** Run the simulation over (source, word) partial aggregates
    * derived from `docs`; optionally bump the provided accumulators
    * (the O14 counter analog).
    */
  def simulate(docs: DataFrame,
               accPackets: Option[LongAccumulator] = None,
               accEncoded: Option[LongAccumulator] = None): Result = {
    val spark = docs.sparkSession
    graft.functions.NativeText.register(spark)

    // combiner output: partial counts per (node-set p, word); the
    // heavy lifting (tokenize + aggregate) is fully distributed
    val partials = docs
      .select(col("source"), explode(graft.functions.NativeText.tokens(col("text"))).as("word"))
      .groupBy("source", "word").agg(count(lit(1)).as("cnt"))
      .withColumn("p", pmod(hash(col("source")), lit(Nodes)).cast("int"))
      .groupBy(col("p"), col("word")).agg(sum("cnt").as("cnt"))
      .collect().toSeq

    def target(word: String): Int = math.floorMod(word.hashCode, Nodes)
    // each partial {p, p+1} is encoded at one replica node: p when the
    // word hashes even, else p+1 — so an encoder node sees partials
    // from two different node sets (overlap exactly itself)
    def encoderNode(p: Int, word: String): Int =
      if (math.floorMod(word.hashCode, 2) == 0) p else (p + 1) % Nodes

    var naive = 0L; var sent = 0L; var encoded = 0L
    var decodeFailures = 0L
    val decoded = scala.collection.mutable.Map.empty[String, Long]
    def credit(word: String, cnt: Long): Unit =
      decoded(word) = decoded.getOrElse(word, 0L) + cnt
    // what each physical node knows from its own map phase: the
    // partial counts of every node-set it replicates — the decode
    // below may ONLY strip values from the target's own knowledge
    // (this is what the reference's static-map side channel faked)
    val localKnowledge: Map[Int, Map[(Int, String), Long]] =
      (0 until Nodes).map { n =>
        n -> partials
          .filter(r => r.getInt(0) == n || (r.getInt(0) + 1) % Nodes == n)
          .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
      }.toMap

    partials.groupBy(r => encoderNode(r.getInt(0), r.getString(1)))
      .toSeq.sortBy(_._1)
      .foreach { case (_, group) =>
        val entries = group.sortBy(r => (r.getString(1), r.getInt(0)))
        naive += entries.size
        // combiner cache scan (WordCount.java:142-188): pair with the
        // first cached entry from a DIFFERENT node set (overlap == 1)
        // addressed to a DIFFERENT reducer; additionally require the
        // coded-MapReduce decodability condition the reference leaves
        // implicit: each target must hold the *other* partial locally
        def nodeSet(p: Int): Set[Int] = Set(p, (p + 1) % Nodes)
        val cache = scala.collection.mutable.ArrayBuffer.empty[Row]
        entries.foreach { e =>
          val m = cache.indexWhere { c =>
            c.getInt(0) != e.getInt(0) &&
              target(c.getString(1)) != target(e.getString(1)) &&
              nodeSet(c.getInt(0)).contains(target(e.getString(1))) &&
              nodeSet(e.getInt(0)).contains(target(c.getString(1)))
          }
          if (m >= 0) {
            val other = cache.remove(m)
            sent += 1; encoded += 1
            // XOR multicast; each target decodes by stripping the
            // OTHER word's partial from its own local knowledge —
            // if the target doesn't hold it, decoding genuinely fails
            val packet = e.getLong(2) ^ other.getLong(2)
            def decodeAt(tgt: Row, known: Row): Unit =
              localKnowledge(target(tgt.getString(1)))
                .get((known.getInt(0), known.getString(1))) match {
                case Some(k) => credit(tgt.getString(1), packet ^ k)
                case None    => decodeFailures += 1
              }
            decodeAt(e, other)
            decodeAt(other, e)
          } else {
            cache += e
          }
        }
        // cleanup flush: unicast leftovers (WordCount.java:211-223)
        cache.foreach { c => sent += 1; credit(c.getString(1), c.getLong(2)) }
      }

    accPackets.foreach(_.add(sent))
    accEncoded.foreach(_.add(encoded))

    // decode must reproduce the true word counts exactly, with zero
    // packets the targets couldn't strip
    val truth = docs
      .select(explode(graft.functions.NativeText.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ok = decodeFailures == 0L &&
      truth.forall { case (w, c) => decoded.getOrElse(w, 0L) == c } &&
      decoded.keys.forall(truth.contains)

    Result(naive, sent, encoded, ok)
  }

  /** DataFrame form for the query registry: one deterministic row. */
  def asDataFrame(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val r = simulate(docs)
    import spark.implicits._
    Seq((r.naivePackets, r.packetsSent, r.encodedPackets,
      math.round(r.packetsSent.toDouble / r.naivePackets * 10000) / 10000.0,
      r.decodedOk))
      .toDF("naive_packets", "packets_sent", "encoded_packets", "load_ratio", "decoded_ok")
  }
}
