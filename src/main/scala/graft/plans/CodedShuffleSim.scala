package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.apache.spark.util.LongAccumulator

/** Faithful simulation of the reference's coded-shuffle *intended*
  * semantics (SURVEY.md §0/§4): trade map redundancy for shuffle
  * packets by XOR-combining two partial aggregates addressed to
  * different reducers into one multicast packet.
  *
  * Reference mapping:
  *  - topology: 3 nodes, replication 2, hard-coded
  *    (`WordCount.java:141,174`) — here: each source is stored on the
  *    node pair `{p, (p+1)%3}` with `p = srcHash(source) % 3`;
  *  - partial aggregates per (node-set, word) = the combiner output
  *    (`WordCount.java:94-103`);
  *  - encoder: two partials whose node sets overlap in EXACTLY one
  *    node and whose words hash to different reducers are XOR'd and
  *    multicast as ONE packet (`WordCount.java:135-183`: same-set
  *    pairs — overlap 2 — are rejected); each partial is encoded at
  *    exactly one of its two replica nodes;
  *  - decode: each reducer strips the half it already knows from
  *    its own map phase — implemented against the CORRECT key,
  *    fixing the reference's wrong-key lookup (§0.1.2,
  *    `WordCount.java:255-258`) and its cross-JVM static-map side
  *    channel (§0.1.1);
  *  - counters `PACKETS_SENT` / `ENCODED_PACKETS_SENT`
  *    (`WordCountDriver.java:17-20`) = LongAccumulators.
  *
  * Pairing policy (round-10): the reference's encoder is a greedy
  * cache scan whose pair count depends on partial ARRIVAL ORDER —
  * nondeterministic across real runs, so any deterministic policy is
  * an equally faithful realization of the intended "pair overlap-1
  * partials addressed to different reducers" semantics. This sim
  * uses rank-zip matching: at encoder node e the pairable
  * compatibility classes form the capacitated path
  * L1(p=e-1,tgt=e) — R1(p=e,tgt=e-1) — L2(p=e-1,tgt=e+1) — R2(p=e,tgt=e)
  * (tgt outside the partner's replica set can never pair), and the
  * endpoint-first allocation x22 = min(L2,R2), x21 = min(L2-x22,R1),
  * x11 = min(L1,R1-x21) is a MAXIMUM matching on a path (exchange
  * argument), so the coding gain is at least what any greedy run
  * achieves. Entries zip by rank-within-class (rank over the unique
  * word), which makes the whole pairing a window + two joins —
  * declarative, deterministic, and exactly reproducible by the
  * DuckDB oracle in closed form: the registry row carries a full
  * hash-gated oracle, not a rows-only check.
  *
  * Execution shape (nothing corpus-sized touches the driver):
  * tokenize + two-level aggregation are ordinary distributed plans;
  * the per-class rank windows partition by (enc, p, tgt) — the
  * topology is a hard-coded 3-node story, so class count (≤18) caps
  * window parallelism, which is inherent to simulating a 3-node
  * cluster, not a scale defect of the engine. Packet counters are
  * COUNTED from materialized packet rows rather than task-side
  * accumulators, so task retry / speculation cannot double-count.
  * The multicast decode is a left-outer join of packets against the
  * exploded local-knowledge table (node-set → replica nodes) whose
  * null side counts genuine decode failures; the exact truth
  * comparison (a second corpus tokenize) is gated behind
  * `checkDecode` — the spec turns it on.
  */
object CodedShuffleSim {

  final case class Result(
      naivePackets: Long,      // partial aggregates, uncoded unicast
      packetsSent: Long,       // with coding: coded pairs count once
      encodedPackets: Long,    // packets that carried 2 words
      decodedOk: Boolean)      // zero failed strips (+ exact counts when checkDecode)

  private val Nodes = 3

  /** Cross-engine hash for topology placement: the md5-prefix word
    * hash ([[graft.functions.TextFunctions.wordHash]]), reproducible
    * in DuckDB as `('0x' || substr(md5(x),1,15))::UBIGINT % 4294967291`.
    */
  private def topoHash(c: Column): Column =
    graft.functions.TextFunctions.wordHash(c)

  /** Run the simulation over (source, word) partial aggregates
    * derived from `docs`; optionally bump the provided accumulators
    * (the O14 counter analog). `checkDecode` additionally verifies the
    * decoded stream against the true word counts (costs one extra
    * corpus tokenize — test-time only).
    */
  def simulate(docs: DataFrame,
               accPackets: Option[LongAccumulator] = None,
               accEncoded: Option[LongAccumulator] = None,
               checkDecode: Boolean = false): Result = {
    val spark = docs.sparkSession
    graft.functions.NativeText.register(spark)

    // combiner output: partial counts per (node-set p, word); reducer
    // target and encoder replica node are deterministic column
    // expressions of the cross-engine hash
    val partials = docs
      .select(col("source"), explode(graft.functions.NativeText.tokens(col("text"))).as("word"))
      .groupBy("source", "word").agg(count(lit(1)).as("cnt"))
      .withColumn("p", (topoHash(col("source")) % Nodes).cast("int"))
      .groupBy(col("p"), col("word")).agg(sum("cnt").as("cnt"))
      .withColumn("wh", topoHash(col("word")))
      .withColumn("tgt", (col("wh") % Nodes).cast("int"))
      .withColumn("enc",
        when(col("wh") % 2 === 0, col("p"))
          .otherwise(pmod(col("p") + 1, lit(Nodes))).cast("int"))
      .drop("wh")

    // the partial table fans out (classing → both pair sides +
    // unicast, plus the knowledge table) — persist it so the corpus
    // tokenize + two aggregations run once, not once per branch; its
    // size is bounded by 3 × vocabulary, not the corpus
    partials.persist(StorageLevel.MEMORY_AND_DISK)

    // compatibility class at the encoder: left partials live on the
    // node-set {e-1, e} (p = e-1), right on {e, e+1} (p = e); a pair
    // must address each side's target inside the OTHER side's replica
    // set, with distinct targets — the path L1—R1—L2—R2
    val e1 = pmod(col("enc") + 1, lit(Nodes))  // e+1
    val e2 = pmod(col("enc") + 2, lit(Nodes))  // e-1
    val classed = partials.withColumn("cls",
      when(col("p") === e2 && col("tgt") === col("enc"), "L1")
        .when(col("p") === e2 && col("tgt") === e1, "L2")
        .when(col("p") === col("enc") && col("tgt") === e2, "R1")
        .when(col("p") === col("enc") && col("tgt") === col("enc"), "R2")
        .otherwise("U"))  // target outside the partner replica set: unicast-only
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("enc"), col("p"), col("tgt")).orderBy(col("word"))))

    // per-encoder class counts (3 rows) -> maximum-matching allocation
    val alloc = classed.groupBy("enc").agg(
        count(when(col("cls") === "L1", 1)).as("l1"),
        count(when(col("cls") === "L2", 1)).as("l2"),
        count(when(col("cls") === "R1", 1)).as("r1"),
        count(when(col("cls") === "R2", 1)).as("r2"))
      .withColumn("x22", least(col("l2"), col("r2")))
      .withColumn("x21", least(col("l2") - col("x22"), col("r1")))
      .withColumn("x11", least(col("l1"), col("r1") - col("x21")))
      .select("enc", "x22", "x21", "x11")

    // rank-zip pair assignment: pair t and index within t. Persisted:
    // three branches (both pair sides + unicast) read it, and the
    // rank window above it would otherwise run per branch
    val assigned = classed.join(broadcast(alloc), Seq("enc"))
      .withColumn("pair_t",
        when(col("cls") === "L2" && col("rk") <= col("x22"), "A")
          .when(col("cls") === "R2" && col("rk") <= col("x22"), "A")
          .when(col("cls") === "L2" && col("rk") > col("x22") &&
            col("rk") <= col("x22") + col("x21"), "B")
          .when(col("cls") === "R1" && col("rk") <= col("x21"), "B")
          .when(col("cls") === "L1" && col("rk") <= col("x11"), "C")
          .when(col("cls") === "R1" && col("rk") > col("x21") &&
            col("rk") <= col("x21") + col("x11"), "C"))
      .withColumn("pair_i",
        when(col("pair_t") === "A", col("rk"))
          .when(col("pair_t") === "B",
            when(col("cls") === "L2", col("rk") - col("x22")).otherwise(col("rk")))
          .when(col("pair_t") === "C",
            when(col("cls") === "R1", col("rk") - col("x21")).otherwise(col("rk"))))
    assigned.persist(StorageLevel.MEMORY_AND_DISK)

    // the packet stream: a coded pair multicasts ONE packet carried as
    // TWO target rows (one per stripped partial); an unpaired partial
    // is a unicast flush row (WordCount.java:211-223)
    val lSide = assigned.where(col("pair_t").isNotNull && col("cls").startsWith("L"))
      .select(col("enc"), col("pair_t"), col("pair_i"),
        col("p").as("l_p"), col("word").as("l_word"),
        col("cnt").as("l_cnt"), col("tgt").as("l_tgt"))
    val rSide = assigned.where(col("pair_t").isNotNull && col("cls").startsWith("R"))
      .select(col("enc"), col("pair_t"), col("pair_i"),
        col("p").as("r_p"), col("word").as("r_word"),
        col("cnt").as("r_cnt"), col("tgt").as("r_tgt"))
    val pairs = lSide.join(rSide, Seq("enc", "pair_t", "pair_i"))
      .withColumn("payload", col("l_cnt").bitwiseXOR(col("r_cnt")))
    val codedRowsDf = pairs.select(
        col("r_tgt").as("tgt_node"), col("l_p").as("known_p"),
        col("l_word").as("known_word"), col("r_word").as("tgt_word"),
        col("payload"), lit(true).as("coded"))
      .unionByName(pairs.select(
        col("l_tgt").as("tgt_node"), col("r_p").as("known_p"),
        col("r_word").as("known_word"), col("l_word").as("tgt_word"),
        col("payload"), lit(true).as("coded")))
    val unicastRowsDf = assigned.where(col("pair_t").isNull)
      .select(col("tgt").as("tgt_node"), col("p").as("known_p"),
        col("word").as("known_word"), col("word").as("tgt_word"),
        col("cnt").as("payload"), lit(false).as("coded"))
    val packets = codedRowsDf.unionByName(unicastRowsDf)

    // what each physical node knows from its own map phase: the
    // partials of every node-set it replicates — decode may ONLY strip
    // values from the target's own knowledge (this is what the
    // reference's static-map side channel faked)
    val knowledge = partials
      .withColumn("k_node",
        explode(array(col("p"), pmod(col("p") + 1, lit(Nodes)).cast("int"))))
      .select(col("k_node"), col("p").as("k_p"), col("word").as("k_word"),
        col("cnt").as("k_cnt"))

    // persist the packet stream so the pairing pass runs once across
    // the counting + decode actions below (a perf choice only: the
    // counters are derived from packet ROWS, not task-side
    // accumulators, so a retried/speculated/recomputed task can no
    // longer double-count — each recompute yields the same rows)
    packets.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // packet accounting from the materialized stream itself: a coded
      // pair is TWO rows for ONE packet; a unicast row is one packet.
      val rowsByCoded = packets.groupBy("coded").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
      val codedRows = rowsByCoded.getOrElse(true, 0L)
      val unicastRows = rowsByCoded.getOrElse(false, 0L)
      val naivePackets = codedRows + unicastRows  // one per partial; a pair holds 2
      val encodedPackets = codedRows / 2
      val packetsSent = encodedPackets + unicastRows
      val codedAtTarget = packets.where(col("coded")).join(knowledge,
        packets("tgt_node") === col("k_node") &&
          col("known_p") === col("k_p") && col("known_word") === col("k_word"),
        "left_outer")
      val failedStrips = codedAtTarget.where(col("k_cnt").isNull).count()
      val decodedOk =
        if (!checkDecode) failedStrips == 0L
        else {
          val credits = codedAtTarget.where(col("k_cnt").isNotNull)
            .select(col("tgt_word").as("word"),
              col("payload").bitwiseXOR(col("k_cnt")).as("cnt"))
            .unionByName(packets.where(!col("coded"))
              .select(col("tgt_word").as("word"), col("payload").as("cnt")))
          val decoded = credits.groupBy("word").agg(sum("cnt").as("dcnt"))
          val truth = docs
            .select(explode(graft.functions.NativeText.tokens(col("text"))).as("word"))
            .groupBy("word").agg(count(lit(1)).as("tcnt"))
          val mismatches = decoded.join(truth, Seq("word"), "full_outer")
            .where(coalesce(col("dcnt"), lit(-1L)) =!= coalesce(col("tcnt"), lit(-2L)))
            .count()
          failedStrips == 0L && mismatches == 0L
        }

      accPackets.foreach(_.add(packetsSent))
      accEncoded.foreach(_.add(encodedPackets))
      Result(naivePackets, packetsSent, encodedPackets, decodedOk)
    } finally {
      packets.unpersist()
      assigned.unpersist()
      partials.unpersist()
    }
  }

  /** DataFrame form for the query registry: one deterministic row,
    * every column reproduced in closed form by the DuckDB oracle
    * (the rank-zip counts are the path maximum matching; decoded_ok
    * is TRUE by the pairing's decodability-by-construction, which the
    * Spark side still verifies against the knowledge table).
    */
  def asDataFrame(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val r = simulate(docs)
    import spark.implicits._
    Seq((r.naivePackets, r.packetsSent, r.encodedPackets,
      math.floor(r.packetsSent.toDouble / r.naivePackets * 10000 + 0.5) / 10000.0,
      r.decodedOk))
      .toDF("naive_packets", "packets_sent", "encoded_packets", "load_ratio", "decoded_ok")
  }
}
