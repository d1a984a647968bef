package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Byte-pair encoding as a RELATIONAL iterative operator — subword
  * tokenization with engine-portable semantics (no opaque UDF doing
  * the merging), so the full train + encode pipeline is replayable by
  * the DuckDB oracle and hash-checked end to end (p26).
  *
  * Why relational BPE: d5/p4/p13/p23 count whitespace tokens, but LLM
  * budget packing and token-volume reporting are only honest in
  * subword units. The classic BPE formulation is an imperative loop
  * over byte pairs; this one maps it onto the same distributed
  * primitives the rest of the engine uses:
  *
  *   - State is the VOCABULARY's segmentation, one row per (word,
  *     position): (w, c, pos, sym) with c = corpus frequency. BPE
  *     statistics are weighted by word frequency, so training never
  *     touches corpus-sized data after the one vocab-building
  *     aggregate — the textbook trick (Sennrich et al., "Neural
  *     Machine Translation of Rare Words with Subword Units", ACL
  *     2016) and also the scale story: vocab is millions of rows at
  *     100 TB, not billions.
  *   - One training round = one weighted pair count (lead() over each
  *     word's positions, SUM(c) per pair), one argmax (count DESC,
  *     then lexicographic pair — a total order, so the merge choice
  *     is deterministic on every engine), and one greedy APPLY.
  *   - Greedy left-to-right non-overlapping application — the part
  *     that normally forces imperative code — is gaps-and-islands:
  *     candidate positions (sym = a, next = b) form consecutive runs;
  *     within a run, greedy selection takes positions at EVEN offset from the
  *     run head ("aaaa" + merge (a,a) → positions 1,3 → "aa aa";
  *     "aaa" → position 1 → "aa a"). Chosen rows concat the pair,
  *     their right halves drop, positions renumber. Three window
  *     passes, all partitioned by word — embarrassingly parallel.
  *   - Encoding the corpus is a JOIN: every corpus word is in the
  *     trained vocab by construction, so per-doc subword counts are a
  *     broadcast join of doc words onto the final segmentation (the
  *     "broadcast merge table" shape — at 100 TB the vocab/merge
  *     artifact broadcasts, the corpus scan never shuffles).
  *
  * Loop discipline mirrors Graph/Dedup: vocab-sized state is
  * localCheckpointed per round (Loops.checkpointPartitioned keeps the
  * word-hash partitioning, so no round re-exchanges), superseded
  * generations are freed eagerly, and the per-round argmax is the
  * only driver-side scalar (a 1-row collect — control plane, same as
  * PageRank's convergence delta).
  */
object Bpe {

  private def ckpt(df: DataFrame): DataFrame =
    graft.plans.Loops.checkpointPartitioned(df)
  private def release(df: DataFrame): Unit =
    graft.plans.Loops.releaseCheckpoint(df)

  /** Trained result: the merge table in application order, and the
    * final vocabulary segmentation (w, c, n_sub).
    */
  case class Trained(merges: Seq[(String, String)], vocabSeg: DataFrame)

  /** Initial character-level state from a (w, c) vocabulary table:
    * one row per character position, 1-based.
    */
  private[graft] def charState(vocab: DataFrame): DataFrame =
    vocab
      .select(col("w"), col("c"),
        posexplode(expr("regexp_extract_all(w, '[a-z0-9]', 0)")))
      .select(col("w"), col("c"), (col("pos") + 1).as("pos"),
        col("col").as("sym"))

  /** One greedy merge application — pure window arithmetic, mirrored
    * literally in the oracle SQL.
    */
  private[graft] def applyMerge(state: DataFrame, a: String,
      b: String): DataFrame = {
    val byPos = Window.partitionBy("w").orderBy("pos")
    val marked = state
      .withColumn("nxt", lead(col("sym"), 1).over(byPos))
      .withColumn("m", col("sym") === lit(a) && col("nxt") === lit(b))
    // consecutive candidate runs; greedy = even offset from run head
    val cand = marked.where(col("m"))
      .select(col("w"), col("pos"))
      .withColumn("grp", col("pos") - row_number().over(byPos))
    val chosen = cand
      .withColumn("off",
        col("pos") - min("pos").over(Window.partitionBy("w", "grp")))
      .where(col("off") % 2 === 0)
      .select(col("w"), col("pos"))
    marked
      .join(chosen.withColumn("ch", lit(true)), Seq("w", "pos"), "left")
      .join(chosen.select(col("w"), (col("pos") + 1).as("pos"))
        .withColumn("sw", lit(true)), Seq("w", "pos"), "left")
      .where(col("sw").isNull) // right halves of chosen merges drop
      .select(col("w"), col("c"),
        row_number().over(byPos).as("pos"), // renumber
        when(col("ch"), concat(col("sym"), lit(b)))
          .otherwise(col("sym")).as("sym"))
  }

  /** Train `rounds` merges over a (w, c) vocabulary. Each round costs
    * one argmax job + one checkpoint job over vocab-sized state.
    * Stops early if no adjacent pair remains.
    */
  def train(vocab: DataFrame, rounds: Int): Trained = {
    val byPos = Window.partitionBy("w").orderBy("pos")
    var state = ckpt(charState(vocab))
    var merges = Vector.empty[(String, String)]
    var done = false
    var round = 0
    while (!done && round < rounds) {
      val best = state
        .withColumn("b", lead(col("sym"), 1).over(byPos))
        .where(col("b").isNotNull)
        .groupBy(col("sym").as("a"), col("b"))
        .agg(sum("c").as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        merges :+= ((a, b))
        val next = ckpt(applyMerge(state, a, b))
        release(state)
        state = next
      }
      round += 1
    }
    Trained(merges,
      state.groupBy("w", "c").agg(count(lit(1)).as("n_sub")))
  }

  /** Driver-side merge loop with EXACTLY [[train]]'s deterministic
    * semantics (weighted pair counts; argmax by n DESC then
    * lexicographic (a, b); greedy left-to-right non-overlapping
    * replacement — BpeSpec pins trainDriver == train on fixtures).
    *
    * This is the production shape, not a shortcut: BPE training
    * state is VOCABULARY-sized — control plane, like s11's rerank
    * pool — while real tokenizers run ~32k merge rounds, which can
    * never be 2 Spark jobs per round. So the corpus-proportional
    * stages (the (w, c) vocab build before, the broadcast corpus
    * encode after) stay distributed, and the inherently sequential
    * loop runs where sequential work belongs. The relational
    * [[train]] remains the engine-replayable form the DuckDB oracle
    * mirrors round-for-round.
    */
  def trainDriver(vocab: DataFrame, rounds: Int): Trained = {
    val spark = vocab.sparkSession
    val rows = vocab.select("w", "c").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    var seg: Array[(String, Long, Array[String])] = rows.map { case (w, c) =>
      (w, c, w.toCharArray.collect {
        case ch if (ch >= 'a' && ch <= 'z') || (ch >= '0' && ch <= '9') =>
          ch.toString
      })
    }
    var merges = Vector.empty[(String, String)]
    var done = false
    var round = 0
    while (!done && round < rounds) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((_, c, syms) <- seg; i <- 0 until syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        counts(k) = counts.getOrElse(k, 0L) + c
      }
      if (counts.isEmpty) done = true
      else {
        val (a, b) = counts.toSeq
          .minBy { case ((x, y), n) => (-n, x, y) }._1
        merges :+= ((a, b))
        seg = seg.map { case (w, c, syms) =>
          val out = Array.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += a + b; i += 2
            } else { out += syms(i); i += 1 }
          }
          (w, c, out.result())
        }
      }
      round += 1
    }
    import spark.implicits._
    Trained(merges,
      seg.toSeq.map { case (w, c, s) => (w, c, s.length.toLong) }
        .toDF("w", "c", "n_sub"))
  }
}
