package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-source set-overlap via BITMASK aggregation.
  *
  * The naive exact answer self-joins the (source, shingle) inverted
  * index on the shingle key — pair volume is bounded by shared
  * shingles, but every shared shingle still materializes one row per
  * source PAIR containing it. With S sources this is O(shared · S²)
  * rows through a shuffle.
  *
  * Instead, give each source a bit (bit `sid % 64` of mask column
  * `sid / 64` — ⌈S/64⌉ BIGINT columns, so S is unbounded), OR the
  * bits per shingle (`bit_or` is duplicate-idempotent, so the raw
  * exploded rows feed it with NO pre-distinct pass), and reduce the
  * per-shingle masks to counts + KMV signatures per DISTINCT
  * CO-OCCURRENCE PATTERN. The pattern table is control-plane-sized
  * (≤ 2^S in theory, a few hundred in practice — patterns only exist
  * for co-occurrences that occur), and every pair intersection,
  * per-source exact size, per-source signature, and union follows
  * from it by exploding set bits of a few hundred rows:
  *
  *   |A ∩ B|  = Σ cnt over patterns with bits a AND b set
  *   |A|      = Σ cnt over patterns with bit a set
  *   |A ∪ B|  = |A| + |B| − |A ∩ B|
  *   sig(A)   = KMV-merge of pattern signatures with bit a set
  *     (exactly the sketch built from A's shingles directly — the
  *     bottom-k set is a semilattice, KmvPropertySpec)
  *
  * Scale shape: ONE job touches data-proportional rows — explode →
  * per-shingle bit_or (map-side combined on mutable long buffers) →
  * per-pattern count + KMV signature — and checkpoints the
  * few-hundred-row pattern table. The S² pair fan-out, the sizes,
  * and the sketch audit all run on that table, never on the data.
  * The source dimension itself is collected once to the driver
  * (sources are control-plane, like the reference's dimension
  * tables) so nothing downstream re-scans the corpus for it. This is
  * the layout a 100 TB corpus audit wants — compare the self-join
  * formulation it replaces (kept in git history; the DuckDB oracle
  * still computes via COUNT(DISTINCT CASE ...) so the equality is
  * cross-checked per run).
  */
object Overlap {

  /** Exact pairwise overlap of per-source shingle sets, plus the KMV
    * union-estimate audit (`within_tol`) — output schema matches the
    * p20 contract: (src_a, src_b, exact_a, exact_b, exact_union,
    * exact_inter, within_tol) ordered by (src_a, src_b).
    *
    * Any number of sources: sid `i` lives in bit `i % 64` of mask
    * column `i / 64` (dense ids, deterministic by name order; source
    * keys are compared AS STRINGS, which is also how the id
    * assignment sorts them).
    */
  def sourceOverlapExact(docs: DataFrame, shingleCol: Column, k: Int = 512,
      tol: Double = 0.15): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    // the source dimension, ONCE, driver-side: sources are a
    // control-plane dimension (the "how much does CommonCrawl overlap
    // Wikipedia" cardinality — tens to thousands), and collecting it
    // here feeds the id assignment, the group count, and the final
    // name back-join without ever re-scanning the corpus
    val names = docs.select(col("source").cast("string"))
      .distinct().as[String].collect().sorted
    val nGroups = (names.length + 63) / 64
    val srcs = broadcast(
      names.zipWithIndex.toSeq.toDF("source", "sid")
        .select(col("source"), col("sid").cast("int").as("sid")))

    // THE one data-proportional job: explode → exchange by shingle →
    // per-shingle source bitmasks → exchange by pattern → per-pattern
    // shingle count + bottom-k signature of the shingle hashes. Both
    // aggregates are map-side combined; what comes out — one row per
    // distinct co-occurrence pattern — is the entire audit state.
    val maskCols = (0 until nGroups).map(i =>
      bit_or(expr(s"CASE WHEN sid DIV 64 = $i THEN shiftleft(CAST(1 AS BIGINT), sid % 64) ELSE CAST(0 AS BIGINT) END"))
        .as(s"mask_$i"))
    val sidsOf = expr(
      (0 until nGroups)
        .map(i => s"transform(filter(sequence(0, 63), b -> (shiftright(mask_$i, b) & 1) = 1), b -> ${i * 64} + b)")
        .mkString("flatten(array(", ", ", "))"))
    val patterns = docs.select(col("source").cast("string").as("source"),
        explode(shingleCol).as("g"))
      .join(srcs, Seq("source"))
      .groupBy("g").agg(maskCols.head, maskCols.tail: _*)
      .select(xxhash64(col("g")).as("h"), sidsOf.as("sids"))
      .groupBy("sids")
      .agg(count(lit(1)).as("cnt"),
        graft.functions.KmvSketch.signature(k)(col("h")).as("sig"))
      .localCheckpoint()

    // ...everything below runs on the few-hundred-row pattern table
    val sizes = patterns
      .select(col("cnt"), explode(col("sids")).as("sid"))
      .groupBy("sid").agg(sum("cnt").cast("long").as("sz"))
    val inter = patterns
      .select(col("cnt"), explode(col("sids")).as("sa"), col("sids"))
      .select(col("cnt"), col("sa"), explode(col("sids")).as("sb"))
      .where(col("sa") < col("sb"))
      .groupBy("sa", "sb").agg(sum("cnt").cast("long").as("exact_inter"))
    val sigs = patterns
      .select(explode(col("sids")).as("sid"), col("sig"))
      .groupBy("sid")
      .agg(graft.functions.KmvSketch.mergeSignatures(k)(col("sig")).as("sig"))

    val withSz = sigs.join(sizes, Seq("sid")).join(srcs, Seq("sid"))
    val a = withSz.select(col("sid").as("sa"), col("source").as("src_a"),
      col("sig").as("sig_a"), col("sz").as("exact_a"))
    val b = withSz.select(col("sid").as("sb"), col("source").as("src_b"),
      col("sig").as("sig_b"), col("sz").as("exact_b"))
    a.join(b, col("src_a") < col("src_b"))
      .join(inter, Seq("sa", "sb"), "left")
      .withColumn("exact_inter", coalesce(col("exact_inter"), lit(0L)))
      .withColumn("est_union",
        graft.functions.KmvSketch.unionEstimateCol(k)(col("sig_a"), col("sig_b")))
      .withColumn("exact_union",
        (col("exact_a") + col("exact_b") - col("exact_inter")).cast("long"))
      .withColumn("est_inter", // sides are exact counts; union is the estimate
        col("exact_a") + col("exact_b") - col("est_union"))
      .withColumn("within_tol",
        abs(col("est_inter") - col("exact_inter")) <= lit(tol) * col("exact_union"))
      .select(col("src_a"), col("src_b"), col("exact_a"), col("exact_b"),
        col("exact_union"), col("exact_inter"), col("within_tol"))
      .orderBy("src_a", "src_b")
  }
}
