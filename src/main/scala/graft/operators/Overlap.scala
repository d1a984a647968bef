package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-source set-overlap via BITMASK aggregation.
  *
  * The naive exact answer self-joins the (source, shingle) inverted
  * index on the shingle key — pair volume is bounded by shared
  * shingles, but every shared shingle still materializes one row per
  * source PAIR containing it. With S sources this is O(shared · S²)
  * rows through a shuffle.
  *
  * When S ≤ 64 the whole pair matrix collapses into one aggregate:
  * give each source a bit, OR the bits per shingle (`bit_or` is
  * duplicate-idempotent, so the raw exploded rows feed it with NO
  * pre-distinct pass), then count shingles per DISTINCT MASK. The mask
  * table is control-plane-sized (≤ 2^S in theory, a few hundred in
  * practice — masks only exist for co-occurrence patterns that occur),
  * and every pair intersection, per-source exact size, and union
  * follows from it by exploding set bits of a few hundred rows:
  *
  *   |A ∩ B|  = Σ cnt over masks with bits a AND b set
  *   |A|      = Σ cnt over masks with bit a set
  *   |A ∪ B|  = |A| + |B| − |A ∩ B|
  *
  * Scale shape: ONE data-proportional shuffle (the per-shingle bit_or,
  * map-side combined on a mutable long buffer → HashAggregate), one
  * tiny mask-count shuffle, then pure control-plane arithmetic. The
  * S² pair fan-out happens on the mask table, never on the data. This
  * is the layout a 100 TB corpus audit wants — compare the self-join
  * formulation it replaces (kept in git history; the DuckDB oracle
  * still computes via COUNT(DISTINCT CASE ...) so the equality is
  * cross-checked per run).
  */
object Overlap {

  /** Dense bit ids for the distinct sources, deterministic by name
    * order. Dim-sized global window (same accepted pattern as the W1
    * global row_number): sources are a control-plane dimension.
    */
  private def sourceIds(docs: DataFrame): DataFrame =
    docs.select(col("source")).distinct()
      .withColumn("sid",
        (row_number().over(Window.orderBy("source")) - 1).cast("int"))

  /** Exact pairwise overlap of per-source shingle sets, plus the KMV
    * union-estimate audit (`within_tol`) — output schema matches the
    * p20 contract: (src_a, src_b, exact_a, exact_b, exact_union,
    * exact_inter, within_tol) ordered by (src_a, src_b).
    *
    * Requires ≤ 64 distinct sources (one bit each in a BIGINT mask);
    * beyond that, partition the source list into 64-wide groups and
    * run per group-pair — this corpus-audit operator targets the
    * "how much does CommonCrawl overlap Wikipedia" cardinality, not
    * per-document blocking (that is Dedup's job).
    */
  def sourceOverlapExact(docs: DataFrame, shingleCol: Column, k: Int = 512,
      tol: Double = 0.15): DataFrame = {
    val srcs = sourceIds(docs)
    val nSrc = srcs.count()
    require(nSrc <= 64, s"bitmask overlap supports <= 64 sources, got $nSrc")

    // raw exploded rows — bit_or is duplicate-idempotent, so no
    // distinct pass anywhere
    val sh0 = docs.select(col("source"), explode(shingleCol).as("g"))
      .join(broadcast(srcs), Seq("source"))

    // THE one data-proportional pass: explode → exchange by shingle →
    // per-shingle source bitmask. Materialized once (distinct-shingle-
    // sized) because every downstream derivation — mask counts, sizes,
    // intersections AND the KMV signatures — reads it; without the cut
    // each consumer would replay the explode+aggregate. At corpus
    // scale this table (shingle, mask) IS the persisted audit index.
    val masks = sh0.groupBy("g")
      .agg(bit_or(expr("shiftleft(CAST(1 AS BIGINT), sid)")).as("mask"))
      .localCheckpoint()
    // ...then shingle counts per distinct co-occurrence pattern (tiny)
    val maskCounts = masks.groupBy("mask").agg(count(lit(1)).as("cnt"))
      .withColumn("arr",
        expr("filter(sequence(0, 63), i -> (shiftright(mask, i) & 1) = 1)"))

    // per-source exact set size from the mask table
    val sizes = maskCounts
      .select(col("cnt"), explode(col("arr")).as("sid"))
      .groupBy("sid").agg(sum("cnt").cast("long").as("sz"))

    // pair intersections from the mask table (S² on a few hundred rows)
    val inter = maskCounts
      .select(col("cnt"), explode(col("arr")).as("sa"), col("arr"))
      .select(col("cnt"), col("sa"), explode(col("arr")).as("sb"))
      .where(col("sa") < col("sb"))
      .groupBy("sa", "sb").agg(sum("cnt").cast("long").as("exact_inter"))

    // KMV signatures from the SAME mask table: shingle g belongs to
    // source s iff bit s is set — explode the bits and bottom-k per
    // source (map-side combine keeps k longs per source per partition)
    val sigs = masks
      .select(xxhash64(col("g")).as("h"),
        explode(expr("filter(sequence(0, 63), i -> (shiftright(mask, i) & 1) = 1)"))
          .as("sid"))
      .groupBy("sid")
      .agg(graft.functions.KmvSketch.signature(k)(col("h")).as("sig"))

    val withSz = sigs.join(sizes, Seq("sid")).join(broadcast(srcs), Seq("sid"))
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
