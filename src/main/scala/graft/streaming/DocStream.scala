package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Structured-Streaming shapes for a `documents` stream: near-dup
  * candidate detection while the corpus is still arriving (the
  * ingest-time half of the dedup pipeline — batch Dedup.minhashPairs
  * is the at-rest half).
  *
  * Input contract: a streaming DataFrame with (doc_id long, text
  * string, ts long nanoseconds) — `readStream` over a documents
  * feed, or a MemoryStream in tests.
  */
object DocStream {

  /** Streaming MinHash/LSH near-dup candidate pairs: each arriving doc
    * is signed ROW-LOCALLY (signature + band keys as per-row
    * expressions — stateless, unlike the batch explode→groupBy build,
    * so the only streaming state is the band join's and the pair
    * dedup's, both bounded by the watermark), then band-bucket
    * candidates form through a watermarked stream-stream SELF-join on
    * (band, band-hash) with a ±`horizonMinutes` event-time bound, and
    * the signature-estimated Jaccard filters candidates exactly as in
    * batch.
    *
    * Hash parity with the batch path is deliberate and tested: j is
    * hashed as INT (batch `lit(j)`), the band ordinal as BIGINT
    * (batch `${b}L`), so `(stream pairs within one horizon) =
    * (batch Dedup.minhashPairs)` — the StreamingSpec parity case.
    *
    * Scale shape: state is per-band-bucket rows inside the horizon —
    * at 100 TB/day the horizon bounds state to a day-ish of signatures
    * (perms longs per doc), and docs pair only within their bucket;
    * pairs across horizons are the batch job's business, not the
    * stream's (the standard lambda split for dedup).
    *
    * The per-row HOF signature evaluation is interpreted (~10× the
    * codegen'd batch build per doc) — acceptable at ingest rates,
    * wrong for backfill: backfills go through the batch path.
    */
  def minhashCandidates(docs: DataFrame, horizonMinutes: Int = 60,
      perms: Int = 64, bands: Int = 8, shingleK: Int = 7,
      minEst: Double = 0.5): DataFrame = {
    val rows = perms / bands
    val signed = docs
      .withColumn("ets", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ets", s"$horizonMinutes minutes")
      .withColumn("gs", TextOps.shingles("text", shingleK))
      .withColumn("sig", expr(
        s"transform(sequence(0, ${perms - 1}), j -> array_min(transform(gs, g -> xxhash64(g, j))))"))
      .select(col("doc_id"), col("ets"), col("sig"),
        explode(expr(
          s"""transform(sequence(CAST(0 AS BIGINT), CAST(${bands - 1} AS BIGINT)),
             |  b -> named_struct('band', b,
             |    'bh', xxhash64(slice(sig, CAST(b * $rows + 1 AS INT), $rows), b)))""".stripMargin))
          .as("bk"))
      .select(col("doc_id"), col("ets"), col("sig"),
        col("bk.band").as("band"), col("bk.bh").as("bh"))
    val a = signed.select(col("doc_id").as("a_id"), col("ets").as("a_ets"),
      col("sig").as("a_sig"), col("band").as("a_band"), col("bh").as("a_bh"))
    val b = signed.select(col("doc_id").as("b_id"), col("ets").as("b_ets"),
      col("sig").as("b_sig"), col("band").as("b_band"), col("bh").as("b_bh"))
    a.join(b,
        expr(s"""a_band = b_band AND a_bh = b_bh AND a_id < b_id AND
                 |b_ets >= a_ets - interval $horizonMinutes minutes AND
                 |b_ets <= a_ets + interval $horizonMinutes minutes""".stripMargin))
      .withColumn("est_jaccard", TextOps.estJaccard("a_sig", "b_sig", perms))
      .where(col("est_jaccard") >= minEst)
      .select(col("a_id"), col("b_id"), col("a_ets"), col("est_jaccard"))
      .dropDuplicatesWithinWatermark("a_id", "b_id")
      .select(col("a_id"), col("b_id"), col("est_jaccard"))
  }
}
