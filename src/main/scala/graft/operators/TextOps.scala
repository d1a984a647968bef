package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for LLM training-data pipelines:
  * shingling, token statistics, language-ID signals, fingerprints.
  * Everything is a codegen'd Catalyst expression (no UDFs) so the hot
  * path stays inside WholeStageCodegen — at 100 TB these run
  * embarrassingly parallel over document partitions with zero shuffle.
  */
object TextOps {

  /** Distinct character k-shingles of a text column (expression-only;
    * ~len array entries per doc before distinct).
    */
  def shingles(text: String, k: Int = 5): Column =
    expr(s"array_distinct(transform(sequence(1, greatest(length($text) - ${k - 1}, 1)), i -> substring($text, i, $k)))")

  /** ASCII token count ([A-Za-z0-9]+ runs) — deliberately an explicit
    * ASCII class so the count agrees byte-for-byte across engines.
    * Computed by the native single-pass counter (functions/AsciiCount)
    * instead of `size(regexp_extract_all(...))`: identical value (runs
    * of ASCII members are exactly the regex matches), no token-array
    * materialization, no regex stepping — the d3/p1 profile showed the
    * regex forms dominating their scans at the sf1 decade.
    */
  def tokenCount(text: String): Column =
    expr(s"ascii_token_count($text)")

  /** Punctuation basis points: 10000 × (chars outside [A-Za-z0-9 ]) /
    * length, floored — value-identical to the regexp_replace
    * length-difference form the oracles use, via one byte pass.
    */
  def punctBp(text: String): Column =
    expr(s"CAST(floor(10000.0 * (length($text) - ascii_clean_count($text))" +
      s" / greatest(length($text), 1)) AS BIGINT)")

  def distinctTokenCount(text: String): Column =
    expr(s"CAST(size(array_distinct(regexp_extract_all(lower($text), '[a-z0-9]+', 0))) AS BIGINT)")

  /** Count of non-overlapping occurrences of `needle` via length
    * arithmetic — exact and engine-portable.
    */
  def occurrences(text: String, needle: String): Column = {
    val n = needle.length
    expr(s"CAST((length($text) - length(replace($text, '$needle', ''))) / $n AS BIGINT)")
  }

  /** LSH band keys from a minhash signature: hash of each `rows`-sized
    * slice, tagged with the band index. Docs sharing any band key are
    * near-dup candidates (band-bucket join — never all-pairs).
    */
  def bandKeys(sigCol: String, bands: Int = 8, rows: Int = 4): Column = {
    val entries = (0 until bands).map { b =>
      val sliceHash = s"xxhash64(slice($sigCol, ${b * rows + 1}, $rows), ${b}L)"
      s"named_struct('band', $b, 'bh', $sliceHash)"
    }
    expr(s"array(${entries.mkString(", ")})")
  }

  /** Estimated Jaccard similarity from two minhash signatures:
    * fraction of agreeing components (k/perms — exact in double).
    */
  def estJaccard(sigA: String, sigB: String, perms: Int = 32): Column =
    expr(s"CAST(aggregate(zip_with($sigA, $sigB, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v) AS DOUBLE) / $perms.0")

  /** 16-bit SimHash band values for hamming-bucket blocking. */
  def simhashBands(simhashCol: String): Seq[(String, Column)] =
    (0 until 4).map(i =>
      s"band_$i" -> expr(s"CAST(shiftright($simhashCol, ${i * 16}) & 65535 AS INT)"))
}
