package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines. Every
  * near-dup variant is bucketed (band-hash or inverted-index joins),
  * never all-pairs: at 100 TB an O(n²) candidate generation is fatal,
  * so candidates only form inside shared buckets whose size is bounded
  * by construction (LSH bands) or by an explicit document-frequency
  * cut (shingle index).
  */
object Dedup {

  /** Exact dedup groups keyed by content hash: one surviving doc_id
    * (min) per distinct text plus multiplicity. Single hash-shuffle on
    * the 128-bit fingerprint — the canonical exact-dedup shape.
    */
  def exactGroups(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.withColumn("fp", md5(col(textCol)))
      .groupBy("fp")
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** Per-doc MinHash signature + LSH band keys. */
  def minhashSignatures(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", perms: Int = 32): DataFrame =
    docs
      .withColumn("shingles", TextOps.shingles(textCol))
      .withColumn("sig", TextOps.minhashSignature("shingles", perms))
      .withColumn("bands", TextOps.bandKeys("sig"))
      .select(col(idCol), col("sig"), col("bands"))

  /** MinHash/LSH near-dup candidate pairs with estimated Jaccard ≥
    * `minEst`. Candidates come ONLY from band-bucket self-joins (docs
    * sharing at least one band hash); the estimated similarity is then
    * exact arithmetic on the signatures (k agreeing / perms).
    */
  def minhashPairs(docs: DataFrame, minEst: Double = 0.5,
      textCol: String = "text", idCol: String = "doc_id",
      perms: Int = 32): DataFrame = {
    val sigs = minhashSignatures(docs, textCol, idCol, perms)
    val banded = sigs
      .select(col(idCol), col("sig"), explode(col("bands")).as("b"))
      .select(col(idCol), col("sig"),
        col("b.band").as("band"), col("b.bh").as("bh"))
    val a = banded.select(col(idCol).as("a_id"), col("sig").as("a_sig"),
      col("band"), col("bh"))
    val b = banded.select(col(idCol).as("b_id"), col("sig").as("b_sig"),
      col("band"), col("bh"))
    a.join(b, Seq("band", "bh"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "a_sig", "b_sig")
      .dropDuplicates("a_id", "b_id")
      .withColumn("est_jaccard", TextOps.estJaccard("a_sig", "b_sig", perms))
      .where(col("est_jaccard") >= minEst)
      .select("a_id", "b_id", "est_jaccard")
  }

  /** Per-doc 64-bit SimHash + 16-bit blocking bands. */
  def simhashes(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val base = docs.withColumn("simhash", TextOps.simhash(textCol))
    TextOps.simhashBands("simhash").foldLeft(base) {
      case (df, (name, c)) => df.withColumn(name, c)
    }.select(col(idCol) +: col("simhash") +:
      TextOps.simhashBands("simhash").map(b => col(b._1)): _*)
  }

  /** SimHash near-dup pairs: candidates share at least one 16-bit band
    * (pigeonhole: hamming ≤ 3 over 64 bits ⇒ some band equal), then
    * exact hamming distance filter via bit_count(xor).
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 16,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val sh = simhashes(docs, textCol, idCol)
    val banded = sh.select(col(idCol), col("simhash"),
      explode(expr("array(named_struct('band', 0, 'bv', band_0), named_struct('band', 1, 'bv', band_1), named_struct('band', 2, 'bv', band_2), named_struct('band', 3, 'bv', band_3))")).as("b"))
      .select(col(idCol), col("simhash"),
        col("b.band").as("band"), col("b.bv").as("bv"))
    val a = banded.select(col(idCol).as("a_id"), col("simhash").as("a_sh"),
      col("band"), col("bv"))
    val b = banded.select(col(idCol).as("b_id"), col("simhash").as("b_sh"),
      col("band"), col("bv"))
    a.join(b, Seq("band", "bv"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "a_sh", "b_sh")
      .dropDuplicates("a_id", "b_id")
      .withColumn("hamming", expr("CAST(bit_count(a_sh ^ b_sh) AS INT)"))
      .where(col("hamming") <= maxHamming)
      .select("a_id", "b_id", "hamming")
  }

  /** Exact (df-filtered) n-gram Jaccard pairs via an inverted shingle
    * index: explode distinct shingles, drop shingles appearing in more
    * than `maxDf` docs (the skew/blowup guard — a stop-shingle in every
    * doc would otherwise make the self-join quadratic), self-join on
    * shingle, count common per pair, Jaccard over the kept-shingle set
    * sizes. Integer arithmetic → double at the end (engine-portable).
    */
  def ngramJaccardPairs(docs: DataFrame, minJaccard: Double = 0.6,
      maxDf: Int = 50, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val sh = docs
      .withColumn("g", explode(TextOps.shingles(textCol)))
      .select(col(idCol), col("g"))
    val kept = sh.withColumn("df",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("g")))
      .where(col("df") <= maxDf)
      .select(col(idCol), col("g"))
    val sizes = kept.groupBy(idCol).agg(count(lit(1)).as("sz"))
    val a = kept.select(col(idCol).as("a_id"), col("g"))
    val b = kept.select(col(idCol).as("b_id"), col("g"))
    a.join(b, Seq("g"))
      .where(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("common"))
      .join(sizes.select(col(idCol).as("a_id"), col("sz").as("a_sz")), Seq("a_id"))
      .join(sizes.select(col(idCol).as("b_id"), col("sz").as("b_sz")), Seq("b_id"))
      .withColumn("jaccard",
        col("common").cast("double") / (col("a_sz") + col("b_sz") - col("common")))
      .where(col("jaccard") >= minJaccard)
      .select("a_id", "b_id", "common", "a_sz", "b_sz", "jaccard")
  }
}
