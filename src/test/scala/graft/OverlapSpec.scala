package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Overlap, TextOps}

/** The bitmask-aggregation overlap (operators/Overlap) against a
  * straightforward distinct-set reference computed with independent
  * Spark primitives — guards the mask arithmetic (bit packing, set-bit
  * explosion, pair fan-out, inclusion-exclusion) with randomized
  * corpora beyond the fixed p20 oracle data.
  */
class OverlapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference: per-pair exact intersection via the distinct
    * (source, shingle) self-join — the formulation Overlap replaced.
    */
  private def referenceOverlap(docs: org.apache.spark.sql.DataFrame) = {
    val sh = docs
      .select(col("source"), explode(TextOps.shingles("text")).as("g"))
      .distinct()
    val sizes = sh.groupBy("source").agg(count(lit(1)).as("sz"))
    val inter = sh.select(col("source").as("src_a"), col("g"))
      .join(sh.select(col("source").as("src_b"), col("g")), Seq("g"))
      .where(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("exact_inter"))
    val a = sizes.select(col("source").as("src_a"), col("sz").as("exact_a"))
    val b = sizes.select(col("source").as("src_b"), col("sz").as("exact_b"))
    a.join(b, col("src_a") < col("src_b"))
      .join(inter, Seq("src_a", "src_b"), "left")
      .withColumn("exact_inter", coalesce(col("exact_inter"), lit(0L)))
      .select(col("src_a"), col("src_b"),
        col("exact_a").cast("long"), col("exact_b").cast("long"),
        col("exact_inter").cast("long"))
  }

  private def maskSide(docs: org.apache.spark.sql.DataFrame) =
    Overlap.sourceOverlapExact(docs, TextOps.shingles("text"))
      .select("src_a", "src_b", "exact_a", "exact_b", "exact_inter")

  test("mask aggregation matches the self-join reference on random corpora") {
    val rnd = new scala.util.Random(41)
    // random words over a small alphabet → heavy cross-source shingle
    // sharing, including sources with total and zero overlap
    def word() = (1 to (3 + rnd.nextInt(5))).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
    val docs = (1 to 120).map { i =>
      val src = s"s${rnd.nextInt(11)}"
      val text =
        if (i % 17 == 0) "zz identical shared document zz" // exact cross-source dups
        else (1 to 8).map(_ => word()).mkString(" ")
      (i.toLong, src, text)
    }.toDF("doc_id", "source", "text")

    val got = maskSide(docs).collect().map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val ref = referenceOverlap(docs).collect().map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet === ref.keySet)
    ref.foreach { case (k, v) => assert(got(k) === v, s"pair $k") }
  }

  test("disjoint sources report zero intersection and correct union") {
    val docs = Seq(
      (1L, "alpha", "aaaaaaaabbbbbbbb"),
      (2L, "beta", "ccccccccdddddddd")).toDF("doc_id", "source", "text")
    val row = maskSide(docs).collect().head
    assert(row.getString(0) == "alpha" && row.getString(1) == "beta")
    assert(row.getLong(4) == 0L)
    assert(row.getLong(2) > 0 && row.getLong(3) > 0)
  }

  test("more than 64 sources spills into extra mask columns (S = 100)") {
    // 100 sources ⇒ two mask columns; overlap structure crosses the
    // 64-bit group boundary on purpose: source s_i shares a document
    // body with s_{i+50}, so ~half the overlapping pairs have one
    // member in each mask group.
    val rnd = new scala.util.Random(97)
    def word() = (1 to (3 + rnd.nextInt(4))).map(_ => ('a' + rnd.nextInt(5)).toChar).mkString
    val docs = (0 until 300).map { i =>
      val sid = i % 100
      val text =
        if (i % 3 == 0) s"shared body number ${i % 50} across the group boundary"
        else (1 to 6).map(_ => word()).mkString(" ")
      (i.toLong, f"s$sid%03d", text)
    }.toDF("doc_id", "source", "text")

    val got = maskSide(docs).collect().map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val ref = referenceOverlap(docs).collect().map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet === ref.keySet)
    ref.foreach { case (k, v) => assert(got(k) === v, s"pair $k") }
    assert(ref.nonEmpty)
  }
}
