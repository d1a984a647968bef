package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsciiCountSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // The regex forms the native counters replace — equivalence against
  // these IS the correctness contract (the oracles keep using regex).
  private val tokenRegex =
    "CAST(size(regexp_extract_all(t, '[A-Za-z0-9]+', 0)) AS BIGINT)"
  private val punctRegex =
    "CAST(length(t) - length(regexp_replace(t, '[^A-Za-z0-9 ]', '')) AS BIGINT)"

  private val fixtures = Seq(
    "hello world",
    "",
    "   ",
    "a",
    "...!!!",
    "one,two;three",
    "trailing token ",
    " leading",
    "tabs\tand\nnewlines are non-members",
    "digits123mixed456",
    "él está aquí — naïve café", // multi-byte members of nothing
    "日本語テキスト then ascii",
    "a.b.c.d.e.f",
    "x" * 10000,
    ("word " * 500).trim)

  private def df = fixtures.toDF("t")

  test("ascii_token_count equals the regexp_extract_all size") {
    val rows = df.select(expr("ascii_token_count(t)").as("native"),
      expr(tokenRegex).as("ref"), col("t")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), s"on: ${r.getString(2).take(40)}"))
  }

  test("length - ascii_clean_count equals the regexp_replace punct count") {
    val rows = df.select(
      (length(col("t")).cast("long") - expr("ascii_clean_count(t)")).as("native"),
      expr(punctRegex).as("ref"), col("t")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), s"on: ${r.getString(2).take(40)}"))
  }

  test("both counters agree between codegen and interpreted paths") {
    val sel = Seq(expr("ascii_token_count(t)"), expr("ascii_clean_count(t)"))
    val withCodegen = df.select(sel: _*).collect().map(r => (r.getLong(0), r.getLong(1)))
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interp = df.select(sel: _*).collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(withCodegen.toSeq == interp.toSeq)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("null input yields null") {
    val r = Seq(Option.empty[String]).toDF("t")
      .select(expr("ascii_token_count(t)"), expr("ascii_clean_count(t)"))
      .collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
