package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation

class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- decontamination ----

  test("decontaminate flags exactly the train docs sharing a bench 4-gram") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"), // bench (id % 3 == 0)
      (1L, "alpha beta gamma delta something else entirely"), // shares 'alpha beta gamma delta'
      (2L, "no overlap with anything benchy here at all"),
      (4L, "zeta epsilon delta gamma beta alpha"), // reversed: no shared 4-gram
      (5L, "x y z beta gamma delta epsilon w") // shares 'beta gamma delta epsilon'
    ).toDF("doc_id", "text")
    val out = Curation.decontaminate(docs, col("doc_id") % 3 === 0, n = 4)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.toSeq == Seq(
      (1L, 1L, true), (2L, 0L, false), (4L, 0L, false), (5L, 1L, true)))
  }

  test("decontaminate counts distinct overlapping grams, not occurrences") {
    val docs = Seq(
      (0L, "a b c d"),
      (1L, "a b c d and again a b c d and once more a b c d")
    ).toDF("doc_id", "text")
    val out = Curation.decontaminate(docs, col("doc_id") === 0, n = 4).collect()
    assert(out.length == 1)
    // 'a b c d' appears 3× in doc 1 but is ONE distinct shared gram
    assert(out.head.getAs[Long]("n_hits") == 1L)
  }

  test("wordGrams is empty (not descending-sequence garbage) under length") {
    val df = Seq((1L, "two words")).toDF("doc_id", "text")
    val g = df.select(Curation.wordGrams(Curation.tokens(col("text")), 4).as("g"))
      .collect().head.getSeq[String](0)
    assert(g.isEmpty)
  }

  // ---- PII redaction ----

  test("piiRedact scrubs emails and phones and reports exact counts") {
    val docs = Seq(
      (1L, "write to jane.doe+x@sub.example.org or 415-555-0142 / 212-555-9999 thanks"),
      (2L, "no pii in this one at all")
    ).toDF("doc_id", "raw")
    val out = Curation.piiRedact(docs, col("raw")).orderBy("doc_id").collect()
    val r1 = out(0)
    assert(r1.getAs[Long]("n_emails") == 1L)
    assert(r1.getAs[Long]("n_phones") == 2L)
    assert(r1.getAs[String]("redacted") ==
      "write to <EMAIL> or <PHONE> / <PHONE> thanks")
    assert(r1.getAs[Boolean]("clean"))
    val r2 = out(1)
    assert(r2.getAs[Long]("n_emails") == 0L && r2.getAs[Long]("n_phones") == 0L)
    assert(r2.getAs[String]("redacted") == "no pii in this one at all")
    assert(r2.getAs[Boolean]("clean"))
  }

  // ---- repetition gate ----

  test("repetitionStats computes exact dup/top basis points") {
    // doc 1: tokens a b a b a -> bigrams [a b, b a, a b, b a]: all 4 in
    // dup mass (each gram count 2), top2 = 2/4; trigrams [a b a, b a b,
    // a b a]: 'a b a' dup (2 of 3).
    // doc 2: all-distinct tokens -> zero dup mass.
    val docs = Seq(
      (1L, "a b a b a"),
      (2L, "p q r s t u")
    ).toDF("doc_id", "text")
    val out = Curation.repetitionStats(docs).orderBy("doc_id").collect()
    val r1 = out(0)
    assert(r1.getAs[Long]("dup2_bp") == 10000L)
    assert(r1.getAs[Long]("top2_bp") == 5000L)
    assert(r1.getAs[Long]("dup3_bp") == math.floor(10000.0 * 2 / 3).toLong)
    assert(!r1.getAs[Boolean]("keep"))
    val r2 = out(1)
    assert(r2.getAs[Long]("dup2_bp") == 0L && r2.getAs[Long]("dup3_bp") == 0L)
    assert(r2.getAs[Boolean]("keep"))
  }

  test("decontaminateSpans: removes only the leaked paragraph, keeps order") {
    // bench doc leaks a 4-gram into doc 1's SECOND paragraph (tokens
    // 4..7 with paraTokens=4); paragraphs 1 and 3 survive and rejoin
    // in document order. doc 2 is fully clean; doc 3 fully dirty → ""
    val docs = Seq(
      (0L, "leak one two three"), // bench (doc_id % 101 == 0 in d19; here explicit col)
      (1L, "a b c d leak one two three e f g h"),
      (2L, "p q r s t u v w"),
      (3L, "leak one two three")
    ).toDF("doc_id", "text")
    val out = Curation.decontaminateSpans(docs, isBench = col("doc_id") === 0L,
        n = 4, paraTokens = 4)
      .orderBy("doc_id").collect()
    assert(out.length == 3)
    val d1 = out(0)
    assert(d1.getAs[Long]("n_paras") == 3L)
    assert(d1.getAs[Long]("n_dirty_paras") == 1L)
    assert(d1.getAs[Long]("kept_tokens") == 8L)
    assert(d1.getAs[String]("scrubbed_text") == "a b c d e f g h")
    val d2 = out(1)
    assert(d2.getAs[Long]("n_dirty_paras") == 0L)
    assert(d2.getAs[String]("scrubbed_text") == "p q r s t u v w")
    val d3 = out(2)
    assert(d3.getAs[Long]("n_paras") == 1L && d3.getAs[Long]("n_dirty_paras") == 1L)
    assert(d3.getAs[Long]("kept_tokens") == 0L)
    assert(d3.getAs[String]("scrubbed_text") == "")
  }

  test("repetitionStats pins a 2-token doc (bigrams but no trigrams) to 0 bp") {
    // exactly 2 tokens → one bigram row (reaches the rollup) but zero
    // trigrams: the unguarded 0.0/0 was NaN→null on Spark and a
    // cross-engine divergence; both sides now pin the empty class to 0
    val docs = Seq((1L, "x y")).toDF("doc_id", "text")
    val out = Curation.repetitionStats(docs).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("dup2_bp") == 0L)
    assert(r.getAs[Long]("top2_bp") == 10000L) // the single bigram is the top
    assert(r.getAs[Long]("dup3_bp") == 0L)     // guarded: no trigram class
    assert(!r.isNullAt(r.fieldIndex("dup3_bp")))
    assert(r.getAs[Boolean]("keep"))
  }

  test("p37 chunking law: full coverage, 16-token overlap, no contained sliver") {
    // doc lengths spanning every regime: sub-chunk (one chunk),
    // exactly one chunk, one token past (second chunk ends at n),
    // stride-aligned, and a long ragged tail
    val lens = Seq(1, 5, 63, 64, 65, 96, 112, 113, 200, 487)
    val docs = lens.zipWithIndex.map { case (n, i) =>
      (i.toLong, (1 to n).map(j => s"w$j").mkString(" "))
    }.toDF("doc_id", "text")
    val got = graft.queries.PipelineQueries.all
      .find(_.name == "p37_chunk_passages").get
      .fn(spark, writeDocsTo(docs))
      .collect()
      .groupBy(_.getAs[Long]("doc_id"))
    lens.zipWithIndex.foreach { case (n, i) =>
      val ch = got(i.toLong).sortBy(_.getAs[Long]("chunk_id"))
      // chunk ids contiguous from 0
      assert(ch.map(_.getAs[Long]("chunk_id")).toSeq == ch.indices.map(_.toLong))
      val spans = ch.map(r => (r.getAs[Long]("start_tok"),
        r.getAs[Long]("start_tok") + r.getAs[Long]("n_ctoks") - 1))
      // coverage: every token position 1..n inside some chunk, last
      // chunk ends AT the doc end (no sliver, no gap)
      assert(spans.head._1 == 1L && spans.last._2 == n.toLong, s"n=$n $spans")
      spans.sliding(2).foreach {
        case Array((_, e1), (s2, _)) =>
          assert(s2 <= e1 + 1, s"gap at n=$n: $spans")
          // overlap law: EVERY sliding pair shares exactly 16 tokens.
          // The earlier chunk of a pair always has a successor, hence
          // is never the clipped final chunk: it is full (64 tokens),
          // and with stride 48 the overlap is 64-48 = 16 — no
          // boundary exemption exists, so none is asserted.
          assert(e1 - s2 + 1 == 16L, s"overlap at n=$n: $spans")
        case _ =>
      }
      spans.map(_._1).sliding(2).foreach {
        case Array(a, b) => assert(b - a == 48L, s"stride at n=$n: $spans")
        case _ =>
      }
      // chunk count law: 1 + ceil(max(0, n-64)/48)
      val want = 1 + math.ceil(math.max(0, n - 64) / 48.0).toInt
      assert(ch.length == want, s"n=$n chunks=${ch.length} want=$want")
    }
  }

  // write a docs frame to a temp dir so a QueryDef (which reads
  // `$dir/documents.parquet`) can run against fixture rows
  private def writeDocsTo(docs: org.apache.spark.sql.DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory("p37docs").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("fix"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }
}
