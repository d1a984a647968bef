package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, Dedup, TextOps}

/** Degenerate-input robustness for the text/dedup family: real corpora
  * contain empty documents, NULL text (failed fetches), and docs
  * shorter than every n-gram/shingle window. The library contract is
  * graceful degradation — no exceptions, no phantom pairs, the rows
  * simply contribute nothing to candidate generation — because at
  * 100 TB a single malformed row must never kill a stage.
  */
class EdgeCaseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"),
    (3L, ""), // empty text
    (4L, null.asInstanceOf[String]), // failed fetch
    (5L, "ab"), // shorter than any shingle/gram window
    (6L, "???!!! --- ***") // no [a-z0-9] tokens at all
  ).toDF("doc_id", "text")

  test("exact dedup: empty and null texts group by their own key, no crash") {
    // exactGroups = one row per fingerprint group: (fp, min doc_id, n)
    val g = Dedup.exactGroups(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_copies")).toMap
    assert(g(1L) == 2L, s"docs 1/2 are true duplicates: $g")
    // empty text and NULL text are distinct groups of one each — a
    // NULL fingerprint must never merge with md5("")
    assert(g(3L) == 1L && g(4L) == 1L, s"empty vs null must not collide: $g")
    assert(g.size == 5, s"6 docs -> 5 groups: $g")
  }

  test("minhash pairs: degenerate docs produce no candidates and no exceptions") {
    val pairs = Dedup.minhashPairs(corpus, minEst = 0.5).collect()
    val ids = pairs.flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(ids.subsetOf(Set(1L, 2L)),
      s"only the real duplicate pair may surface: ${pairs.mkString(",")}")
    assert(pairs.length == 1)
  }

  test("n-gram Jaccard pairs: under-length docs contribute no shingles") {
    val pairs = Dedup.ngramJaccardPairs(corpus, minJaccard = 0.5).collect()
    val ids = pairs.flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(ids.subsetOf(Set(1L, 2L)), s"got ${pairs.mkString(",")}")
  }

  test("simhash pairs: zero-token docs pair ONLY with each other (all-zero sig contract)") {
    // documented simhashes behavior: a doc with zero tokens keeps the
    // all-zero signature (explode_outer), so zero-content docs are
    // mutual hamming-0 duplicates — semantically defensible (their
    // token content is identically empty) and pinned here; pipelines
    // that want them out run the p11 quality gate first. The
    // load-bearing part: degenerate docs must NEVER pair with a real
    // document.
    val pairs = Dedup.simhashPairs(corpus, maxHamming = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val degenerate = Set(3L, 4L, 6L)
    val crossPairs = pairs.filter { case (a, b) =>
      degenerate.contains(a) != degenerate.contains(b) }
    assert(crossPairs.isEmpty,
      s"zero-token docs must not pair with real docs: ${crossPairs.mkString(",")}")
    assert(pairs.contains((1L, 2L)), s"real duplicates found: ${pairs.mkString(",")}")
  }

  test("decontamination: a doc with no tokens is trivially clean, not an error") {
    val out = Curation.decontaminate(corpus, isBench = col("doc_id") === 1L,
      n = 4).collect()
    val byDoc = out.map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(byDoc(2L), "true duplicate of the bench doc is contaminated")
    assert(!byDoc(3L) && !byDoc(4L) && !byDoc(5L) && !byDoc(6L),
      s"degenerate docs are clean: $byDoc")
  }

  test("token counting: empty/null/symbol-only docs report zero tokens") {
    val st = corpus.select(col("doc_id"),
        coalesce(TextOps.tokenCount("text"), lit(0L)).as("n_tokens"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(st(3L) == 0L && st(5L) == 1L && st(6L) == 0L, s"$st")
    // null text must yield zero (via the coalesce contract), not throw
    assert(st(4L) == 0L, s"$st")
  }
  test("v3_fk_orphans stays edge-complete when a child table is empty") {
    // the oracle's per-edge UNGROUPED aggregate emits (fk, NULL, 0)
    // even for an empty child table; the Spark plan must too (r13
    // ADVICE: a bare groupBy would silently drop the edge)
    val src = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    Seq("region", "nation", "customer", "supplier", "orders", "lineitem")
      .foreach { t =>
        spark.read.parquet(s"$src/$t.parquet").where(lit(false))
          .write.mode("overwrite").parquet(s"$dir/$t.parquet")
      }
    val rows = SparkEntry.queries("v3_fk_orphans")(spark, dir)
      .orderBy("fk").collect()
    assert(rows.length == 6, s"all 6 declared edges must report: ${rows.toSeq}")
    rows.foreach { r =>
      assert(r.isNullAt(1), s"n_rows must be NULL (SUM over empty): $r")
      assert(r.getLong(2) == 0L, s"n_orphans must be 0: $r")
    }
  }
}
