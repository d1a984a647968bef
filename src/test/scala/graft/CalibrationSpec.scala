package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Semantics of p33_isotonic_calibration (the minimax closed form of
  * isotonic regression) and the q46 sketch-rollup contract.
  *
  * The isotonic test builds a synthetic documents table whose ' the '
  * densities land in KNOWN score buckets with KNOWN positive rates,
  * then checks the query's fitted curve against the hand-computed
  * pool-adjacent-violators solution — including a violation (a
  * high-rate bucket before a low-rate one) that must pool to the
  * weighted average, and a clean tail that must stay untouched.
  */
class CalibrationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** A 1200-char doc with exactly `k` occurrences of " the ": k
    * non-overlapping "q the " blocks plus x-padding. score_bp =
    * floor(10000·k/1200), bucket = min(floor(score_bp/12), 15) —
    * k ∈ {0, 3, 6, 9} lands in buckets {0, 2, 4, 6}.
    */
  private def doc(id: Long, k: Int, lang: String): (Long, String, String, String, Long) = {
    val text = "q the " * k + "x" * (1200 - 6 * k)
    (id, text, lang, "src", text.length.toLong)
  }

  private def writeDocs(rows: Seq[(Long, String, String, String, Long)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("caldocs").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("isotonic fit pools the violation and preserves the monotone tail") {
    // bucket 0: rate 3/4, bucket 2: 1/4 (violation), bucket 4: 2/4,
    // bucket 6: 4/4. PAV: pool(0.75, 0.25) = 0.5; 0.5 continues the
    // pool boundary (equal is allowed); 1.0 stands alone.
    val rows =
      Seq.tabulate(4)(i => doc(i, 0, if (i < 3) "en" else "de")) ++
      Seq.tabulate(4)(i => doc(10 + i, 3, if (i < 1) "en" else "de")) ++
      Seq.tabulate(4)(i => doc(20 + i, 6, if (i < 2) "en" else "de")) ++
      Seq.tabulate(4)(i => doc(30 + i, 9, "en"))
    val dir = writeDocs(rows)
    val out = SparkEntry.queries("p33_isotonic_calibration")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (0L, 4L, 3L, 750000L, 500000L),
      (2L, 4L, 1L, 250000L, 500000L),
      (4L, 4L, 2L, 500000L, 500000L),
      (6L, 4L, 4L, 1000000L, 1000000L)))
    // the defining isotonic property, independent of the hand solution
    val fitted = out.map(_._5)
    assert(fitted.zip(fitted.tail).forall { case (a, b) => a <= b })
  }

  test("isotonic fit of an already-monotone curve is the raw curve") {
    val rows =
      Seq.tabulate(4)(i => doc(i, 0, if (i < 1) "en" else "de")) ++
      Seq.tabulate(4)(i => doc(10 + i, 3, if (i < 2) "en" else "de")) ++
      Seq.tabulate(4)(i => doc(20 + i, 6, if (i < 3) "en" else "de"))
    val dir = writeDocs(rows)
    val out = SparkEntry.queries("p33_isotonic_calibration")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(out.forall { case (_, raw, fit) => raw == fit })
  }

  test("q46 sketch rollup: merged == direct and estimates in tolerance") {
    val out = SparkEntry.queries("q46_sketch_rollup")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.length >= 2) // 'all' plus one row per event_type
    assert(out.forall(_.getBoolean(3)), "merged signature != direct sketch")
    assert(out.forall(_.getBoolean(4)), "estimate outside tolerance")
  }
}
