package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Independent JVM recomputations of the deterministic-sampling and
  * rolling-robust-statistic queries (p36, e29): the DuckDB oracle
  * cross-checks Spark at the SQL level, these specs cross-check the
  * SEMANTICS against a from-scratch Scala implementation — a shared
  * misreading of the A-ES key or the discrete-median index would pass
  * the oracle (both sides wrong together) but fail here.
  */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("p36_weighted_sample equals a from-scratch A-ES draw (same md5 uniforms)") {
    val docs = Tables.documents(spark, dir)
      .select("lang", "doc_id", "n_chars", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expect = docs.map { case (lang, id, w, text) =>
      val u = (java.lang.Long.parseLong(md5hex(text).take(6), 16) + 1L) /
        16777217.0
      (lang, id, w, math.floor(1e6 * math.log(u) / w).toLong)
    }.groupBy(_._1).toSeq.flatMap { case (lang, xs) =>
      xs.sortBy(x => (-x._4, x._2)).take(5).zipWithIndex
        .map { case ((_, id, w, k), i) => (lang, id, w, k, (i + 1).toLong) }
    }.toSet
    val got = SparkEntry.queries("p36_weighted_sample")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got === expect)
  }

  test("p36: the draw is inclusion-monotone in weight (heavy doc always sampled)") {
    import spark.implicits._
    // one doc with overwhelming weight per stratum: ln(u)/w ≈ 0 beats
    // every unit-weight competitor (ln(u) < 0 strictly, since the md5
    // uniform never hits u = 1 exactly on these texts)
    val tmp = java.nio.file.Files.createTempDirectory("graft_p36").toString
    val rows = (1 to 40).map(i => (i.toLong, s"light doc number $i", "xx",
      "t", 1L)) :+ (99L, "the heavyweight document", "xx", "t", 1000000000L)
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("p36_weighted_sample")(spark, tmp)
      .collect().map(_.getLong(1)).toSet
    assert(got.contains(99L), s"P(select) ∝ w must pick the heavy doc: $got")
    assert(got.size == 5)
  }

  test("e29_rolling_median equals a brute-force trailing-5 discrete median") {
    val ev = Tables.events(spark, dir)
      .select("user_id", "event_id", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val expect = ev.groupBy(_._1).map { case (u, xs) =>
      val ordered = xs.sortBy(x => (x._3, x._2))
      val meds = ordered.indices.map { i =>
        val frame = ordered.slice(math.max(0, i - 4), i + 1)
          .map(_._4).sorted
        (ordered(i)._2, frame((frame.length + 1) / 2 - 1))
      }
      (u, (meds.length.toLong, meds.maxBy(_._1)._2, meds.map(_._2).max))
    }
    val got = SparkEntry.queries("e29_rolling_median")(spark, dir)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got === expect)
  }
}
