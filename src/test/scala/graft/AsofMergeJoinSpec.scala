package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{AsofMergeJoin, AsofMergeJoinExec}

class AsofMergeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def randomSides(seed: Int) = {
    val rnd = new scala.util.Random(seed)
    val left = (1 to 400).map(i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "ts", "l_id")
    // right deduped to one row per (k, ts) — the declared tie contract
    val right = (1 to 300).map(i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, i.toLong * 10))
      .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
      .toDF("k", "rts", "r_val")
    (left, right)
  }

  test("native exec matches a reference per-row scan on random data") {
    val (left, right) = randomSides(11)
    val got = AsofMergeJoin.asofJoin(left, right, Seq("k"), "ts", "rts")
      .select("l_id", "r_val").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    val ls = left.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val rs = right.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = ls.map { case (k, ts, id) =>
      val cand = rs.filter(r => r._1 == k && r._2 <= ts)
      id -> (if (cand.isEmpty) None else Some(cand.maxBy(_._2)._3))
    }.toMap
    assert(got === expect)
  }

  test("native exec equals the composed union-merge operator") {
    val (left, right) = randomSides(23)
    val native = AsofMergeJoin.asofJoin(left, right, Seq("k"), "ts", "rts")
      .select(col("l_id"), col("r_val"))
    val composed = graft.operators.AsofJoin.asofJoin(left, right,
        keys = Seq("k"), leftTs = "ts", rightTs = "rts",
        rightCols = Seq("r_val"))
      .select(col("l_id"), col("asof_r_val").as("r_val"))
    assert(native.except(composed).count() == 0)
    assert(composed.except(native).count() == 0)
  }

  test("plans as AsofMergeJoinExec with one exchange+sort per side, no window") {
    val (left, right) = randomSides(37)
    val df = AsofMergeJoin.asofJoin(left, right, Seq("k"), "ts", "rts")
    df.collect()
    // AQE's explain prints Final and Initial sections; count the final only
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("AsofMergeJoin"), s"expected the native exec:\n$plan")
    assert(!plan.contains("Window"), s"no window operator expected:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges:\n$plan")
  }

  test("downstream key aggregation reuses the join's partitioning (no 3rd exchange)") {
    val (left, right0) = randomSides(51)
    val right = right0.withColumnRenamed("k", "rk")
    val agged = AsofMergeJoin.asofJoin(left, right, Seq("k"), "ts", "rts",
        rightKeys = Seq("rk"))
      .groupBy("k").agg(count(lit(1)).as("n"), sum("r_val").as("s"))
    agged.collect()
    val plan = agged.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2,
      s"groupBy(k) must reuse the as-of exec's partitioning, got $exchanges exchanges:\n$plan")
  }

  test("left rows with no earlier match null-extend (asof LEFT semantics)") {
    val left = Seq((1L, 5L, 100L), (1L, 50L, 101L)).toDF("k", "ts", "l_id")
    val right = Seq((1L, 10L, 7L)).toDF("k", "rts", "r_val")
    val got = AsofMergeJoin.asofJoin(left, right, Seq("k"), "ts", "rts")
      .select("l_id", "r_val").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got === Map(100L -> -1L, 101L -> 7L))
  }

  test("inclusive match: right row at exactly left ts is taken") {
    val left = Seq((1L, 10L, 100L)).toDF("k", "ts", "l_id")
    val right = Seq((1L, 10L, 7L), (1L, 9L, 6L)).toDF("k", "rts", "r_val")
    val got = AsofMergeJoin.asofJoin(left, right, Seq("k"), "ts", "rts")
      .select("r_val").collect().map(_.getLong(0))
    assert(got.toSeq == Seq(7L))
  }

  test("null keys and null timestamps never match (SQL equi-join semantics)") {
    // a null-keyed left row must NOT pair with a null-keyed right row
    // (raw orderings would treat NULL == NULL), and null-ts rows on
    // either side are non-matching; all left rows still emit
    val left = Seq(
      (Some(1L), Some(10L), 100L),  // normal match
      (None, Some(10L), 101L),      // null key → unmatched
      (Some(1L), None, 102L),       // null ts → unmatched
      (Some(2L), Some(10L), 103L)   // right side has only null-ts row → unmatched
    ).toDF("k", "ts", "l_id")
    val right = Seq(
      (Some(1L), Some(5L), 7L),
      (None.asInstanceOf[Option[Long]], Some(5L), 8L), // null key: never held
      (Some(2L), None.asInstanceOf[Option[Long]], 9L)  // null ts: never held
    ).toDF("k", "rts", "r_val")
    val got = AsofMergeJoin.asofJoin(left, right, Seq("k"), "ts", "rts")
      .select("l_id", "r_val").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got === Map(100L -> 7L, 101L -> -1L, 102L -> -1L, 103L -> -1L))
  }

  test("string timestamps survive buffer reuse across advanceRight") {
    // the ts ordering compares COPIED 1-column rows; with a string ts
    // an aliased buffer would corrupt the held comparison value as the
    // right iterator advances through many rows
    val left = Seq((1L, "2024-06-15", 100L), (1L, "2024-01-01", 101L))
      .toDF("k", "ts", "l_id")
    val right = (1 to 200).map(i => (1L, f"2024-03-${i % 28 + 1}%02d", i.toLong))
      .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
      .toDF("k", "rts", "r_val")
    val got = AsofMergeJoin.asofJoin(left, right, Seq("k"), "ts", "rts")
      .select("l_id", "r_val").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // expected: latest rts <= each left ts, by string order
    val rs = right.collect().map(r => (r.getString(1), r.getLong(2)))
    def expect(ts: String): Long =
      rs.filter(_._1 <= ts).sortBy(_._1).lastOption.map(_._2).getOrElse(-1L)
    assert(got === Map(100L -> expect("2024-06-15"), 101L -> expect("2024-01-01")))
  }
}
