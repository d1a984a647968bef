package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** plans/TopKRewrite: the window-rank≤k idiom must plan as partial
  * top-k aggregation (no Window operator, no full-group shuffle) and
  * return exactly the rows the window form returns.
  */
class PlanRewriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture = {
    val rnd = new scala.util.Random(99)
    Seq.tabulate(2000)(i =>
      (s"g${rnd.nextInt(7)}", i.toLong, rnd.nextInt(500).toLong))
      .toDF("grp", "id", "score")
  }

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy("grp").orderBy(col("score").desc, col("id"))
    fixture
      .select(col("grp"), col("id"), col("score"),
        row_number().over(w).cast("bigint").as("rk"))
      .where(col("rk") <= k)
  }

  test("rank-filter plan rewrites to aggregation: no Window operator") {
    val plan = windowTopK(3).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"Window survived the rewrite:\n$plan")
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"expected aggregate-based plan:\n$plan")
  }

  test("rewritten results equal the window semantics row-for-row") {
    val got = windowTopK(3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._4))
    // independent driver-side computation of the same contract
    val expect = fixture.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).toSeq
      .flatMap { case (g, rows) =>
        rows.sortBy(t => (-t._3, t._2)).take(3).zipWithIndex
          .map { case ((_, id, sc), i) => (g, id, sc, (i + 1).toLong) }
      }
      .sortBy(t => (t._1, t._4))
    assert(got.toSeq === expect)
  }

  test("non-matching shapes keep the window plan (rule bails out)") {
    // rank() is not row_number: positions are not dense/deterministic
    // under the aggregator's contract, so the rule must not fire.
    val w = Window.partitionBy("grp").orderBy(col("score").desc, col("id"))
    val kept = fixture
      .select(col("grp"), col("id"), col("score"),
        rank().over(w).cast("bigint").as("rk"))
      .where(col("rk") <= 3)
    assert(kept.queryExecution.executedPlan.toString.contains("Window"))
    // extra passthrough column outside (grouping ∪ {score, id}) — the
    // aggregator cannot re-derive it, so the rule must not fire.
    val extra = fixture.withColumn("payload", col("id") * 2)
    val w2 = Window.partitionBy("grp").orderBy(col("score").desc, col("id"))
    val kept2 = extra
      .select(col("grp"), col("id"), col("score"), col("payload"),
        row_number().over(w2).cast("bigint").as("rk"))
      .where(col("rk") <= 3)
    assert(kept2.queryExecution.executedPlan.toString.contains("Window"))
    assert(kept2.count() === 21)
  }

  test("nullable score / non-default null ordering keep the window plan") {
    // nullable score: TopKAgg's primitive-Long buffer would NPE and
    // null placement differs from the comparator — must not rewrite.
    val nullable = fixture.withColumn("nscore",
      when(col("score") > 5, col("score")))  // nullable LongType attr
    val w = Window.partitionBy("grp").orderBy(col("nscore").desc, col("id"))
    val kept = nullable
      .select(col("grp"), col("id"), col("nscore"),
        row_number().over(w).cast("bigint").as("rk"))
      .where(col("rk") <= 3)
    assert(kept.queryExecution.executedPlan.toString.contains("Window"),
      "nullable score column must bail out")
    assert(kept.count() === 21)

    // desc_nulls_first flips where the comparator would put ties with
    // nulls — any non-default ordering must bail, nullable or not.
    val w2 = Window.partitionBy("grp")
      .orderBy(col("score").desc_nulls_first, col("id"))
    val kept2 = fixture
      .select(col("grp"), col("id"), col("score"),
        row_number().over(w2).cast("bigint").as("rk"))
      .where(col("rk") <= 3)
    assert(kept2.queryExecution.executedPlan.toString.contains("Window"),
      "desc_nulls_first must bail out")
  }

  test("grouping column named pos/col does not break the rewrite") {
    // The rebuilt plan references posexplode's outputs exprId-precise;
    // user columns shadowing the generated names must still resolve.
    val renamed = fixture.withColumnRenamed("grp", "pos")
    val w = Window.partitionBy("pos").orderBy(col("score").desc, col("id"))
    val out = renamed
      .select(col("pos"), col("id"), col("score"),
        row_number().over(w).cast("bigint").as("rk"))
      .where(col("rk") <= 3)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"rewrite should still fire:\n$plan")
    assert(out.count() === 21)

    val renamed2 = fixture.withColumnRenamed("grp", "col")
    val w2 = Window.partitionBy("col").orderBy(col("score").desc, col("id"))
    val out2 = renamed2
      .select(col("col"), col("id"), col("score"),
        row_number().over(w2).cast("bigint").as("rk"))
      .where(col("rk") <= 3)
    assert(!out2.queryExecution.executedPlan.toString.contains("Window"))
    assert(out2.count() === 21)
  }

  // ---- plans/MergeScalarAggJoins ----

  // parquet-backed: LocalRelation column pruning rewrites the relation
  // itself (different output arity per subquery — no common source left
  // to fuse), while file relations keep the Project-over-Relation shape
  // the rule matches; the real engine tables are files
  private def subqFixture(): Unit = {
    val p = "/tmp/msaj_fixture_parquet"
    Seq.tabulate(300)(i => (i.toLong % 40, i.toLong, (i % 7 + 1).toLong))
      .toDF("k", "id", "v").write.mode("overwrite").parquet(p)
    spark.read.parquet(p).createOrReplaceTempView("msaj_t")
  }

  test("sibling correlated scalar aggregates fuse into one Aggregate") {
    subqFixture()
    val df = spark.sql(
      """SELECT id, v FROM msaj_t t
        |WHERE v * (SELECT COUNT(*) FROM msaj_t t2 WHERE t2.k = t.k)
        |      > (SELECT SUM(t2.v) FROM msaj_t t2 WHERE t2.k = t.k)
        |ORDER BY id""".stripMargin)
    val opt = df.queryExecution.optimizedPlan
    val aggs = opt.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a }
    assert(aggs.size == 1, s"expected ONE fused aggregate:\n$opt")
    assert(aggs.head.aggregateExpressions.exists(_.toString.contains("count")) &&
      aggs.head.aggregateExpressions.exists(_.toString.contains("sum")),
      s"fused aggregate must compute both functions:\n${aggs.head}")
    // semantics: recompute with windows (one pass, trivially correct)
    val expect = spark.sql(
      """SELECT id, v FROM (
        |  SELECT id, v, COUNT(*) OVER (PARTITION BY k) AS c,
        |         SUM(v) OVER (PARTITION BY k) AS s FROM msaj_t)
        |WHERE v * c > s ORDER BY id""".stripMargin).collect().toSeq
    assert(df.collect().toSeq == expect)
  }

  test("subqueries correlated on DIFFERENT outer keys do NOT fuse") {
    Seq.tabulate(200)(i => (i.toLong % 10, i.toLong % 5, i.toLong, 1L))
      .toDF("ka", "kb", "id", "v").createOrReplaceTempView("msaj_u")
    val df = spark.sql(
      """SELECT id FROM msaj_u t
        |WHERE (SELECT COUNT(*) FROM msaj_u t2 WHERE t2.ka = t.ka)
        |      > (SELECT SUM(t2.v) FROM msaj_u t2 WHERE t2.ka = t.kb)
        |ORDER BY id""".stripMargin)
    val opt = df.queryExecution.optimizedPlan
    val aggs = opt.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a }
    assert(aggs.size == 2,
      s"different correlation keys must keep separate aggregates:\n$opt")
    // and the answer matches the window recomputation
    val expect = spark.sql(
      """SELECT id FROM (
        |  SELECT id, COUNT(*) OVER (PARTITION BY ka) AS c, kb FROM msaj_u) a
        |JOIN (SELECT ka AS kb2, SUM(v) AS s FROM msaj_u GROUP BY ka) b
        |  ON a.kb = b.kb2
        |WHERE c > s ORDER BY id""".stripMargin).collect().toSeq
    assert(df.collect().toSeq == expect)
  }

  test("different groupings / different sources do not fuse") {
    subqFixture()
    // grouping on k vs grouping on id: canonical grouping check bails
    val df = spark.sql(
      """SELECT id FROM msaj_t t
        |WHERE (SELECT COUNT(*) FROM msaj_t t2 WHERE t2.k = t.k)
        |      > (SELECT MAX(t2.v) FROM msaj_t t2 WHERE t2.id = t.id)
        |ORDER BY id""".stripMargin)
    val aggs = df.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a }
    assert(aggs.size == 2, "different correlation columns must not fuse")
    df.collect() // and it executes
  }
}
