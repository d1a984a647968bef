package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Sessions
import graft.operators.Skew
import graft.sources.Tables

/** Salted-vs-plain head-to-head on a skewed dataset (VERDICT r12 task
  * 4): the uniform driver testdata proves the q21/q22/q35 salted
  * operators result-preserving but never NECESSARY. Run against
  * tools/gen_skew.py output:
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.SkewBench /tmp/sf1_skew"
  *
  * Times (min over SPARK_GRAFT_BENCH_RUNS, default 5) three pairs:
  *  - agg:      Skew.saltedSumCount      vs plain groupBy-sum/count
  *  - distinct: Skew.saltedDistinct      vs plain COUNT(DISTINCT)
  *  - join:     Skew.saltedJoin + agg    vs plain merge-join + agg,
  *              the plain form under AQE skew-join ON and OFF
  * and reports the observed max partition row count of each join
  * variant's output (the quantity salting bounds). One JSON line per
  * measurement; merged into BENCHNOTES by hand.
  */
object SkewBench {
  private val dec12_2 = DecimalType(12, 2)

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1_skew")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    def timeMin(label: String)(mk: => DataFrame): Double = {
      mk.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"""[skew] {"case":"$label","min":${ts.min}%.3f,"runs":[${ts.map(t => f"$t%.3f").mkString(",")}]}""")
      ts.min
    }

    def saltedAgg = Skew
      .saltedSumCount(Tables.events(spark, dir), Seq("event_type"), "value")
      .orderBy("event_type")
    def plainAgg = Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(sum(col("value").cast(dec12_2)).cast("double").as("sum_value"),
        count(lit(1)).as("n_rows"), min("value").as("min_value"),
        max("value").as("max_value"))
      .orderBy("event_type")

    def saltedDist = Skew
      .saltedDistinct(Tables.events(spark, dir), Seq("event_type"), "user_id")
      .orderBy("event_type")
    def plainDist = Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("n_distinct"))
      .orderBy("event_type")

    // high-cardinality distinct domain (event_id is unique): the hot
    // key's exact-distinct final state is hot-rows-sized, which is
    // what lands on ONE reducer in the plain plan
    def saltedDistHi = Skew
      .saltedDistinct(Tables.events(spark, dir), Seq("event_type"), "event_id")
      .orderBy("event_type")
    def plainDistHi = Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(countDistinct("event_id").as("n_distinct"))
      .orderBy("event_type")

    def fact = Tables.lineitem(spark, dir).select("l_suppkey", "l_quantity")
    def dim = Tables.supplier(spark, dir)
      .withColumnRenamed("s_suppkey", "l_suppkey")
      .select("l_suppkey", "s_nationkey")
    def saltedJoin = Skew.saltedJoin(fact, dim, Seq("l_suppkey"))
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast(dec12_2)).cast("double").as("sum_qty"))
      .orderBy("s_nationkey")
    def plainJoin = fact.join(dim.hint("merge"), Seq("l_suppkey"))
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast(dec12_2)).cast("double").as("sum_qty"))
      .orderBy("s_nationkey")

    def withSkewJoin[T](on: Boolean)(f: => T): T = {
      val k = "spark.sql.adaptive.skewJoin.enabled"
      val prev = spark.conf.get(k)
      spark.conf.set(k, on.toString)
      try f finally spark.conf.set(k, prev)
    }

    // sanity: the twins agree on the skewed data too
    require(saltedAgg.collect().toSeq == plainAgg.collect().toSeq,
      "salted agg != plain agg on skewed data")
    require(saltedDist.collect().toSeq == plainDist.collect().toSeq,
      "salted distinct != plain distinct on skewed data")
    require(saltedJoin.collect().toSeq == plainJoin.collect().toSeq,
      "salted join != plain join on skewed data")

    timeMin("agg_salted")(saltedAgg)
    timeMin("agg_plain")(plainAgg)
    timeMin("distinct_salted")(saltedDist)
    timeMin("distinct_plain")(plainDist)
    timeMin("distinct_hicard_salted")(saltedDistHi)
    timeMin("distinct_hicard_plain")(plainDistHi)
    withSkewJoin(on = false) {
      timeMin("join_salted_aqeskew_off")(saltedJoin)
      timeMin("join_plain_aqeskew_off")(plainJoin)
    }
    withSkewJoin(on = true) {
      timeMin("join_salted_aqeskew_on")(saltedJoin)
      timeMin("join_plain_aqeskew_on")(plainJoin)
    }

    // partition-load diagnostic: max rows landing on one reducer in
    // the join output (pre-aggregate), salted vs plain, AQE skew off —
    // the structural quantity the salt bounds
    def maxPart(df: DataFrame): Long = df
      .withColumn("pid", spark_partition_id())
      .groupBy("pid").count().agg(max("count")).collect()(0).getLong(0)
    withSkewJoin(on = false) {
      val ms = maxPart(Skew.saltedJoin(fact, dim, Seq("l_suppkey")))
      val mp = maxPart(fact.join(dim.hint("merge"), Seq("l_suppkey")))
      println(s"""[skew] {"case":"join_max_partition_rows","salted":$ms,"plain":$mp}""")
    }
    // distinct-path structural pair: saltedDistinct's stage-1 exchange
    // spreads on the (key, value) PAIR; the plain plan's final
    // exact-distinct exchange clusters on the key alone
    val ev = Tables.events(spark, dir)
    val dsSpread = maxPart(ev.select("event_type", "event_id").distinct())
    val dsKeyed = maxPart(ev.select("event_type", "event_id")
      .repartition(col("event_type")))
    println(s"""[skew] {"case":"distinct_max_partition_rows","pair_spread":$dsSpread,"key_clustered":$dsKeyed}""")
    spark.stop()
  }
}
