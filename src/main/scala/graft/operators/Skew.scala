package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Skew-resilient aggregation: two-stage salted aggregate.
  *
  * A plain `groupBy(key)` shuffles every row of a hot key to one
  * reducer; at 100 TB a single hot key (power-law event types, null
  * join keys, …) serializes the stage. Salting splits each key into
  * `saltBuckets` sub-groups for the first (map-heavy) aggregation, then
  * re-aggregates the tiny salted partials — same result, bounded
  * per-reducer load. AQE's skew-join splitting covers joins; this
  * covers aggregations.
  *
  * The decomposition re-aggregates partials (sum of sums, sum of
  * counts, min of mins, max of maxs), so results are exactly equal to
  * the unsalted aggregate — which is how the oracle checks it.
  */
object Skew {

  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      saltBuckets: Int = 16, sumDecimal: DecimalType = DecimalType(12, 2),
      entropyCols: Seq[String] = Nil): DataFrame = {
    val keyCols = keys.map(col)
    val ent = (if (entropyCols.nonEmpty) entropyCols else Seq(valueCol)).map(col)
    val salted = df.withColumn("_salt", saltColumn(saltBuckets, ent, keyCols: _*))
    val partial = salted
      .groupBy(keyCols :+ col("_salt"): _*)
      .agg(
        sum(col(valueCol).cast(sumDecimal)).as("_psum"),
        count(lit(1)).as("_pcnt"),
        min(col(valueCol)).as("_pmin"),
        max(col(valueCol)).as("_pmax"))
    partial
      .groupBy(keyCols: _*)
      .agg(
        sum(col("_psum")).cast("double").as("sum_value"),
        sum(col("_pcnt")).as("n_rows"),
        min(col("_pmin")).as("min_value"),
        max(col("_pmax")).as("max_value"))
  }

  /** Exact COUNT(DISTINCT) under key skew — the non-additive aggregate
    * the engine's thesis (SURVEY §0) calls the hard part.
    *
    * A plain `groupBy(key).agg(countDistinct(v))` plans as an Expand +
    * two aggregations, but the final exact-distinct state for a hot key
    * still lands on ONE reducer, holding every distinct value of that
    * key in one hash set. This decomposition instead:
    *
    *   stage 1: `distinct (key, v)` — shuffled on the PAIR, so a hot
    *            key's values spread over all reducers (the distinct
    *            column is a natural salt: no added salt key, no
    *            re-aggregation subtlety); map-side partial dedup
    *            shrinks the shuffle before it happens.
    *   stage 2: `groupBy(key).count()` — now a plain ADDITIVE count
    *            over already-distinct pairs; the second shuffle carries
    *            one row per distinct (key, v), and per-reducer state is
    *            a single counter.
    *
    * Exactly equal to COUNT(DISTINCT v) — which is how the oracle
    * checks it. (For approximate needs use approx_count_distinct; this
    * is the EXACT path.)
    */
  def saltedDistinct(df: DataFrame, keys: Seq[String], distinctCol: String)
      : DataFrame = {
    val keyCols = keys.map(col)
    df.select(keyCols :+ col(distinctCol): _*)
      .distinct()
      .groupBy(keyCols: _*)
      .agg(count(lit(1)).as("n_distinct"))
  }

  /** Salted key for joins against a replicated small side (classic
    * skew-join salting): explode the small side `saltBuckets`× and salt
    * the big side, so one hot key spreads over `saltBuckets` reducers.
    */
  def saltColumn(saltBuckets: Int, entropyCols: Seq[Column],
      keyCols: Column*): Column =
    // The salt is a pure function of ROW CONTENT: crc32 over the key
    // columns plus caller-named entropy columns. Two earlier forms
    // were rejected by measurement and review:
    //  - spark_partition_id + crc32(key) is CONSTANT per (key, input
    //    split): with few parquet splits a mega-hot key collapsed onto
    //    2-3 salt values (r13 Zipf harness — max reducer held 2.4M of
    //    3M hot rows);
    //  - monotonically_increasing_id spreads perfectly but is row-
    //    ORDER-dependent: if the salted input sits downstream of a
    //    shuffle, a retried map task can assign different salts than
    //    the outputs some reducers already fetched, duplicating or
    //    losing rows under partial-stage retry (the SPARK-23207 class;
    //    Spark SQL does not mark such stages indeterminate).
    // The content salt is retry-deterministic by construction AND
    // input-split-independent. Contract: entropyCols must vary within
    // a hot key (a row id, a measure, a timestamp); rows identical on
    // keys+entropy land in one bucket, so full-row exact duplicates do
    // not spread — pass a unique id column when duplicates dominate.
    pmod(crc32(concat_ws("\u0000", (keyCols ++ entropyCols): _*)),
      lit(saltBuckets)).cast("int")

  /** Skew-resilient equi-join: salt the fact side, replicate the dim
    * side `saltBuckets`×, join on (keys, salt). One hot fact key
    * spreads across `saltBuckets` reducers instead of serializing one.
    * The dim side carries a `merge` hint so the join stays a shuffle
    * join even when the dim is broadcast-sized — in the regime where
    * salting matters (dim too big to broadcast, fact key power-law)
    * there is no broadcast escape hatch, and the salted exchange IS
    * the plan. Exactly equal to the plain join (each fact row meets
    * its dim row in exactly one salt bucket), which is how the oracle
    * checks it. AQE's skew-join split covers sort-merge joins
    * reactively; this is the proactive form that also covers the
    * hash-partitioned aggregations stacked on the join.
    *
    * `keys` must exist on both sides (rename the dim's key first).
    * `entropyCols` feed the content salt (see saltColumn's contract);
    * empty means every non-key fact column — maximal spread, at the
    * cost of hashing the full row (all those columns are in the
    * shuffle anyway).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      saltBuckets: Int = 8, entropyCols: Seq[String] = Nil): DataFrame = {
    val ent = (if (entropyCols.nonEmpty) entropyCols
               else fact.columns.toSeq.filterNot(keys.contains)).map(col)
    val fSalted = fact.withColumn("_salt",
      saltColumn(saltBuckets, ent, keys.map(col): _*))
    val dSalted = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    fSalted.join(dSalted.hint("merge"), keys :+ "_salt").drop("_salt")
  }
}
