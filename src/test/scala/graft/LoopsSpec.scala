package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r17 optimization-round loop machinery: scale-adaptive round
  * width, the scoped-conf helpers, and lazy-checkpoint fusion — the
  * internals every CC/graph loop now rides on.
  */
class LoopsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import graft.plans.Loops

  test("adaptedPartitions: derived from rows, clamped to [1, session width]") {
    val width = spark.sessionState.conf.numShufflePartitions
    // tiny state -> 1 partition, never 0
    assert(Loops.adaptedPartitions(spark, 0L) === 1)
    assert(Loops.adaptedPartitions(spark, 1000L) === 1)
    // huge state -> clamped at the session width (the 100 TB posture:
    // big loops keep full parallelism)
    assert(Loops.adaptedPartitions(spark, Long.MaxValue / 64) === width)
    // linear in between: 10 partitions' worth of 64 MB at 32 B/row
    val rowsFor10 = 10L * (64L << 20) / 32
    val got = Loops.adaptedPartitions(spark, rowsFor10)
    assert(got === math.min(width, 10))
  }

  test("adaptedPartitions honors the byte-target knob") {
    val key = "spark.graft.loop.targetPartitionBytes"
    spark.conf.set(key, (1L << 20).toString) // 1 MB target
    try {
      val width = spark.sessionState.conf.numShufflePartitions
      // 32 B/row, 1 MB target -> 32k rows per partition
      assert(Loops.adaptedPartitions(spark, 64 * 1024L) ===
        math.min(width, 2))
    } finally spark.conf.unset(key)
  }

  test("withShufflePartitions: scopes width (and AQE when narrow), restores both") {
    val width = spark.sessionState.conf.numShufflePartitions
    assume(width > 1, "needs a multi-partition session to test narrowing")
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    Loops.withShufflePartitions(spark, 1) {
      assert(spark.conf.get("spark.sql.shuffle.partitions") === "1")
      // narrow scope = static execution for the rounds
      assert(spark.conf.get("spark.sql.adaptive.enabled") === "false")
    }
    assert(spark.sessionState.conf.numShufflePartitions === width)
    assert(spark.conf.get("spark.sql.adaptive.enabled") === aqeBefore)
    // full-width scope keeps AQE as-is (the skew net stays on for
    // big-state loops)
    Loops.withShufflePartitions(spark, width) {
      assert(spark.conf.get("spark.sql.adaptive.enabled") === aqeBefore)
    }
    // restore still runs when the body throws
    intercept[RuntimeException] {
      Loops.withShufflePartitions(spark, 1) { throw new RuntimeException("x") }
    }
    assert(spark.sessionState.conf.numShufflePartitions === width)
    assert(spark.conf.get("spark.sql.adaptive.enabled") === aqeBefore)
  }

  test("checkpointLazy: a full action materializes; the frame then survives release of its source") {
    import spark.implicits._
    val src = (1L to 1000L).toDF("x")
    val cp = Loops.checkpointLazy(src.withColumn("y", col("x") * 2))
    // the count IS the materializing job (fusion contract)
    assert(cp.count() === 1000L)
    // after materialization the plan is a LogicalRDD and re-reads blocks
    assert(cp.queryExecution.analyzed.isInstanceOf[
      org.apache.spark.sql.execution.LogicalRDD])
    assert(cp.agg(sum("y")).as[Long].head() === 1000L * 1001L)
  }

  test("CC results are width-invariant: tiny vs huge byte target, path + forest") {
    import graft.operators.Dedup
    import spark.implicits._
    // path 1-2-3-...-12 plus a disjoint triangle and a singleton pair
    val pairs = ((1L to 11L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (101L, 102L), (100L, 102L), (200L, 201L)))
      .toDF("a_id", "b_id")
    val key = "spark.graft.loop.targetPartitionBytes"
    def run(): Map[Long, Long] = {
      val fix = Dedup.duplicateClusters(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val log = Dedup.duplicateClustersLogN(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fix === log, "fixpoint and logN must agree")
      fix
    }
    spark.conf.set(key, "1") // force full session width (rows*32 >= 1 byte each)
    val wide = try run() finally spark.conf.unset(key)
    val narrow = run() // default 64 MB target -> 1 partition for this input
    assert(wide === narrow)
    assert(narrow(12L) === 1L && narrow(102L) === 100L && narrow(201L) === 200L)
  }
}
