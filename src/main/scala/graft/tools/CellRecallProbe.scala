package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.Similarity
import graft.sources.Tables

/** Scratch probe (round-15 tuning): measures cellTopKNeighbors recall
  * vs exact all-pairs ground truth on the driver's embeddings table
  * for a grid of (K-divisor, nprobe) — the evidence behind s17's
  * declared recall contract. Not part of any gate.
  */
object CellRecallProbe {
  private def clusteredVecs(n: Int, d: Int, seed: Long,
      nLabels: Int): Seq[(Long, Array[Float], Int)] = {
    val rnd = new scala.util.Random(seed)
    val out = scala.collection.mutable.ArrayBuffer[(Long, Array[Float], Int)]()
    var cluster = 0
    while (out.size < n) {
      val size = 6 + rnd.nextInt(19)
      val c = Array.fill(d)(rnd.nextGaussian())
      val cn = math.sqrt(c.map(x => x * x).sum)
      val sigma = math.sqrt(0.15 / d)
      for (_ <- 0 until size if out.size < n) {
        val v = c.map(x => (x / cn + rnd.nextGaussian() * sigma).toFloat)
        out += ((out.size.toLong, v, cluster % nLabels))
      }
      cluster += 1
    }
    out.toSeq
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    import spark.implicits._
    val fixture = dir == "fixture"
    val emb = if (fixture)
      clusteredVecs(600, 64, 4242L, 4).toDF("vec_id", "embedding", "label")
        .localCheckpoint(true)
      else Tables.embeddings(spark, dir)
    val n = if (fixture) 600L
      else Tables.parquetRowCount(spark, s"$dir/embeddings.parquet")
    val minCosBp = 2000
    val k = 3
    // exact ground truth: corpus-wide all-pairs top-3
    val truth = Similarity.blockedCosinePairs(
        emb.withColumn("all", lit(0)), minCosBp, blockCol = "all")
      .select(col("a_id"), col("b_id"), col("cos_bp"))
      .union(Similarity.blockedCosinePairs(
          emb.withColumn("all", lit(0)), minCosBp, blockCol = "all")
        .select(col("b_id"), col("a_id"), col("cos_bp")))
      .withColumn("rk", row_number().over(Window.partitionBy("a_id")
        .orderBy(col("cos_bp").desc, col("b_id"))))
      .where(col("rk") <= k)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    println(s"n=$n truth_edges=${truth.size}")
    val truthDf = truth.toSeq.toDF("a_id", "b_id").localCheckpoint(true)
    // UPPER-BOUND recall per (K, nprobe) without materializing the
    // candidate stream: a truth edge is recallable iff the two probe
    // sets intersect (symmetric) / b's primary is probed (primary).
    // Truth is only O(n*k) edges, so this joins 3 small tables.
    for (div <- Seq(2500L, 1000L, 500L, 250L)) {
      val kc = math.max(8L, n / div).toInt
      val cents = (0 until kc).map(i => i.toLong * (n / kc))
      val probes = Similarity.ivfProbeAssignments(emb, cents, math.min(8, kc))
        .localCheckpoint(true)
      for (np <- Seq(1, 2, 3, 4, 8) if np <= kc && np <= 8) {
        val pa = probes.filter(col("prk") <= np)
          .select(col("vec_id").as("a_id"), col("cell_id"))
        val pb = probes.filter(col("prk") <= np)
          .select(col("vec_id").as("b_id"), col("cell_id"))
        val prim = probes.filter(col("prk") === 1)
          .select(col("vec_id").as("b_id"), col("cell_id"))
        val symHit = truthDf.join(pa, Seq("a_id"))
          .join(pb, Seq("cell_id", "b_id"))
          .select("a_id", "b_id").distinct().count()
        val primHit = truthDf.join(pa, Seq("a_id")).join(prim, Seq("cell_id", "b_id"))
          .select("a_id", "b_id").distinct().count()
        // cost model: candidate pairs the symmetric join would emit
        val cost = probes.filter(col("prk") <= np)
          .groupBy("cell_id").agg(count(lit(1)).as("m"))
          .agg(sum(expr("m * (m - 1)"))).collect()(0).getLong(0)
        println(f"div=$div K=$kc np=$np sym=${symHit.toDouble / truth.size}%.4f prim=${primHit.toDouble / truth.size}%.4f candPairs=$cost")
      }
    }
    spark.stop()
  }
}
