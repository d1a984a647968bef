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
    val kc = math.max(8L, n / 2500L).toInt
    val cents = (0 until kc).map(i => i.toLong * (n / kc))
    for (np <- Seq(1, 2, 4, 8)) {
      if (np <= kc) {
        val got = Similarity.cellTopKNeighbors(emb, k = k,
            minCosBp = minCosBp, centroidIds = cents, nprobe = np)
          .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
        val recall = got.intersect(truth).size.toDouble / truth.size
        println(f"K=$kc nprobe=$np primary recall=$recall%.4f got=${got.size}")
      }
      // symmetric probe-intersect variant: candidate iff the two
      // vectors' probe sets share a cell (cost ~ np^2 vs np)
      if (np <= kc) {
        val probes = Similarity.ivfProbeAssignments(emb, cents, np)
          .localCheckpoint(true)
        val withNorm = emb.select(col("vec_id"), col("embedding"))
        val aSide = probes.select(col("vec_id").as("a_id"), col("cell_id"))
        val bSide = probes.select(col("vec_id").as("b_id"), col("cell_id"))
        val cand = aSide.join(bSide, Seq("cell_id"))
          .where(col("a_id") =!= col("b_id"))
          .select("a_id", "b_id").distinct()
        val scored = cand
          .join(withNorm.select(col("vec_id").as("a_id"),
            col("embedding").as("av")), Seq("a_id"))
          .join(withNorm.select(col("vec_id").as("b_id"),
            col("embedding").as("bv")), Seq("b_id"))
          .withColumn("an2", Similarity.qdot("av", "av"))
          .withColumn("bn2", Similarity.qdot("bv", "bv"))
          .withColumn("dot", Similarity.qdot("av", "bv"))
          .withColumn("cos_bp", expr(
            "CAST(floor(10000.0 * CAST(dot AS DOUBLE) / (sqrt(CAST(an2 AS DOUBLE)) * sqrt(CAST(bn2 AS DOUBLE)))) AS BIGINT)"))
          .where(col("cos_bp") >= minCosBp)
          .withColumn("rk", row_number().over(Window.partitionBy("a_id")
            .orderBy(col("cos_bp").desc, col("b_id"))))
          .where(col("rk") <= k)
          .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
        val recall = scored.intersect(truth).size.toDouble / truth.size
        println(f"K=$kc nprobe=$np symmetric recall=$recall%.4f got=${scored.size}")
      }
    }
    spark.stop()
  }
}
