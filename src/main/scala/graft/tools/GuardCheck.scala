package graft.tools
object GuardCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("16")
    val dir = "/tmp/sf10_graft"
    Seq("s4_ann_lsh_pairs", "d13_editdist_pairs", "d23_dup_clusters_relcut",
        "s16_ann_topk_neighbors")
      .foreach { q =>
        try {
          graft.SparkEntry.queries(q)(spark, dir).write
            .format("noop").mode("overwrite").save()
          println(s"[guard] $q: RAN TO COMPLETION (no refusal)")
        } catch {
          case e: Throwable =>
            val m = Option(e.getMessage).getOrElse("").linesIterator
              .take(2).mkString(" / ")
            println(s"[guard] $q: REFUSED -> $m")
        }
      }
    spark.stop()
  }
}
