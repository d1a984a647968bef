package graft.tools

import java.nio.file.{Files, Paths}

/** Optimization-round artifact generator: writes the
  * `.explain("formatted")` output of each named query to
  * `<outDir>/<name>_<tag>.txt`, so plan-shape claims in
  * OPTIMIZATION_r*.md are checkable against committed files.
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.PlanDump \
  *        <sfDir> <outDir> <tag> <q1,q2,...>"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, tag, names) = args.take(4)
    val spark = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    Files.createDirectories(Paths.get(outDir))
    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      // queryExecution.explainString gives the same text explain() prints
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${q}_$tag.txt"), txt)
      println(s"[plandump] wrote $outDir/${q}_$tag.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
