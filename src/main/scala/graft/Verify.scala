package graft

import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    new java.io.File(outDir).mkdirs()
    // Local-iteration filter: comma-separated name prefixes. Unset (the
    // driver's invocation) runs everything.
    val only = sys.env.get("GRAFT_VERIFY_ONLY").map(_.split(",").toSeq)
    // Flap hunting: GRAFT_VERIFY_REPEAT=N re-runs each selected query N
    // times in the same JVM, dumping run i>1 to `<name>__r<i>` so a
    // nondeterministic result can be caught by diffing the dumps. The
    // checker ignores the __r dirs (no oracle entry of that name).
    val repeat = sys.env.get("GRAFT_VERIFY_REPEAT").map(_.toInt).getOrElse(1)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
      .foreach { case (name, fn) =>
      (1 to repeat).foreach { i =>
        val dest = if (i == 1) s"$outDir/$name" else s"$outDir/${name}__r$i"
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(dest)
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
