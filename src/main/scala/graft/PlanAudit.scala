package graft

/** Plan-smell sweep: prints, for EVERY declared query, the operators
  * that deserve a second look at 100 TB — sort-based aggregate
  * demotions (usually an immutable agg buffer, e.g. a string min/max,
  * dragging a whole multi-distinct pipeline into a full sort),
  * cartesian / nested-loop joins, and unpartitioned window operators.
  * A flag is a REVIEW cue, not automatically a bug: a global
  * SortAggregate with empty grouping keys performs no sort, a
  * broadcast nested-loop against a literal-sized side is fine, and a
  * deliberate global window (q19) is the declared semantics.
  *
  * Run: `sbt "runMain graft.PlanAudit <sfDir>"`.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val smells = Seq(
      "SortAggregate" -> "sort-agg",
      "CartesianProduct" -> "cartesian",
      "BroadcastNestedLoopJoin" -> "bnl-join",
      "Exchange SinglePartition" -> "single-part")
    var flagged = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, q) =>
      try {
        val df = q(spark, sfDir)
        df.write.format("noop").mode("overwrite").save() // final AQE plan
        val plan = df.queryExecution.executedPlan.toString
        val hits = smells.collect {
          case (op, tag) if plan.contains(op) =>
            s"$tag(${op.r.findAllIn(plan).size})"
        }
        if (hits.nonEmpty) { flagged += 1; println(s"[audit] $name: ${hits.mkString(" ")}") }
      } catch {
        case e: Throwable => println(s"[audit] $name: ERROR ${e.getMessage}")
      }
    }
    println(s"[audit] done: $flagged/${SparkEntry.queries.size} queries flagged")
    spark.stop()
  }
}
