package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned-parquet warehouse layer: materialize a fact table
  * `partitionBy` a derived date column and read it back so that
  * partition pruning (not just row-group predicate pushdown) serves
  * date-ranged queries.
  *
  * Scale posture (100 TB): date-partitioned facts are the canonical
  * lake layout — a month-ranged query must touch only the matching
  * directories. The plan proof lives in ScaleSpec ("partitioned scan
  * prunes partitions"): `PartitionFilters` on the scan node, pruned
  * file counts. At test scale the write is memoized per (session,
  * sf dir), mirroring how dims are CTAS'd once (HierarchyQueries).
  */
object Warehouse {

  /** Orders partitioned by order month (`o_month` = 'yyyy-MM'), written
    * under the session's spark-warehouse dir and read back as a
    * partitioned table. The partition column is a STRING directory key
    * — the layout-stable choice (date-typed partition values get
    * re-inferred and can shift across engines).
    */
  def ordersByMonth(s: SparkSession, dir: String): DataFrame =
    SessionCache.getOrElseUpdate(s, s"orders_by_month:$dir") {
      val safe = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = s"spark-warehouse/orders_by_month$safe"
      Tables.orders(s, dir)
        .withColumn("o_month",
          date_format(to_date(col("o_orderdate")), "yyyy-MM"))
        .write.partitionBy("o_month").mode("overwrite").parquet(path)
      s.read.parquet(path)
    }
}
