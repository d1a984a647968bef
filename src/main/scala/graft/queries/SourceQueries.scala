package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Warehouse

/** Text source formats (SURVEY S6): CSV and JSON-lines exports written
  * by the engine and read back through explicit-schema readers, then
  * aggregated — proving the round trip preserves values. The oracle
  * computes the same aggregate from the original parquet, so any
  * export/parse drift (quoting, null rendering, number formatting)
  * breaks the hash.
  */
object SourceQueries {

  val all: Seq[QueryDef] = Seq(

    QueryDef("c1_csv_roundtrip",
      """SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin) { (s, dir) =>
      Warehouse.documentsCsv(s, dir)
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("bigint").as("sum_chars"))
        .orderBy("lang", "source")
    },

    QueryDef("c2_json_roundtrip",
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      Warehouse.ordersJson(s, dir)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("revenue"))
        .orderBy("o_orderpriority")
    },

    QueryDef("c3_orc_roundtrip",
      """SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Warehouse.lineitemOrc(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("sum_price"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ---- c5: parquet schema evolution via mergeSchema ----
    // Append-only column add: the merged read surfaces NULL for the
    // pre-evolution batch; the oracle recreates the same view from the
    // original table with a CASE on the batch split.
    QueryDef("c5_schema_evolution",
      """SELECT lang,
        |  CASE WHEN doc_id % 2 = 1 THEN source END AS source,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(doc_id) AS BIGINT) AS sum_ids
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      Warehouse.documentsEvolved(s, dir)
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id")).cast("long").as("sum_ids"))
        .orderBy("lang", "source")
    })
}
