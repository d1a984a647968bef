package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Event-stream analytics over `events` (ts = nanosecond-epoch bigint
  * under nanosAsLong; DuckDB reads the same parquet as TIMESTAMP, so
  * oracle arithmetic goes through epoch_ns — hour-level buckets are
  * unaffected by DuckDB's ns→µs truncation).
  *
  * Batch shapes here; the same aggregations run incrementally in
  * Structured Streaming via graft.streaming.EventStream (tested with
  * MemoryStream — no oracle, streaming is out of DuckDB's scope).
  */
object EventQueries {

  private val dec12_2 = DecimalType(12, 2)

  val all: Seq[QueryDef] = Seq(

    // ---- tumbling 1h windows per event type ----
    QueryDef("e1_hourly_windows",
      """SELECT epoch_ns(ts) // 3600000000000 AS hour_bucket, event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_bucket, event_type""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .withColumn("hour_bucket", expr("ts div 3600000000000"))
        .groupBy("hour_bucket", "event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(dec12_2)).cast("double").as("sum_value"))
        .orderBy("hour_bucket", "event_type")
    },

    // ---- exact distinct users per event type ----
    QueryDef("e2_distinct_users",
      """SELECT event_type,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"),
          sum(col("value").cast(dec12_2)).cast("double").as("sum_value"))
        .orderBy("event_type")
    },

    // ---- JSON property extraction ----
    QueryDef("e3_json_extract",
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k_val"))
        .orderBy("event_id")
    },

    // ---- 6h tumbling windows via the event-time window() API ----
    // Exercises the Structured-Streaming window shape on a batch frame;
    // w_start is epoch seconds (engine-portable).
    QueryDef("e4_six_hour_windows",
      """SELECT (epoch_ns(ts) // 21600000000000) * 21600 AS w_start,
        |  COUNT(*) AS n_events,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1 ORDER BY w_start""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .withColumn("ets", timestamp_micros(expr("ts div 1000")))
        .groupBy(window(col("ets"), "6 hours").as("w"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
        .select(unix_timestamp(col("w.start")).as("w_start"),
          col("n_events"), col("n_users"))
        .orderBy("w_start")
    },

    // ---- sessionization: gap-based sessions per user (windowed lag) ----
    // Timestamps are quantized to MICROSECONDS on the Spark side (ts
    // div 1000) to match DuckDB's ns→µs truncation of the same parquet;
    // event_id breaks ordering ties on both sides.
    QueryDef("e5_sessionize",
      """WITH seq AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS tus,
        |    LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_tus
        |  FROM events
        |), flagged AS (
        |  SELECT user_id, event_id, tus,
        |    CASE WHEN prev_tus IS NULL OR tus - prev_tus > 1800000000 THEN 1 ELSE 0 END AS new_session
        |  FROM seq
        |), numbered AS (
        |  SELECT user_id, tus,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY tus, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged
        |)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  COUNT(*) AS n_events,
        |  CAST((MAX(tus) - MIN(tus)) // 1000000 AS BIGINT) AS duration_s
        |FROM numbered GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin) { (s, dir) =>
      val byUser = Window.partitionBy("user_id").orderBy(col("tus"), col("event_id"))
      val cum = Window.partitionBy("user_id").orderBy(col("tus"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .withColumn("tus", expr("ts div 1000"))
        .withColumn("prev_tus", lag(col("tus"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_tus").isNull ||
            col("tus") - col("prev_tus") > 1800000000L, 1).otherwise(0))
        .withColumn("session_id", sum(col("new_session")).over(cum).cast("long"))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          expr("CAST((MAX(tus) - MIN(tus)) div 1000000 AS BIGINT)").as("duration_s"))
        .orderBy("user_id", "session_id")
    })
}
