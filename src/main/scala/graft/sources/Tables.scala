package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet source layer for the driver-generated TPC-H-ish tables
  * (see /root/repo/TESTDATA.md). The reference workload's only I/O is
  * the DuckDB CLI (reference: create_duckdb_database.sh:5-7); our
  * engine's canonical source is columnar Parquet read through Spark's
  * vectorized reader, so predicate pushdown / column pruning reach the
  * scan for free.
  *
  * Scale posture: at 100 TB each logical table is a directory of many
  * parquet files (possibly partitioned); everything here takes a
  * directory and a table name, never a single-file assumption beyond
  * the driver's `<dir>/<name>.parquet` layout.
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** `events.ts` is Parquet INT64 TIMESTAMP(NANOS) which Spark rejects
    * unless this legacy flag is on; the column then reads as nanosecond
    * bigint (TESTDATA: FIXTURES.md §2). Runtime-settable SQL conf.
    */
  def configureNanos(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    require(all.contains(name), s"unknown table: $name (expected one of ${all.mkString(", ")})")
    if (name == "events") configureNanos(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
