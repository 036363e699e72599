package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table loaders. All queries read the driver-generated parquet
  * tables under a scale-factor directory (see TESTDATA.md / FIXTURES.md).
  *
  * At cluster scale these reads are plain parquet scans: Catalyst pushes
  * predicates and prunes columns into the scan, so every query below only
  * pays for the columns/rows it touches regardless of table size.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects. Requires `spark.sql.legacy.parquet.nanosAsLong=true` set at
    * session build (Verify/Bench/test harness do this — a per-read
    * `conf.set` here would be a racy side effect on shared session state).
    * The raw long nanos are floor-converted to a microsecond TimestampType
    * — the same truncation DuckDB applies casting TIMESTAMP_NS → TIMESTAMP,
    * keeping oracle comparisons aligned. Integer `div` (not `/`) avoids
    * double-precision loss on ~1.7e18 ns.
    */
  def events(s: SparkSession, d: String): DataFrame =
    table(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
