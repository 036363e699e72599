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
  /** events.ts has shipped as two encodings across testdata generations:
    * parquet TIMESTAMP(NANOS) (reads as a raw long under
    * `spark.sql.legacy.parquet.nanosAsLong=true`, which Verify/Bench/test
    * harness all set — Spark's vectorized reader rejects nanos otherwise)
    * and plain TIMESTAMP(MICROS) (reads as TIMESTAMP_NTZ). Dispatch on the
    * scanned type so both load to the same microsecond TimestampType:
    * long nanos are floor-divided (`div`, not `/` — double precision would
    * lose bits on ~1.7e18 ns), matching DuckDB's TIMESTAMP_NS → TIMESTAMP
    * truncation; NTZ micros cast 1:1 under the harness's UTC session zone.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types._
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType | TimestampType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case other =>
        // fail loudly: a silent cast of an unexpected encoding (string,
        // double, ...) would produce nulls and surface as downstream
        // oracle mismatches instead of a clear load error
        throw new IllegalStateException(
          s"events.ts scanned as unsupported type $other; expected " +
            "LONG (nanos under nanosAsLong), TIMESTAMP_NTZ, or TIMESTAMP")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
