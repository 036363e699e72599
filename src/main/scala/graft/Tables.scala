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

  /** Scale-adaptive parallelism floor for compute-heavy map stages
    * (guide §2.5, "input skew: one huge unsplittable file — repartition
    * immediately after the read").
    *
    * The fixture parquet tables are single-row-group files, so a scan
    * plans as ONE task and any codegen-heavy chain fused into the scan
    * stage (clean/tokenize/shingle, per-dim explodes) runs on one core
    * while the other 31 idle — measured 4 tasks / 3.0 s for t12 at
    * sf0.1. At production scale a table is thousands of splits and this
    * helper is a no-op: the repartition is inserted ONLY when the
    * scan's planned parallelism is below the session's default
    * parallelism. Keyed by a stable id column (deterministic
    * row→partition assignment under task retry — the SPARK-38388
    * doctrine; round-robin would also pay a local sort), with an
    * explicit partition count so AQE does not coalesce the fan-out
    * away. Callers must be order-independent downstream (every
    * hash-twinned query already is — the DuckDB oracle aggregates in
    * its own order); model-fitting paths whose floats depend on
    * partition layout (LDA, L-BFGS) deliberately do NOT use it.
    */
  def fanOut(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target, key)
  }
}
