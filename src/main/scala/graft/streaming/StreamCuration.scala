package graft.streaming

import graft.functions.TextFunctions.{fingerprint, qualityScore}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Incremental front half of TrainingPipeline.curate — the stages whose
  * semantics are per-row or keyed-by-digest run as Structured Streaming,
  * so a recurring crawl feeds curated text continuously instead of
  * re-running the batch pipeline over the full corpus:
  *
  *   file source (new crawl drops) → quality gate → exact dedup
  *
  * The quality gate is stateless and fuses into the file-source scan
  * (native quality_raw expression — one codegen pass). Exact dedup keys
  * the state store by the 16-byte content digest, NEVER the text: state
  * size is |distinct digests| × ~50 bytes regardless of document size,
  * and each micro-batch shuffles only its delta. The corpus-wide stages
  * that need a global view (near-dup clusters, decontamination) stay
  * batch — they consume this stream's sink on the reference's Airflow
  * cadence, reading only the new shard (the same split production
  * curation systems use: streaming hygiene, batch global dedup).
  *
  * Both dedup-state trade-offs from StreamDedup apply unchanged: the
  * default keeps a digest forever (exactly-once per content across all
  * history); the bounded variant evicts state behind the watermark.
  */
object StreamCuration {

  /** Quality-gated, digest-deduped document stream (unbounded digest
    * state — exactly-once per content over all history).
    */
  def curateStream(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      minQuality: Double,
      tsCol: String,
      watermark: String = "48 hours",
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
      .filter(qualityScore(col("text")) >= minQuality)
      .withColumn("digest", fingerprint(col("text")))
      .withWatermark(tsCol, watermark)
      .dropDuplicates("digest")

  /** Bounded-state variant: a digest's state is evicted once its event
    * time falls behind the watermark (re-crawl after the horizon
    * re-emits — the 48-h feed model).
    */
  def curateStreamBounded(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      minQuality: Double,
      tsCol: String,
      watermark: String = "48 hours",
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
      .filter(qualityScore(col("text")) >= minQuality)
      .withColumn("digest", fingerprint(col("text")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("digest")
}
