package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Write-path operators (SURVEY §2.1): the reference's Mongo/CSV sinks
  * re-expressed as Spark writers.
  *
  *  - S5/S6 (insert_one / insert_many): both collapse to an append-mode
  *    parquet write — Spark writes are always batched per partition, so
  *    the row/bulk distinction disappears by construction.
  *  - S7 (unique-index sink with DuplicateKeyError-skip): Spark has no
  *    write-path constraint; the equivalent plan is dedup-within-batch +
  *    left-anti join against the existing sink keys, then append
  *    (middlewares.py:12-16 + bbc_news_dag.py:36-38). At scale the
  *    anti-join reads ONLY the key column of the sink (column pruning)
  *    and shuffles on the key — or broadcasts when the new batch is
  *    small, which AQE decides.
  *  - S8 (CsvItemExporter with explicit fields_to_export): column-ordered
  *    header CSV write (pipelines.py:76-102).
  */
object Sinks {

  /** S5/S6: append rows to a parquet table. */
  def append(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path)

  /** Existing-sink key read for the anti-join, pruned to the partitions
    * the incoming batch can collide with. The `IN (batch's partition
    * values)` predicate is a partition filter, so the scan touches only
    * those directories — at a 100 TB sink with years of ingest dates, a
    * daily run reads one or two partitions' key columns instead of the
    * whole history.
    */
  private[graft] def existingKeys(spark: SparkSession, path: String,
      key: String, partitionCol: Option[String],
      partitionValues: Seq[Any]): DataFrame = {
    val existing = spark.read.parquet(path)
    partitionCol match {
      case Some(pc) =>
        existing.filter(col(pc).isin(partitionValues: _*)).select(col(key))
      case None => existing.select(col(key))
    }
  }

  /** S7: append only rows whose key is absent from the existing sink;
    * duplicates within the incoming batch keep the first by a
    * deterministic tie-break (min of all other columns is not defined —
    * use dropDuplicates, matching the reference's first-write-wins).
    * Returns the number of rows actually written.
    *
    * SINGLE-WRITER CONTRACT: uniqueness is enforced by the read-then-
    * anti-join, not by the store — the reference enforces it at the store
    * (pipelines.py:64's unique Mongo index), where two racing writers
    * would both be caught. Here two appendUnique calls that OVERLAP in
    * time can each read the sink before the other's append lands and both
    * write the same key. One writer at a time (the reference DAG's
    * 30-minute sequential schedule — and any Airflow/cron-style batch
    * cadence) gets exactly-once keys, re-feeding included; concurrent
    * writers are out of contract and need a store-side constraint or a
    * coordination layer (e.g. one Delta/Iceberg MERGE per feed) instead.
    * SinksSpec pins the sequential exactly-once behavior.
    *
    * `partitionCol`: optional ingest-date-style layout column. The sink
    * is written partitionBy(partitionCol) and the anti-join's
    * existing-keys read prunes to the incoming batch's partition values.
    * CONTRACT: the partition column must be functionally dependent on
    * the key (a re-fed row carries the same date — true of sitemap
    * lastmod, crawl date, event time), otherwise a duplicate living in a
    * non-scanned partition would be re-appended. The batch's distinct
    * partition values are collected to the driver — bounded by the feed's
    * date range (a daily run has 1-2), never row-scale.
    */
  def appendUnique(spark: SparkSession, df: DataFrame, path: String,
      key: String, partitionCol: Option[String] = None): Long = {
    val deduped = df.dropDuplicates(key)
    // existence via the Hadoop FS API — java.io.File is wrong for any
    // URI-qualified path (file:/, hdfs://, s3a://) and would silently
    // skip the uniqueness check
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fresh =
      if (fs.exists(hPath)) {
        val pVals = partitionCol.toSeq.flatMap { pc =>
          deduped.select(col(pc)).distinct().collect().map(_.get(0))
        }
        deduped.join(existingKeys(spark, path, key, partitionCol, pVals),
          Seq(key), "left_anti")
      } else deduped
    val out = fresh.cache()
    val n = out.count()
    if (n > 0) {
      val w = out.write.mode(SaveMode.Append)
      partitionCol.fold(w)(pc => w.partitionBy(pc)).parquet(path)
    }
    out.unpersist()
    n
  }

  /** Range-sharded write: the standard layout for a 100 TB corpus that
    * downstream consumers read by key range (doc-id shards for training
    * runs, time shards for backfills). `repartitionByRange` samples the
    * key to build balanced range boundaries (one Exchange), and
    * `sortWithinPartitions` orders rows inside each shard WITHOUT a
    * global sort — every output file covers a disjoint, internally
    * sorted key range, so a reader can binary-search files from
    * min/max footer stats and parquet row-group pruning works within
    * each file. A plain `orderBy().write` would funnel the final merge;
    * this shape never does.
    */
  def writeRangeSharded(df: DataFrame, path: String, key: String,
      shards: Int): Unit =
    df.repartitionByRange(shards, col(key))
      .sortWithinPartitions(col(key))
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** S8: header CSV with explicit field ordering. */
  def writeCsv(df: DataFrame, path: String, fieldsToExport: Seq[String]): Unit =
    df.select(fieldsToExport.map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .csv(path)

  /** Training-corpus publish: compressed JSONL shards laid out one
    * directory per `partitionCol` value (the domain/language axis LLM
    * loaders sample by) with every file capped at `maxRecordsPerFile` —
    * bounded shards parallelize loader workers evenly and keep any
    * single file re-downloadable. The `repartition(partitionCol)` before
    * the write is the small-files guard: without it every upstream task
    * writes a sliver into every partition directory (tasks × domains
    * files); with it each domain's rows converge to one task that then
    * splits on the record cap, so file count ≈ rows/cap, independent of
    * upstream parallelism. Skewed domains stay bounded BY the cap;
    * loaders that need sorted shards compose with
    * [[writeRangeSharded]]'s range layout instead.
    */
  def writeJsonlShards(df: DataFrame, path: String, partitionCol: String,
      maxRecordsPerFile: Int, codec: String = "gzip"): Unit =
    df.repartition(col(partitionCol))
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .option("compression", codec)
      .partitionBy(partitionCol)
      .json(path)

  /** Schema-on-read JSONL ingest with corrupt-line tolerance — the read
    * side of [[writeJsonlShards]]'s wire format, and the shape any
    * external corpus drop (Common-Crawl-style JSONL) arrives in.
    * Returns (good, corrupt): `good` carries exactly the caller's
    * schema; `corrupt` carries the raw offending lines for a quarantine
    * sink, so one bad line never fails a 100 TB ingest job.
    *
    * The schema is REQUIRED, deliberately: without one, Spark's JSON
    * source runs a full inference pass over every byte before the real
    * scan — a doubled read that is invisible at test scale and ruinous
    * at corpus scale. PERMISSIVE mode routes malformed lines into the
    * `_corrupt_record` column instead of throwing.
    *
    * The two frames are independent single-scan plans: `good` reads the
    * native JSON scan under DROPMALFORMED (bad lines vanish inside the
    * scan — no corrupt column ever enters the plan, so any downstream
    * pruning, including a bare count(), stays legal), while `corrupt`
    * re-derives corruptness from a TEXT scan with a PERMISSIVE
    * `from_json` in the filter — Spark disallows querying only the
    * corrupt column off a raw JSON scan, and the text formulation also
    * hands back the offending line byte-for-byte.
    */
  def readJsonl(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): (DataFrame, DataFrame) = {
    val corruptCol = "_corrupt_record"
    val good = spark.read
      .schema(schema)
      .option("mode", "DROPMALFORMED")
      .json(path)
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    val corrupt = spark.read.text(path)
      .filter(from_json(col("value"),
          schema.add(corruptCol, org.apache.spark.sql.types.StringType),
          Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corruptCol))
        .getField(corruptCol).isNotNull)
      .select(col("value").as("raw_line"))
    (good, corrupt)
  }
}
