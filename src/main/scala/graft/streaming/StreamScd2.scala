package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental SCD2 history maintenance — the STREAMING half of q34's
  * batch merge (`queries/Relational.q34Scd2History`): snapshot batches
  * arrive one at a time and fold into a persistent history table via
  * the foreachBatch MERGE pattern (the Delta/Iceberg `MERGE INTO`
  * shape, expressed against plain parquet). Batch≡streaming parity is
  * the contract: replaying snapshots 1..N through [[mergeSnapshot]]
  * yields byte-identical history to q34's one-shot gaps-and-islands
  * merge over the same snapshots — StreamScd2Spec pins it.
  *
  * Merge semantics per document in the arriving snapshot s:
  *  - tip version has the same digest AND valid_to == s−1 → extend the
  *    tip's validity to s (contiguous unchanged presence);
  *  - otherwise (digest changed, or the doc skipped ≥1 snapshot, or the
  *    doc is new) → close the tip as-is and append version tip+1 with
  *    valid_from = valid_to = s. Documents absent from s are untouched.
  *
  * At scale: the merge joins the history TIPS (one row per live doc)
  * against the snapshot delta — one keyed shuffle on doc_id — and
  * persistence is [[Scd2Store]]'s manifest-bucketed layout: only the
  * hash buckets whose doc_ids appear in the batch delta are rewritten
  * (into a fresh generation directory), untouched buckets' files stay
  * byte-identical, and the manifest pointer swaps atomically, so a
  * failed batch leaves the previous history fully intact. foreachBatch
  * is at-least-once; the manifest's `lastSnap` makes re-delivered
  * snapshots a no-op (see [[mergeBatch]]). Per-batch I/O is therefore
  * proportional to the delta's bucket spread, never to |history| — the
  * plain-parquet reduction of lakehouse MERGE INTO.
  */
object StreamScd2 {

  /** Empty history frame with the q34 persistent schema (is_current is
    * derived at read time, not stored).
    */
  def emptyHistory(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long, String, Int, Int)]
      .toDF("doc_id", "version", "digest", "valid_from", "valid_to")
  }

  /** Pure merge of one snapshot (doc_id, digest) into the history at
    * snapshot number `snap`. Deterministic; no side effects. NOT
    * idempotent — re-merging an already-applied snapshot s finds
    * extended tips at valid_to == s (so contiguousSame's valid_to ==
    * s−1 test fails) and would append duplicate versions; replay
    * protection is [[mergeBatch]]'s lastSnap skip, not this function.
    */
  def mergeSnapshot(history: DataFrame, snapshot: DataFrame, snap: Int): DataFrame = {
    val byVer = Window.partitionBy(col("doc_id")).orderBy(col("version").desc)
    val ranked = history.withColumn("rn", row_number().over(byVer))
    val tip = ranked.filter(col("rn") === 1).drop("rn")
    val closed = ranked.filter(col("rn") =!= 1).drop("rn")
    val delta = snapshot.select(col("doc_id"), col("digest").as("new_digest"))
    val j = tip.join(delta, Seq("doc_id"), "full_outer")
    val contiguousSame = col("digest").isNotNull && col("new_digest").isNotNull &&
      col("new_digest") === col("digest") && col("valid_to") === snap - 1
    val extended = j.filter(contiguousSame)
      .select(col("doc_id"), col("version"), col("digest"),
        col("valid_from"), lit(snap).as("valid_to"))
    val keptTip = j.filter(col("digest").isNotNull && !contiguousSame)
      .select(col("doc_id"), col("version"), col("digest"),
        col("valid_from"), col("valid_to"))
    val appended = j.filter(col("new_digest").isNotNull && !contiguousSame)
      .select(col("doc_id"),
        (coalesce(col("version"), lit(0L)) + 1).as("version"),
        col("new_digest").as("digest"),
        lit(snap).as("valid_from"), lit(snap).as("valid_to"))
    closed.union(extended).union(keptTip).union(appended)
  }

  /** q34-shaped read view: history plus the derived is_current flag
    * relative to the latest merged snapshot.
    */
  def historyWithCurrent(history: DataFrame, latestSnap: Int): DataFrame =
    history
      .withColumn("is_current", col("valid_to") === latestSnap)
      .select(col("doc_id"), col("version"), col("digest"),
        col("valid_from"), col("valid_to"), col("is_current"))
      .orderBy(col("doc_id"), col("version"))

  /** The foreachBatch body: fold every NEW snapshot id present in the
    * micro-batch, in ascending order, into the [[Scd2Store]] at
    * `historyDir`.
    *
    * Incremental + idempotent + crash-safe:
    *  - snaps ≤ the manifest's lastSnap are dropped up front, so an
    *    at-least-once re-delivery (foreachBatch's contract) merges
    *    nothing and leaves the store untouched;
    *  - only the buckets whose doc_ids appear in the remaining delta
    *    are read and rewritten — [[mergeSnapshot]] is per-doc, and a
    *    doc's whole version chain lives in one hash bucket, so merging
    *    the touched-bucket subset is exactly equivalent to merging the
    *    full history (StreamScd2Spec pins byte-parity with q34);
    *  - the write lands in a fresh generation directory and the
    *    manifest swaps atomically afterwards, so a crash mid-batch
    *    leaves the previous history intact (no localCheckpoint needed:
    *    the job reads old-generation files and writes new ones — the
    *    lineage never scans the path it replaces).
    */
  def mergeBatch(spark: SparkSession, historyDir: String, batch: DataFrame): Unit = {
    val man = Scd2Store.readManifest(historyDir)
    val snaps = batch.select(col("snap")).distinct()
      .collect().map(_.getInt(0)).sorted
      .filter(_ > man.lastSnap)
    if (snaps.isEmpty) return
    val delta = batch.filter(col("snap") > man.lastSnap)
    val touched = delta.select(Scd2Store.bucketOf(col("doc_id")).as("b"))
      .distinct().collect().map(_.getLong(0).toInt).toSet // bounded by NumBuckets
    var hist = Scd2Store.readBuckets(spark, historyDir, man, touched)
    snaps.foreach { s =>
      hist = mergeSnapshot(hist,
        delta.filter(col("snap") === s).select(col("doc_id"), col("digest")), s)
    }
    Scd2Store.commit(historyDir, man, hist, touched, snaps.max)
  }

  /** Wire a (doc_id, digest, snap) stream into the history store:
    * `stream.writeStream.foreachBatch(sink(spark, dir)).start()`.
    */
  def sink(spark: SparkSession, historyDir: String): (DataFrame, Long) => Unit =
    (batch, _) => mergeBatch(spark, historyDir, batch)
}
