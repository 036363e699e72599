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
  * against the snapshot delta — one keyed shuffle on doc_id; closed
  * versions are never rewritten logically, and a lakehouse deployment
  * maps the physical rewrite to MERGE INTO / partition-scoped rewrite
  * of touched doc_id buckets. Here the whole (small) history parquet is
  * swapped per batch, with a localCheckpoint cutting lineage so the
  * overwrite never reads its own output path.
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
    * snapshot number `snap`. Deterministic, idempotent per (history,
    * snapshot) pair; no side effects.
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

  /** The foreachBatch body: fold every snapshot id present in the
    * micro-batch, in ascending order, into the history parquet at
    * `historyDir`. The eager localCheckpoint materializes the merged
    * history BEFORE the overwrite, so the write never scans the path it
    * is replacing (and the lineage never nests across batches).
    */
  def mergeBatch(spark: SparkSession, historyDir: String, batch: DataFrame): Unit = {
    val path = new java.io.File(historyDir)
    var hist =
      if (path.exists() && path.list().exists(_.endsWith(".parquet")))
        spark.read.parquet(historyDir)
      else emptyHistory(spark)
    val snaps = batch.select(col("snap")).distinct()
      .collect().map(_.getInt(0)).sorted
    snaps.foreach { s =>
      hist = mergeSnapshot(hist,
        batch.filter(col("snap") === s).select(col("doc_id"), col("digest")), s)
    }
    val pinned = hist.localCheckpoint(true)
    pinned.write.mode("overwrite").parquet(historyDir)
    pinned.unpersist(blocking = false)
  }

  /** Wire a (doc_id, digest, snap) stream into the history store:
    * `stream.writeStream.foreachBatch(sink(spark, dir)).start()`.
    */
  def sink(spark: SparkSession, historyDir: String): (DataFrame, Long) => Unit =
    (batch, _) => mergeBatch(spark, historyDir, batch)
}
