package graft.streaming

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.queries.Dedup

/** Streaming face of d19: a per-micro-batch NEAR-dup ingest gate over a
  * persistent MinHash band index — the stateful sibling of
  * [[StreamDedup]]'s exact-key dedup. Each micro-batch of documents is
  * probed against the index built from every EARLIER batch (band
  * equi-join + exact Jaccard verify on candidates, `Dedup.d19Probe`),
  * its near-dup verdicts are published, and its own band rows + docs
  * are appended to the store — so the index grows linearly with the
  * corpus and no batch ever re-scans corpus text beyond the
  * candidate-id verify fetch.
  *
  * Store layout (same doctrine as [[Scd2Store]], simplified because
  * appends here are PARTITIONED BY BATCH and never rewritten):
  * {{{
  *   store/bands/batch=<id>/   (doc_id, band, bh)   the probe index
  *   store/docs/batch=<id>/    (doc_id, text)        verify payloads
  *   outDir/batch=<id>/        (new_id, dup_of, jaccard) verdicts
  * }}}
  * foreachBatch is at-least-once: a re-delivered batch id finds its
  * `bands/batch=<id>` directory already present and SKIPS all three
  * writes — replays are no-ops, and because the probe reads only
  * batches `< id` (directory names, not file listing order), a replay
  * could not even see its own half-written output. Batch 0 probes an
  * empty index and only seeds the store.
  *
  * Scale: identical to d19's analysis — per batch the corpus-sized
  * work is one (band, hash) equi-join against the index (32 rows per
  * corpus doc, no text) and an id-keyed shingle fetch for candidates
  * only. State lives in parquet, not the state store, so it survives
  * restarts and is queryable/compactable like any table.
  */
object StreamNearDedup {

  /** The foreachBatch body, curried with the store/output roots:
    * `stream.writeStream.foreachBatch(sink(spark, store, out)).start()`.
    */
  def sink(spark: SparkSession, storeDir: String, outDir: String)
      : (DataFrame, Long) => Unit = { (batch, batchId) =>
    processBatch(spark, batch, batchId, storeDir, outDir)
  }

  /** One gate step; package-visible so the spec can drive batches
    * directly and assert replay idempotence.
    */
  private[graft] def processBatch(spark: SparkSession, batch: DataFrame,
      batchId: Long, storeDir: String, outDir: String): Unit = {
    val bandDir = new File(storeDir, s"bands/batch=$batchId")
    if (bandDir.exists()) return // at-least-once replay: already merged

    val docs = batch.select(col("doc_id"), col("text"))
    val priorBatches = listBatchDirs(new File(storeDir, "bands"))
      .filter(_._1 < batchId)
    if (priorBatches.isEmpty)
      emptyVerdicts(spark).write.mode("overwrite")
        .parquet(s"$outDir/batch=$batchId")
    else {
      val index = spark.read.parquet(priorBatches.map(_._2): _*)
      val corpusDocs = spark.read.parquet(
        listBatchDirs(new File(storeDir, "docs"))
          .filter(_._1 < batchId).map(_._2): _*)
        // a crashed-and-retried compact can leave byte-identical
        // duplicate rows across dirs; any survivor is correct
        .dropDuplicates("doc_id")
      val corpusSh = Dedup.shingleSetsOf(corpusDocs).cache()
      // materialize before releasing the shingle cache, release the
      // checkpoint blocks once written (Checkpoints doctrine)
      val cp = graft.Checkpoints.eager(Dedup.d19Probe(docs, index, corpusSh))
      corpusSh.unpersist(blocking = false)
      try cp.df.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      finally cp.release()
    }
    // publish-then-merge: write docs first, bands LAST — the bands
    // directory is the replay sentinel, so a crash between the two
    // leaves a store the retry fully repairs (overwrite mode)
    docs.write.mode("overwrite").parquet(s"$storeDir/docs/batch=$batchId")
    Dedup.minhashBands(Dedup.shingleSetsOf(docs))
      .write.mode("overwrite").parquet(bandDir.toString)
  }

  /** Compact every store partition with batch id ≤ `upTo` into a single
    * `batch=<upTo>` directory (bands and docs alike) — the small-files
    * maintenance a long-running gate needs: after thousands of batches
    * the per-probe file listing and tiny-file scans dominate, and the
    * fix is exactly a lakehouse compaction. Probe semantics are
    * untouched: any batch id > upTo still reads the identical union of
    * earlier rows.
    *
    * Crash safety without a manifest: the merged directory is written
    * FIRST (overwrite mode, into `batch=<upTo>` — a directory the
    * replay sentinel already considers merged), then the superseded
    * directories are deleted. A crash between the two leaves duplicate
    * rows across old + merged dirs — harmless, because the probe's
    * candidate set is `distinct()` and the verify joins shingle payloads
    * by id (duplicates collapse), and a compaction retry is a pure
    * re-write + re-delete. The spec pins verdict identity across
    * compaction and across a simulated half-completed compaction.
    */
  def compact(spark: SparkSession, storeDir: String, upTo: Long): Unit = {
    // upTo must be an ALREADY-MERGED batch: compacting into a fresh
    // batch=<upTo> dir would plant the replay sentinel for a batch that
    // was never processed, silently swallowing its future delivery
    require(new File(storeDir, s"bands/batch=$upTo").exists(),
      s"compact target batch=$upTo does not exist in $storeDir/bands")
    for (sub <- Seq("bands", "docs")) {
      val root = new File(storeDir, sub)
      val olds = listBatchDirs(root).filter(_._1 < upTo)
      if (olds.nonEmpty) {
        // 1. materialize the union of the SUPERSEDED dirs (batch=<upTo>
        //    itself is not an input, so no step ever rewrites a live dir)
        val tmp = new File(root, s"_compact_tmp_$upTo") // name probes ignore
        spark.read.parquet(olds.map(_._2): _*)
          .write.mode("overwrite").parquet(tmp.toString)
        // 2. per-file atomic renames INTO batch=<upTo>: after any crash
        //    point the union of visible dirs only ever gains duplicate
        //    rows, never loses one
        val keep = new File(root, s"batch=$upTo")
        java.nio.file.Files.createDirectories(keep.toPath)
        tmp.listFiles().filter(_.getName.endsWith(".parquet"))
          .zipWithIndex.foreach { case (f, i) =>
            java.nio.file.Files.move(f.toPath,
              keep.toPath.resolve(s"compact-$upTo-$i-${f.getName}"),
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          }
        org.apache.commons.io.FileUtils.deleteQuietly(tmp)
        // 3. drop the superseded dirs; a crash midway leaves duplicates
        //    the probe's distinct()/doc-id dedup collapses
        olds.foreach { case (_, p) =>
          org.apache.commons.io.FileUtils.deleteQuietly(new File(p))
        }
      }
    }
  }

  private def emptyVerdicts(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType.fromDDL("new_id BIGINT, dup_of BIGINT, jaccard DOUBLE"))

  private def listBatchDirs(root: File): Seq[(Long, String)] =
    Option(root.listFiles()).getOrElse(Array.empty[File]).toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      .map(f => (f.getName.stripPrefix("batch=").toLong, f.getAbsolutePath))
      .sortBy(_._1)
}
