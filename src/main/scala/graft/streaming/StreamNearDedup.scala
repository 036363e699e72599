package graft.streaming

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.queries.Dedup

/** Streaming face of d19: a per-micro-batch NEAR-dup ingest gate over a
  * persistent MinHash store — the stateful sibling of [[StreamDedup]]'s
  * exact-key dedup. Each micro-batch of documents is probed against the
  * store built from every EARLIER batch (band equi-join + exact Jaccard
  * verify on candidates, `Dedup.d19ProbeDirs`), its near-dup verdicts
  * are published, and its own band + shingle rows are appended — so the
  * store grows linearly with the corpus and no batch ever touches
  * corpus TEXT at all.
  *
  * Store layout (same doctrine as [[Scd2Store]], simplified because
  * appends here are PARTITIONED BY BATCH and never rewritten):
  * {{{
  *   store/bands/batch=<id>/              (doc_id, band, bh)  the probe index
  *   store/shingles/batch=<id>/bucket=<k> (doc_id, sh)        verify payloads,
  *                                        bucketed by xxhash64(doc_id)%64 so
  *                                        the verify fetch prunes to candidate
  *                                        buckets (the d19ProbeStored shape)
  *   outDir/batch=<id>/                   (new_id, dup_of, jaccard) verdicts
  * }}}
  * foreachBatch is at-least-once: a re-delivered batch id finds its
  * `bands/batch=<id>` directory already present and SKIPS all three
  * writes — replays are no-ops, and because the probe reads only
  * batches `< id` (directory names, not file listing order), a replay
  * could not even see its own half-written output. Batch 0 probes an
  * empty store and only seeds it.
  *
  * Scale: identical to d19's stored-probe analysis — per batch the
  * corpus-proportional work is one scan of the bands dirs (32 small
  * rows per corpus doc, measured FLAT in SCALING.md's d19 receipt) and
  * a candidate-bucket-pruned shingle fetch. State lives in parquet, not
  * the state store, so it survives restarts and is queryable and
  * compactable like any table.
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
    val priorBands = listBatchDirs(new File(storeDir, "bands"))
      .filter(_._1 < batchId).map(_._2)
    if (priorBands.isEmpty)
      emptyVerdicts(spark).write.mode("overwrite")
        .parquet(s"$outDir/batch=$batchId")
    else {
      val priorShingles = listBatchDirs(new File(storeDir, "shingles"))
        .filter(_._1 < batchId).map(_._2)
      // materialize, write, release (Checkpoints doctrine — the eager
      // also captures the probe's internal batch-shingle/cand caches)
      val cp = graft.Checkpoints.eager(
        Dedup.d19ProbeDirs(spark, docs, priorBands, priorShingles))
      try cp.df.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      finally cp.release()
    }
    // publish-then-merge: write shingles first, bands LAST — the bands
    // directory is the replay sentinel, so a crash between the two
    // leaves a store the retry fully repairs (overwrite mode)
    val sh = Dedup.shingleSetsOf(docs).cache()
    sh.withColumn("bucket",
        pmod(xxhash64(col("doc_id")), lit(Dedup.D19Buckets.toLong)))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$storeDir/shingles/batch=$batchId")
    Dedup.minhashBands(sh).write.mode("overwrite").parquet(bandDir.toString)
    sh.unpersist(blocking = false)
  }

  /** Compact every store partition with batch id ≤ `upTo` into a single
    * `batch=<upTo>` directory (bands and shingles alike) — the
    * small-files maintenance a long-running gate needs: after thousands
    * of batches the per-probe file listing and tiny-file scans
    * dominate, and the fix is exactly a lakehouse compaction. Probe
    * semantics are untouched: any batch id > upTo still reads the
    * identical union of earlier rows.
    *
    * Crash safety without a manifest: the merged data is staged to a
    * temp directory the probes ignore, its part files move into the
    * kept directory via per-file atomic renames (bucket subdirectories
    * preserved for the shingle store), and only then are the
    * superseded directories deleted — so any crash point leaves the
    * visible union with DUPLICATE rows, never missing ones, and the
    * probe collapses duplicates (candidate distinct + doc_id dedup on
    * the pruned shingle fetch). The spec pins verdict identity across
    * compaction and across a simulated half-completed compaction.
    */
  def compact(spark: SparkSession, storeDir: String, upTo: Long): Unit = {
    // upTo must be an ALREADY-MERGED batch: compacting into a fresh
    // batch=<upTo> dir would plant the replay sentinel for a batch that
    // was never processed, silently swallowing its future delivery
    require(new File(storeDir, s"bands/batch=$upTo").exists(),
      s"compact target batch=$upTo does not exist in $storeDir/bands")
    for (sub <- Seq("bands", "shingles")) {
      val root = new File(storeDir, sub)
      val olds = listBatchDirs(root).filter(_._1 < upTo)
      if (olds.nonEmpty) {
        // 1. materialize the union of the SUPERSEDED dirs (batch=<upTo>
        //    itself is not an input, so no step ever rewrites a live dir)
        val tmp = new File(root, s"_compact_tmp_$upTo") // name probes ignore
        val merged = spark.read.parquet(olds.map(_._2): _*)
        val writer = merged.write.mode("overwrite")
        if (sub == "shingles") writer.partitionBy("bucket").parquet(tmp.toString)
        else writer.parquet(tmp.toString)
        // 2. per-file atomic renames INTO batch=<upTo> (bucket= subdirs
        //    preserved): after any crash point the union of visible dirs
        //    only ever gains duplicate rows, never loses one
        val keep = new File(root, s"batch=$upTo")
        moveParquetTree(tmp, keep, s"compact-$upTo")
        org.apache.commons.io.FileUtils.deleteQuietly(tmp)
        // 3. drop the superseded dirs; a crash midway leaves duplicates
        //    the probe's distinct()/doc-id dedup collapses
        olds.foreach { case (_, p) =>
          org.apache.commons.io.FileUtils.deleteQuietly(new File(p))
        }
      }
    }
  }

  /** Move every part file under `src` (flat, or one partition level
    * deep, e.g. bucket=K) into the same relative location under `dst`
    * with a unique prefix, via per-file atomic renames.
    */
  private def moveParquetTree(src: File, dst: File, prefix: String): Unit = {
    var i = 0
    def moveInto(from: File, to: File): Unit = {
      java.nio.file.Files.createDirectories(to.toPath)
      from.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        java.nio.file.Files.move(f.toPath,
          to.toPath.resolve(s"$prefix-$i-${f.getName}"),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        i += 1
      }
    }
    moveInto(src, dst)
    src.listFiles().filter(f => f.isDirectory && f.getName.contains("="))
      .foreach(part => moveInto(part, new File(dst, part.getName)))
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
