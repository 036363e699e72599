package graft.streaming

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, StandardCopyOption}

import org.apache.spark.sql.SparkSession

/** Shared mechanics of the per-batch streaming ingest-gate stores —
  * the text ([[StreamNearDedup]]), embedding ([[StreamEmbedDedup]]) and
  * media ([[StreamMediaDedup]]) gates all keep the same store shape:
  *
  *   store/<table>/batch=<id>[/<part>=<k>]   append-once per micro-batch
  *
  * with the FIRST table's `batch=<id>` directory doubling as the
  * at-least-once replay sentinel (so processBatch must write it LAST),
  * and a `_compacted_up_to` marker vouching for sentinel dirs that a
  * compaction merged away. This object owns the directory protocol;
  * the per-modality gates own what the tables contain and how a batch
  * is probed.
  */
private[streaming] object GateStore {

  private val CompactedMarker = "_compacted_up_to"

  /** (batchId, absolutePath) of every `batch=<id>` child, ascending. */
  def listBatchDirs(root: File): Seq[(Long, String)] =
    Option(root.listFiles()).getOrElse(Array.empty[File]).toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      .map(f => (f.getName.stripPrefix("batch=").toLong, f.getAbsolutePath))
      .sortBy(_._1)

  /** Batch ids strictly below this are compacted away — their sentinel
    * dirs were merged into a higher batch dir, and the marker vouches
    * for them instead.
    */
  def compactedUpTo(storeDir: String): Long = {
    val f = new File(storeDir, CompactedMarker)
    if (!f.exists()) Long.MinValue
    else new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
      .trim.toLong
  }

  /** True iff `batchId` was already merged: its sentinel dir (the first
    * store table's batch dir) was COMMITTED, or the compaction marker
    * covers it. Committed means the job-commit `_SUCCESS` marker is
    * present, not merely that the directory exists — Spark creates the
    * output directory at job START (`_temporary` staging), so a crash
    * mid-write leaves a dir whose presence would otherwise make the
    * replay skip the batch and silently lose its index rows; checking
    * the commit marker turns that torn write into a clean reprocess
    * (every gate write is overwrite-mode, so the retry repairs it).
    */
  def alreadyMerged(storeDir: String, sentinelTable: String,
      batchId: Long): Boolean =
    new File(storeDir,
      s"$sentinelTable/batch=$batchId/_SUCCESS").exists() ||
      batchId < compactedUpTo(storeDir)

  /** Monotonic atomic update of the compaction marker (tmp + rename —
    * readers see the old or new value, never a torn file).
    */
  private def writeCompactedMarker(storeDir: String, upTo: Long): Unit = {
    val v = math.max(upTo, compactedUpTo(storeDir))
    val tmp = new File(storeDir, CompactedMarker + ".tmp").toPath
    Files.write(tmp, v.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, new File(storeDir, CompactedMarker).toPath,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** The shared per-micro-batch skeleton all three gates run —
    * sentinel check, prior-dir listing, probe-or-empty verdict write
    * with the eagerBuild release bracket, then the sweep-wrapped store
    * append. Centralized so a fix to the replay/leak/crash mechanics
    * lands once instead of three times.
    *
    * @param probe   builds the verdict frame from (table → prior batch
    *                dirs); only called when the sentinel table has
    *                prior batches
    * @param append  writes THIS batch's store rows; must write the
    *                sentinel table LAST (its commit marker is the
    *                replay sentinel)
    */
  def runBatch(spark: SparkSession, batchId: Long, storeDir: String,
      outDir: String, tables: Seq[(String, Seq[String])],
      verdictsDdl: String,
      probe: Map[String, Seq[String]] => org.apache.spark.sql.DataFrame,
      append: () => Unit): Unit = {
    val sentinel = tables.head._1
    if (alreadyMerged(storeDir, sentinel, batchId)) return
    val prior = tables.map { case (t, _) =>
      t -> listBatchDirs(new File(storeDir, t))
        .filter(_._1 < batchId).map(_._2)
    }.toMap
    if (prior(sentinel).isEmpty)
      spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(verdictsDdl))
        .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    else {
      // materialize, write, release (Checkpoints doctrine). The THUNK
      // form is load-bearing: the stored probes pin internal caches
      // during their driver-side bucket collects — while the frame is
      // being BUILT — so only a before-snapshot taken before
      // construction captures them for release()
      val cp = graft.Checkpoints.eagerBuild(spark)(probe(prior))
      try cp.df.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      finally cp.release()
    }
    // the sweep releases everything the append leg pinned (e.g. the
    // banding's internal signature cache) once the tables are on disk
    graft.Checkpoints.sweep(spark)(append())
  }

  /** Compact every store partition with batch id < `upTo` into the
    * `batch=<upTo>` directory of each listed table — the small-files
    * maintenance a long-running gate needs: after thousands of batches
    * the per-probe file listing and tiny-file scans dominate, and the
    * fix is exactly a lakehouse compaction. Probe semantics are
    * untouched: any batch id > upTo still reads the identical union of
    * earlier rows.
    *
    * `tables` maps each store subdirectory to its partition columns
    * (empty = flat). The FIRST table is the sentinel table; `upTo` must
    * already be merged there (compacting into a fresh dir would plant a
    * replay sentinel for a batch that was never processed, silently
    * swallowing its future delivery).
    *
    * Crash safety without a manifest: merged data is staged to a temp
    * directory the probes ignore, its part files move into the kept
    * directory via per-file atomic renames (partition subdirectories
    * preserved), the compaction marker is written (the superseded dirs
    * double as replay sentinels, so the marker must vouch for them
    * BEFORE any deletion), and only then are the superseded directories
    * deleted — so any crash point leaves the visible union with
    * DUPLICATE rows, never missing ones, and every gate's probe
    * collapses duplicates (candidate distinct + payload dedup by id).
    */
  def compact(spark: SparkSession, storeDir: String, upTo: Long,
      tables: Seq[(String, Seq[String])]): Unit = {
    val sentinel = tables.head._1
    require(alreadyMerged(storeDir, sentinel, upTo),
      s"compact target batch=$upTo was never committed in $storeDir/$sentinel")
    val superseded = Seq.newBuilder[File]
    for ((sub, partCols) <- tables) {
      val root = new File(storeDir, sub)
      val olds = listBatchDirs(root).filter(_._1 < upTo)
      // every superseded dir must itself be COMMITTED: merging a torn
      // dir and then writing the marker would vouch its id as merged
      // forever, converting a repairable torn write into permanent
      // silent loss — refuse loudly instead (the torn batch needs its
      // at-least-once re-delivery first)
      olds.find { case (_, p) => !new File(p, "_SUCCESS").exists() }
        .foreach { case (id, _) => throw new IllegalStateException(
          s"$root/batch=$id is uncommitted (no _SUCCESS) — replay it before compacting") }
      if (olds.nonEmpty) {
        // 1. materialize the union of the SUPERSEDED dirs (batch=<upTo>
        //    itself is not an input, so no step ever rewrites a live dir)
        val tmp = new File(root, s"_compact_tmp_$upTo") // name probes ignore
        val merged = spark.read.parquet(olds.map(_._2): _*)
        // converge files per partition value (the writers' small-files
        // guard) — compaction exists to SHRINK file counts, and an
        // unconverged partitionBy would re-fan tasks × partitions
        val shaped =
          if (partCols.isEmpty) merged
          else merged.repartition(partCols.map(org.apache.spark.sql.functions.col): _*)
        val writer = shaped.write.mode("overwrite")
        (if (partCols.isEmpty) writer else writer.partitionBy(partCols: _*))
          .parquet(tmp.toString)
        // 2. per-file atomic renames INTO batch=<upTo> (partition
        //    subdirs preserved): after any crash point the union of
        //    visible dirs only ever gains duplicate rows, never loses one
        moveParquetTree(tmp, new File(root, s"batch=$upTo"), s"compact-$upTo")
        org.apache.commons.io.FileUtils.deleteQuietly(tmp)
        superseded ++= olds.map { case (_, p) => new File(p) }
      }
    }
    // 3. record "ids < upTo are merged" BEFORE deleting the superseded
    //    sentinel dirs — otherwise a re-delivered compacted batch id
    //    would see an apparently-unprocessed store, overwrite its
    //    verdicts with wrong/empty ones and re-append its rows. Marker
    //    first means a crash mid-delete leaves both sentinels live.
    writeCompactedMarker(storeDir, upTo)
    // 4. drop the superseded dirs; a crash midway leaves duplicates the
    //    probes collapse
    superseded.result().foreach(org.apache.commons.io.FileUtils.deleteQuietly)
  }

  /** Move every part file under `src` (flat, or one partition level
    * deep, e.g. bucket=K) into the same relative location under `dst`
    * with a unique prefix, via per-file atomic renames.
    */
  private def moveParquetTree(src: File, dst: File, prefix: String): Unit = {
    var i = 0
    def moveInto(from: File, to: File): Unit = {
      Files.createDirectories(to.toPath)
      from.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        Files.move(f.toPath, to.toPath.resolve(s"$prefix-$i-${f.getName}"),
          StandardCopyOption.ATOMIC_MOVE)
        i += 1
      }
    }
    moveInto(src, dst)
    src.listFiles().filter(f => f.isDirectory && f.getName.contains("="))
      .foreach(part => moveInto(part, new File(dst, part.getName)))
  }
}
