package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.io.File
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Manifest-pointed, hash-bucketed parquet store for the SCD2 history —
  * the persistence half of [[StreamScd2]], shaped like a miniature
  * lakehouse table so the per-batch merge is INCREMENTAL in I/O, not
  * just in compute:
  *
  *  - history rows live under `data/g<G>/bucket=<K>/` parquet
  *    directories, bucketed by `pmod(xxhash64(doc_id), NumBuckets)` —
  *    every version of a given document is in exactly one bucket;
  *  - a tiny `_manifest.properties` file is the SINGLE source of truth:
  *    it maps each bucket to the generation directory currently holding
  *    it, and records `lastSnap`, the highest snapshot id ever merged;
  *  - a merge writes ONLY the buckets whose keys appear in the batch
  *    delta, into a fresh generation directory, then swaps the manifest
  *    via an atomic same-directory rename. Untouched buckets' files are
  *    not rewritten, not copied, not even opened — the new manifest
  *    simply keeps pointing at them (the spec asserts byte-identity);
  *  - a crash at ANY point before the manifest swap leaves the previous
  *    manifest pointing at fully intact files — the half-written
  *    generation directory is unreferenced garbage that the next
  *    successful commit's [[gc]] sweeps;
  *  - foreachBatch is at-least-once, so a re-delivered micro-batch
  *    re-presents already-merged snapshots; `lastSnap` makes the merge
  *    idempotent — snaps ≤ lastSnap are skipped before any work runs.
  *
  * This is exactly the commit protocol of Delta/Iceberg reduced to its
  * core (data files immutable, a pointer flipped atomically, old files
  * GC'd after commit), expressed with nothing beyond the JDK. The
  * atomic-rename step assumes a filesystem with atomic same-directory
  * rename (local disk, HDFS); on an object store without it (raw S3)
  * a real deployment swaps the pointer through a conditional PUT or a
  * catalog — the same place Delta/Iceberg moved their pointer.
  *
  * Scale: [[NumBuckets]] is 16 here (fixture-sized history); at 100×
  * the bucket count scales with history size (target a few hundred MB
  * of parquet per bucket) so a micro-batch touching d distinct docs
  * rewrites O(min(d, B)) buckets of |history|/B bytes each — per-batch
  * write cost proportional to the delta's key spread, never to the
  * whole history.
  */
object Scd2Store {

  val NumBuckets = 16
  private val ManifestName = "_manifest.properties"

  /** The store pointer: highest merged snapshot id, the generation
    * counter the next commit will increment, and the bucket → relative
    * data directory map (only buckets that hold rows are present).
    */
  case class Manifest(lastSnap: Int, generation: Long, buckets: Map[Int, String])

  val EmptyManifest: Manifest = Manifest(Int.MinValue, 0L, Map.empty)

  /** Bucket id of a doc_id column — the ONE function the writer and the
    * touched-bucket pruning must agree on.
    */
  def bucketOf(docId: Column): Column =
    pmod(xxhash64(docId), lit(NumBuckets.toLong))

  def readManifest(storeDir: String): Manifest = {
    val f = new File(storeDir, ManifestName)
    if (!f.exists()) EmptyManifest
    else {
      val p = new java.util.Properties()
      val in = Files.newInputStream(f.toPath)
      try p.load(in) finally in.close()
      val buckets = scala.collection.mutable.Map.empty[Int, String]
      p.stringPropertyNames().forEach { k =>
        if (k.startsWith("bucket."))
          buckets(k.stripPrefix("bucket.").toInt) = p.getProperty(k)
      }
      Manifest(p.getProperty("lastSnap").toInt,
        p.getProperty("generation").toLong, buckets.toMap)
    }
  }

  /** Atomic pointer swap: write to a temp sibling, fsync, rename over
    * the live manifest. Readers see the old or the new manifest, never
    * a torn one.
    */
  private[streaming] def writeManifest(storeDir: String, m: Manifest): Unit = {
    Files.createDirectories(Paths.get(storeDir))
    val p = new java.util.Properties()
    p.setProperty("lastSnap", m.lastSnap.toString)
    p.setProperty("generation", m.generation.toString)
    m.buckets.foreach { case (b, d) => p.setProperty(s"bucket.$b", d) }
    val tmp = Paths.get(storeDir, ManifestName + ".tmp")
    val out = Files.newOutputStream(tmp)
    try p.store(out, "graft scd2 store pointer") finally out.close()
    Files.move(tmp, Paths.get(storeDir, ManifestName),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Read the bucket subset a merge needs (partition pruning by hand:
    * only the listed buckets' files are opened). `buckets` ids absent
    * from the manifest simply contribute nothing (first time a bucket
    * receives rows).
    */
  def readBuckets(spark: SparkSession, storeDir: String, m: Manifest,
      buckets: Set[Int]): DataFrame = {
    val paths = buckets.toSeq.sorted.flatMap(m.buckets.get)
      .map(rel => new File(storeDir, rel).toString)
    if (paths.isEmpty) StreamScd2.emptyHistory(spark)
    else spark.read.parquet(paths: _*)
  }

  /** The full history as one frame (q34-shaped read). */
  def readHistory(spark: SparkSession, storeDir: String): DataFrame = {
    val m = readManifest(storeDir)
    readBuckets(spark, storeDir, m, m.buckets.keySet)
  }

  /** Time travel: the corpus state AS OF snapshot `snap` — one
    * (doc_id, digest, version) row per document live at that snapshot
    * (the q36 read, served from the store instead of a rebuilt
    * history). A version row covers snapshots [valid_from, valid_to],
    * so the as-of filter is a pushed interval predicate over the
    * bucket files; at scale min/max footer stats prune row groups the
    * interval misses.
    */
  def asOf(spark: SparkSession, storeDir: String, snap: Int): DataFrame =
    readHistory(spark, storeDir)
      .filter(col("valid_from") <= snap && col("valid_to") >= snap)
      .select(col("doc_id"), col("version"), col("digest"))

  /** Commit one merged touched-bucket frame: write it partitioned by
    * bucket under a fresh generation dir, swap the manifest, sweep
    * unreferenced generations. `merged` must contain exactly the rows
    * of the touched buckets (all their docs, not just delta docs).
    */
  private[streaming] def commit(storeDir: String, m: Manifest,
      merged: DataFrame, touched: Set[Int], newLastSnap: Int): Manifest = {
    val gen = m.generation + 1
    val genRel = s"data/g$gen"
    merged
      .withColumn("bucket", bucketOf(col("doc_id")))
      // repartition BY the bucket column so each bucket directory gets
      // one file per commit, not one per shuffle partition — without
      // this a B-bucket store accumulates B × shuffle-partitions tiny
      // files per touch (the classic small-files failure); at larger
      // per-bucket volumes repartition(n, col) trades file count for
      // write parallelism
      .repartition(col("bucket"))
      // overwrite, NOT the ErrorIfExists default: a crash between the
      // generation write and the manifest swap leaves an orphan
      // data/g<gen+1> directory, and the restarted job — whose manifest
      // still says generation = gen — computes the SAME target path.
      // The orphan is unreferenced (the pointer never moved), so
      // truncating it is safe; erroring instead would wedge the store
      // until a manual sweep. Static partition-overwrite semantics
      // clear the whole orphan, including bucket dirs the retry does
      // not touch. StreamScd2Spec's crash case pins this path.
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(new File(storeDir, genRel).toString)
    val newBuckets = m.buckets ++
      touched.toSeq.filter(b => new File(storeDir, s"$genRel/bucket=$b").exists())
        .map(b => b -> s"$genRel/bucket=$b")
    val next = Manifest(newLastSnap, gen, newBuckets)
    writeManifest(storeDir, next)
    gc(storeDir, next)
    next
  }

  /** Delete generation/bucket directories the manifest no longer
    * references — superseded buckets from this commit plus any orphan
    * a crashed earlier attempt left behind. Runs strictly AFTER the
    * pointer swap, so a crash here only delays cleanup.
    */
  private[streaming] def gc(storeDir: String, m: Manifest): Unit = {
    val live = m.buckets.values.toSet
    val dataDir = new File(storeDir, "data")
    Option(dataDir.listFiles()).getOrElse(Array.empty).foreach { genDir =>
      Option(genDir.listFiles()).getOrElse(Array.empty).foreach { bDir =>
        val rel = s"data/${genDir.getName}/${bDir.getName}"
        if (!live.contains(rel)) deleteRecursively(bDir.toPath)
      }
      if (Option(genDir.list()).forall(_.isEmpty)) genDir.delete()
    }
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Option(p.toFile.listFiles()).getOrElse(Array.empty)
        .foreach(f => deleteRecursively(f.toPath))
    Files.deleteIfExists(p)
  }
}
