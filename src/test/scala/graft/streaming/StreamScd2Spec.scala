package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Incremental SCD2 maintenance vs the q34 one-shot batch merge:
  * replaying the same three snapshots through the foreachBatch MERGE
  * sink must produce byte-identical history (batch ≡ streaming parity),
  * and the pure merge handles the extend / change / gap / new cases.
  */
class StreamScd2Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir
  import spark.implicits._

  private def snapshotFrame(snap: Int): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
    val base = snap match {
      case 1 => docs
      case 2 => docs.filter(col("doc_id") % 11 =!= 0)
      case 3 => docs.filter(col("doc_id") % 13 =!= 0)
    }
    val digest =
      if (snap == 3)
        when(col("doc_id") % 7 === 0, md5(concat(col("text"), lit("v2"))))
          .otherwise(md5(col("text")))
      else md5(col("text"))
    base.select(col("doc_id"), digest.as("digest"), lit(snap).as("snap"))
  }

  test("pure merge: extend, change, gap-reappear, and new-doc cases") {
    val h0 = StreamScd2.emptyHistory(spark)
    val s1 = Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("doc_id", "digest")
    val h1 = StreamScd2.mergeSnapshot(h0, s1, 1)
    // snap 2: doc 1 unchanged (extend), doc 2 changed (new version),
    // doc 3 absent (tip left closed), doc 4 new
    val s2 = Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("doc_id", "digest")
    val h2 = StreamScd2.mergeSnapshot(h1, s2, 2)
    // snap 3: doc 3 reappears with its OLD digest — the gap still forces
    // a new version (q34 semantics)
    val s3 = Seq((3L, "c")).toDF("doc_id", "digest")
    val h3 = StreamScd2.historyWithCurrent(
      StreamScd2.mergeSnapshot(h2, s3, 3), 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getInt(3), r.getInt(4), r.getBoolean(5)))
    assert(h3.toSet == Set(
      (1L, 1L, "a", 1, 2, false),
      (2L, 1L, "b", 1, 1, false), (2L, 2L, "B", 2, 2, false),
      (3L, 1L, "c", 1, 1, false), (3L, 2L, "c", 3, 3, true),
      (4L, 1L, "d", 2, 2, false)), s"got ${h3.toSet}")
  }

  test("streamed snapshot merges equal q34's one-shot batch history") {
    val srcDir = java.nio.file.Files.createTempDirectory("scd2_src").toString
    val histDir = java.nio.file.Files.createTempDirectory("scd2_hist").toString + "/hist"
    // one file per snapshot, mtimes ascending so maxFilesPerTrigger=1
    // delivers them in snapshot order
    (1 to 3).foreach { s =>
      val tmp = java.nio.file.Files.createTempDirectory("scd2_tmp").toString + "/out"
      snapshotFrame(s).coalesce(1).write.parquet(tmp)
      val f = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = java.nio.file.Paths.get(srcDir, f"part_$s%02d.parquet")
      java.nio.file.Files.copy(f.toPath, dst)
      dst.toFile.setLastModified(1700000000000L + s * 60000L)
    }
    val q = spark.readStream
      .schema(snapshotFrame(1).schema)
      .option("maxFilesPerTrigger", 1)
      .option("latestFirst", "false")
      .parquet(srcDir)
      .writeStream
      .foreachBatch(StreamScd2.sink(spark, histDir))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    def canon(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getInt(3), r.getInt(4), r.getBoolean(5))).toSet
    assert(Scd2Store.readManifest(histDir).lastSnap == 3)
    val streamed = canon(
      StreamScd2.historyWithCurrent(Scd2Store.readHistory(spark, histDir), 3))
    val batch = canon(graft.queries.Relational.q34Scd2History(spark, dir))
    assert(streamed == batch,
      s"streamed ${streamed.size} rows vs batch ${batch.size}")
  }

  /** Fingerprint a bucket's physical files: (name, size, mtime) set —
    * byte-identity without reading contents (parquet files are
    * immutable once written; a rewrite lands NEW files in a NEW
    * generation dir, so same absolute path + size + mtime ⇒ same file).
    */
  private def bucketFiles(histDir: String, rel: String) =
    new java.io.File(histDir, rel).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getAbsolutePath, f.length(), f.lastModified())).toSet

  test("merge rewrites only delta-touched buckets; the rest keep their exact files") {
    val histDir = java.nio.file.Files.createTempDirectory("scd2_inc").toString + "/hist"
    // snap 1: a wide keyspace so every bucket is populated
    val s1 = spark.range(0, 512).select(col("id").as("doc_id"),
      md5(col("id").cast("string")).as("digest"), lit(1).as("snap"))
    StreamScd2.mergeBatch(spark, histDir, s1)
    val m1 = Scd2Store.readManifest(histDir)
    assert(m1.lastSnap == 1 && m1.buckets.size == Scd2Store.NumBuckets)
    val before = m1.buckets.map { case (b, rel) => b -> bucketFiles(histDir, rel) }
    // snap 2: a single-doc delta — exactly one bucket is touched
    val oneDoc = spark.range(7, 8).select(col("id").as("doc_id"),
      lit("changed").as("digest"), lit(2).as("snap"))
    val touchedBucket = oneDoc
      .select(Scd2Store.bucketOf(col("doc_id"))).first().getLong(0).toInt
    StreamScd2.mergeBatch(spark, histDir, oneDoc)
    val m2 = Scd2Store.readManifest(histDir)
    assert(m2.lastSnap == 2 && m2.generation == m1.generation + 1)
    // untouched buckets: same manifest path AND same physical files
    (0 until Scd2Store.NumBuckets).filter(_ != touchedBucket).foreach { b =>
      assert(m2.buckets(b) == m1.buckets(b), s"bucket $b path changed")
      assert(bucketFiles(histDir, m2.buckets(b)) == before(b),
        s"bucket $b files rewritten")
    }
    // the touched bucket moved to the new generation and superseded
    // files were GC'd
    assert(m2.buckets(touchedBucket) != m1.buckets(touchedBucket))
    assert(!new java.io.File(histDir, m1.buckets(touchedBucket)).exists(),
      "superseded bucket dir not GC'd")
    // and the merge itself is correct: doc 7 has two versions
    val doc7 = Scd2Store.readHistory(spark, histDir)
      .filter(col("doc_id") === 7).orderBy(col("version")).collect()
    assert(doc7.length == 2 && doc7(1).getString(2) == "changed")
  }

  test("re-delivered micro-batch is a no-op (at-least-once idempotency)") {
    val histDir = java.nio.file.Files.createTempDirectory("scd2_idem").toString + "/hist"
    val s1 = spark.range(0, 64).select(col("id").as("doc_id"),
      md5(col("id").cast("string")).as("digest"), lit(1).as("snap"))
    val s2 = spark.range(0, 64).select(col("id").as("doc_id"),
      md5(concat(col("id").cast("string"), lit("v2"))).as("digest"),
      lit(2).as("snap"))
    StreamScd2.mergeBatch(spark, histDir, s1)
    StreamScd2.mergeBatch(spark, histDir, s2)
    val m = Scd2Store.readManifest(histDir)
    val histBefore = Scd2Store.readHistory(spark, histDir).collect().toSet
    // foreachBatch re-delivers snap 2 after a restart — must not append
    // duplicate versions or bump the generation
    StreamScd2.mergeBatch(spark, histDir, s2)
    // and a mixed batch (old snap 2 + nothing new) is equally inert
    StreamScd2.mergeBatch(spark, histDir, s1.unionByName(s2))
    val m2 = Scd2Store.readManifest(histDir)
    assert(m2 == m, "re-delivery changed the manifest")
    assert(Scd2Store.readHistory(spark, histDir).collect().toSet == histBefore)
    // every doc has exactly versions 1 and 2 — no duplicates
    val bad = Scd2Store.readHistory(spark, histDir)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      .filter(col("n") =!= 2).count()
    assert(bad == 0)
  }

  test("asOf reads reproduce each snapshot's exact live state") {
    val histDir = java.nio.file.Files.createTempDirectory("scd2_asof").toString + "/hist"
    (1 to 3).foreach { s =>
      StreamScd2.mergeBatch(spark, histDir, snapshotFrame(s))
    }
    (1 to 3).foreach { s =>
      val got = Scd2Store.asOf(spark, histDir, s)
        .select(col("doc_id"), col("digest")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      val want = snapshotFrame(s).select(col("doc_id"), col("digest")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == want, s"as-of snapshot $s: ${got.size} vs ${want.size} docs")
    }
    // exactly one version per doc per as-of point (interval disjointness)
    val dup = Scd2Store.asOf(spark, histDir, 2)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).count()
    assert(dup == 0)
  }

  test("I/O receipt: a single-doc batch writes ~1/NumBuckets of the history bytes") {
    // the measured form of the incremental-persistence claim (the r8
    // design rewrote |history| bytes per batch regardless of delta):
    // build a 200k-doc history, merge a one-doc delta, and compare
    // bytes written by the second commit against the full history
    val histDir = java.nio.file.Files.createTempDirectory("scd2_io").toString + "/hist"
    val big = spark.range(0, 200000).select(col("id").as("doc_id"),
      md5(col("id").cast("string")).as("digest"), lit(1).as("snap"))
    StreamScd2.mergeBatch(spark, histDir, big)
    val m1 = Scd2Store.readManifest(histDir)
    def dirBytes(rel: String): Long =
      new java.io.File(histDir, rel).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val fullBytes = m1.buckets.values.map(dirBytes).sum
    val delta = spark.range(77, 78).select(col("id").as("doc_id"),
      lit("changed").as("digest"), lit(2).as("snap"))
    StreamScd2.mergeBatch(spark, histDir, delta)
    val m2 = Scd2Store.readManifest(histDir)
    val rewritten = m2.buckets.filter { case (b, rel) => m1.buckets.get(b) != Some(rel) }
    val deltaBytes = rewritten.values.map(dirBytes).sum
    assert(rewritten.size == 1, s"expected 1 rewritten bucket, got ${rewritten.size}")
    // one bucket of a 16-bucket store: ~6% of the history, with slack
    // for parquet per-file overhead
    assert(deltaBytes * (Scd2Store.NumBuckets / 2) < fullBytes,
      s"batch wrote $deltaBytes of $fullBytes history bytes — not incremental")
  }

  test("orphan generation dirs from a crashed attempt are ignored and swept") {
    val histDir = java.nio.file.Files.createTempDirectory("scd2_orph").toString + "/hist"
    val s1 = spark.range(0, 32).select(col("id").as("doc_id"),
      md5(col("id").cast("string")).as("digest"), lit(1).as("snap"))
    StreamScd2.mergeBatch(spark, histDir, s1)
    val histBefore = Scd2Store.readHistory(spark, histDir).collect().toSet
    // simulate a crash AFTER data write, BEFORE manifest swap: a full
    // generation dir exists but no manifest references it
    val orphan = new java.io.File(histDir, "data/g999/bucket=0")
    orphan.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(orphan, "junk.parquet").toPath, "not parquet")
    // reads go through the manifest — the orphan is invisible
    assert(Scd2Store.readHistory(spark, histDir).collect().toSet == histBefore)
    // the next successful commit sweeps it
    val s2 = spark.range(0, 32).select(col("id").as("doc_id"),
      lit("x").as("digest"), lit(2).as("snap"))
    StreamScd2.mergeBatch(spark, histDir, s2)
    assert(!new java.io.File(histDir, "data/g999").exists(), "orphan not swept")
  }

  test("crash between generation write and manifest swap: retry reuses the path and converges") {
    // the EXACT crash point the commit protocol claims to survive: the
    // next generation directory is fully written but the manifest never
    // swapped. The restarted job's manifest still says generation = g,
    // so its retry computes the SAME data/g<g+1> target — this test
    // pins that the retry overwrites the unreferenced orphan instead of
    // failing on path-already-exists, that pre-crash reads are
    // untouched, and that the retried merge converges to the clean-run
    // history.
    val histDir = java.nio.file.Files.createTempDirectory("scd2_crash").toString + "/hist"
    val cleanDir = java.nio.file.Files.createTempDirectory("scd2_clean").toString + "/hist"
    def snap(n: Int): DataFrame = spark.range(0, 32).select(
      col("id").as("doc_id"),
      when(col("id") % 5 === 0, md5(concat(col("id").cast("string"), lit(s"v$n"))))
        .otherwise(md5(col("id").cast("string"))).as("digest"),
      lit(n).as("snap"))
    StreamScd2.mergeBatch(spark, histDir, snap(1))
    val man = Scd2Store.readManifest(histDir)
    val histBefore = Scd2Store.readHistory(spark, histDir).collect().toSet
    // crash simulation: the retry's own target path, fully populated
    val orphan = new java.io.File(histDir, s"data/g${man.generation + 1}/bucket=0")
    orphan.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(orphan, "junk.parquet").toPath, "not parquet")
    // the pointer never moved: reads and manifest are the pre-crash ones
    assert(Scd2Store.readManifest(histDir) == man)
    assert(Scd2Store.readHistory(spark, histDir).collect().toSet == histBefore)
    // restart: the at-least-once re-delivery of snap 1 is a no-op...
    StreamScd2.mergeBatch(spark, histDir, snap(1))
    assert(Scd2Store.readManifest(histDir) == man, "replayed snap moved the pointer")
    // ...and merging snap 2 lands on the orphan's path without error
    StreamScd2.mergeBatch(spark, histDir, snap(2))
    StreamScd2.mergeBatch(spark, cleanDir, snap(1))
    StreamScd2.mergeBatch(spark, cleanDir, snap(2))
    assert(Scd2Store.readHistory(spark, histDir).collect().toSet ==
      Scd2Store.readHistory(spark, cleanDir).collect().toSet,
      "crashed-then-retried store diverged from the clean run")
    // the junk file cannot survive: its generation was truncated by the
    // retry's overwrite
    assert(!new java.io.File(orphan, "junk.parquet").exists(), "orphan file survived")
  }
}
