package graft.streaming

import graft.{Tables, TestSpark}
import graft.queries.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The streaming near-dup ingest gate: per-batch verdicts must equal the
  * one-shot d19 probe of that batch against all earlier batches, replays
  * must be no-ops, and planted cross-batch clones must surface.
  */
class StreamNearDedupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir
  import spark.implicits._

  /** Three batches of the fixture (doc_id mod 3) with a clone planted in
    * each later batch: b1 clones a b0 doc, b2 clones a b1 doc — so every
    * probed batch has at least one guaranteed j=1 verdict.
    */
  private def batches(): Seq[DataFrame] = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    def part(m: Int) = docs.filter(col("doc_id") % 3 === m)
    def cloneOf(src: DataFrame, newId: Long) = {
      val r = src.orderBy(col("doc_id")).limit(1).collect().head
      Seq((newId, r.getString(1))).toDF("doc_id", "text")
    }
    val b0 = part(0)
    val b1 = part(1).unionByName(cloneOf(b0, 8000001L))
    val b2 = part(2).unionByName(cloneOf(b1, 8000002L))
    Seq(b0, b1, b2)
  }

  private def canon(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("streamed gate verdicts equal the one-shot probe per batch; clones surface") {
    val root = java.nio.file.Files.createTempDirectory("neardedup-").toString
    val (srcDir, storeDir, outDir) = (s"$root/src", s"$root/store", s"$root/out")
    val bs = batches()
    // one parquet file per batch, mtimes ascending so maxFilesPerTrigger=1
    // delivers them as batchIds 0, 1, 2 in order
    bs.zipWithIndex.foreach { case (b, i) =>
      val tmp = s"$root/tmp$i"
      b.coalesce(1).write.parquet(tmp)
      val f = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = java.nio.file.Paths.get(srcDir, f"part_$i%02d.parquet")
      java.nio.file.Files.createDirectories(dst.getParent)
      java.nio.file.Files.copy(f.toPath, dst)
      dst.toFile.setLastModified(1700000000000L + i * 60000L)
    }
    val q = spark.readStream
      .schema(bs.head.schema)
      .option("maxFilesPerTrigger", 1)
      .option("latestFirst", "false")
      .parquet(srcDir)
      .writeStream
      .foreachBatch(StreamNearDedup.sink(spark, storeDir, outDir))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)

    // batch 0 probes an empty index: zero verdicts, store seeded
    assert(spark.read.parquet(s"$outDir/batch=0").count() == 0)
    // each later batch equals the one-shot d19 probe against the union
    // of all earlier batches (d19Frame == brute force per DedupSpec)
    val exp1 = canon(Dedup.d19Frame(bs(0), bs(1)))
    val exp2 = canon(Dedup.d19Frame(bs(0).unionByName(bs(1)), bs(2)))
    assert(canon(spark.read.parquet(s"$outDir/batch=1")) == exp1)
    assert(canon(spark.read.parquet(s"$outDir/batch=2")) == exp2)
    // the planted clones surface with jaccard exactly 1.0
    assert(exp1.exists { case (n, _, j) => n == 8000001L && j == 1.0 })
    assert(exp2.exists { case (n, _, j) => n == 8000002L && j == 1.0 })

    // at-least-once replay: re-presenting batch 1 is a no-op — verdict
    // and store files keep their exact (path, size, mtime) fingerprints
    import scala.jdk.CollectionConverters._
    def fp(p: String) = org.apache.commons.io.FileUtils
      .listFiles(new java.io.File(p), null, true).asScala
      .map(f => (f.getAbsolutePath, f.length(), f.lastModified())).toSet
    val before = Seq(s"$outDir/batch=1", s"$storeDir/bands/batch=1",
      s"$storeDir/shingles/batch=1").map(fp)
    StreamNearDedup.processBatch(spark, bs(1), 1L, storeDir, outDir)
    val after = Seq(s"$outDir/batch=1", s"$storeDir/bands/batch=1",
      s"$storeDir/shingles/batch=1").map(fp)
    assert(before == after, "replayed batch rewrote store or output files")

    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("a torn sentinel write is reprocessed, not skipped") {
    // Spark creates the output dir at job START, so a crash mid-write of
    // the bands table leaves the dir present without its _SUCCESS commit
    // marker — a dir-existence sentinel would skip the replay and the
    // batch's index rows would be lost from the store forever. The
    // sentinel is the COMMIT marker: the replay must reprocess and
    // repair (all gate writes are overwrite-mode).
    val root = java.nio.file.Files.createTempDirectory("neardedup-t-").toString
    val (storeDir, outDir) = (s"$root/store", s"$root/out")
    val bs = batches()
    StreamNearDedup.processBatch(spark, bs(0), 0L, storeDir, outDir)
    StreamNearDedup.processBatch(spark, bs(1), 1L, storeDir, outDir)
    // simulate the torn write: commit marker and data gone, dir present
    val bands1 = new java.io.File(s"$storeDir/bands/batch=1")
    bands1.listFiles().foreach(org.apache.commons.io.FileUtils.deleteQuietly)
    assert(bands1.exists() && bands1.listFiles().isEmpty)
    StreamNearDedup.processBatch(spark, bs(1), 1L, storeDir, outDir)
    assert(new java.io.File(bands1, "_SUCCESS").exists(),
      "torn sentinel write was not repaired")
    // and the repaired store yields the correct batch-2 verdicts
    StreamNearDedup.processBatch(spark, bs(2), 2L, storeDir, outDir)
    assert(canon(spark.read.parquet(s"$outDir/batch=2")) ==
      canon(Dedup.d19Frame(bs(0).unionByName(bs(1)), bs(2))))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("a store whose ENTIRE history is zero-row batches does not wedge the probe") {
    // the asymmetric cousin of the zero-row pin below: a zero-shingle
    // batch's BANDS dir stays data-"bearing" (flat zero-row writes emit
    // one schema-carrying parquet file) while its SHINGLES dir has no
    // files at all (partitionBy of zero rows emits none) — so when the
    // whole history is zero-row, the probe branch RUNS (prior bands
    // non-empty) with an EMPTY shingle-dir list. Pre-fix,
    // d19ProbeDirs' payload-fetch reduce threw on that empty list, and
    // every at-least-once replay rethrew: a permanent wedge reachable
    // from nothing more than an all-short-docs first batch.
    val root = java.nio.file.Files.createTempDirectory("neardedup-z0-").toString
    val (storeDir, outDir) = (s"$root/store", s"$root/out")
    val tiny = Seq((9000001L, "hi")).toDF("doc_id", "text") // < 3 tokens
    StreamNearDedup.processBatch(spark, tiny, 0L, storeDir, outDir)
    assert(GateStore.hasDataFiles(new java.io.File(s"$storeDir/bands/batch=0")),
      "flat zero-row bands write should keep a schema-bearing file")
    assert(!GateStore.hasDataFiles(new java.io.File(s"$storeDir/shingles/batch=0")))
    val bs = batches()
    // pre-fix: UnsupportedOperationException (empty.reduceLeft), forever
    StreamNearDedup.processBatch(spark, bs(1), 1L, storeDir, outDir)
    assert(spark.read.parquet(s"$outDir/batch=1").count() == 0,
      "no payload history means the correct verdict set is empty")
    // and the gate keeps gating: batch 2 still catches batch 1's rows
    StreamNearDedup.processBatch(spark, bs(2), 2L, storeDir, outDir)
    assert(canon(spark.read.parquet(s"$outDir/batch=2")) ==
      canon(Dedup.d19Frame(bs(1), bs(2))))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("a committed zero-row batch neither wedges later probes nor compaction") {
    // a micro-batch whose every doc is shorter than the shingle width
    // commits bands/shingles dirs with _SUCCESS but NO data files
    // (partitionBy of zero rows emits none). Pre-fix, every later
    // batch's probe read that dir and threw 'Unable to infer schema' —
    // and replays hit the same error, wedging the stream permanently.
    val root = java.nio.file.Files.createTempDirectory("neardedup-z-").toString
    val (storeDir, outDir) = (s"$root/store", s"$root/out")
    val bs = batches()
    StreamNearDedup.processBatch(spark, bs(0), 0L, storeDir, outDir)
    val tiny = Seq((9000001L, "hi")).toDF("doc_id", "text") // < 3 tokens
    StreamNearDedup.processBatch(spark, tiny, 1L, storeDir, outDir)
    val bands1 = new java.io.File(s"$storeDir/bands/batch=1")
    assert(new java.io.File(bands1, "_SUCCESS").exists(),
      "zero-row batch must still commit its replay sentinel")
    // the data-less dir is the PARTITIONED table: partitionBy of zero
    // rows emits no files at all (an unpartitioned zero-row write still
    // emits one schema-bearing file, so bands stays readable)
    val shingles1 = new java.io.File(s"$storeDir/shingles/batch=1")
    assert(!GateStore.hasDataFiles(shingles1))
    // the empty batch's verdicts were still probed and published (empty)
    assert(spark.read.parquet(s"$outDir/batch=1").count() == 0)
    // later batches must probe cleanly past the data-less dir
    StreamNearDedup.processBatch(spark, bs(2), 2L, storeDir, outDir)
    assert(canon(spark.read.parquet(s"$outDir/batch=2")) ==
      canon(Dedup.d19Frame(bs(0), bs(2))))
    // and the empty batch's sentinel still makes its replay a no-op
    val mtime = new java.io.File(bands1, "_SUCCESS").lastModified()
    StreamNearDedup.processBatch(spark, tiny, 1L, storeDir, outDir)
    assert(new java.io.File(bands1, "_SUCCESS").lastModified() == mtime,
      "replay of a committed zero-row batch was reprocessed")
    // compaction over a mix of data-bearing and data-less dirs: merges
    // the data, supersedes (deletes) the empty dirs, keeps verdicts
    StreamNearDedup.compact(spark, storeDir, 2L)
    assert(!new java.io.File(s"$storeDir/bands/batch=0").exists())
    assert(!bands1.exists() && !shingles1.exists(),
      "superseded dirs (incl. the data-less one) survived compaction")
    StreamNearDedup.processBatch(spark, bs(1), 3L, storeDir, outDir)
    assert(canon(spark.read.parquet(s"$outDir/batch=3")) ==
      canon(Dedup.d19Frame(bs(0).unionByName(bs(2)), bs(1))))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("compact refuses a marker-covered target whose dir was merged away") {
    // a stray superseded dir surviving a crashed delete plus a re-run
    // of compact with an upTo BELOW the current marker: merging into
    // the now-deleted batch=<upTo> would create a fresh dir with no
    // _SUCCESS that every future compact trips over as torn — and no
    // replay can repair it (the marker makes replays skip that id).
    // The target must be a LIVE committed sentinel dir.
    val root = java.nio.file.Files.createTempDirectory("neardedup-m-").toString
    val (storeDir, outDir) = (s"$root/store", s"$root/out")
    val bs = batches()
    bs.zipWithIndex.foreach { case (b, i) =>
      StreamNearDedup.processBatch(spark, b, i.toLong, storeDir, outDir) }
    StreamNearDedup.compact(spark, storeDir, 2L) // marker = 2, dirs 0/1 gone
    // simulate the stray survivor of a crashed delete
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(s"$storeDir/bands/batch=2"),
      new java.io.File(s"$storeDir/bands/batch=0"))
    intercept[IllegalArgumentException] {
      StreamNearDedup.compact(spark, storeDir, 1L)
    }
    // no torn batch=1 dir was planted; compacting to the live target
    // still works and sweeps the stray
    StreamNearDedup.compact(spark, storeDir, 2L)
    assert(!new java.io.File(s"$storeDir/bands/batch=0").exists())
    StreamNearDedup.processBatch(spark, bs(1), 3L, storeDir, outDir)
    assert(canon(spark.read.parquet(s"$outDir/batch=3")) ==
      canon(Dedup.d19Frame(bs(0).unionByName(bs(1)).unionByName(bs(2)), bs(1))))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("compaction preserves verdicts, including after a simulated half-crash") {
    val root = java.nio.file.Files.createTempDirectory("neardedup-c-").toString
    val (storeDir, outDir) = (s"$root/store", s"$root/out")
    val bs = batches()
    StreamNearDedup.processBatch(spark, bs(0), 0L, storeDir, outDir)
    // executor storage flat per batch: the probe bracket + append sweep
    // must release everything this batch pinned (a long-running gate
    // would otherwise grow storage monotonically)
    val pinnedBefore = spark.sparkContext.getPersistentRDDs.keySet
    StreamNearDedup.processBatch(spark, bs(1), 1L, storeDir, outDir)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- pinnedBefore
    assert(leaked.isEmpty, s"gate batch leaked persistent RDDs: $leaked")
    val exp2 = canon(Dedup.d19Frame(bs(0).unionByName(bs(1)), bs(2)))

    // compact batches 0..1 into batch=1; batch 2's probe must see the
    // identical union
    StreamNearDedup.compact(spark, storeDir, 1L)
    assert(!new java.io.File(s"$storeDir/bands/batch=0").exists())
    // the at-least-once no-op guarantee must survive compaction: batch
    // 0's bands dir (its replay sentinel) was merged away, so a
    // re-delivery must be vouched for by the compaction marker — were
    // it reprocessed, it would see an apparently-empty prior store,
    // overwrite its verdicts, and re-seed bands/batch=0
    StreamNearDedup.processBatch(spark, bs(0), 0L, storeDir, outDir)
    assert(!new java.io.File(s"$storeDir/bands/batch=0").exists(),
      "replay of a compacted batch id was reprocessed")
    StreamNearDedup.processBatch(spark, bs(2), 2L, storeDir, outDir)
    assert(canon(spark.read.parquet(s"$outDir/batch=2")) == exp2)

    // simulated half-crash: superseded rows resurface as duplicates
    // (compaction moved files in but a retry's delete never ran) —
    // verdicts must be unchanged because the probe collapses dup rows
    for (sub <- Seq("bands", "shingles")) {
      val keep = new java.io.File(s"$storeDir/$sub/batch=1")
      val ghost = new java.io.File(s"$storeDir/$sub/batch=0")
      org.apache.commons.io.FileUtils.copyDirectory(keep, ghost)
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$outDir/batch=2"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$storeDir/bands/batch=2"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$storeDir/shingles/batch=2"))
    StreamNearDedup.processBatch(spark, bs(2), 2L, storeDir, outDir)
    assert(canon(spark.read.parquet(s"$outDir/batch=2")) == exp2,
      "duplicate store rows changed the verdicts")

    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("text store geometry is pinned: a mismatched probe throws before any batch runs") {
    // the text store's shape parameters (shingle width, MinHash banding,
    // verify buckets) are exactly as silent-recall-lethal as the embed
    // store's SigSpec: shingles built at another width share no keys
    // with the stored sets, so near-dups sail through with zero errors.
    val root = java.nio.file.Files.createTempDirectory("neardedup-g-").toString
    try {
      val store = s"$root/store"
      // frozen serialized form — a refactor must not orphan live stores
      assert(StreamNearDedup.Geometry ==
        "minhash:shingle=3,bands=32x4,buckets=64")
      // a store created by some other build at a different shape...
      GateStore.ensureGeometry(store, "minhash:shingle=5,bands=16x8,buckets=64")
      // ...refuses this build's probe BEFORE any write happens
      val e = intercept[IllegalStateException] {
        StreamNearDedup.processBatch(spark, batches().head, 0L,
          store, s"$root/out")
      }
      assert(e.getMessage.contains("geometry"), e.getMessage)
      assert(!new java.io.File(s"$store/bands").exists(),
        "mismatched-geometry batch still wrote store rows")
      // and the sink fails at CONSTRUCTION, before the stream starts
      val e2 = intercept[IllegalStateException] {
        StreamNearDedup.sink(spark, store, s"$root/out")
      }
      assert(e2.getMessage.contains("geometry"), e2.getMessage)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  test("owner guard is DEFAULT-ON: two queries with different outputs refuse one store, no explicit owner needed") {
    val root = java.nio.file.Files.createTempDirectory("neardedup-o-").toString
    try {
      val store = s"$root/store"
      // first query claims out:<outDir> implicitly
      StreamNearDedup.sink(spark, store, s"$root/outA")
      // restart of the SAME query (same outDir) re-claims fine
      StreamNearDedup.sink(spark, store, s"$root/outA")
      // ...including when the restart respells the same path (trailing
      // slash / non-normalized) — the claim is path-normalized
      StreamNearDedup.sink(spark, store, s"$root/outA/")
      StreamNearDedup.sink(spark, store, s"$root/./outA")
      // a DIFFERENT query pointed at the same store is refused loudly —
      // the unguarded-by-default path no longer exists
      val e = intercept[IllegalStateException] {
        StreamNearDedup.sink(spark, store, s"$root/outB")
      }
      assert(e.getMessage.contains("owned"), e.getMessage)
      // same refusal across gate types sharing the store root
      intercept[IllegalStateException] {
        StreamMediaDedup.sink(spark, store, s"$root/outC")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  test("default owner is scheme-aware: URI and plain-path spellings of one output derive one owner; remote URIs are never CWD-resolved") {
    // file: URIs with no remote authority collapse to the local form —
    // all four spellings name ONE owner
    assert(GateStore.ownerFor("/tmp/graft-owner-x") == "out:/tmp/graft-owner-x")
    assert(GateStore.ownerFor("file:/tmp/graft-owner-x") ==
      GateStore.ownerFor("/tmp/graft-owner-x"))
    assert(GateStore.ownerFor("file:///tmp/graft-owner-x/") ==
      GateStore.ownerFor("/tmp/graft-owner-x"))
    assert(GateStore.ownerFor("file:/tmp/./graft-owner-x") ==
      GateStore.ownerFor("/tmp/graft-owner-x"))
    // scheme-qualified paths keep scheme://authority/path verbatim
    // (pre-fix, Paths.get resolved these against the CWD — a restart
    // switching spellings derived a different owner and was refused)
    assert(GateStore.ownerFor("hdfs://nn:8020/warehouse/out/") ==
      "out:hdfs://nn:8020/warehouse/out")
    assert(GateStore.ownerFor("hdfs://nn:8020/warehouse/out") ==
      GateStore.ownerFor("hdfs://nn:8020/warehouse/out///"))
    assert(GateStore.ownerFor("s3a://bucket/curated/out") ==
      "out:s3a://bucket/curated/out")
    // distinct outputs stay distinct
    assert(GateStore.ownerFor("hdfs://nn:8020/a") !=
      GateStore.ownerFor("hdfs://nn:8020/b"))
    assert(GateStore.ownerFor("s3a://bucket/a") !=
      GateStore.ownerFor("s3n://bucket/a"))
    // unencoded characters Hadoop writers accept must not throw at sink
    // construction (java.net.URI.create would)
    assert(GateStore.ownerFor("s3a://bucket/out dir") ==
      "out:s3a://bucket/out dir")
    assert(GateStore.ownerFor("/tmp/out dir/") == "out:/tmp/out dir")
    // end-to-end: a restart that switches between URI and plain-path
    // spellings of the same output re-claims its own store
    val root = java.nio.file.Files.createTempDirectory("neardedup-uri-").toString
    try {
      val store = s"$root/store"
      StreamNearDedup.sink(spark, store, s"$root/out")
      StreamNearDedup.sink(spark, store, s"file:$root/out")
      StreamNearDedup.sink(spark, store, s"file://$root/out/")
      // a genuinely different output is still refused
      intercept[IllegalStateException] {
        StreamNearDedup.sink(spark, store, s"file:$root/other")
      }
      // upgrade path: a store claimed under the PRE-scheme-aware default
      // (URI CWD-resolved by Paths.get) re-claims and migrates its
      // marker instead of refusing its own writer after the fix
      val legacyStore = s"$root/legacy-store"
      val uriOut = s"file:$root/out"
      GateStore.claimOwner(legacyStore,
        "out:" + java.nio.file.Paths.get(uriOut).toAbsolutePath.normalize)
      StreamNearDedup.sink(spark, legacyStore, uriOut) // must not throw
      StreamNearDedup.sink(spark, legacyStore, s"$root/out") // marker upgraded
      intercept[IllegalStateException] { // and still guards
        StreamNearDedup.sink(spark, legacyStore, s"$root/other")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }
}
