package graft.streaming

import graft.{Tables, TestSpark}
import graft.queries.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The streaming embedding near-dup ingest gate: per-batch verdicts must
  * equal the one-shot d20 probe of that batch against all earlier
  * batches, replays (including of compacted ids) must be no-ops, planted
  * cross-batch vector clones must surface at cos = 1, and executor
  * storage must stay flat across batches.
  */
class StreamEmbedDedupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir
  import spark.implicits._

  /** Three batches of the fixture (vec_id mod 3) with a clone planted in
    * each later batch: b1 clones a b0 vector, b2 clones a b1 vector.
    */
  private def batches(): Seq[DataFrame] = {
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    def part(m: Int) = vecs.filter(col("vec_id") % 3 === m)
    def cloneOf(src: DataFrame, newId: Long) = {
      val r = src.orderBy(col("vec_id")).limit(1).collect().head
      Seq((newId, r.getSeq[Float](1))).toDF("vec_id", "embedding")
    }
    val b0 = part(0)
    val b1 = part(1).unionByName(cloneOf(b0, 8000001L))
    val b2 = part(2).unionByName(cloneOf(b1, 8000002L))
    Seq(b0, b1, b2)
  }

  private def canon(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("streamed gate verdicts equal the one-shot d20 probe per batch; clones surface") {
    val root = java.nio.file.Files.createTempDirectory("embeddedup-").toString
    val (srcDir, storeDir, outDir) = (s"$root/src", s"$root/store", s"$root/out")
    val bs = batches()
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
      .foreachBatch(StreamEmbedDedup.sink(spark, storeDir, outDir))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)

    // batch 0 probes an empty index: zero verdicts, store seeded
    assert(spark.read.parquet(s"$outDir/batch=0").count() == 0)
    val exp1 = canon(Dedup.d20Frame(bs(0), bs(1)))
    val exp2 = canon(Dedup.d20Frame(bs(0).unionByName(bs(1)), bs(2)))
    assert(canon(spark.read.parquet(s"$outDir/batch=1")) == exp1)
    assert(canon(spark.read.parquet(s"$outDir/batch=2")) == exp2)
    // the planted clones surface with cosine exactly 1.0
    assert(exp1.exists { case (n, _, c) => n == 8000001L && c == 1.0 })
    assert(exp2.exists { case (n, _, c) => n == 8000002L && c == 1.0 })

    // at-least-once replay: re-presenting batch 1 is a no-op
    import scala.jdk.CollectionConverters._
    def fp(p: String) = org.apache.commons.io.FileUtils
      .listFiles(new java.io.File(p), null, true).asScala
      .map(f => (f.getAbsolutePath, f.length(), f.lastModified())).toSet
    val before = Seq(s"$outDir/batch=1", s"$storeDir/sigs/batch=1").map(fp)
    StreamEmbedDedup.processBatch(spark, bs(1), 1L, storeDir, outDir)
    val after = Seq(s"$outDir/batch=1", s"$storeDir/sigs/batch=1").map(fp)
    assert(before == after, "replayed batch rewrote store or output files")

    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("a store written at one geometry refuses a probe at another, loudly") {
    // silent recall loss is the worst dedup-gate failure: a SigWide
    // store probed as SigNarrow bands 64-bit sigs as 4x4 bits, matches
    // nothing, and waves near-dups through with zero errors. The
    // _geometry marker makes the mismatch throw on first touch.
    val root = java.nio.file.Files.createTempDirectory("embeddedup-g-").toString
    val (storeDir, outDir) = (s"$root/store", s"$root/out")
    val bs = batches()
    StreamEmbedDedup.processBatch(spark, bs(0), 0L, storeDir, outDir,
      spec = Dedup.SigWide)
    // same geometry: restart path, re-touch is a no-op
    StreamEmbedDedup.processBatch(spark, bs(1), 1L, storeDir, outDir,
      spec = Dedup.SigWide)
    // forgotten spec argument after a restart → default narrow → throw
    val e = intercept[IllegalStateException] {
      StreamEmbedDedup.processBatch(spark, bs(2), 2L, storeDir, outDir)
    }
    // the marker stores the FROZEN geometryId form, not the case-class
    // toString (a rename/refactor must not invalidate live stores)
    assert(e.getMessage.contains(Dedup.SigWide.geometryId), e.getMessage)
    assert(Dedup.SigWide.geometryId == "sig:64/4",
      "geometryId format is frozen — changing it orphans every live store")
    // migration: a store whose marker still carries the pre-freeze
    // toString spelling upgrades in place instead of throwing
    val legacyRoot = s"$root/legacy"
    StreamEmbedDedup.processBatch(spark, bs(0), 0L, legacyRoot, s"$root/lo",
      spec = Dedup.SigWide)
    val marker = java.nio.file.Paths.get(legacyRoot, "_geometry")
    java.nio.file.Files.write(marker, "SigSpec(64,4)".getBytes("UTF-8"))
    StreamEmbedDedup.processBatch(spark, bs(1), 1L, legacyRoot, s"$root/lo",
      spec = Dedup.SigWide) // must not throw
    assert(new String(java.nio.file.Files.readAllBytes(marker),
      "UTF-8").trim == "sig:64/4", "legacy marker was not upgraded")
    // the probeDepth dial fails at CONSTRUCTION (geometry/owner
    // doctrine), not at the first micro-batch with a non-empty store
    val e3 = intercept[IllegalArgumentException] {
      StreamEmbedDedup.sink(spark, s"$root/pd", s"$root/pdo",
        spec = Dedup.SigWide, probeDepth = 3)
    }
    assert(e3.getMessage.contains("probeDepth"), e3.getMessage)
    intercept[IllegalArgumentException] {
      StreamCuration.triGateSink(spark, s"$root/t2", s"$root/e2",
        s"$root/m2", dir, s"$root/o3", owner = "pd-check", probeDepth = -1)
    }
    // the pipeline-level entry point guards the same way
    val e2 = intercept[IllegalStateException] {
      graft.TrainingPipeline.curateIncrementalBatch(spark,
        Seq((1L, ("w " * 40).trim, "webz")).toDF("doc_id", "text", "source"),
        5L, s"$root/text", dir, s"$root/o2",
        batchEmbeddings = Some(bs(2)), embedStoreDir = Some(storeDir),
        sigSpec = Dedup.SigNarrow)
    }
    assert(e2.getMessage.contains("geometry"), e2.getMessage)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("a torn sentinel write is reprocessed, not skipped") {
    // the gates share GateStore.runBatch, but the commit-marker sentinel
    // contract deserves its own pin per modality (single-table store
    // here: dir present, _SUCCESS and data gone = torn write)
    val root = java.nio.file.Files.createTempDirectory("embeddedup-t-").toString
    val (storeDir, outDir) = (s"$root/store", s"$root/out")
    val bs = batches()
    StreamEmbedDedup.processBatch(spark, bs(0), 0L, storeDir, outDir)
    StreamEmbedDedup.processBatch(spark, bs(1), 1L, storeDir, outDir)
    val sigs1 = new java.io.File(s"$storeDir/sigs/batch=1")
    sigs1.listFiles().foreach(org.apache.commons.io.FileUtils.deleteQuietly)
    StreamEmbedDedup.processBatch(spark, bs(1), 1L, storeDir, outDir)
    assert(new java.io.File(sigs1, "_SUCCESS").exists(),
      "torn sentinel write was not repaired")
    StreamEmbedDedup.processBatch(spark, bs(2), 2L, storeDir, outDir)
    assert(canon(spark.read.parquet(s"$outDir/batch=2")) ==
      canon(Dedup.d20Frame(bs(0).unionByName(bs(1)), bs(2))))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("a committed empty micro-batch neither wedges later probes nor compaction") {
    // an empty micro-batch (a trigger with no new data routed through
    // foreachBatch) commits sigs/batch=<id> with _SUCCESS and no data
    // files; later probes must skip it rather than fail schema
    // inference on it (the text-gate twin pins the short-doc variant)
    val root = java.nio.file.Files.createTempDirectory("embeddedup-z-").toString
    val (storeDir, outDir) = (s"$root/store", s"$root/out")
    val bs = batches()
    StreamEmbedDedup.processBatch(spark, bs(0), 0L, storeDir, outDir)
    val empty = bs(0).limit(0)
    StreamEmbedDedup.processBatch(spark, empty, 1L, storeDir, outDir)
    val sigs1 = new java.io.File(s"$storeDir/sigs/batch=1")
    assert(new java.io.File(sigs1, "_SUCCESS").exists(),
      "empty batch must still commit its replay sentinel")
    assert(!GateStore.hasDataFiles(sigs1))
    assert(spark.read.parquet(s"$outDir/batch=1").count() == 0)
    StreamEmbedDedup.processBatch(spark, bs(2), 2L, storeDir, outDir)
    assert(canon(spark.read.parquet(s"$outDir/batch=2")) ==
      canon(Dedup.d20Frame(bs(0), bs(2))))
    // compaction across the data-less dir merges cleanly and sweeps it
    StreamEmbedDedup.compact(spark, storeDir, 2L)
    assert(!sigs1.exists(), "data-less superseded dir survived compaction")
    StreamEmbedDedup.processBatch(spark, bs(1), 3L, storeDir, outDir)
    assert(canon(spark.read.parquet(s"$outDir/batch=3")) ==
      canon(Dedup.d20Frame(bs(0).unionByName(bs(2)), bs(1))))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("compaction preserves verdicts, sentinels and a half-crash; storage stays flat") {
    val root = java.nio.file.Files.createTempDirectory("embeddedup-c-").toString
    val (storeDir, outDir) = (s"$root/store", s"$root/out")
    val bs = batches()
    StreamEmbedDedup.processBatch(spark, bs(0), 0L, storeDir, outDir)
    // executor storage flat per batch: the probe bracket + append sweep
    // must release everything this batch pinned
    val pinnedBefore = spark.sparkContext.getPersistentRDDs.keySet
    StreamEmbedDedup.processBatch(spark, bs(1), 1L, storeDir, outDir)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- pinnedBefore
    assert(leaked.isEmpty, s"gate batch leaked persistent RDDs: $leaked")
    val exp2 = canon(Dedup.d20Frame(bs(0).unionByName(bs(1)), bs(2)))

    StreamEmbedDedup.compact(spark, storeDir, 1L)
    assert(!new java.io.File(s"$storeDir/sigs/batch=0").exists())
    // replay of a COMPACTED id must stay a no-op (marker vouches for it)
    StreamEmbedDedup.processBatch(spark, bs(0), 0L, storeDir, outDir)
    assert(!new java.io.File(s"$storeDir/sigs/batch=0").exists(),
      "replay of a compacted batch id was reprocessed")
    StreamEmbedDedup.processBatch(spark, bs(2), 2L, storeDir, outDir)
    assert(canon(spark.read.parquet(s"$outDir/batch=2")) == exp2)

    // simulated half-crash: superseded rows resurface as duplicates —
    // verdicts must be unchanged because the probe collapses dup rows
    val keep = new java.io.File(s"$storeDir/sigs/batch=1")
    val ghost = new java.io.File(s"$storeDir/sigs/batch=0")
    org.apache.commons.io.FileUtils.copyDirectory(keep, ghost)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$outDir/batch=2"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$storeDir/sigs/batch=2"))
    StreamEmbedDedup.processBatch(spark, bs(2), 2L, storeDir, outDir)
    assert(canon(spark.read.parquet(s"$outDir/batch=2")) == exp2,
      "duplicate store rows changed the verdicts")

    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }
}
