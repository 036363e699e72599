package graft.streaming

import graft.{Tables, TestSpark, TrainingPipeline}
import graft.queries.{Dedup, Multimodal}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** One stream, three gates: the at-least-once incremental-curation
  * sink (curateIncrementalBatch under StreamCuration.triGateSink) —
  * bootstrap from EMPTY stores, per-modality gating with aligned ids,
  * one unified verdict frame, byte-identical replay no-ops, agreement
  * with the single-delivery curateIncremental on identical store
  * content, and the store owner guard.
  */
class TriGateCurationSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir
  import spark.implicits._

  private def txt(unit: String) = (unit + " ").repeat(30).trim

  /** Self-diagnosing modality fixtures (the TrainingPipelineSpec triad
    * pattern): v0/v1 provably far in cosine, m0/mD provably outside
    * the pHash gate.
    */
  private lazy val fixture = {
    val eRows = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id")).limit(50).collect()
    def vec(r: Row) = r.getSeq[Float](1).map(_.toDouble)
    def cosine(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum /
        (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    val v0 = eRows.head
    val v1 = eRows.tail.find(r => math.abs(cosine(vec(v0), vec(r))) < 0.35)
      .getOrElse(fail("fixture has no far vector"))
    val mediaAll = Multimodal.mediaTable(spark, dir)
      .select(col("media_id"), col("payload"), col("meta.format").as("format"))
      .filter(length(col("payload")) >= 64)
      .orderBy(col("media_id")).limit(20).collect()
    def mediaDf(id: Long, r: Row) =
      Seq((id, r.getAs[Array[Byte]](1), r.getString(2)))
        .toDF("media_id", "payload", "format")
    val m0 = mediaAll.head
    val mD = mediaAll.tail.find(r =>
        Multimodal.mm9Frame(mediaDf(1L, m0), mediaDf(2L, r)).count() == 0)
      .getOrElse(fail("fixture has no far media item"))
    (v0.getSeq[Float](1), v1.getSeq[Float](1),
      m0.getAs[Array[Byte]](1), m0.getString(2),
      mD.getAs[Array[Byte]](1), mD.getString(2))
  }

  /** Aligned-modality rows: (doc_id, text, source, embedding?, payload?,
    * format?). Batch 0 seeds empty stores; batch 1 plants one clone per
    * modality plus a kept control.
    */
  private def alignedBatches(): Seq[DataFrame] = {
    val (v0, v1, m0p, m0f, mDp, mDf) = fixture
    val b0 = Seq[(Long, String, String, Option[Seq[Float]],
        Option[Array[Byte]], Option[String])](
      (9500001L, txt("alpha seed corpus entry one"), "webz",
        Some(v0), Some(m0p), Some(m0f)),
      (9500002L, txt("beta seed second body here"), "webz",
        None, None, None))
    val b1 = Seq[(Long, String, String, Option[Seq[Float]],
        Option[Array[Byte]], Option[String])](
      // clones alpha's TEXT verbatim → text gate drop
      (9600001L, txt("alpha seed corpus entry one"), "webz",
        None, None, None),
      // novel text, clones alpha's VECTOR → embed gate drop
      (9600002L, txt("gamma wholly different wording body"), "webz",
        Some(v0), None, None),
      // novel text, clones alpha's MEDIA payload → media gate drop
      (9600003L, txt("delta another unrelated passage text"), "webz",
        None, Some(m0p), Some(m0f)),
      // novel everything (far vector, far media) → kept
      (9600004L, txt("epsilon final novel control doc"), "webz",
        Some(v1), Some(mDp), Some(mDf)))
    Seq(b0.toDF("doc_id", "text", "source", "embedding", "payload", "format"),
      b1.toDF("doc_id", "text", "source", "embedding", "payload", "format"))
  }

  private def stageCounts(outDir: String, id: Long): Map[String, Long] =
    spark.read.parquet(s"$outDir/stage_counts/batch=$id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def verdictSet(outDir: String, id: Long): Set[(String, Long, Long, Double)] =
    spark.read.parquet(s"$outDir/verdicts/batch=$id")
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

  test("tri-gate stream: bootstrap, per-modality gating, one verdict frame, replay no-op") {
    val root = java.nio.file.Files.createTempDirectory("trigate-").toString
    val (srcDir, tStore, eStore, mStore, outDir) = (s"$root/src",
      s"$root/text", s"$root/embed", s"$root/media", s"$root/out")
    val bs = alignedBatches()
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
      .foreachBatch(StreamCuration.triGateSink(spark, tStore, eStore,
        mStore, dir, outDir, owner = "trigate-spec"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)

    // batch 0: empty stores probe nothing — everything passes, stores
    // seeded, verdict frame empty (the bootstrap curateIncremental's
    // flat layout cannot express)
    val c0 = stageCounts(outDir, 0)
    assert(c0("ingest") == 2 && c0("near_dup_gate") == 2 &&
      c0("embed_dup_gate") == 2 && c0("media_dup_gate") == 2, c0.toString)
    assert(verdictSet(outDir, 0).isEmpty)
    assert(new java.io.File(s"$tStore/bands/batch=0/_SUCCESS").exists())

    // batch 1: one drop per modality, the control survives
    val c1 = stageCounts(outDir, 1)
    assert(c1("ingest") == 4 && c1("near_dup_gate") == 3 &&
      c1("embed_dup_gate") == 2 && c1("media_dup_gate") == 1, c1.toString)
    val kept = spark.read.parquet(s"$outDir/chunks/batch=1")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(kept == Set(9600004L))
    // ONE verdict frame names every drop with its modality and score
    val v1s = verdictSet(outDir, 1)
    assert(v1s.exists { case (m, n, d, s) =>
      m == "text" && n == 9600001L && d == 9500001L && s == 1.0 }, v1s.toString)
    assert(v1s.exists { case (m, n, d, s) =>
      m == "embed" && n == 9600002L && d == 9500001L && s == 1.0 }, v1s.toString)
    assert(v1s.exists { case (m, n, d, s) =>
      m == "media" && n == 9600003L && d == 9500001L && s == 0.0 }, v1s.toString)

    // at-least-once replay of batch 1: byte-identical no-op across
    // verdicts, chunks, counts and ALL THREE stores; zero leaked RDDs
    import scala.jdk.CollectionConverters._
    def fp(p: String) = org.apache.commons.io.FileUtils
      .listFiles(new java.io.File(p), null, true).asScala
      .map(f => (f.getAbsolutePath, f.length(), f.lastModified())).toSet
    val watched = Seq(s"$outDir/verdicts/batch=1", s"$outDir/chunks/batch=1",
      s"$outDir/stage_counts/batch=1", tStore, eStore, mStore)
    val before = watched.map(fp)
    val pinnedBefore = spark.sparkContext.getPersistentRDDs.keySet
    TrainingPipeline.curateIncrementalBatch(spark,
      bs(1).select(col("doc_id"), col("text"), col("source")), 1L,
      tStore, dir, outDir,
      batchEmbeddings = Some(bs(1).filter(col("embedding").isNotNull)
        .select(col("doc_id").as("vec_id"), col("embedding"))),
      embedStoreDir = Some(eStore),
      batchMedia = Some(bs(1).filter(col("payload").isNotNull)
        .select(col("doc_id").as("media_id"), col("payload"), col("format"))),
      mediaStoreDir = Some(mStore))
    assert(watched.map(fp) == before, "replayed batch rewrote files")
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- pinnedBefore
    assert(leaked.isEmpty, s"replay leaked persistent RDDs: $leaked")

    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("curateIncrementalBatch == curateIncremental on identical store content") {
    // the batch-dir layout vs the flat single-delivery layout, same
    // store CONTENT: gate decisions, stage counts and chunks must agree
    // — the stream is the same pipeline, not a reimplementation
    val root = java.nio.file.Files.createTempDirectory("trigate-eq-").toString
    val bs = alignedBatches()
    val seed = bs(0)
    val docs0 = seed.select(col("doc_id"), col("text"), col("source"))
    try {
      // batch-layout stores, seeded by processing batch 0
      val (tB, eB, mB, outB) = (s"$root/bt", s"$root/be", s"$root/bm", s"$root/bo")
      def embsOf(b: DataFrame) = b.filter(col("embedding").isNotNull)
        .select(col("doc_id").as("vec_id"), col("embedding"))
      def mediaOf(b: DataFrame) = b.filter(col("payload").isNotNull)
        .select(col("doc_id").as("media_id"), col("payload"), col("format"))
      TrainingPipeline.curateIncrementalBatch(spark, docs0, 0L, tB, dir, outB,
        batchEmbeddings = Some(embsOf(seed)), embedStoreDir = Some(eB),
        batchMedia = Some(mediaOf(seed)), mediaStoreDir = Some(mB))
      // a PROCESSING batch (not a replay) must also leave executor
      // storage flat — probes bracketed, appends swept
      val pinnedBefore = spark.sparkContext.getPersistentRDDs.keySet
      TrainingPipeline.curateIncrementalBatch(spark,
        bs(1).select(col("doc_id"), col("text"), col("source")), 1L,
        tB, dir, outB,
        batchEmbeddings = Some(embsOf(bs(1))), embedStoreDir = Some(eB),
        batchMedia = Some(mediaOf(bs(1))), mediaStoreDir = Some(mB))
      val leaked = spark.sparkContext.getPersistentRDDs.keySet -- pinnedBefore
      assert(leaked.isEmpty, s"batch processing leaked persistent RDDs: $leaked")

      // flat stores seeded with batch 0's ACCEPTED docs (batch 0 passes
      // every gate, so that is batch 0's full quality-gated clean set —
      // read it back from the chunk output's id set)
      val kept0 = spark.read.parquet(s"$outB/chunks/batch=0")
        .select(col("doc_id")).distinct()
      val clean0 = docs0.join(kept0, Seq("doc_id"))
      val (tF, eF, mF) = (s"$root/ft", s"$root/fe", s"$root/fm")
      Dedup.d19WriteStore(clean0, tF)
      Dedup.d20WriteStore(embsOf(seed)
        .join(kept0.select(col("doc_id").as("vec_id")), Seq("vec_id")), eF)
      Multimodal.mm9WriteStore(mediaOf(seed)
        .join(kept0.select(col("doc_id").as("media_id")), Seq("media_id")), mF)
      val (chunksF, countsF) = TrainingPipeline.curateIncremental(spark,
        bs(1).select(col("doc_id"), col("text"), col("source")), tF, dir,
        batchEmbeddings = Some(embsOf(bs(1))), embedStoreDir = Some(eF),
        batchMedia = Some(mediaOf(bs(1))), mediaStoreDir = Some(mF))

      assert(stageCounts(outB, 1).toSeq.sorted == countsF.sorted,
        s"stage counts diverged: ${stageCounts(outB, 1)} vs $countsF")
      val chunksB = spark.read.parquet(s"$outB/chunks/batch=1")
      val cols = chunksF.columns.sorted.toSeq
      assert(chunksB.select(cols.map(col): _*).collect().toSet ==
        chunksF.select(cols.map(col): _*).collect().toSet,
        "chunk outputs diverged between batch-dir and flat layouts")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  test("tri-gate compactEvery: all three stores compact inline, verdicts and chunks unchanged, compacted replay no-op") {
    val root = java.nio.file.Files.createTempDirectory("trigate-p-").toString
    val bs = alignedBatches()
    try {
      // control run (no policy) and policy run (compact at >= 2 dirs)
      val (tC, eC, mC, oC) = (s"$root/ct", s"$root/ce", s"$root/cm", s"$root/co")
      val (tP, eP, mP, oP) = (s"$root/pt", s"$root/pe", s"$root/pm", s"$root/po")
      val control = StreamCuration.triGateSink(spark, tC, eC, mC, dir, oC,
        owner = "trigate-ctl")
      val policy = StreamCuration.triGateSink(spark, tP, eP, mP, dir, oP,
        owner = "trigate-pol", compactEvery = Some(2))
      bs.zipWithIndex.foreach { case (b, i) =>
        control(b, i.toLong); policy(b, i.toLong)
      }
      (0 until 2).foreach { i =>
        assert(verdictSet(oP, i) == verdictSet(oC, i),
          s"policy verdicts diverged at batch $i")
        assert(stageCounts(oP, i) == stageCounts(oC, i))
        assert(spark.read.parquet(s"$oP/chunks/batch=$i")
            .select("doc_id").collect().map(_.getLong(0)).toSet ==
          spark.read.parquet(s"$oC/chunks/batch=$i")
            .select("doc_id").collect().map(_.getLong(0)).toSet)
      }
      // every store collapsed to its newest batch dir, markers vouch
      def dirs(store: String, table: String) =
        GateStore.listBatchDirs(new java.io.File(s"$store/$table")).map(_._1)
      assert(dirs(tP, "bands") == Seq(1L) && dirs(tP, "shingles") == Seq(1L))
      assert(dirs(eP, "sigs") == Seq(1L))
      assert(dirs(mP, "bands") == Seq(1L))
      Seq(tP, eP, mP).foreach(s => assert(GateStore.compactedUpTo(s) == 1L))
      // replay of the merged-away batch 0: still a no-op everywhere
      import scala.jdk.CollectionConverters._
      def fp(p: String) = org.apache.commons.io.FileUtils
        .listFiles(new java.io.File(p), null, true).asScala
        .map(f => (f.getAbsolutePath, f.length(), f.lastModified())).toSet
      val watched = Seq(tP, eP, mP, s"$oP/verdicts/batch=0")
      val before = watched.map(fp)
      policy(bs(0), 0L)
      assert(watched.map(fp) == before,
        "replay of a compacted tri-gate batch rewrote files")
      // batch 2 (a fresh doc) probes the compacted stores correctly:
      // its alpha-clone text row must still be caught by batch 0's
      // (merged) bands
      val b2 = Seq[(Long, String, String, Option[Seq[Float]],
          Option[Array[Byte]], Option[String])](
        (9700001L, txt("alpha seed corpus entry one"), "webz",
          None, None, None))
        .toDF("doc_id", "text", "source", "embedding", "payload", "format")
      policy(b2, 2L)
      val v2 = verdictSet(oP, 2)
      assert(v2.exists { case (m, n, d, s) =>
        m == "text" && n == 9700001L && d == 9500001L && s == 1.0 },
        s"compacted store lost batch 0's rows: $v2")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  test("tri-gate LEVELED compaction: verdicts unchanged, all three stores fold to level runs, merged replay no-op, post-merge probe intact") {
    // the leveled twin of the compactEvery test above — the production
    // policy (GateStore.maybeCompactLeveled) composing across all three
    // modality stores inside one logical batch
    val root = java.nio.file.Files.createTempDirectory("trigate-l-").toString
    val bs = alignedBatches()
    try {
      val (tC, eC, mC, oC) = (s"$root/ct", s"$root/ce", s"$root/cm", s"$root/co")
      val (tL, eL, mL, oL) = (s"$root/lt", s"$root/le", s"$root/lm", s"$root/lo")
      val control = StreamCuration.triGateSink(spark, tC, eC, mC, dir, oC,
        owner = "trigate-ctl-l")
      val leveled = StreamCuration.triGateSink(spark, tL, eL, mL, dir, oL,
        owner = "trigate-lev", compactEvery = Some(2), compactLeveled = true)
      bs.zipWithIndex.foreach { case (b, i) =>
        control(b, i.toLong); leveled(b, i.toLong)
      }
      (0 until 2).foreach { i =>
        assert(verdictSet(oL, i) == verdictSet(oC, i),
          s"leveled verdicts diverged at batch $i")
      }
      // each store folded its two batches into one level-0 run,
      // recorded in its own _levels ledger, marker vouching batch 0
      def dirs(store: String, table: String) =
        GateStore.listBatchDirs(new java.io.File(s"$store/$table")).map(_._1)
      assert(dirs(tL, "bands") == Seq(1L) && dirs(tL, "shingles") == Seq(1L))
      assert(dirs(eL, "sigs") == Seq(1L))
      assert(dirs(mL, "bands") == Seq(1L))
      Seq(tL, eL, mL).foreach { s =>
        assert(GateStore.compactedUpTo(s) == 1L)
        assert(GateStore.readLevels(s).toSet == Set((0, 1L)),
          s"missing level-0 run ledger in $s")
      }
      // replay of the merged-away batch 0: no-op across all stores
      import scala.jdk.CollectionConverters._
      def fp(p: String) = org.apache.commons.io.FileUtils
        .listFiles(new java.io.File(p), null, true).asScala
        .map(f => (f.getAbsolutePath, f.length(), f.lastModified())).toSet
      val watched = Seq(tL, eL, mL, s"$oL/verdicts/batch=0")
      val before = watched.map(fp)
      leveled(bs(0), 0L)
      assert(watched.map(fp) == before,
        "replay of a leveled-compacted tri-gate batch rewrote files")
      // fresh batch still catches batch 0's (merged) text rows
      val b2 = Seq[(Long, String, String, Option[Seq[Float]],
          Option[Array[Byte]], Option[String])](
        (9700002L, txt("alpha seed corpus entry one"), "webz",
          None, None, None))
        .toDF("doc_id", "text", "source", "embedding", "payload", "format")
      leveled(b2, 2L)
      assert(verdictSet(oL, 2).exists { case (m, n, d, s) =>
        m == "text" && n == 9700002L && d == 9500001L && s == 1.0 },
        "leveled store lost batch 0's rows")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  test("stageCounts off: verdicts and chunks identical, stage_counts not written, measurably fewer jobs") {
    // the tri-gate floor is ~30 jobs/batch, 8 of them the per-stage
    // eager count()s plus the chunk re-read and the stage_counts write
    // (TriGateScaleProbe's breakdown) — pure fixed cost when nobody
    // reads the accounting. stageCounts=false must drop jobs WITHOUT
    // touching a single output byte of verdicts or chunks.
    val root = java.nio.file.Files.createTempDirectory("trigate-sc-").toString
    try {
      val bs = alignedBatches()
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      }
      def drive(tag: String, counts: Boolean): (String, Int) = {
        val out = s"$root/out-$tag"
        val sink = StreamCuration.triGateSink(spark, s"$root/text-$tag",
          s"$root/embed-$tag", s"$root/media-$tag", dir, out,
          owner = s"trigate-sc-$tag", stageCounts = counts)
        spark.sparkContext.addSparkListener(listener)
        jobs.set(0)
        try bs.zipWithIndex.foreach { case (b, i) => sink(b, i.toLong) }
        finally {
          Thread.sleep(1000) // let the async listener bus drain
          spark.sparkContext.removeSparkListener(listener)
        }
        (out, jobs.get())
      }
      val (onOut, onJobs) = drive("on", counts = true)
      val (offOut, offJobs) = drive("off", counts = false)
      def chunkSet(out: String, i: Int): Set[String] =
        spark.read.parquet(s"$out/chunks/batch=$i")
          .collect().map(_.mkString("|")).toSet
      (0 until bs.size).foreach { i =>
        assert(verdictSet(offOut, i.toLong) == verdictSet(onOut, i.toLong),
          s"verdicts diverged with counts off at batch $i")
        assert(chunkSet(offOut, i) == chunkSet(onOut, i),
          s"chunks diverged with counts off at batch $i")
        assert(new java.io.File(s"$onOut/stage_counts/batch=$i").exists())
      }
      assert(!new java.io.File(s"$offOut/stage_counts").exists(),
        "stage_counts written despite stageCounts=false")
      assert(offJobs < onJobs,
        s"counts-off ran $offJobs jobs vs $onJobs with counts on")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  test("foldWrites: one publish job, row-identical verdicts+chunks via the layout-agnostic readers, same stores, replay still no-op") {
    val root = java.nio.file.Files.createTempDirectory("trigate-fw-").toString
    try {
      val bs = alignedBatches()
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      }
      def drive(tag: String, fold: Boolean): (String, String, Int) = {
        val out = s"$root/out-$tag"
        val sink = StreamCuration.triGateSink(spark, s"$root/text-$tag",
          s"$root/embed-$tag", s"$root/media-$tag", dir, out,
          owner = s"trigate-fw-$tag", stageCounts = false,
          foldWrites = fold)
        spark.sparkContext.addSparkListener(listener)
        jobs.set(0)
        try bs.zipWithIndex.foreach { case (b, i) => sink(b, i.toLong) }
        finally {
          Thread.sleep(1000) // let the async listener bus drain
          spark.sparkContext.removeSparkListener(listener)
        }
        (out, s"$root/text-$tag", jobs.get())
      }
      val (flatOut, flatText, flatJobs) = drive("flat", fold = false)
      val (foldOut, foldText, foldJobs) = drive("fold", fold = true)
      def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
        df.collect().map(_.mkString("|")).toSet
      (0 until bs.size).foreach { i =>
        // layout-agnostic readers agree row-for-row AND schema-for-schema
        val (vFlat, vFold) = (TrainingPipeline.readVerdicts(spark, flatOut, i),
          TrainingPipeline.readVerdicts(spark, foldOut, i))
        val (cFlat, cFold) = (TrainingPipeline.readChunks(spark, flatOut, i),
          TrainingPipeline.readChunks(spark, foldOut, i))
        assert(vFold.schema == vFlat.schema)
        assert(cFold.schema == cFlat.schema)
        assert(rows(vFold) == rows(vFlat), s"verdicts diverged, batch $i")
        assert(rows(cFold) == rows(cFlat), s"chunks diverged, batch $i")
        // the folded reader equals the flat layout's raw parquet too
        assert(rows(vFold) == rows(spark.read
          .parquet(s"$flatOut/verdicts/batch=$i")
          .select("modality", "new_id", "dup_of", "score")))
        // each mode writes ONLY its own layout
        assert(!new java.io.File(s"$foldOut/verdicts").exists())
        assert(!new java.io.File(s"$foldOut/chunks").exists())
        assert(!new java.io.File(s"$flatOut/curated").exists())
        // the concurrent payload appends left identical store rows
        assert(rows(spark.read.parquet(s"$foldText/bands/batch=$i")) ==
          rows(spark.read.parquet(s"$flatText/bands/batch=$i")),
          s"text bands diverged, batch $i")
      }
      // bootstrap batch 0 published no verdict rows — the folded layout
      // has no kind=verdicts dir and the reader degrades to an empty
      // frame of the exact VerdictsDdl schema
      assert(TrainingPipeline.readVerdicts(spark, foldOut, 0).isEmpty)
      // the verdict+chunks fold is one write job instead of two
      assert(foldJobs < flatJobs,
        s"foldWrites ran $foldJobs jobs vs $flatJobs flat")
      // replay stays a byte-identical no-op (sentinel ordering intact):
      // re-deliver batch 1 and fingerprint the published files
      def fp(p: String): Set[(String, Long, Long)] = {
        import scala.jdk.CollectionConverters._
        org.apache.commons.io.FileUtils
          .listFiles(new java.io.File(p), null, true).asScala
          .map(f => (f.getAbsolutePath, f.length(), f.lastModified())).toSet
      }
      val before = fp(s"$foldOut/curated/batch=1")
      val sink = StreamCuration.triGateSink(spark, foldText,
        s"$root/embed-fold", s"$root/media-fold", dir, foldOut,
        owner = "trigate-fw-fold", stageCounts = false, foldWrites = true)
      sink(bs(1), 1L)
      assert(fp(s"$foldOut/curated/batch=1") == before,
        "replayed folded batch rewrote published output")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  test("cancellation mid-append: batch fails before its sentinel, locks release, replay equals an uninterrupted control") {
    val root = java.nio.file.Files.createTempDirectory("trigate-cx-").toString
    try {
      val bs = alignedBatches()
      def mk(tag: String) = StreamCuration.triGateSink(spark,
        s"$root/text-$tag", s"$root/embed-$tag", s"$root/media-$tag",
        dir, s"$root/out-$tag", owner = s"trigate-cx-$tag",
        stageCounts = false, foldWrites = true)
      // control trio: the same batches, uninterrupted
      val control = mk("c")
      bs.zipWithIndex.foreach { case (b, i) => control(b, i.toLong) }
      // victim trio: bootstrap batch 0, then cancel batch 1 while its
      // concurrent payload appends are in flight — the payloadFault
      // holds leg 0 open so the interrupt lands mid-append by
      // construction, not by luck
      val victim = mk("v")
      victim(bs(0), 0L)
      val legStarted = new java.util.concurrent.CountDownLatch(1)
      TrainingPipeline.payloadFault = i =>
        if (i == 0) { legStarted.countDown(); Thread.sleep(20000) }
      val thrown = new java.util.concurrent.atomic.AtomicReference[Throwable]
      val flagRestored = new java.util.concurrent.atomic.AtomicBoolean(false)
      val runner = new Thread(() =>
        try victim(bs(1), 1L)
        catch { case t: Throwable =>
          thrown.set(t)
          // the interrupt status must survive the sweep/lock finallys
          // and reach the canceller alongside the real failure
          flagRestored.set(Thread.currentThread().isInterrupted)
        },
        "trigate-cancel-runner")
      runner.start()
      assert(legStarted.await(120, java.util.concurrent.TimeUnit.SECONDS),
        "payload legs never started")
      runner.interrupt()
      runner.join(90000) // 30 s grace + wind-down slack
      assert(!runner.isAlive, "cancelled batch did not wind down")
      TrainingPipeline.payloadFault = _ => ()
      assert(thrown.get() != null, "cancelled batch reported success")
      assert(flagRestored.get(),
        "interrupt status was not restored to the canceller")
      // the batch failed BEFORE its replay sentinel: the text-bands
      // append (dead last by contract) never landed
      assert(!new java.io.File(s"$root/text-v/bands/batch=1").exists(),
        "text-bands sentinel landed despite cancellation")
      // the interrupted release left no lock and leaked no marker tmp
      // in any of the three store roots
      for (store <- Seq("text-v", "embed-v", "media-v")) {
        val left = Option(new java.io.File(s"$root/$store").listFiles())
          .getOrElse(Array.empty)
          .filter(_.getName.contains("_compaction_lock")).map(_.getName)
        assert(left.isEmpty, s"$store store kept lock artifacts: " +
          left.mkString(", "))
      }
      // the store locks released through the interrupt (the
      // interrupt-proof heartbeat-join release): the replay acquires
      // them immediately instead of blocking LockWaitMs and throwing,
      // and repairs the batch to the control's exact verdicts/chunks
      victim(bs(1), 1L)
      // folded layout → compare through the layout-agnostic readers
      def vSet(out: String, id: Long): Set[String] =
        TrainingPipeline.readVerdicts(spark, out, id)
          .collect().map(_.mkString("|")).toSet
      def cSet(out: String, id: Long): Set[String] =
        TrainingPipeline.readChunks(spark, out, id)
          .collect().map(_.mkString("|")).toSet
      assert(vSet(s"$root/out-v", 1L) == vSet(s"$root/out-c", 1L),
        "replayed cancelled batch diverged from the control")
      assert(cSet(s"$root/out-v", 1L) == cSet(s"$root/out-c", 1L))
      // and the repaired stores gate a later batch identically
      victim(bs(1), 2L); control(bs(1), 2L)
      assert(vSet(s"$root/out-v", 2L) == vSet(s"$root/out-c", 2L),
        "post-repair gating diverged from the control")
    } finally {
      TrainingPipeline.payloadFault = _ => ()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  test("maintainTriGate: one out-of-band pass maintains all three stores under the sink's owner, verdicts unchanged") {
    val root = java.nio.file.Files.createTempDirectory("trigate-mt-").toString
    try {
      val bs = alignedBatches()
      def mkSink(tag: String) = StreamCuration.triGateSink(spark,
        s"$root/text-$tag", s"$root/embed-$tag", s"$root/media-$tag",
        dir, s"$root/out-$tag", owner = "trigate-mt", stageCounts = false)
      val (sinkM, sinkC) = (mkSink("m"), mkSink("c"))
      bs.zipWithIndex.foreach { case (b, i) =>
        sinkM(b, i.toLong); sinkC(b, i.toLong) }
      val policy = GateStore.MaintenancePolicy(compactEvery = 2)
      // the wrong owner is refused per store — no silent skip
      intercept[IllegalStateException] {
        graft.TrainingPipeline.maintainTriGate(spark, s"$root/text-m",
          s"$root/embed-m", s"$root/media-m", "someone-else", policy)
      }
      // the sink's owner maintains all three in one call
      val reports = graft.TrainingPipeline.maintainTriGate(spark,
        s"$root/text-m", s"$root/embed-m", s"$root/media-m",
        "trigate-mt", policy)
      assert(reports.keySet == Set("text", "embed", "media"))
      reports.foreach { case (k, r) =>
        assert(r.compactions.nonEmpty, s"$k store did not compact")
        assert(r.after.tables.head.liveDirs == 1, s"$k store not folded")
      }
      // a post-maintenance batch probes the folded stores identically
      // to the unmaintained control trio
      sinkM(bs(1), 2L); sinkC(bs(1), 2L)
      assert(verdictSet(s"$root/out-m", 2L) == verdictSet(s"$root/out-c", 2L),
        "tri-gate maintenance changed verdicts")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  test("a torn folded publish never shadows a repaired flat layout: readers require the fold's commit marker") {
    val root = java.nio.file.Files.createTempDirectory("trigate-torn-").toString
    try {
      val out = s"$root/out"
      val torn = Seq((1L, 0, "webz", "torn partial rows", 3))
        .toDF("doc_id", "chunk_id", "source", "chunk", "n_tok")
      val repaired = Seq((2L, 0, "webz", "repaired flat rows", 3))
        .toDF("doc_id", "chunk_id", "source", "chunk", "n_tok")
      // simulate a folded write that died mid-flight: data files exist
      // under kind=chunks but the batch root never got its _SUCCESS
      torn.write.mode("overwrite").parquet(s"$out/curated/batch=0/kind=chunks")
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(s"$out/curated/batch=0/kind=chunks/_SUCCESS"))
      // the at-least-once retry ran with foldWrites=false and repaired
      // the batch in the flat layout
      repaired.write.mode("overwrite").parquet(s"$out/chunks/batch=0")
      val got = TrainingPipeline.readChunks(spark, out, 0L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == Set(2L),
        s"torn folded remnants shadowed the repaired flat data: $got")
      // once the folded batch root IS committed, it is preferred
      java.nio.file.Files.createFile(
        java.nio.file.Paths.get(s"$out/curated/batch=0/_SUCCESS"))
      val got2 = TrainingPipeline.readChunks(spark, out, 0L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got2 == Set(1L))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  test("a COMMITTED fold is authoritative even for an empty side: stale flat rows are never resurrected") {
    val root = java.nio.file.Files.createTempDirectory("trigate-foldauth-").toString
    try {
      val out = s"$root/out"
      // history: the batch was once published flat WITH verdict rows...
      Seq(("text", 7L, 3L, 0.9))
        .toDF("modality", "new_id", "dup_of", "score")
        .write.mode("overwrite").parquet(s"$out/verdicts/batch=0")
      // ...and later (store wiped, foldWrites turned on) re-published
      // folded with a legitimately EMPTY verdict side: the fold is
      // committed (_SUCCESS at the batch root) and carries only chunks
      Seq((2L, 0, "webz", "folded chunk rows", 3))
        .toDF("doc_id", "chunk_id", "source", "chunk", "n_tok")
        .write.mode("overwrite").parquet(s"$out/curated/batch=0/kind=chunks")
      java.nio.file.Files.createFile(
        java.nio.file.Paths.get(s"$out/curated/batch=0/_SUCCESS"))
      // the committed fold's empty verdict side READS EMPTY — the stale
      // flat rows must not leak through the data-less fallback
      val v = TrainingPipeline.readVerdicts(spark, out, 0L)
      assert(v.isEmpty,
        s"stale flat verdicts resurrected: ${v.collect().mkString(",")}")
      assert(v.schema.fieldNames.toSeq ==
        Seq("modality", "new_id", "dup_of", "score"))
      // the fold's non-empty side reads normally
      assert(TrainingPipeline.readChunks(spark, out, 0L)
        .select("doc_id").collect().map(_.getLong(0)).toSet == Set(2L))
      // and with NO fold commit, the flat layout still serves
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(s"$out/curated/batch=0/_SUCCESS"))
      assert(TrainingPipeline.readVerdicts(spark, out, 0L)
        .select("new_id").collect().map(_.getLong(0)).toSet == Set(7L))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  test("gate stores refuse a second writer; same owner re-claims; release hands over") {
    val root = java.nio.file.Files.createTempDirectory("owner-").toString
    val store = s"$root/store"
    GateStore.claimOwner(store, "ingest-q1")
    GateStore.claimOwner(store, "ingest-q1") // restart path: no-op
    // a second query pointed at the same store fails LOUDLY at sink
    // construction — before any batch dir could interleave
    val e = intercept[IllegalStateException] {
      StreamNearDedup.sink(spark, store, s"$root/out2",
        owner = Some("ingest-q2"))
    }
    assert(e.getMessage.contains("ingest-q1"))
    intercept[IllegalStateException] {
      StreamEmbedDedup.sink(spark, store, s"$root/out3",
        owner = Some("rogue"))
    }
    intercept[IllegalStateException] {
      GateStore.releaseOwner(store, "not-the-owner")
    }
    // decommission hands the store over cleanly
    GateStore.releaseOwner(store, "ingest-q1")
    StreamMediaDedup.sink(spark, store, s"$root/out4",
      owner = Some("ingest-q2")) // new owner claims fine
    GateStore.releaseOwner(store, "ingest-q2")
    GateStore.releaseOwner(store, "anyone") // missing marker: no-op
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }
}
