package graft.streaming

import graft.{Tables, TestSpark}
import graft.functions.TextFunctions.{fingerprint, qualityScore}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Stream-vs-batch equivalence for the curation front half: streaming
  * the fixture through quality gate + digest dedup across overlapping
  * micro-batches must yield exactly the batch pipeline's survivor
  * semantics — the gated set, one survivor per content digest.
  */
class StreamCurationSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("restarted stream restores dedup state from the checkpoint (no re-emission)") {
    import spark.implicits._
    // run 1 drains file A; run 2 (fresh query, SAME checkpoint) drains
    // file B, whose rows overlap A's digests — the restored state store
    // must suppress them, and the file sink must hold exactly one row
    // per digest across both runs
    val ts0 = java.sql.Timestamp.valueOf("2024-06-01 12:00:00")
    def rows(ids: Range) = ids.map { i =>
      (i.toLong, s"shared content payload number ${i % 6} with ample words",
        new java.sql.Timestamp(ts0.getTime + i * 60000L))
    }
    val src = java.nio.file.Files.createTempDirectory("cur_restart_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("cur_restart_ck").toString
    val sink = java.nio.file.Files.createTempDirectory("cur_restart_sk").toString + "/out"
    val schema = rows(0 until 1).toDF("doc_id", "text", "ts").schema
    def writeDrop(name: String, ids: Range): Unit = {
      val stage =
        java.nio.file.Files.createTempDirectory("cur_stage").toString + "/d"
      rows(ids).toDF("doc_id", "text", "ts").coalesce(1).write.parquet(stage)
      val f = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(f.toPath, java.nio.file.Paths.get(src, name))
    }
    def drain(): Unit = {
      val q = StreamCuration.curateStream(spark, src, schema,
          minQuality = 0.0, tsCol = "ts")
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    writeDrop("a.parquet", 0 until 12) // digests 0..5, each twice
    drain()
    writeDrop("b.parquet", 6 until 24) // digests 0..5 again — ALL seen in run 1
    drain()
    val out = spark.read.parquet(sink)
    val digests = out.select("digest").collect().map(_.getString(0))
    assert(digests.length == 6, s"expected 6 rows, got ${digests.length}")
    assert(digests.toSet.size == 6,
      "restart re-emitted a digest the first run already published")
  }

  test("hybrid: streamed front half + batch back half equals all-batch curate") {
    import spark.implicits._
    // The scaladoc contract this pins: the corpus-wide stages consume
    // the stream's sink "on the reference's Airflow cadence" and the
    // hybrid equals the batch pipeline. Two overlapping crawl drops
    // cover the fixture; the streamed front half (quality gate + digest
    // dedup) feeds TrainingPipeline.backHalf — the SAME code curate
    // runs — and the final chunk sets must be identical.
    val dir = TestSpark.sfDir
    val docs = Tables.documents(spark, dir)
      .withColumn("ts",
        expr("timestamp '2024-06-01 12:00:00' + make_interval(0,0,0,0,0,0,doc_id)"))
    // keeper-identity precondition: with unique digests, stream
    // first-seen vs batch min-id dedup keep the same rows (overlap
    // rows between drops share the doc_id, so either copy is the same
    // row). Fail loudly if the fixture ever grows exact duplicates.
    val dupDigests = docs
      .groupBy(fingerprint(col("text")).as("d")).count()
      .filter(col("count") > 1).count()
    assert(dupDigests == 0,
      "fixture grew exact duplicate texts; hybrid==batch needs a keeper-identity argument")

    val n = docs.count()
    val cut1 = (n * 3) / 5
    val cut2 = (n * 2) / 5
    val src = java.nio.file.Files.createTempDirectory("hyb_src").toString
    var i = 0
    for (part <- Seq(docs.filter(col("doc_id") < cut1),
        docs.filter(col("doc_id") >= cut2))) {
      val stagePath = java.nio.file.Files.createTempDirectory("hyb_stage").toString + "/d"
      part.orderBy(col("doc_id")).coalesce(1).write.parquet(stagePath)
      val f = new java.io.File(stagePath).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(src, f"drop_$i%02d.parquet"))
      i += 1
    }

    val minQ = 0.25 // curate's default quality gate
    val q = StreamCuration.curateStream(spark, src, docs.schema, minQ, "ts")
      .writeStream.format("memory").queryName("hybrid_front")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    // batch back half over the stream's sink, after the same stratified
    // gate curate applies between its quality gate and dedup (both are
    // pure row predicates, so gate order commutes)
    // materialize the sink before the back half's self-referencing
    // anti-joins (the same flat-lineage boundary curate's stage hook
    // provides)
    val frontSink = graft.Checkpoints.eager(
      spark.table("hybrid_front")
        .filter(graft.queries.Relational.stratifiedKeep(col("doc_id"), col("lang")))).df
    val hybridChunks = graft.TrainingPipeline.backHalf(spark, dir, frontSink)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getString(3), r.getInt(4))).toSet

    val batchChunks = graft.TrainingPipeline.curate(spark, dir)._1
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getString(3), r.getInt(4))).toSet

    assert(hybridChunks == batchChunks,
      s"hybrid ${hybridChunks.size} chunks vs batch ${batchChunks.size}")
    assert(hybridChunks.nonEmpty)
  }

  test("streamed quality gate + digest dedup equals the batch stages") {
    import spark.implicits._
    val minQ = 0.5
    val base = java.sql.Timestamp.valueOf("2024-06-01 12:00:00")
    val docs = Tables.documents(spark, TestSpark.sfDir)
      .select(col("doc_id"), col("text"),
        // synthetic event time inside one watermark horizon
        expr("timestamp '2024-06-01 12:00:00' + make_interval(0,0,0,0,0,0,doc_id)")
          .as("ts"))
    assert(base != null)

    // two overlapping drops, each sorted so min-doc_id arrives first
    val tmp = java.nio.file.Files.createTempDirectory("cur_src").toString
    val p1 = docs.filter(col("doc_id") % 3 =!= 0).orderBy(col("doc_id"))
    val p2 = docs.filter(col("doc_id") % 2 === 0).orderBy(col("doc_id"))
    p1.coalesce(1).write.parquet(s"$tmp/f1")
    p2.coalesce(1).write.parquet(s"$tmp/f2")
    val dir = java.nio.file.Files.createTempDirectory("cur_flat").toString
    var i = 0
    for (sub <- Seq("f1", "f2")) {
      val f = new java.io.File(s"$tmp/$sub").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(dir, f"part_$i%02d.parquet"))
      i += 1
    }

    val q = StreamCuration.curateStream(spark, dir, docs.schema, minQ, "ts")
      .writeStream.format("memory").queryName("cur_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.sql("SELECT doc_id, digest FROM cur_out")
      .collect().map(r => (r.getLong(0), r.getString(1)))

    // batch truth over the union feed: gate, then one survivor per digest
    val feed = docs.filter(col("doc_id") % 3 =!= 0 || col("doc_id") % 2 === 0)
    val gated = feed.filter(qualityScore(col("text")) >= minQ)
      .select(col("doc_id"), fingerprint(col("text")).as("digest"))
    val batchDigests = gated.select("digest").distinct()
      .collect().map(_.getString(0)).toSet

    assert(got.map(_._2).toSet == batchDigests, "digest sets differ")
    assert(got.length == got.map(_._2).toSet.size,
      "a digest was emitted more than once across micro-batches")
    // every emitted survivor is a gated member of its digest group
    val members = gated.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got.forall(members), "stream emitted a row the batch gate rejects")
  }
}
