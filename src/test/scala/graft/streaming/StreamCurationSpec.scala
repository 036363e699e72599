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
