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
    val streamed = canon(
      StreamScd2.historyWithCurrent(spark.read.parquet(histDir), 3))
    val batch = canon(graft.queries.Relational.q34Scd2History(spark, dir))
    assert(streamed == batch,
      s"streamed ${streamed.size} rows vs batch ${batch.size}")
  }
}
