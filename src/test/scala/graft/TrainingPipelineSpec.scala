package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end curation accounting: every stage only ever drops rows,
  * the drops are exactly the sets the stage operators define, and the
  * final chunk table reconstructs the surviving documents. One shared
  * curate() run backs all assertions (a curation run is one pipeline
  * execution, not one per check).
  */
class TrainingPipelineSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir
  private lazy val outDir =
    java.nio.file.Files.createTempDirectory("curate").toString + "/chunks"
  private lazy val result = {
    val (chunks, counts) = TrainingPipeline.curate(spark, dir, Some(outDir), shards = 4)
    (chunks.cache(), counts)
  }

  test("curate stages drop monotonically and account for every row") {
    val (chunks, counts) = result
    val byStage = counts.toMap
    assert(counts.map(_._1) == Seq("ingest", "quality_gate",
      "stratified_sample", "exact_dedup", "near_dup_drop",
      "decontaminate", "chunk"))
    // filters are monotone non-increasing until chunking explodes
    val docStages = counts.dropRight(1).map(_._2)
    assert(docStages.zip(docStages.tail).forall { case (a, b) => b <= a },
      counts.toString)
    assert(byStage("ingest") > 0 && byStage("decontaminate") > 0)
    // chunking never loses a surviving non-empty document
    val nChunkedDocs = chunks.select("doc_id").distinct().count()
    assert(nChunkedDocs == byStage("decontaminate"))
    assert(byStage("chunk") >= nChunkedDocs)
  }

  test("curate survivors exclude contaminated ids and non-canonical dups") {
    val (chunks, _) = result
    val surviving = chunks.select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val contaminated = queries.Dedup.d6Decontaminate(spark, dir)
      .collect().map(_.getLong(0)).toSet
    val nonCanonical = queries.Dedup.d7DupClusters(spark, dir)
      .filter(col("cluster") =!= col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(surviving.intersect(contaminated).isEmpty)
    assert(surviving.intersect(nonCanonical).isEmpty)
    // chunks carry real content within the 128-token budget
    val sample = chunks.filter(col("chunk_id") === 0).limit(20).collect()
    sample.foreach { r =>
      assert(r.getAs[String]("chunk").nonEmpty)
      assert(r.getAs[Int]("n_tok") > 0 && r.getAs[Int]("n_tok") <= 128)
    }
  }

  test("curate writes readable range-sharded output") {
    val (chunks, _) = result
    val back = spark.read.parquet(outDir)
    assert(back.count() == chunks.count())
    assert(back.columns.toSet ==
      Set("doc_id", "chunk_id", "source", "chunk", "n_tok"))
  }
}
