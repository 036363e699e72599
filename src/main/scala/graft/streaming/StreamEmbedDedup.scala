package graft.streaming

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.queries.Dedup

/** Streaming face of d20: the per-micro-batch EMBEDDING near-dup ingest
  * gate — [[StreamNearDedup]]'s doctrine on the vector modality, so the
  * gate triad (text d19, embeddings d20, media mm9) shares one replay /
  * crash / compaction story. Each micro-batch of (vec_id, embedding)
  * rows is probed against the sign-LSH store built from every EARLIER
  * batch (band equi-join + exact-cosine verify on candidate buckets,
  * `Dedup.d20ProbeDirs`), its verdicts are published, and its own band
  * + signature rows are appended — the corpus vector table is never
  * touched per batch.
  *
  * Store layout (the [[GateStore]] protocol):
  * {{{
  *   store/bands/batch=<id>/            (vec_id, band, bv)   the probe index
  *   store/sigs/batch=<id>/bucket=<k>   (vec_id, v, nrm, sig) verify payloads,
  *                                      bucketed by xxhash64(vec_id)%64 so the
  *                                      exact-cosine verify reads candidate
  *                                      buckets only (the d20ProbeStored shape)
  *   outDir/batch=<id>/                 (new_id, dup_of, cos) verdicts
  * }}}
  * foreachBatch is at-least-once: a re-delivered batch id finds its
  * `bands/batch=<id>` sentinel (or the compaction marker vouching for
  * it) and skips all three writes. Batch 0 probes an empty store and
  * only seeds it. The append leg writes sigs FIRST, bands LAST — a
  * crash between the two leaves payload rows without index rows
  * (harmless orphans), never index rows whose verify payloads are
  * missing (which would make candidates vanish at the verify join).
  *
  * Scale: per batch the corpus-proportional work is one scan of the
  * bands dirs (4 small rows per corpus vector) plus a candidate-bucket
  * sig fetch; executor storage stays flat per batch (eagerBuild probe
  * bracket + sweep on the append leg, spec-pinned).
  */
object StreamEmbedDedup {

  private val Tables = Seq("bands" -> Seq.empty[String],
    "sigs" -> Seq("bucket"))

  /** The foreachBatch body, curried with the store/output roots. */
  def sink(spark: SparkSession, storeDir: String, outDir: String)
      : (DataFrame, Long) => Unit = { (batch, batchId) =>
    processBatch(spark, batch, batchId, storeDir, outDir)
  }

  /** One gate step; package-visible so the spec can drive batches
    * directly and assert replay idempotence.
    */
  private[graft] def processBatch(spark: SparkSession, batch: DataFrame,
      batchId: Long, storeDir: String, outDir: String): Unit = {
    if (GateStore.alreadyMerged(storeDir, "bands", batchId)) return

    val vecs = batch.select(col("vec_id"), col("embedding"))
    val priorBands = GateStore.listBatchDirs(new File(storeDir, "bands"))
      .filter(_._1 < batchId).map(_._2)
    if (priorBands.isEmpty)
      emptyVerdicts(spark).write.mode("overwrite")
        .parquet(s"$outDir/batch=$batchId")
    else {
      val priorSigs = GateStore.listBatchDirs(new File(storeDir, "sigs"))
        .filter(_._1 < batchId).map(_._2)
      // materialize, write, release — thunk form captures the probe's
      // construction-time caches (StreamNearDedup's note)
      val cp = graft.Checkpoints.eagerBuild(spark)(
        Dedup.d20ProbeDirs(spark, vecs, priorBands, priorSigs))
      try cp.df.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      finally cp.release()
    }
    // publish-then-merge: sigs first, bands LAST (the replay sentinel)
    graft.Checkpoints.sweep(spark) {
      val ce = Dedup.embedSigs(vecs).cache()
      ce.withColumn("bucket",
          pmod(xxhash64(col("vec_id")), lit(Dedup.D19Buckets.toLong)))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(s"$storeDir/sigs/batch=$batchId")
      Dedup.embedBands(ce).write.mode("overwrite")
        .parquet(s"$storeDir/bands/batch=$batchId")
    }
  }

  /** Compact store partitions with batch id < `upTo` into `batch=<upTo>`
    * — see [[GateStore.compact]] for the crash envelope and the replay-
    * sentinel marker.
    */
  def compact(spark: SparkSession, storeDir: String, upTo: Long): Unit =
    GateStore.compact(spark, storeDir, upTo, Tables)

  private def emptyVerdicts(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType.fromDDL("new_id BIGINT, dup_of BIGINT, cos DOUBLE"))
}
