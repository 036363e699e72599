package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** d19 incremental-vs-rebuild receipt: with a FIXED ingest batch (the
  * sf0.1 `doc_id % 10 = 7` slice) and a corpus growing ×F, times
  *
  *  - `store_build`  — d19WriteStore over the ×F corpus (the ONCE cost,
  *    amortized across every later batch; grows with the corpus by
  *    design),
  *  - `probe_stored` — d19ProbeStored of the fixed batch against that
  *    store (the PER-BATCH cost: one bands scan — 32 small rows per
  *    corpus doc — plus candidate-bucket shingle fetches; corpus text
  *    is never touched),
  *  - `rebuild_inline` — d19Frame(corpus, batch), what a pipeline
  *    without the persisted index pays per batch (re-shingles the whole
  *    corpus),
  *
  * at ×1 and ×F, 3-run medians. The claim under test: probe_stored
  * grows far slower than rebuild_inline as the corpus grows — the
  * incremental index is what makes per-batch dedup affordable at
  * 100 TB. (The ×F replica makes every corpus replica a near-dup of
  * its source batch doc, so the TRUE candidate set also grows ~×F —
  * the probe's verify leg is output-bound, like d1/d2's receipts.)
  *
  * Usage: tools/run.sh graft.D19IncrementalProbe [xFdir] [F] [runs]
  * (builds the documents replica itself if the dir is missing).
  */
object D19IncrementalProbe {
  def main(args: Array[String]): Unit = {
    val xfDir = if (args.nonEmpty) args(0) else "/tmp/graft-scale/d19x10"
    val f = if (args.length > 1) args(1).toInt else 10
    val runs = if (args.length > 2) args(2).toInt else 3
    val src = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .appName("d19-incremental-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.Dedup

    // documents-only ×f replica (ScaleSuiteProbe's perturbation: every
    // replica is a near-dup of its source — worst case for dedup paths)
    if (!new java.io.File(s"$xfDir/documents.parquet").exists()) {
      val docs = Tables.documents(spark, src)
      val off = docs.agg(max(col("doc_id"))).first().getLong(0) + 1L
      docs.select(col("*"),
          explode(sequence(lit(0L), lit(f - 1L))).as("rep"))
        .withColumn("doc_id", col("doc_id") + col("rep") * off)
        .withColumn("text", when(col("rep") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" r"), col("rep"))))
        .drop("rep")
        .write.mode("overwrite").parquet(s"$xfDir/documents.parquet")
    }

    def cleanup(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc(); Thread.sleep(300); System.gc()
    }
    def timed(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn
      val dt = (System.nanoTime() - t0) / 1e9; cleanup(); dt
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // the FIXED batch, regardless of corpus factor
    val batch = Tables.documents(spark, src).filter(col("doc_id") % 10 === 7)

    def corpusOf(dir: String): DataFrame =
      spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") % 10 =!= 7)

    val out = scala.collection.mutable.LinkedHashMap[String, Double]()
    for ((label, dir) <- Seq("x1" -> src, s"x$f" -> xfDir)) {
      val store = s"/tmp/d19-probe-store-$label"
      out(s"store_build_$label") = median((1 to runs).map(_ =>
        timed(Dedup.d19WriteStore(corpusOf(dir), store))))
      out(s"probe_stored_$label") = median((1 to runs).map(_ =>
        timed(noop(Dedup.d19ProbeStored(spark, batch, store)))))
      out(s"rebuild_inline_$label") = median((1 to runs).map(_ =>
        timed(noop(Dedup.d19Frame(corpusOf(dir), batch)))))
    }
    val fields = out.map { case (k, v) => s"\"$k\":${math.rint(v * 1000) / 1000}" }
    println(s"""{"metric":"d19_incremental","f":$f,"runs":$runs,${fields.mkString(",")}}""")
    spark.stop()
  }
}
