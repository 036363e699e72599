package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** d18 composition receipt: times the ensemble END-TO-END against the
  * sum of its parts — d2 MinHash pairs + d3 SimHash pairs + d5
  * winnowing pairs + the d7 connected-components loop over their
  * distinct union — on a fixture dir (the ×10 replica by default), so
  * d18's 100× scale claim is a measured number, not an inheritance
  * from the parts' individual receipts.
  *
  * Expectation pinned by the receipt: T(d18) ≈ Σ T(parts) (within
  * run-to-run noise) — the ensemble adds one distinct-union shuffle on
  * (id1, id2) edges and nothing super-additive; if d18 ever exceeded
  * the sum materially, the union would be re-running a generator or
  * breaking a reused exchange.
  *
  * Usage (test-classes on -cp, like ScaleSuiteProbe):
  *   tools/run.sh graft.D18CompositionProbe [dir] [runs]
  */
object D18CompositionProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft-scale/x10"
    val runs = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .appName("d18-composition-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.Dedup

    def cleanup(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      // drain-hardened double GC (see Bench.cleanup / SCALING.md)
      System.gc()
      Thread.sleep(300)
      System.gc()
    }
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      cleanup(); dt
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }

    val parts: Seq[(String, () => Unit)] = Seq(
      "d2_minhash" -> (() => noop(Dedup.d2MinHashPairs(spark, dir))),
      "d3_simhash" -> (() => noop(Dedup.d3SimHashPairs(spark, dir))),
      "d5_winnow" -> (() => noop(Dedup.d5WinnowPairs(spark, dir))),
      "cc_over_union" -> { () =>
        // edges pre-materialized (untimed, below) so this times the
        // union-distinct + alternating-star loop alone — otherwise the
        // generator cost would be double-counted in the parts sum
        val pairs = spark.read.parquet("/tmp/d18-probe-edges")
        val (cp, _) = Dedup.connectedComponentsWithRounds(pairs.distinct())
        noop(cp.df); cp.release()
      },
      "d18_end_to_end" -> (() => noop(Dedup.d18EnsembleClusters(spark, dir))))

    // pre-materialize the union edge set for the cc_over_union leg
    Dedup.d2MinHashPairs(spark, dir).select("id1", "id2")
      .unionByName(Dedup.d3SimHashPairs(spark, dir).select("id1", "id2"))
      .unionByName(Dedup.d5WinnowPairs(spark, dir).select("id1", "id2"))
      .write.mode("overwrite").parquet("/tmp/d18-probe-edges")
    cleanup()
    // warm codegen once
    parts.foreach { case (_, f) => f(); cleanup() }
    val times = (1 to runs).map { _ =>
      parts.map { case (n, f) => n -> timed(f()) }.toMap
    }
    val med = parts.map { case (n, _) => n -> median(times.map(_(n))) }.toMap
    val sumParts = med("d2_minhash") + med("d3_simhash") + med("d5_winnow")
    val q = "\""
    println("{" +
      s"${q}metric$q:${q}d18_composition$q,${q}dir$q:$q$dir$q," +
      s"${q}runs$q:$runs," +
      med.map { case (n, v) => f"$q$n$q:$v%.3f" }.mkString(",") + "," +
      f"${q}sum_generators$q:$sumParts%.3f," +
      f"${q}sum_parts_with_cc$q:${sumParts + med("cc_over_union")}%.3f," +
      f"${q}end_to_end_over_sum$q:${med("d18_end_to_end") / (sumParts + med("cc_over_union"))}%.3f" +
      "}")
    spark.stop()
  }
}
