package graft

import org.apache.spark.sql.SparkSession

/** Cold-fit budget receipt (round-12 verdict #7): BENCH_FULL's
  * `total_with_cold` substitutes each artifact-backed query's
  * INDEPENDENTLY-cold time (fresh throwaway artifact root per query),
  * which re-pays shared model fits once per consumer — m2/m3/m18 all
  * train the same base LDA. A real cold START pays each fit once: this
  * probe times the artifact-backed queries SEQUENTIALLY against ONE
  * shared empty root (marginal cold cost — later consumers of an
  * already-fitted artifact measure their own work only), alongside the
  * per-query independent colds for the additive comparison.
  *
  * Usage: tools/run.sh graft.ColdFitProbe [sfDir] [runs]
  */
object ColdFitProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val runs = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .appName("cold-fit-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val order = Seq("m2_dominant_topics", "m3_topic_keywords",
      "m18_intertopic", "m4_lda_sweep", "t23_leakage_safe_split",
      "d15_cluster_reps", "d17_soft_weights")

    def cleanup(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc(); Thread.sleep(300); System.gc()
    }
    def timed(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9; cleanup(); dt
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    def freshRoot(): java.nio.file.Path = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("/tmp"), "coldfit-")

    // independent colds: fresh root + cleared registry per query
    val indep = order.map { name =>
      name -> median((1 to runs).map { _ =>
        val tmp = freshRoot()
        graft.queries.Topics.modelRootOverride = Some(tmp.toString)
        graft.queries.Topics.clearModelCache()
        try timed(name)
        finally {
          graft.queries.Topics.modelRootOverride = None
          graft.queries.Topics.clearModelCache()
          org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
        }
      })
    }
    // shared-root cold start: ONE fresh root, queries in sequence —
    // the marginal cold cost of each (runs = whole-sequence repeats)
    val sharedRuns = (1 to runs).map { _ =>
      val tmp = freshRoot()
      graft.queries.Topics.modelRootOverride = Some(tmp.toString)
      graft.queries.Topics.clearModelCache()
      try order.map(n => n -> timed(n))
      finally {
        graft.queries.Topics.modelRootOverride = None
        graft.queries.Topics.clearModelCache()
        org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
      }
    }
    val shared = order.map(n =>
      n -> median(sharedRuns.map(_.toMap.apply(n))))

    def js(m: Seq[(String, Double)]) = m.map { case (k, v) =>
      s"\"$k\":${math.rint(v * 1000) / 1000}" }.mkString("{", ",", "}")
    println(s"""{"metric":"cold_fit","runs":$runs,"sf":"$sfDir","independent":${js(indep)},"shared_root":${js(shared)},"independent_total":${math.rint(indep.map(_._2).sum * 100) / 100},"shared_total":${math.rint(shared.map(_._2).sum * 100) / 100}}""")
    spark.stop()
  }
}
