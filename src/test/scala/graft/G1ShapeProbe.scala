package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r17 verdict item 7: is PageRank's loop state cheaper with the
  * out-degree ATTACHED to every pinned edge row (the committed r17
  * shape — widens the edge checkpoint by 8 bytes/edge but each round is
  * ONE edge-grain join), or with the degree kept as a SEPARATE pinned
  * node-grain table (narrow edge state, but each round pays an extra
  * node-grain join to form rank/deg before the edge join)?
  *
  * Times N fixed rounds of each shape over the same pinned inputs on a
  * replica dir (numerics identical by construction — same joins, same
  * sums — so this is a pure loop-cost A/B). Run AFTER ScaleSuiteProbe
  * has materialized the replica, e.g.:
  *   tools/run.sh graft.G1ShapeProbe /tmp/graft-scale/x10 10 3
  */
object G1ShapeProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft-scale/x10"
    val rounds = if (args.length > 1) args(1).toInt else 10
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("g1-shape-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("id"))
    val n = docs.count()
    val edges = docs.select(col("id").as("src"),
      explode(array(
        (col("id") * 7 + 1) % n,
        (col("id") * 13 + 3) % n,
        (col("id") * 29 + 7) % n)).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()

    def cleanup(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc(); Thread.sleep(300); System.gc()
    }

    /** Committed r17 shape: degree attached to every pinned edge row. */
    def attached(): Double = {
      val eRaw = Checkpoints.eager(edges)
      val eE = Checkpoints.eager(eRaw.df.join(
        eRaw.df.groupBy(col("src")).agg(count(lit(1)).as("deg")), Seq("src")))
      eRaw.release()
      var ranks = Checkpoints.eager(docs.select(col("id"), lit(1.0 / n).as("rank")))
      val t0 = System.nanoTime()
      for (_ <- 1 to rounds) {
        val next = Checkpoints.eager(eE.df
          .join(ranks.df.select(col("id").as("src"), col("rank")), Seq("src"))
          .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
          .groupBy(col("id")).agg(sum(col("c")).as("rank")))
        ranks.release(); ranks = next
      }
      val dt = (System.nanoTime() - t0) / 1e9
      ranks.release(); eE.release(); cleanup(); dt
    }

    /** Narrow-edge shape: separate pinned node-grain degree table; each
      * round forms rank/deg at node grain first.
      */
    def separate(): Double = {
      val eE = Checkpoints.eager(edges)
      val degs = Checkpoints.eager(
        eE.df.groupBy(col("src")).agg(count(lit(1)).as("deg")))
      var ranks = Checkpoints.eager(docs.select(col("id"), lit(1.0 / n).as("rank")))
      val t0 = System.nanoTime()
      for (_ <- 1 to rounds) {
        val rs = ranks.df.select(col("id").as("src"), col("rank"))
          .join(degs.df, Seq("src"))
          .select(col("src"), (col("rank") / col("deg")).as("q"))
        val next = Checkpoints.eager(eE.df
          .join(rs, Seq("src"))
          .select(col("dst").as("id"), col("q").as("c"))
          .groupBy(col("id")).agg(sum(col("c")).as("rank")))
        ranks.release(); ranks = next
      }
      val dt = (System.nanoTime() - t0) / 1e9
      ranks.release(); degs.release(); eE.release(); cleanup(); dt
    }

    def median(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.length / 2) }
    // warm both once, then alternate reps
    attached(); separate()
    val a = (1 to reps).map(_ => attached())
    val b = (1 to reps).map(_ => separate())
    println(f"""{"metric":"g1_shape","dir":"$dir","n":$n,"rounds":$rounds,"reps":$reps,"attached_median":${median(a)}%.3f,"separate_median":${median(b)}%.3f,"attached":[${a.map(x => f"$x%.3f").mkString(",")}],"separate":[${b.map(x => f"$x%.3f").mkString(",")}]}""")
    spark.stop()
  }
}
