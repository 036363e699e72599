package graft

import org.apache.spark.sql.SparkSession

/** Counts d2's MinHash candidate pairs (d7's input edge set) per
  * fixture directory — the normalizer for ScaleSuiteProbe's d7 row.
  * Replication makes every replica family one near-dup cluster, so the
  * PAIR count grows ~quadratically in the factor by construction; d7's
  * wall-time-per-edge is the scale-honest metric, not wall-time-per-doc.
  *
  * Usage: tools/run.sh (+test-classes on -cp) graft.PairCountProbe dir...
  */
object PairCountProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("pair-count-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { dir =>
      val t0 = System.nanoTime()
      val n = graft.queries.Dedup.d2MinHashPairs(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"D2PAIRS dir=$dir pairs=$n secs=$dt%.1f")
    }
    spark.stop()
  }
}
