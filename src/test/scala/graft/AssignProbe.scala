package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.SimFunctions.{dot, l2Norm}

/** One-off scale probe for the SemDeDup centroid-assignment redesign
  * (round 8): times the round-7 FLAT n·k argmax against the two-level
  * n·(kc+kf) argmax at an n large enough that compute dominates job
  * overhead (the in-suite DedupSpec probe at n=40k is overhead-bound, so
  * it asserts the row-count model and leaves wall-clock to this main).
  *
  * Usage: java -cp "target/scala-2.13/classes:target/scala-2.13/test-classes:&lt;spark jars&gt;"
  *   graft.AssignProbe [n]
  *
  * Measured on the build box (local[32], dim 64):
  *  - n=1M:  flat k=3907  → 2.45 s; two-level kc=63+kf=62   → 1.65 s (1.5×)
  *  - n=4M:  flat k=15625 → 165.5 s; two-level kc=125+kf=125 → 3.15 s (52×)
  * The flat rule's n·k work quadruples per 2× of n (quadratic) while the
  * two-level n·2√k grows ~2.8× — at 4M vectors the flat assignment is
  * already 52× slower and widening. Numbers cited in Dedup.scala's d10
  * scaladoc.
  */
object AssignProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 300000L
    val spark = SparkSession.builder().master("local[32]")
      .appName("assign-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.range(n).select(col("id").as("vec_id"),
        expr("transform(sequence(0, 63), j -> cast(sin(id * 64 + j) as double))").as("v"))
      .withColumn("nrm", l2Norm(col("v"))).cache()
    emb.count()
    val kFlat = math.max(16L, (n + 255) / 256).toInt
    val (kc, kf) = graft.queries.Dedup.semDedupPanels(n)
    def panel(lim: Int, descending: Boolean): DataFrame = {
      val s = if (descending) emb.orderBy(col("vec_id").desc) else emb.orderBy(col("vec_id"))
      s.limit(lim).select(col("vec_id").as("cent_id"), col("v").as("cv"), col("nrm").as("cn"))
    }
    def argmaxTime(panels: Seq[DataFrame]): Double = {
      val t0 = System.nanoTime
      panels.foreach { p =>
        emb.join(broadcast(p), lit(true))
          .select(col("vec_id"), col("cent_id"),
            round(dot(col("v"), col("cv")) / (col("nrm") * col("cn")), 6).as("cs"))
          .groupBy(col("vec_id"))
          .agg(max_by(col("cent_id"), struct(col("cs"), -col("cent_id"))).as("cell"))
          .count()
      }
      (System.nanoTime - t0) / 1e9
    }
    argmaxTime(Seq(panel(kc, false))) // warm codegen + cache
    val tTwo = argmaxTime(Seq(panel(kc, false), panel(kf, true)))
    val tFlat = argmaxTime(Seq(panel(kFlat, false)))
    println(f"n=$n dim=64: two-level (kc=$kc+kf=$kf) $tTwo%.2f s, flat (k=$kFlat) $tFlat%.2f s, ratio ${tFlat / tTwo}%.1f×")
    spark.stop()
  }
}
