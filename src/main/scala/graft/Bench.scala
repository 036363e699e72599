package graft
import org.apache.spark.sql.SparkSession
/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR.
  *
  * Each query is materialized through the built-in `noop` sink, which
  * evaluates every output column of every row (unlike `.count()`, under
  * which Catalyst prunes unreferenced projections and would let derived
  * columns go unmeasured).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // target environment is local[32] with 32 shuffle partitions
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb session/codegen/scan warm-up so the first timed query isn't
    // charged for JIT + file-index initialization
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    try spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // optional args = subset of query names (local iteration; the driver
    // passes none and times the full suite)
    val wanted = args.toSet
    val selected =
      if (wanted.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => wanted(n) }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // Release per-query state so timings are independent. clearCache()
      // alone is NOT enough: localCheckpoint pins RDD blocks that the
      // Dataset cache manager never sees (round 3 measured m2 at 376.6 s
      // in-suite vs 10.1 s in a fresh JVM — executor storage filled by
      // earlier queries' checkpoint blocks). Unpersist every persistent
      // RDD explicitly, then give the ContextCleaner a GC cycle so aged
      // broadcasts are actually dropped, not just unreferenced.
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      name -> elapsed
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // the driver's log tail truncates long stdout — persist the full
    // per-query map verbatim so every round's timings stay adjudicable
    val sfName = new java.io.File(sfDir).getName
    val out = java.nio.file.Paths.get(s"target/bench-$sfName.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out,
      line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
