package graft

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** One-question probe: do `Dataset.observe` metrics ride a
  * `localCheckpoint(eager = true)` materialization — i.e. can an
  * iterative loop's per-round convergence aggregate (L1 delta, edge-set
  * signature) be collected DURING the round's checkpoint job instead of
  * as a second full pass over the just-pinned blocks?
  *
  * If yes: every g1/g2/d7/d18 round drops from two jobs (checkpoint +
  * cached-block agg scan) to one, and at cluster scale one corpus-sized
  * read per round disappears (guide §1.2: remove passes).
  *
  * Usage: tools/run.sh graft.ObserveProbe
  * Prints OBSERVE_OK <sum> <count> or times out loudly.
  */
object ObserveProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("observe-probe")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val obs = Observation("probe")
    val df = spark.range(0, 1000000, 1, 8).toDF("id")
      .withColumn("d", col("id").cast("double") / 1e6)
      .observe(obs, sum(col("d")).as("s"), count(lit(1)).as("n"))
    val cp = df.localCheckpoint(true)
    // bounded wait in a watchdog so a non-firing listener fails loudly
    // instead of hanging the probe
    val watchdog = new Thread(() => {
      Thread.sleep(30000)
      println("OBSERVE_TIMEOUT — metrics never arrived")
      Runtime.getRuntime.halt(3)
    })
    watchdog.setDaemon(true)
    watchdog.start()
    val m = obs.get
    println(s"OBSERVE_OK ${m("s")} ${m("n")}")
    println(s"rows=${cp.count()}")
    spark.stop()
  }
}
