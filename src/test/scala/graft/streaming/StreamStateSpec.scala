package graft.streaming

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** mapGroupsWithState running counts: the final per-key state across
  * micro-batches must equal the batch groupBy count.
  */
class StreamStateSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("stateful running counts converge to batch counts across micro-batches") {
    val events = Tables.events(spark, TestSpark.sfDir)
      .select(col("user_id"), col("event_id"))
      .filter(col("user_id") < 40)
    val tmp = java.nio.file.Files.createTempDirectory("stream_state").toString
    // three micro-batch files with overlapping keys
    events.filter(col("event_id") % 3 === 0).coalesce(1).write.parquet(s"$tmp/s0")
    events.filter(col("event_id") % 3 === 1).coalesce(1).write.parquet(s"$tmp/s1")
    events.filter(col("event_id") % 3 === 2).coalesce(1).write.parquet(s"$tmp/s2")
    val src = java.nio.file.Files.createTempDirectory("stream_state_flat").toString
    var i = 0
    for (st <- Seq("s0", "s1", "s2")) {
      val f = new java.io.File(s"$tmp/$st").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(src, f"part_$i%02d.parquet"))
      i += 1
    }
    val q = StreamState.runningCounts(spark, src, events.schema, "user_id")
      .writeStream.format("memory").queryName("state_out")
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // the max emitted running total per key is the final state
    val got = spark.sql("SELECT key, max(n) AS n FROM state_out GROUP BY key")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exp = events.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == exp)
  }
}
