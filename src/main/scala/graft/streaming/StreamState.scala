package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.sql.types.StructType

/** Custom keyed streaming state via mapGroupsWithState — the arbitrary-
  * state primitive beyond dropDuplicates/window aggs. Models the
  * reference's incremental per-collection counters (bbc_news_dag.py:60-67
  * docs_count via XCom): a per-key running event count that survives
  * micro-batch boundaries in the state store.
  *
  * Scale: state is partitioned by key hash across executors; each
  * micro-batch shuffles only its delta rows to their key's partition and
  * touches only the keys present in the batch.
  */
object StreamState {

  case class KeyCount(key: Long, n: Long)

  /** Running per-key row counts over a parquet file stream. Update-mode
    * output: each micro-batch emits the new running total for keys it
    * touched.
    */
  def runningCounts(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      keyCol: String,
      maxFilesPerTrigger: Int = 1): DataFrame = {
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
      .select(col(keyCol).cast("long"))
    implicit val longEnc = Encoders.scalaLong
    implicit val kcEnc = Encoders.product[KeyCount]
    stream
      .groupByKey(_.getLong(0))
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[org.apache.spark.sql.Row], state: GroupState[Long]) =>
          val updated = state.getOption.getOrElse(0L) + rows.size
          state.update(updated)
          KeyCount(key, updated)
      }
      .toDF("key", "n")
  }
}
