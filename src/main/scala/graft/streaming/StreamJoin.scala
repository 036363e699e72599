package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Watermarked stream-stream interval join — the attribution shape
  * (purchase joined to the same user's click within an hour), the last
  * Structured-Streaming join primitive the streaming slice was missing
  * next to StreamDedup (dropDuplicates), StreamState/StreamSessions
  * (stateful maps), and StreamScd2 (foreachBatch merge). The batch
  * twin is q23's range join; StreamJoinSpec proves stream ≡ batch on
  * a file-fed replay.
  *
  * Scale contract: BOTH sides carry a watermark and the join predicate
  * carries an explicit event-time band
  * (`buy_ts ∈ [click_ts, click_ts + horizon]`), which is exactly what
  * lets Spark bound the join STATE — each side's state store retains
  * only rows inside watermark + horizon and evicts the rest at every
  * micro-batch. An unconstrained stream-stream join would buffer both
  * streams forever (unbounded state — the actual scale-killer); with
  * the band, state is O(arrival rate × horizon) per key range,
  * hash-partitioned across executors like any keyed state. The join
  * itself shuffles both deltas by user_id only — one keyed exchange
  * per side per micro-batch, payload columns only.
  */
object StreamJoin {

  /** Clicks→purchase attribution over a parquet file stream of `events`
    * rows: inner join purchases to SAME-USER clicks at most `horizon`
    * earlier. Emits one row per (click, purchase) pair in the band.
    */
  def attribute(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      horizon: String = "1 hour",
      watermark: String = "1 minute",
      maxFilesPerTrigger: Int = 1): DataFrame = {
    def side(): DataFrame = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
    val clicks = side()
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val buys = side()
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("buy_user"), col("event_id").as("buy_id"),
        col("ts").as("buy_ts"), col("value"))
      .withWatermark("buy_ts", watermark)
    clicks.join(buys,
      expr(s"""user_id = buy_user AND
               buy_ts >= click_ts AND
               buy_ts <= click_ts + interval $horizon"""))
      .select(col("user_id"), col("click_id"), col("buy_id"),
        col("click_ts"), col("buy_ts"), col("value"))
  }

  /** The batch twin over the same frame — what the stream must equal
    * once every event is inside the watermark horizon.
    */
  def attributeBatch(events: DataFrame, horizon: String = "1 hour"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val buys = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("buy_user"), col("event_id").as("buy_id"),
        col("ts").as("buy_ts"), col("value"))
    clicks.join(buys,
      expr(s"""user_id = buy_user AND
               buy_ts >= click_ts AND
               buy_ts <= click_ts + interval $horizon"""))
      .select(col("user_id"), col("click_id"), col("buy_id"),
        col("click_ts"), col("buy_ts"), col("value"))
  }
}
