package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Streaming gap-based sessionization via flatMapGroupsWithState — the
  * streaming twin of q21 (30-minute inactivity gap over `events`), and
  * the arbitrary-MULTI-output state primitive the checklist pairs with
  * mapGroupsWithState (StreamState covers the one-output form).
  *
  * Per user key, open-session state (start, last, count) lives in the
  * state store; a session EMITS when either
  *  - a new event for the same user arrives more than `gap` after the
  *    session's last event (eager close), or
  *  - the event-time timeout fires: the watermark passed last+gap, so
  *    no in-horizon event can extend the session (final close).
  *
  * Ordering caveat (documented divergence from the batch q21): events
  * are sorted WITHIN each micro-batch, but a cross-batch late event
  * older than the open session's last timestamp merges by gap-to-last
  * rather than re-splitting history — exact out-of-order replay is the
  * batch path's job; the stream matches it whenever arrival order
  * respects event-time order (the file-feed test drives it that way).
  *
  * Scale: state is hash-partitioned by user across executors; each
  * micro-batch shuffles only its delta and touches only keys present in
  * the batch or timing out — the same single-shuffle-by-key shape as
  * the batch window, but incremental.
  */
object StreamSessions {

  case class OpenSession(startUs: Long, lastUs: Long, n: Long)
  case class Session(user_id: Long, start_us: Long, n_events: Long, span_us: Long)

  def sessionize(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      gap: String = "30 minutes",
      watermark: String = "1 second",
      maxFilesPerTrigger: Int = 1): DataFrame = {
    val gapUs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(gap))
    val gapMicros = gapUs.days * 86400000000L + gapUs.microseconds
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
      .withWatermark("ts", watermark)
      .select(col("user_id").cast("long"), col("ts"))
    implicit val longEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[Session]
    stream
      .groupByKey(_.getLong(0))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[org.apache.spark.sql.Row],
         state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(user, s.startUs, s.n, s.lastUs - s.startUs))
          } else {
            val times = rows.map(r => r.getTimestamp(1).getTime * 1000L +
              (r.getTimestamp(1).getNanos / 1000) % 1000).toArray.sorted
            val out = scala.collection.mutable.ArrayBuffer.empty[Session]
            var cur = state.getOption
            times.foreach { t =>
              cur match {
                case Some(s) if t - s.lastUs <= gapMicros =>
                  cur = Some(s.copy(lastUs = math.max(s.lastUs, t), n = s.n + 1))
                case Some(s) =>
                  out += Session(user, s.startUs, s.n, s.lastUs - s.startUs)
                  cur = Some(OpenSession(t, t, 1))
                case None =>
                  cur = Some(OpenSession(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // final close once the watermark clears last + gap
              state.setTimeoutTimestamp((s.lastUs + gapMicros) / 1000L + 1)
            }
            out.iterator
          }
      }
      .toDF("user_id", "start_us", "n_events", "span_us")
  }
}
