package graft.queries

import graft.{Tables, TestSpark}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Power-user skew receipts for the bare-`user_id` window/group queries
  * (q41 funnel, q46 transitions). The driver fixture's user distribution
  * is benign; this spec plants the adversarial shape — ONE user holding
  * 10% of all events — and pins:
  *  - both queries complete and match a driver replay on the skewed
  *    fixture (q41's per-stage groupBys partial-aggregate map-side, so
  *    the hot key folds to one row per task before the exchange);
  *  - q46's documented 100 TB rebound (scaladoc at Relational.scala's
  *    q46Transitions): pre-splitting the window by (user, session) via
  *    q21's 30-min gap rule bounds the largest window partition by the
  *    longest SESSION, not the power user's full history, and changes
  *    the answer by EXACTLY the session-boundary transitions —
  *    total_split = total_full − (n_sessions − n_users) — so the
  *    rebound's semantic delta is a counted quantity, not a hope.
  */
class SkewSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Deterministic skewed events fixture: user 7 owns 3,000 of 30,000
    * events (10%); 1,800 background users own 15 each. The power user's
    * stream has a >30-min gap every 40 events (~75 sessions); background
    * users emit one 15-event session. Event types cycle so every user
    * walks view→click→purchase orderings (q41's funnel is non-empty).
    */
  private lazy val skewDir: String = {
    val dir = "/tmp/graft-skew"
    val types = Array("view", "click", "purchase", "signup")
    val base = 1700000000000000L // epoch micros, fixed
    val rows = new scala.collection.mutable.ArrayBuffer[(Long, Long, Long, String)]
    var eid = 0L
    // power user 7: 3,000 events, 5-min cadence, 31-min gap every 40
    var t = base
    (0 until 3000).foreach { i =>
      if (i > 0 && i % 40 == 0) t += 31L * 60 * 1000000 else if (i > 0) t += 5L * 60 * 1000000
      rows += ((eid, t, 7L, types(i % 4))); eid += 1
    }
    // 1,800 background users: 15 events each, 10-min cadence, one session
    (0 until 1800).foreach { u =>
      var tu = base + u * 1000000L
      (0 until 15).foreach { i =>
        rows += ((eid, tu, 100L + u, types((u + i) % 4))); eid += 1
        tu += 10L * 60 * 1000000
      }
    }
    import spark.implicits._
    rows.toSeq.toDF("event_id", "ts_us", "user_id", "event_type")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withColumn("value", (col("event_id") % 97).cast("double"))
      .withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(4)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def collected: Array[(Long, Long, Long, String)] =
    Tables.events(spark, skewDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getString(3)))

  test("fixture is genuinely skewed: one user holds 10% of events") {
    val byUser = collected.groupBy(_._1).map { case (u, es) => u -> es.length }
    val total = byUser.values.sum
    assert(total === 30000)
    assert(byUser(7L) === 3000, "power user must hold 10%")
    assert(byUser.filter(_._1 != 7L).values.max <= 15)
  }

  test("q41 funnel completes and matches a driver replay on the skewed fixture") {
    val byUser = collected.groupBy(_._1)
    var n1 = 0L; var n2 = 0L; var n3 = 0L
    byUser.values.foreach { es =>
      val t1 = es.filter(_._4 == "view").map(_._2).minOption
      t1.foreach { v =>
        n1 += 1
        val t2 = es.filter(e => e._4 == "click" && e._2 > v).map(_._2).minOption
        t2.foreach { c =>
          n2 += 1
          if (es.exists(e => e._4 == "purchase" && e._2 > c)) n3 += 1
        }
      }
    }
    val got = Relational.q41Funnel(spark, skewDir).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(got(1) === n1 && got(2) === n2 && got(3) === n3)
    assert(n1 >= n2 && n2 >= n3 && n3 > 0)
  }

  test("q46 transitions complete and match a driver replay on the skewed fixture") {
    val expected = collected.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._2, e._3)).map(_._4)
      sorted.zip(sorted.drop(1))
    }.toSeq.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val got = Relational.q46Transitions(spark, skewDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === expected)
    // the power user's 2,999 in-stream transitions are present, so the
    // hot key genuinely flowed through one window partition
    assert(expected.values.sum === (3000 - 1) + 1800L * (15 - 1))
  }

  test("q46 rebound: (user, session) pre-split bounds the window partition " +
    "and shifts the answer by exactly the session-boundary count") {
    val ev = Tables.events(spark, skewDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sess = ev
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("new_session")).over(byUser))
    // the rebound window: keyed by (user, session) — the shape the q46
    // scaladoc prescribes at 100 TB so no task ever holds a power
    // user's full history
    val bySession = Window.partitionBy(col("user_id"), col("session_seq"))
      .orderBy(col("ts"), col("event_id"))
    val split = sess
      .withColumn("to_type", lead(col("event_type"), 1).over(bySession))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val full = Relational.q46Transitions(spark, skewDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val sessSizes = sess.groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n")).collect().map(r => r.getLong(2))
    val nSessions = sessSizes.length.toLong
    val nUsers = 1801L
    // (a) bounded partition: the largest (user, session) slice is the
    // longest session (40 events), 75x smaller than the hot key's 3,000
    assert(sessSizes.max <= 40, s"max session ${sessSizes.max}")
    assert(sessSizes.max * 75 <= 3000)
    // (b) exact semantic delta: each extra session per user drops one
    // cross-boundary transition and nothing else
    assert(split.values.sum === full.values.sum - (nSessions - nUsers))
    // and every split count is dominated by its full count
    split.foreach { case (k, n) => assert(n <= full(k), s"pair $k") }
  }
}
