package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import scala.collection.immutable.ListMap

/** Window / time-series operators (SURVEY.md §2.9).
  *
  * O-W1 daily tumbling bucket (sentiment_analysis.ipynb line 477),
  * O-W2 10-row trailing rolling mean with pandas null semantics (lines
  * 506-508: first 9 rows null because min_periods defaults to window),
  * O-W5 groupwise top-1 (dominant topic, topic_modelling.ipynb 676-679).
  *
  * Scale notes: the rolling mean runs over the *post-aggregation* daily
  * frame (cardinality ≈ #days), so its single-partition global window is
  * fine at any input scale — the shuffle that matters is the daily groupBy,
  * which map-side combines. Per-key windows (w3) partition by key and scale
  * horizontally.
  */
object Windows {

  type Q = (SparkSession, String) => DataFrame

  /** O-W1: tumbling 1-day window over event time → multi-measure mean.
    * Mirrors groupby(date).mean() over polarity/subjectivity.
    */
  def w1DailyAvg(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(round((sum(round(col("value") * 100).cast("long")) / lit(100.0))
        / count(lit(1)), 6).as("avg_value"),
        count(lit(1)).as("n"))
      .orderBy(col("day"))

  // the average runs through an exact integer cent sum (value is a
  // 2-decimal quantity) so it is summation-order-independent — the q15
  // hardening, applied here before a boundary hit happens
  val w1Sql: String =
    """SELECT CAST(ts AS DATE) AS day,
      |  round((sum(CAST(round(value * 100) AS BIGINT)) / 100.0)
      |        / count(*), 6) AS avg_value, count(*) AS n
      |FROM events GROUP BY 1 ORDER BY day""".stripMargin

  /** O-W2: 10-row trailing rolling mean over the daily series, masked to
    * null while fewer than 10 rows are in frame (pandas min_periods).
    *
    * The rolling window is DELIBERATELY un-partitioned (so executors log
    * `WindowExec: No Partition Defined` — expected, not a defect): its
    * input is the post-aggregation daily frame, whose cardinality is
    * #days regardless of event volume, so the single partition holds a
    * bounded series at any input scale. PlansSpec pins the window
    * sitting ABOVE the aggregation; a global window over the raw stream
    * would be the actual scale bug.
    */
  def w2RollingMean(s: SparkSession, dir: String): DataFrame = {
    // daily means through the exact cent sum (see w1): the rolling
    // window then consumes bit-identical inputs in both engines
    val daily = Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(((sum(round(col("value") * 100).cast("long")) / lit(100.0))
        / count(lit(1))).as("avg_value"))
    val w = Window.orderBy(col("day")).rowsBetween(-9, 0)
    daily
      .withColumn("rolling_avg",
        when(count(lit(1)).over(w) < 10, lit(null))
          .otherwise(round(avg(col("avg_value")).over(w), 6)))
      .select(col("day"), round(col("avg_value"), 6).as("avg_value"), col("rolling_avg"))
      .orderBy(col("day"))
  }

  val w2Sql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    (sum(CAST(round(value * 100) AS BIGINT)) / 100.0)
      |      / count(*) AS avg_value
      |  FROM events GROUP BY 1)
      |SELECT day, round(avg_value, 6) AS avg_value,
      |  CASE WHEN count(*) OVER w < 10 THEN NULL
      |       ELSE round(avg(avg_value) OVER w, 6) END AS rolling_avg
      |FROM daily
      |WINDOW w AS (ORDER BY day ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
      |ORDER BY day""".stripMargin

  /** O-W5 / O-A7: groupwise top-1 via row_number — the dominant-topic
    * pattern (max-value event per user). One shuffle on the key.
    */
  def w3TopPerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id").asc)
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
  }

  val w3Sql: String =
    """SELECT user_id, event_id, event_type, value FROM (
      |  SELECT user_id, event_id, event_type, value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rn
      |  FROM events) WHERE rn = 1""".stripMargin

  /** Groupwise top-N (N=3) — generalization the label/topic reporting needs. */
  def w4Top3PerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id").asc)
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("event_type"), col("rn"), col("event_id"), col("value"))
  }

  val w4Sql: String =
    """SELECT event_type, rn, event_id, value FROM (
      |  SELECT event_type, event_id, value,
      |    row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rn
      |  FROM events) WHERE rn <= 3""".stripMargin

  /** Running cumulative sum per key — incremental-ingest bookkeeping shape
    * (the reference's XCom doc-counts become running counts; O-A1).
    */
  def w5RunningSum(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("running_value", round(sum(col("value")).over(w), 4))
      .withColumn("seq", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))))
      .select(col("user_id"), col("seq"), col("event_id"), col("running_value"))
  }

  val w5Sql: String =
    """SELECT user_id,
      |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq,
      |  event_id,
      |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value
      |FROM events""".stripMargin

  /** Lag/lead delta — session-gap shape over the event stream. */
  def w6LagDelta(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("gap_sec",
        when(col("prev_ts").isNull, lit(null))
          .otherwise(col("ts").cast("double") - col("prev_ts").cast("double")))
      .select(col("user_id"), col("event_id"),
              round(col("gap_sec"), 6).as("gap_sec"))
  }

  val w6Sql: String =
    """SELECT user_id, event_id,
      |  round(epoch(ts) - epoch(lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)), 6) AS gap_sec
      |FROM events""".stripMargin

  /** Ranking-function family: ntile quartiles + cumulative distribution
    * + dense_rank per key — one shuffle on the key, streams within
    * groups (same scale shape as any per-key window).
    */
  def w7RankFamily(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
    Tables.events(s, dir)
      .filter(col("user_id") < 10)
      .select(col("event_type"), col("event_id"),
        ntile(4).over(w).as("quartile"),
        round(cume_dist().over(w), 6).as("cd"),
        dense_rank().over(w).as("dr"))
      .orderBy(col("event_type"), col("event_id"))
  }

  val w7Sql: String =
    """SELECT event_type, event_id,
      |  ntile(4) OVER w AS quartile,
      |  round(cume_dist() OVER w, 6) AS cd,
      |  dense_rank() OVER w AS dr
      |FROM events WHERE user_id < 10
      |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
      |ORDER BY event_type, event_id""".stripMargin

  /** W8: gap-based sessions via Spark's NATIVE session_window — the
    * built-in operator form of q21's lag+cumsum composition (and the one
    * that transfers unchanged to Structured Streaming with a watermark:
    * the state store merges windows incrementally). One keyed shuffle on
    * user_id; the aggregate merges sessions inside the agg operator, no
    * per-row window function at all. Session bounds surface as epoch
    * microseconds; Spark's session end = last event + gap, and a gap of
    * EXACTLY 30 min starts a new session (windows are half-open), which
    * the oracle twin mirrors with its >= flag.
    */
  def w8SessionWindow(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("start_us"),
        unix_micros(col("sw.end")).as("end_us"),
        col("n_events"))
      .orderBy(col("user_id"), col("start_us"))

  val w8Sql: String =
    """WITH lagged AS (
      |  SELECT user_id, event_id, ts,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events
      |), flagged AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN prev_ts IS NULL
      |           OR epoch_us(ts) - epoch_us(prev_ts) >= 1800 * 1000000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM lagged
      |), sessions AS (
      |  SELECT user_id, ts,
      |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                           ROWS UNBOUNDED PRECEDING) AS seq
      |  FROM flagged
      |)
      |SELECT user_id, min(epoch_us(ts)) AS start_us,
      |       max(epoch_us(ts)) + 1800 * 1000000 AS end_us,
      |       count(*) AS n_events
      |FROM sessions GROUP BY user_id, seq
      |ORDER BY user_id, start_us""".stripMargin

  /** w9's core over any (day, n) daily frame — separated so the spec can
    * drive it with planted gaps (the fixture's 30-day event window is
    * contiguous, so the fixture exercises only the no-gap identity).
    */
  def gapFillFrame(daily: DataFrame): DataFrame = {
    val bounds = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val allDays = bounds
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
    allDays.join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("n"), lit(0L)).as("n"),
        col("n").isNull.as("filled"))
      .orderBy(col("day"))
  }

  /** W9: calendar densification (gap fill) — complete the daily series
    * over [min(day), max(day)], zero-filling missing days with a
    * `filled` provenance flag. The step every monitoring/trend consumer
    * needs before rolling windows or drift math: a missing partition
    * must read as "no data that day", not silently shrink the frame
    * (w2's rolling mean over a gappy series would otherwise average
    * across the gap).
    *
    * Scale shape: the input is the POST-AGGREGATION daily frame (w1/w2
    * doctrine — #days rows at any event volume); the calendar spine is
    * one generated sequence from a 1-row bounds aggregate, and the left
    * join is broadcast-sized. Event-volume work is exactly w1's one
    * map-side-combined count.
    */
  def w9GapFill(s: SparkSession, dir: String): DataFrame =
    gapFillFrame(
      Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n")))

  val w9Sql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, count(*) AS n FROM events GROUP BY 1
      |), bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
      |alldays AS (
      |  SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
      |  FROM bounds
      |)
      |SELECT a.day, coalesce(d.n, 0)::BIGINT AS n, d.n IS NULL AS filled
      |FROM alldays a LEFT JOIN daily d USING (day) ORDER BY day""".stripMargin

  /** EWMA smoothing weight on the new observation in [[w10Ewma]]. */
  val W10Alpha = 0.3

  /** W10: exponentially-weighted moving average over the daily series —
    * the standard smoother next to w2's flat rolling mean (trend
    * dashboards default to it; pandas `ewm(alpha).mean()` with
    * adjust=False semantics: s_t = (1−α)·s_{t−1} + α·x_t, seeded at the
    * first observation).
    *
    * Float doctrine: NO pow() anywhere — libm pow is not guaranteed
    * identically rounded across engines. Each row's EWMA is a
    * left-associated fold over its ordered prefix (the m19 sorted-fold
    * rule): Spark folds `aggregate` over the window-ordered
    * collect_list, DuckDB folds list_reduce over the same ordered list
    * — identical operation sequence on identical (w1-hash-verified)
    * round-6 inputs, so every double matches bit-for-bit.
    *
    * Scale: the window runs over the POST-AGGREGATION daily frame
    * (#days rows at any event volume — the w2 single-partition
    * doctrine), and the per-row prefix fold is O(#days²) on that
    * bounded series, not on events.
    */
  def w10Ewma(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    w1DailyAvg(s, dir)
      .select(col("day"), col("avg_value"))
      .withColumn("xs", collect_list(col("avg_value")).over(w))
      .select(col("day"), col("avg_value"),
        round(expr(
          s"aggregate(slice(xs, 2, size(xs) - 1), element_at(xs, 1)," +
            s" (s, x) -> s * ${1 - W10Alpha}D + x * ${W10Alpha}D)"), 6)
          .as("ewma"))
      .orderBy(col("day"))
  }

  val w10Sql: String =
    s"""WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    round((sum(CAST(round(value * 100) AS BIGINT)) / 100.0)
      |          / count(*), 6) AS avg_value
      |  FROM events GROUP BY 1
      |), pref AS (
      |  SELECT day, avg_value,
      |    list(avg_value) OVER (ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS xs
      |  FROM daily
      |)
      |SELECT day, avg_value,
      |  round(list_reduce(xs, (s, x) -> s * ${1 - W10Alpha} + x * $W10Alpha), 6) AS ewma
      |FROM pref ORDER BY day""".stripMargin

  /** CUSUM flag threshold: a change is flagged when the cumulative
    * excess over the series mean exceeds this many mean-days.
    */
  val W11FlagK = 2L

  /** W11: one-sided CUSUM change-point detection (Page, Biometrika
    * 1954) over per-type daily event volumes — the drift alarm an
    * ingest pipeline runs on its own throughput (a crawler whose daily
    * volume steps up sustained is usually a feed change or a spam
    * source; q33's PSI is the distributional twin, this is the
    * volumetric one). s_i = max(0, s_{i−1} + (x_i − mean)) flags when
    * the cumulative excess exceeds [[W11FlagK]] mean-days.
    *
    * Integer-exactness device: deviations are scaled by nd (the type's
    * day count), so d_i = x_i·nd − total and the fold is pure BIGINT —
    * s_i = nd·CUSUM and the flag compares s_i > K·total (≡ CUSUM >
    * K·mean) without a single float. The recursive max(0, ·) fold is
    * not a SQL window function; both engines replay it as an
    * order-pinned prefix-list fold (w10's device), bit-exact because
    * everything is integer arithmetic. Per-row prefix folds are
    * O(days²) per type — days is calendar-bounded (30 here; 3650 for a
    * decade), so the quadratic term is capped regardless of corpus
    * size, and the heavy input (the daily counts) comes from one
    * map-side-combined aggregation.
    */
  def w11Cusum(s: SparkSession, dir: String): DataFrame =
    cusumFrame(
      Tables.events(s, dir)
        .select(col("event_type"), to_date(col("ts")).as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("x")))

  /** The injectable w11 core over any (event_type, day, x) daily-count
    * frame — the fixture series is stationary (zero flags is the
    * verified true negative); WindowsSpec plants a step-change series
    * and asserts the flag fires exactly past the K-mean-days excess.
    */
  private[queries] def cusumFrame(daily: DataFrame): DataFrame = {
    val byType = org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))
    val ordered = byType.orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    daily
      .withColumn("nd", count(lit(1)).over(byType))
      .withColumn("total", sum(col("x")).over(byType))
      .withColumn("d", col("x") * col("nd") - col("total"))
      .withColumn("ds", collect_list(col("d")).over(ordered))
      .select(col("event_type"), col("day"), col("x").as("n_events"),
        expr("aggregate(ds, CAST(0 AS BIGINT)," +
          " (s, d) -> greatest(CAST(0 AS BIGINT), s + d))").as("cusum_scaled"))
      .withColumn("flagged", col("cusum_scaled") > lit(W11FlagK) *
        sum(col("n_events")).over(byType))
      .orderBy(col("event_type"), col("day"))
  }

  val w11Sql: String =
    s"""WITH daily AS (
       |  SELECT event_type, CAST(ts AS DATE) AS day, count(*)::BIGINT AS x
       |  FROM events GROUP BY 1, 2
       |), scaled AS (
       |  SELECT event_type, day, x,
       |    count(*) OVER (PARTITION BY event_type)::BIGINT AS nd,
       |    sum(x) OVER (PARTITION BY event_type)::BIGINT AS total
       |  FROM daily
       |), pref AS (
       |  SELECT event_type, day, x, total,
       |    list(x * nd - total) OVER (PARTITION BY event_type ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ds
       |  FROM scaled
       |)
       |SELECT event_type, day, x AS n_events,
       |  list_reduce(list_prepend(0::BIGINT, ds),
       |    (s, d) -> greatest(0, s + d)) AS cusum_scaled,
       |  list_reduce(list_prepend(0::BIGINT, ds),
       |    (s, d) -> greatest(0, s + d)) > $W11FlagK * total AS flagged
       |FROM pref ORDER BY event_type, day""".stripMargin

  /** W12: day-of-week seasonal profile — per (event_type, weekday), the
    * mean value and its deviation from the event type's overall mean:
    * the baseline table every anomaly detector and dashboard normalizes
    * against (w11's CUSUM flags level shifts; w12 supplies the expected
    * weekly shape those shifts are measured from). Weekday numbering is
    * Sunday = 0 (Spark's dayofweek is 1-based — shifted to match the
    * twin engine's convention once, here, not in every consumer).
    *
    * Exactness: both means run through the w1 integer cent sums, the
    * overall mean is derived from the SAME per-dow partials (one corpus
    * scan, then a 7-row-per-type re-aggregation — the q39 mergeable-
    * state device), and the deviation subtracts the two unrounded
    * doubles before the single terminal round — identical IEEE trees in
    * both engines. Scale: one map-side-combined aggregate to
    * |event_type|×7 rows; everything after is broadcast-sized.
    */
  def w12Seasonality(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.events(s, dir)
      .groupBy(col("event_type"), (dayofweek(col("ts")) - 1).as("dow"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("sc"))
    val tot = per.groupBy(col("event_type"))
      .agg(sum(col("n_events")).as("nt"), sum(col("sc")).as("st"))
    per.join(broadcast(tot), Seq("event_type"))
      .select(col("event_type"), col("dow").cast("int").as("dow"),
        col("n_events"),
        round((col("sc") / lit(100.0)) / col("n_events"), 6).as("avg_value"),
        round((col("sc") / lit(100.0)) / col("n_events")
          - (col("st") / lit(100.0)) / col("nt"), 6).as("deviation"))
      .orderBy(col("event_type"), col("dow"))
  }

  val w12Sql: String =
    """WITH per AS (
      |  SELECT event_type, dayofweek(ts) AS dow, count(*) AS n_events,
      |    sum(CAST(round(value * 100) AS BIGINT)) AS sc
      |  FROM events GROUP BY 1, 2
      |), tot AS (
      |  SELECT event_type, sum(n_events) AS nt, sum(sc) AS st
      |  FROM per GROUP BY 1
      |)
      |SELECT event_type, CAST(dow AS INT) AS dow, n_events,
      |  round((sc / 100.0) / n_events, 6) AS avg_value,
      |  round((sc / 100.0) / n_events - (st / 100.0) / nt, 6) AS deviation
      |FROM per JOIN tot USING (event_type)
      |ORDER BY event_type, dow""".stripMargin

  // w13: trailing-baseline length and the flag threshold (|z| > 2σ)
  val W13Baseline = 7
  val W13SigmaK = 2.0

  /** W13: trailing z-score anomaly flags — per event type, each day's
    * event count against the mean/σ of the PRECEDING [[W13Baseline]]
    * days (the current day never contaminates its own baseline): the
    * volume-anomaly monitor every ingestion pipeline runs (w11's CUSUM
    * catches sustained level shifts; w13 catches single-day spikes).
    * Days with fewer than a full baseline behind them report null z
    * (pandas min_periods semantics, w2's doctrine); a zero-variance
    * baseline also reports null z but still flags any deviation.
    *
    * Exactness: daily counts are integers, so the windowed Σx and Σx²
    * are exact BIGINTs and mean/variance are single double expressions
    * over them — identical IEEE trees in both engines (the variance is
    * guarded with greatest(·, 0) against the tiny negative float
    * residue Σx²−(Σx)²/n can leave when σ = 0). Scale: the window runs
    * over the post-aggregation per-type daily series — #days rows per
    * type regardless of event volume — partitioned by event_type.
    */
  def w13AnomalyFlags(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-W13Baseline, -1)
    val withStats = daily
      .withColumn("bn", count(lit(1)).over(w))
      .withColumn("sc", sum(col("n_events")).over(w))
      .withColumn("sq", sum(col("n_events") * col("n_events")).over(w))
    val mean = col("sc") / col("bn")
    val variance = greatest(
      (col("sq") - col("sc") * col("sc") / col("bn")) / col("bn"), lit(0.0))
    val std = sqrt(variance)
    withStats
      .withColumn("z",
        when(col("bn") < W13Baseline, lit(null))
          .when(std > 0, round((col("n_events") - mean) / std, 6)))
      .withColumn("flagged",
        when(col("bn") < W13Baseline, lit(false))
          .otherwise(abs(col("n_events") - mean) > lit(W13SigmaK) * std))
      .select(col("event_type"), col("day"), col("n_events"), col("z"),
        col("flagged"))
      .orderBy(col("event_type"), col("day"))
  }

  val w13Sql: String =
    s"""WITH daily AS (
       |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events
       |  FROM events GROUP BY 1, 2
       |), st AS (
       |  SELECT event_type, day, n_events,
       |    count(*) OVER tw AS bn,
       |    sum(n_events) OVER tw AS sc,
       |    sum(n_events * n_events) OVER tw AS sq
       |  FROM daily
       |  WINDOW tw AS (PARTITION BY event_type ORDER BY day
       |                ROWS BETWEEN $W13Baseline PRECEDING AND 1 PRECEDING)
       |)
       |SELECT event_type, day, n_events,
       |  CASE WHEN bn < $W13Baseline THEN NULL
       |       WHEN sqrt(greatest((sq - sc * sc / bn) / bn, 0.0)) > 0
       |       THEN round((n_events - sc / bn)
       |                  / sqrt(greatest((sq - sc * sc / bn) / bn, 0.0)), 6)
       |       END AS z,
       |  CASE WHEN bn < $W13Baseline THEN false
       |       ELSE abs(n_events - sc / bn)
       |            > $W13SigmaK * sqrt(greatest((sq - sc * sc / bn) / bn, 0.0))
       |       END AS flagged
       |FROM st ORDER BY event_type, day""".stripMargin

  /** W14: weekly retention cohorts — users grouped by first-seen week,
    * and for each (cohort, weeks-since-first) cell the fraction of the
    * cohort still active: the canonical retention triangle every
    * product-analytics layer computes, and for a data engine the
    * standard test that "first event per key → rejoin → bucketed
    * distinct count" composes scalably. Shape: one keyed min-aggregate
    * (first event per user), one keyed equi-join back onto the event
    * stream (user-keyed, AQE-planned), one (cohort, offset) distinct
    * count, and a broadcast of the |cohorts|-row size dim. Per-user
    * state is a single date — no per-user event arrays, no window over
    * user history. Counts exact integers; the rate is one terminal
    * division — hash-exact.
    */
  def w14RetentionCohorts(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val first = ev.groupBy(col("user_id")).agg(min(col("day")).as("first_day"))
    val active = ev.join(first, Seq("user_id"))
      .select(col("user_id"), col("first_day"),
        floor(datediff(col("day"), col("first_day")) / 7).cast("long").as("week"))
      .distinct()
    val cohorts = first.groupBy(col("first_day")).agg(count(lit(1)).as("cohort_size"))
    active.groupBy(col("first_day"), col("week"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(cohorts), Seq("first_day"))
      .select(col("first_day").as("cohort_day"), col("week"),
        col("n_active"), col("cohort_size"),
        round(col("n_active") / col("cohort_size").cast("double"), 6).as("retention"))
      .orderBy(col("cohort_day"), col("week"))
  }

  val w14Sql: String =
    """WITH ev AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day FROM events
      |), first AS (
      |  SELECT user_id, min(day) AS first_day FROM ev GROUP BY 1
      |), active AS (
      |  SELECT DISTINCT e.user_id, f.first_day,
      |    CAST(floor(date_diff('day', f.first_day, e.day) / 7) AS BIGINT) AS week
      |  FROM ev e JOIN first f USING (user_id)
      |), cohorts AS (
      |  SELECT first_day, count(*) AS cohort_size FROM first GROUP BY 1
      |)
      |SELECT a.first_day AS cohort_day, a.week,
      |  count(*) AS n_active, c.cohort_size,
      |  round(count(*) / c.cohort_size::DOUBLE, 6) AS retention
      |FROM active a JOIN cohorts c USING (first_day)
      |GROUP BY 1, 2, 4 ORDER BY cohort_day, week""".stripMargin

  /** W15: OHLC bucket downsampling — per (event_type, day): the first
    * value (open), max (high), min (low), last value (close), and the
    * event count: the canonical lossy time-series compaction every
    * metrics store ships (candlesticks), and the general
    * "first/last/extremes per bucket" reduction a 100 TB event archive
    * compacts through before dashboarding. Open/close are
    * min_by/max_by over the (ts, event_id) struct — total order, so
    * ties are deterministic — aggregated in ONE map-side-combined pass
    * (never a per-bucket sort or window over raw events); the oracle
    * replays the same argmin/argmax by window rank. Values pass
    * through untouched (no sums → no summation-order concern).
    */
  def w15Ohlc(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"), col("day"))

  val w15Sql: String =
    """WITH r AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, value,
      |    row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
      |                       ORDER BY ts, event_id) AS rf,
      |    row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
      |                       ORDER BY ts DESC, event_id DESC) AS rl
      |  FROM events
      |)
      |SELECT event_type, day,
      |  max(CASE WHEN rf = 1 THEN value END) AS open,
      |  max(value) AS high, min(value) AS low,
      |  max(CASE WHEN rl = 1 THEN value END) AS close,
      |  count(*) AS n_events
      |FROM r GROUP BY 1, 2 ORDER BY event_type, day""".stripMargin

  val queries: ListMap[String, Q] = ListMap(
    "w1_daily_avg" -> (w1DailyAvg _),
    "w2_rolling_mean" -> (w2RollingMean _),
    "w3_top_per_group" -> (w3TopPerGroup _),
    "w4_top3_per_group" -> (w4Top3PerGroup _),
    "w5_running_sum" -> (w5RunningSum _),
    "w6_lag_delta" -> (w6LagDelta _),
    "w7_rank_family" -> (w7RankFamily _),
    "w8_session_window" -> (w8SessionWindow _),
    "w9_gap_fill" -> (w9GapFill _),
    "w10_ewma" -> (w10Ewma _),
    "w11_cusum" -> (w11Cusum _),
    "w12_seasonality" -> (w12Seasonality _),
    "w13_anomaly_flags" -> (w13AnomalyFlags _),
    "w14_retention_cohorts" -> (w14RetentionCohorts _),
    "w15_ohlc" -> (w15Ohlc _),
  )

  val oracle: ListMap[String, String] = ListMap(
    "w1_daily_avg" -> w1Sql,
    "w2_rolling_mean" -> w2Sql,
    "w3_top_per_group" -> w3Sql,
    "w4_top3_per_group" -> w4Sql,
    "w5_running_sum" -> w5Sql,
    "w6_lag_delta" -> w6Sql,
    "w7_rank_family" -> w7Sql,
    "w8_session_window" -> w8Sql,
    "w9_gap_fill" -> w9Sql,
    "w10_ewma" -> w10Sql,
    "w11_cusum" -> w11Sql,
    "w12_seasonality" -> w12Sql,
    "w13_anomaly_flags" -> w13Sql,
    "w14_retention_cohorts" -> w14Sql,
    "w15_ohlc" -> w15Sql,
  )
}
