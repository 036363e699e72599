package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import scala.collection.immutable.ListMap

/** Core relational operators (SURVEY.md §2.2–2.6, §2.4–2.5).
  *
  * Each query is declarative DataFrame API so Catalyst plans it: filters and
  * projections push into the parquet scan, aggregates run partial+final,
  * small dims broadcast, top-K plans as TakeOrderedAndProject (no full sort).
  * Every double output is rounded so the DuckDB oracle hash-compares stably.
  *
  * Reference operators covered (see SURVEY.md §2 for file:line citations):
  * O-P1..P11 filters/projections, O-S1..S3 top-K/sorts, O-J1/J3/J4 joins,
  * O-A1..A3 aggregations, O-D1/D2 dedup, set ops.
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  /** O-A2 / TPC-H Q1 shape: scan → filter → partial/final hash agg.
    * Reference: daily groupby-mean, sentiment_analysis.ipynb cell 13.
    * Scale: single shuffle on low-cardinality keys; map-side combine makes
    * the shuffle O(#groups × #partitions), independent of input rows.
    */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        round(sum(col("l_extendedprice")), 4).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 4) AS sum_qty,
      |  round(sum(l_extendedprice), 4) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** O-S1/O-S2: top-K by timestamp (reference: sort('date',-1).limit(1000),
    * data_preparation.py:19). Catalyst plans TakeOrderedAndProject — each
    * partition keeps a K-row heap, driver merges; no global sort at 100 TB.
    */
  def q2TopKByDate(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .orderBy(col("o_orderdate").desc, col("o_orderkey").asc)
      .limit(1000)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_totalprice"))

  val q2Sql: String =
    """SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
      |FROM orders ORDER BY o_orderdate DESC, o_orderkey ASC LIMIT 1000""".stripMargin

  /** O-P5/O-P6/O-P8: numeric predicates + projection + derived column.
    * Filter and the 4-column projection push into the parquet scan
    * (PushedFilters + ReadSchema — verified via explain).
    */
  def q3FilterProject(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_quantity") > 45 && col("l_discount") >= 0.05)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("net_price"))

  val q3Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity,
      |  round(l_extendedprice * (1 - l_discount), 4) AS net_price
      |FROM lineitem WHERE l_quantity > 45 AND l_discount >= 0.05""".stripMargin

  /** O-J1: dimension join + agg (reference: topic-label join,
    * topic_modelling.ipynb cell 29). No broadcast hint: `part` scales with
    * the data (100 TB → hundreds of GB), so a forced broadcast would OOM
    * executors at scale. The broadcast threshold / AQE picks broadcast when
    * the dim is genuinely small; otherwise a shuffled hash join on the key.
    * (Explicit `broadcast()` is reserved for fixed-cardinality dims like
    * nation/region in q16.)
    */
  def q4BroadcastJoinAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("p_brand"))

  val q4Sql: String =
    """SELECT p_brand, round(sum(l_quantity), 4) AS sum_qty, count(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** O-J1 (left outer flavor): customers with their order counts; count(col)
    * ignores the nulls produced by the outer side, matching the oracle.
    */
  def q5LeftJoinCount(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_mktsegment"))
      .agg(count(col("o_orderkey")).as("n_orders"))
  }

  val q5Sql: String =
    """SELECT c_custkey, c_mktsegment, count(o_orderkey) AS n_orders
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey, c_mktsegment""".stripMargin

  /** O-J3: left anti join — the reference's incremental-ingest dedup pushdown
    * (middlewares.py:12-16 skips already-crawled URLs before fetching).
    * At scale AQE converts this to broadcast when the existing-keys side is
    * small, else shuffled hash join on the key.
    */
  def q6AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).filter(col("o_totalprice") > 150000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
  }

  val q6Sql: String =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)""".stripMargin

  /** O-J4: left semi join — existence probe (pipelines.py:33-44 seen-set). */
  def q7SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
    val l = Tables.lineitem(s, dir).filter(col("l_quantity") > 49)
    p.join(l, p("p_partkey") === l("l_partkey"), "left_semi")
      .select(col("p_partkey"), col("p_brand"), col("p_type"))
  }

  val q7Sql: String =
    """SELECT p_partkey, p_brand, p_type FROM part p
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 49)""".stripMargin

  /** O-D1: exact dedup — distinct over a projection (DuplicatesPipeline,
    * pipelines.py:33-44). Shuffles on the full row key; at scale prefer the
    * keyed variant (q9) which picks a deterministic survivor.
    */
  def q8DistinctPairs(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(col("user_id"), col("event_type")).distinct()

  val q8Sql: String = "SELECT DISTINCT user_id, event_type FROM events"

  /** O-D2: keyed dedup with deterministic survivor — latest event per user
    * (cross-run URL dedup, bbc_news_dag.py:36-38). max_by aggregation,
    * NOT a window rank: the partial (map-side) aggregate keeps one row
    * per key per partition, so the shuffle carries ~|keys| rows instead
    * of every event, and a hot key costs its partitions one row each —
    * skew-immune where row_number().over(partitionBy(key)) would funnel
    * the hot key's full history through one task. Tie-break (ts,
    * event_id) is total, so the survivor is deterministic.
    */
  def q9LatestPerKey(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(max_by(
        struct(col("event_id"), col("event_type"), col("value")),
        struct(col("ts"), col("event_id"))).as("last"))
      .select(col("user_id"), col("last.event_id"), col("last.event_type"),
        col("last.value"))

  val q9Sql: String =
    """SELECT user_id, event_id, event_type, value FROM (
      |  SELECT user_id, event_id, event_type, value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) WHERE rn = 1""".stripMargin

  /** O-A3: frequency count sorted desc (value_counts, topic_modelling.ipynb
    * cell 25). Key tiebreak keeps output deterministic.
    */
  def q10ValueCounts(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("event_type"))

  val q10Sql: String =
    """SELECT event_type, count(*) AS n FROM events
      |GROUP BY event_type ORDER BY n DESC, event_type""".stripMargin

  /** O-A1 + exact distinct count: per-type cardinality of users. At 100 TB
    * this is the expensive exact form (two-level shuffle); the
    * sketch-based form is q20_approx_distinct.
    */
  def q11CountDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
           count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  val q11Sql: String =
    """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Set ops: union all + except-distinct (implicit UNION ALL of Mongo
    * appends; SURVEY §2.6). Error-users minus signup-users.
    */
  def q12ExceptUsers(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    e.filter(col("event_type") === "error").select(col("user_id"))
      .except(e.filter(col("event_type") === "signup" && col("value") > 150)
        .select(col("user_id")))
  }

  val q12Sql: String =
    """SELECT user_id FROM events WHERE event_type = 'error'
      |EXCEPT
      |SELECT user_id FROM events WHERE event_type = 'signup' AND value > 150""".stripMargin

  def q13IntersectUsers(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    e.filter(col("event_type") === "error").select(col("user_id"))
      .intersect(e.filter(col("event_type") === "purchase").select(col("user_id")))
  }

  val q13Sql: String =
    """SELECT user_id FROM events WHERE event_type = 'error'
      |INTERSECT
      |SELECT user_id FROM events WHERE event_type = 'purchase'""".stripMargin

  /** O-P2: timestamp range predicate (archive_scraper.py:28 lastmod cutoff) +
    * O-P9 cast to date. Predicate pushes into the parquet scan.
    */
  def q14TsRange(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("ts") > lit("2024-01-05 00:00:00").cast("timestamp"))
      .select(col("event_id"), to_date(col("ts")).as("event_date"), col("event_type"))

  val q14Sql: String =
    """SELECT event_id, CAST(ts AS DATE) AS event_date, event_type
      |FROM events WHERE ts > TIMESTAMP '2024-01-05 00:00:00'""".stripMargin

  /** from_json coverage (events.props payload; SURVEY §7.2 step 7).
    * get_json_object avoids a full from_json schema when one key is needed.
    */
  /** The average goes through an EXACT integer cent sum: `value` is a
    * 2-decimal quantity, so summing round(value*100) as BIGINT is
    * order-independent, and the final divide + round performs the same
    * two IEEE ops on identical inputs in both engines. round(avg(..))
    * over raw doubles was 1 ulp away from the oracle at sf0.001 — a
    * group avg landed exactly on the 4-decimal rounding boundary and
    * Spark's and DuckDB's summation orders differ (caught by the
    * off-gate sf0.001 sweep; the sf0.01 gate had no boundary hit).
    */
  def q15JsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"),
        round((sum(round(col("value") * 100).cast("long")) / lit(100.0))
          / count(lit(1)), 4).as("avg_value"))
      .orderBy(col("k"))

  val q15Sql: String =
    """SELECT CAST(props->>'$.k' AS INT) AS k, count(*) AS n,
      |  round((sum(CAST(round(value * 100) AS BIGINT)) / 100.0)
      |        / count(*), 4) AS avg_value
      |FROM events GROUP BY 1 ORDER BY k""".stripMargin

  /** Multi-table join: fact → dim → dim chain with broadcasts (region/nation
    * are tiny). At scale only the customer⋈orders edge shuffles.
    */
  def q16JoinChain(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum(col("o_totalprice")), 4).as("revenue"),
           count(lit(1)).as("n_orders"))
      .orderBy(col("r_name"), col("n_name"))

  val q16Sql: String =
    """SELECT r_name, n_name, round(sum(o_totalprice), 4) AS revenue, count(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  /** O-P3: non-null/non-empty predicate (drop-empty-title, pipelines.py:21). */
  def q17NonEmpty(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .filter(col("text").isNotNull && trim(col("text")) =!= "")
      .select(col("doc_id"), col("lang"), col("n_chars"))

  val q17Sql: String =
    """SELECT doc_id, lang, n_chars FROM documents
      |WHERE text IS NOT NULL AND trim(text) <> ''""".stripMargin

  /** Conditional aggregation (CASE WHEN): per-segment order status mix. */
  def q18PivotStatus(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_f"),
        sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_o"),
        sum(when(col("o_orderstatus") === "P", 1).otherwise(0)).as("n_p"))
      .orderBy(col("o_orderpriority"))

  val q18Sql: String =
    """SELECT o_orderpriority,
      |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
      |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
      |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** O-J2 (+O-P10): positional join — the reference aligns LDA inference
    * output with its source rows by pandas index (topic_modelling.ipynb
    * line 820 pd.concat(axis=1)). Spark has no implicit row order, so the
    * positional form is a deterministic sort on each side followed by
    * RDD `zipWithIndex` ordinals, then an equi-join on the ordinal (the
    * pattern to reach for when an ordinal is semantically real; for LDA
    * itself we avoid it entirely — transform appends in-row, see Topics).
    *
    * zipWithIndex, NOT `row_number over an un-partitioned window`: the
    * global window funnels every row through ONE task (the WindowExec
    * trap t15's scaladoc documents — fine at sf0.1, a stall at 100×),
    * while zipWithIndex is two fully parallel passes — a per-partition
    * count job, then a map that offsets each partition's local index.
    * The sort's range exchange makes partition order == global order,
    * which zipWithIndex preserves. PlansSpec asserts no un-partitioned
    * WindowExec survives in this plan.
    */
  def q19PositionalJoin(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    def withPos(df: org.apache.spark.sql.DataFrame, sortKey: String): DataFrame = {
      val sorted = df.orderBy(col(sortKey))
      val schema = StructType(StructField("pos", LongType, nullable = false)
        +: sorted.schema.fields)
      val rdd = sorted.rdd.zipWithIndex.map { case (r, i) =>
        Row.fromSeq((i + 1L) +: r.toSeq)
      }
      s.createDataFrame(rdd, schema)
    }
    val left = withPos(Tables.documents(s, dir).select(col("doc_id"), col("lang")), "doc_id")
    val right = withPos(Tables.embeddings(s, dir).select(col("vec_id"), col("label")), "vec_id")
    left.join(right, Seq("pos"))
      .select(col("pos"), col("doc_id"), col("lang"), col("vec_id"), col("label"))
      .orderBy(col("pos"))
  }

  val q19Sql: String =
    """WITH l AS (
      |  SELECT row_number() OVER (ORDER BY doc_id) AS pos, doc_id, lang
      |  FROM documents
      |), r AS (
      |  SELECT row_number() OVER (ORDER BY vec_id) AS pos, vec_id, label
      |  FROM embeddings
      |)
      |SELECT pos, doc_id, lang, vec_id, label
      |FROM l JOIN r USING (pos) ORDER BY pos""".stripMargin

  /** Approximate distinct count (HLL++ sketch, rsd=5%): the 100 TB form
    * of q11 — the sketch merges map-side, so the shuffle carries one
    * ~1.5 KB sketch per group instead of every distinct key. Rows-only
    * oracle (DuckDB's approx sketch differs); the ExactVsApprox check
    * lives in QueriesSpec (relative error bound).
    */
  def q20ApproxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.05).as("n_users_approx"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  /** Gap-based sessionization: a new session starts after a >30-minute
    * silence per user — lag + running conditional sum, the standard
    * windowed form (one shuffle on user_id; within-partition streaming).
    * Emits per-session row counts and time span.
    */
  def q21Sessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("new_session")).over(byUser))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        (max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))).as("span_us"))
      .orderBy(col("user_id"), col("session_seq"))
  }

  val q21Sql: String =
    """WITH lagged AS (
      |  SELECT user_id, event_id, ts,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events
      |), flagged AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN prev_ts IS NULL
      |           OR epoch_us(ts) - epoch_us(prev_ts) > 1800 * 1000000 THEN 1 ELSE 0 END AS new_session
      |  FROM lagged
      |), sessions AS (
      |  SELECT user_id, ts,
      |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
      |  FROM flagged
      |)
      |SELECT user_id, session_seq, count(*) AS n_events,
      |       max(epoch_us(ts)) - min(epoch_us(ts)) AS span_us
      |FROM sessions GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""".stripMargin

  /** As-of join (backward): for every click, the most recent purchase by
    * the same user at-or-before the click's timestamp. Spark has no
    * native ASOF JOIN; the scalable composition is the union-tag-window
    * pattern — tag build rows, union with probe rows, one window per key
    * ordered by (ts, tag) carrying the last build timestamp forward, then
    * keep probe rows. ONE shuffle on the key (same as any keyed window),
    * no range-join explosion, no per-row probe. DuckDB verifies with its
    * native ASOF JOIN.
    */
  def q22AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(1).as("is_build"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), lit(0).as("is_build"))
    // build rows sort before probe rows at equal ts (is_build desc), so
    // an equal-timestamp purchase is visible to the click ("at or before")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("is_build").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    purchases.unionByName(clicks)
      .withColumn("last_purchase_ts",
        last(when(col("is_build") === 1, col("ts")), ignoreNulls = true).over(w))
      .filter(col("is_build") === 0)
      .select(col("user_id"), col("ts"), col("last_purchase_ts"))
      .orderBy(col("user_id"), col("ts"))
  }

  val q22Sql: String =
    """SELECT c.user_id, c.ts, p.ts AS last_purchase_ts
      |FROM (SELECT user_id, ts FROM events WHERE event_type = 'click') c
      |ASOF LEFT JOIN
      |     (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
      |  ON c.user_id = p.user_id AND c.ts >= p.ts
      |ORDER BY c.user_id, c.ts""".stripMargin

  /** Range join: per user, count ordered event pairs within a 5-minute
    * band. The equi-key (user_id) drives the join strategy — a hash join
    * on the key with the time band as a post-join filter — so the plan
    * is key-partitioned, never a cartesian/broadcast-nested-loop; the
    * quadratic term is bounded per key by the band width.
    */
  def q23RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"), col("event_id"), col("ts"))
    val a = ev.select(col("user_id"), col("event_id").as("id1"), col("ts").as("ts1"))
    val b = ev.select(col("user_id"), col("event_id").as("id2"), col("ts").as("ts2"))
    a.join(b, Seq("user_id"))
      .filter(col("id1") < col("id2") &&
        unix_micros(col("ts2")) >= unix_micros(col("ts1")) &&
        unix_micros(col("ts2")) - unix_micros(col("ts1")) <= 300L * 1000000L)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("user_id"))
  }

  val q23Sql: String =
    """SELECT a.user_id, count(*) AS n_pairs
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id AND a.event_id < b.event_id
      | AND epoch_us(b.ts) >= epoch_us(a.ts)
      | AND epoch_us(b.ts) - epoch_us(a.ts) <= 300 * 1000000
      |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin

  /** Exact interpolated percentiles per group (median + p90). Exact
    * percentile needs the full sorted value set per group — the
    * expensive form; at 100 TB swap for approx_percentile (t-digest
    * sketch, map-side mergeable) when ±ε is acceptable.
    */
  def q24Percentiles(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.9)"), 6).as("p90"))
      .orderBy(col("event_type"))

  val q24Sql: String =
    """SELECT event_type,
      |  round(quantile_cont(value, 0.5), 6) AS p50,
      |  round(quantile_cont(value, 0.9), 6) AS p90
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** CUBE over (event_type, day): all four grouping combinations in one
    * pass — Catalyst expands the grouping sets before the single
    * partial+final aggregation, so the shuffle still map-side combines.
    */
  def q25Cube(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("day", to_date(col("ts")))
      .cube(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type").asc_nulls_first, col("day").asc_nulls_first)

  val q25Sql: String =
    """SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
      |FROM events GROUP BY CUBE (event_type, CAST(ts AS DATE))
      |ORDER BY event_type NULLS FIRST, day NULLS FIRST""".stripMargin

  /** Deterministic stratified sampling (training-data rebalancing):
    * keep documents where an md5-derived bucket of (doc_id, lang) falls
    * under a per-stratum rate — here the over-represented 'en' stratum is
    * downsampled to 20%, all others kept. Hash sampling, not RNG
    * sampling, is the 100 TB shape: the decision is a pure function of
    * the row, so it is reproducible across retries/speculative tasks,
    * stable under repartitioning, and needs no sampling state — a
    * map-only filter evaluated inside the scan.
    */
  /** The q26 keep predicate as a reusable Column — a pure row function,
    * so it applies identically to a batch scan and a streaming source
    * (StreamFilterSpec proves the equivalence).
    */
  def stratifiedKeep(docId: Column, lang: Column): Column = {
    val bucket = conv(
      substring(md5(concat(docId.cast("string"), lang)), 1, 8),
      16, 10).cast("long") % 1000
    bucket < when(lang === "en", 200).otherwise(1000)
  }

  def q26StratifiedSample(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .filter(stratifiedKeep(col("doc_id"), col("lang")))
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  val q26Sql: String =
    """SELECT doc_id, lang FROM documents
      |WHERE ('0x' || substr(md5(doc_id::VARCHAR || lang), 1, 8))::UBIGINT % 1000
      |      < CASE WHEN lang = 'en' THEN 200 ELSE 1000 END
      |ORDER BY doc_id""".stripMargin

  /** Salted skew-spread aggregation, value-checked: the two-phase
    * (key, salt) partial count re-aggregated by bare key must equal the
    * plain GROUP BY count exactly — associative partials lose nothing.
    * The operator exists for keys hot enough that even map-side combine
    * leaves one reducer with the whole key (operators/Salted scaladoc);
    * this query pins its correctness against the unsalted oracle.
    */
  def q27SaltedCount(s: SparkSession, dir: String): DataFrame =
    graft.operators.Salted
      .saltedCount(Tables.events(s, dir), col("event_type"), salts = 16)
      .orderBy(col("key"))

  val q27Sql: String =
    """SELECT event_type AS key, count(*) AS n
      |FROM events GROUP BY event_type ORDER BY key""".stripMargin

  /** Domain-mix rebalancing (training-data composition control): resample
    * the corpus so every language contributes equally (the fixture's
    * skewed axis: en dwarfs the rest 3:1) — the "data mixing"
    * step a pretraining pipeline runs when one domain dwarfs the rest.
    * Each stratum's keep-rate is min(n)/n_s, applied as q26's
    * deterministic md5-bucket predicate with an INTEGER threshold
    * (min_n·10⁶ `/` n_s in Long arithmetic on the driver — identical to
    * the oracle's BIGINT `//` by construction, no floating-point
    * rounding at any corpus size), so the decision stays a pure row
    * function: reproducible across retries, stable under
    * repartitioning.
    *
    * Scale shape: one map-side-combined count per stratum (tiny — the
    * stratum axis is low-cardinality by definition, so collecting the
    * per-stratum counts is a bounded driver value, not a corpus
    * collect), the per-stratum thresholds broadcast back, and the
    * resample itself is a map-only filter fused into the scan.
    */
  def q28DomainMix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_s"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val minN = counts.map(_._2).min
    val rates = counts.toSeq
      .map { case (lang, n) => (lang, minN * 1000000L / n) }
      .toDF("lang", "thr")
    val bucket = conv(
      substring(md5(concat(col("doc_id").cast("string"), col("lang"))), 1, 8),
      16, 10).cast("long") % 1000000L
    docs.join(broadcast(rates), Seq("lang"))
      .filter(bucket < col("thr"))
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  val q28Sql: String =
    """WITH counts AS (
      |  SELECT lang, count(*) AS n_s FROM documents GROUP BY 1
      |), mn AS (SELECT min(n_s) AS min_n FROM counts),
      |rates AS (
      |  SELECT lang, (min_n * 1000000) // n_s AS thr FROM counts, mn
      |)
      |SELECT d.doc_id, d.lang
      |FROM documents d JOIN rates r USING (lang)
      |WHERE ('0x' || substr(md5(d.doc_id::VARCHAR || d.lang), 1, 8))::UBIGINT
      |      % 1000000 < thr
      |ORDER BY doc_id""".stripMargin

  /** Q30: grouped APPROXIMATE percentiles — q24's sketch-path twin, the
    * way percentile dashboards actually run at 100 TB. Exact
    * `percentile` buffers every value per group (an unbounded sort-based
    * aggregation); `approx_percentile` keeps a fixed-size
    * KLL/Greenwald-Khanna-style summary per group, so the shuffle
    * carries constant-size sketch partials that merge associatively —
    * the same partial/final two-phase as any map-side-combined agg.
    * Accuracy 10000 bounds rank error at 1/10000. Rows-only oracle
    * (sketch output); QueriesSpec bounds it against exact q24 and pins
    * the percentile ordering invariant.
    */
  def q30ApproxPercentiles(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        round(expr("approx_percentile(value, 0.5, 10000)"), 6).as("p50"),
        round(expr("approx_percentile(value, 0.9, 10000)"), 6).as("p90"),
        round(expr("approx_percentile(value, 0.99, 10000)"), 6).as("p99"))
      .orderBy(col("event_type"))

  /** Q29: snapshot diff — reconcile two corpus snapshots into
    * added / removed / changed rows, the incremental-crawl bookkeeping a
    * recurring scrape pipeline runs between refreshes (the reference
    * re-crawls the same sitemaps daily; S7's unique-key sink is the
    * write half, this is the read half). Snapshots A and B are derived
    * deterministically from the fixture (drop-every-11th vs
    * drop-every-13th, with every 7th text mutated) so the oracle can
    * replay them.
    *
    * 100 TB shape: each side reduces to (key, digest) IN THE SCAN
    * PROJECTION — document text never leaves the scan stage — and the
    * full-outer join co-partitions two digest streams on the key: one
    * shuffle pair, each row 40 bytes regardless of document size. At
    * cluster scale both snapshots are date-partitioned parquet, so the
    * scan reads exactly the two snapshot partitions; with both sides
    * bucketed by doc_id (PlansSpec's bucketed-join pin) even that
    * shuffle disappears.
    */
  def q29SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val a = docs.filter(col("doc_id") % 11 =!= 0)
      .select(col("doc_id"), md5(col("text")).as("da"))
    val b = docs.filter(col("doc_id") % 13 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, md5(concat(col("text"), lit("v2"))))
          .otherwise(md5(col("text"))).as("db"))
    a.join(b, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("da").isNull, "added")
          .when(col("db").isNull, "removed")
          .when(col("da") =!= col("db"), "changed").as("change"))
      .filter(col("change").isNotNull)
      .orderBy(col("doc_id"))
  }

  val q29Sql: String =
    """WITH a AS (
      |  SELECT doc_id, md5(text) AS da FROM documents WHERE doc_id % 11 <> 0
      |), b AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 7 = 0 THEN md5(text || 'v2') ELSE md5(text) END AS db
      |  FROM documents WHERE doc_id % 13 <> 0
      |), d AS (
      |  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
      |    CASE WHEN da IS NULL THEN 'added'
      |         WHEN db IS NULL THEN 'removed'
      |         WHEN da <> db THEN 'changed' END AS change
      |  FROM a FULL JOIN b ON a.doc_id = b.doc_id
      |)
      |SELECT doc_id, change FROM d WHERE change IS NOT NULL
      |ORDER BY doc_id""".stripMargin

  /** Q31: temperature-sampled domain mixture weights — the mixture-
    * planning table a multi-domain pretraining run derives before
    * sampling (Devlin/XLM-style temperature rebalancing): each source's
    * sampling weight is p^α / Σ p^α with α = 0.5, flattening the domain
    * distribution without q28's hard equalization. `boost` = weight/p is
    * the over/under-sampling factor a data loader applies per domain.
    *
    * Float-vs-oracle doctrine: α = 0.5 makes the power an IEEE sqrt —
    * correctly rounded in both engines, unlike pow() — and the
    * normalizer folds in sorted-source order on the driver (the m11/t21
    * ordered-fold rule), so every double matches DuckDB bit-for-bit.
    *
    * 100 TB shape: one map-side-combined count per source; the
    * per-source counts are a bounded driver value (the domain axis is
    * low-cardinality by definition) and the output IS the tiny policy
    * table — no corpus-sized state anywhere.
    */
  def q31TemperatureMix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val counts = Tables.documents(s, dir)
      .groupBy(col("source")).agg(count(lit(1)).as("n_s"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._1)
    val total = counts.map(_._2).sum
    val z = counts.foldLeft(0.0) { case (acc, (_, n)) =>
      acc + math.sqrt(n.toDouble / total) }
    counts.map { case (src, n) =>
      val p = n.toDouble / total
      val w = math.sqrt(p) / z
      (src, n, w, w / p)
    }.toDF("source", "n_docs", "w", "b")
      .select(col("source"), col("n_docs"),
        round(col("w"), 6).as("weight"), round(col("b"), 6).as("boost"))
      .orderBy(col("source"))
  }

  val q31Sql: String =
    """WITH counts AS (
      |  SELECT source, count(*) AS n_s FROM documents GROUP BY 1
      |), tot AS (SELECT sum(n_s) AS n FROM counts),
      |z AS (
      |  SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |           list(sqrt(CAST(n_s AS DOUBLE) / CAST(n AS DOUBLE))
      |                ORDER BY source)),
      |         (a, x) -> a + x) AS z
      |  FROM counts, tot
      |)
      |SELECT source, n_s AS n_docs,
      |  round(sqrt(CAST(n_s AS DOUBLE) / CAST(n AS DOUBLE)) / z, 6) AS weight,
      |  round(sqrt(CAST(n_s AS DOUBLE) / CAST(n AS DOUBLE)) / z
      |        / (CAST(n_s AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS boost
      |FROM counts, tot, z ORDER BY source""".stripMargin

  /** Q32: data-quality constraint audit — the Deequ/Great-Expectations
    * gate a production pipeline runs on every snapshot before anything
    * downstream trusts it: completeness (non-null / non-empty
    * fractions), key uniqueness, categorical-domain containment, and
    * numeric range, emitted as a tidy (check, value, passed) table a
    * scheduler can alert on.
    *
    * Scale shape: every metric folds in ONE map-side-combined full-scan
    * aggregation (count/sum/min/max plus one exact count-distinct on the
    * key — the only shuffle, carrying ids); the constraint table is then
    * a map-only explode of the single metrics row. No per-constraint
    * rescans — adding a check adds a column to the same pass, the Deequ
    * design point.
    */
  def q32DqAudit(s: SparkSession, dir: String): DataFrame = {
    val allowedLangs = Seq("de", "en", "es", "fr", "zh")
    val m = Tables.documents(s, dir).agg(
      count(lit(1)).as("n"),
      count(col("doc_id")).as("n_id"),
      countDistinct(col("doc_id")).as("n_idd"),
      sum(when(col("text").isNull || length(col("text")) === 0, 1L)
        .otherwise(0L)).as("text_bad"),
      sum(when(col("lang").isNull || !col("lang").isin(allowedLangs: _*), 1L)
        .otherwise(0L)).as("lang_bad"),
      sum(when(col("source").isNull, 1L).otherwise(0L)).as("source_bad"),
      min(col("n_chars")).as("nc_min"),
      max(col("n_chars")).as("nc_max"))
    m.select(explode(array(
      struct(lit("completeness_doc_id").as("check_name"),
        round(col("n_id") / col("n"), 6).as("value"),
        (col("n_id") === col("n")).as("passed")),
      struct(lit("completeness_source").as("check_name"),
        round(lit(1.0) - col("source_bad") / col("n"), 6).as("value"),
        (col("source_bad") === 0).as("passed")),
      struct(lit("completeness_text").as("check_name"),
        round(lit(1.0) - col("text_bad") / col("n"), 6).as("value"),
        (col("text_bad") === 0).as("passed")),
      struct(lit("lang_in_set").as("check_name"),
        round(lit(1.0) - col("lang_bad") / col("n"), 6).as("value"),
        (col("lang_bad") === 0).as("passed")),
      struct(lit("range_n_chars").as("check_name"),
        col("nc_max").cast("double").as("value"),
        (col("nc_min") >= 1 && col("nc_max") <= 100000).as("passed")),
      struct(lit("uniqueness_doc_id").as("check_name"),
        round(col("n_idd") / col("n"), 6).as("value"),
        (col("n_idd") === col("n")).as("passed")))).as("c"))
      .select(col("c.check_name").as("check_name"), col("c.value").as("value"),
        col("c.passed").as("passed"))
      .orderBy(col("check_name"))
  }

  val q32Sql: String =
    """WITH m AS (
      |  SELECT count(*) AS n, count(doc_id) AS n_id,
      |    count(DISTINCT doc_id) AS n_idd,
      |    sum(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END) AS text_bad,
      |    sum(CASE WHEN lang IS NULL
      |             OR lang NOT IN ('de','en','es','fr','zh') THEN 1 ELSE 0 END) AS lang_bad,
      |    sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS source_bad,
      |    min(n_chars) AS nc_min, max(n_chars) AS nc_max
      |  FROM documents
      |)
      |SELECT * FROM (
      |  SELECT 'completeness_doc_id' AS check_name,
      |         round(n_id / n, 6) AS value, n_id = n AS passed FROM m
      |  UNION ALL SELECT 'completeness_source',
      |         round(1.0 - source_bad / n, 6), source_bad = 0 FROM m
      |  UNION ALL SELECT 'completeness_text',
      |         round(1.0 - text_bad / n, 6), text_bad = 0 FROM m
      |  UNION ALL SELECT 'lang_in_set',
      |         round(1.0 - lang_bad / n, 6), lang_bad = 0 FROM m
      |  UNION ALL SELECT 'range_n_chars',
      |         CAST(nc_max AS DOUBLE), nc_min >= 1 AND nc_max <= 100000 FROM m
      |  UNION ALL SELECT 'uniqueness_doc_id',
      |         round(n_idd / n, 6), n_idd = n FROM m
      |) ORDER BY check_name""".stripMargin

  /** Q34: slowly-changing-dimension (type 2) history build — fold a
    * sequence of corpus snapshots into versioned validity intervals
    * (digest, valid_from, valid_to, is_current), the metadata-lake shape
    * a recurring crawl keeps so any past corpus state can be
    * reconstructed. Extends q29's two-snapshot diff to the general
    * N-snapshot merge: three snapshots are derived deterministically
    * from the fixture (baseline; drop-every-11th; drop-every-13th with
    * every-7th text mutated — q29's A/B preceded by the full corpus) and
    * collapsed per document with the gaps-and-islands device: a segment
    * breaks when the digest changes OR the document skips a snapshot
    * (absence then reappearance is a new version, as an SCD2 store
    * records it).
    *
    * 100 TB shape: each snapshot reduces to (doc_id, digest) in the scan
    * projection — text never leaves the scan (q29's rule); the union is
    * scan-parallel; the only shuffle keys on doc_id for the per-document
    * window, whose partitions are ≤ #snapshots rows each — tiny state,
    * arbitrarily many documents. Snapshot count grows the union linearly
    * (one partition-pruned scan each on a date-partitioned lake), never
    * quadratically.
    */
  def q34Scd2History(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val snap1 = docs.select(col("doc_id"), lit(1).as("snap"),
      md5(col("text")).as("digest"))
    val snap2 = docs.filter(col("doc_id") % 11 =!= 0)
      .select(col("doc_id"), lit(2).as("snap"), md5(col("text")).as("digest"))
    val snap3 = docs.filter(col("doc_id") % 13 =!= 0)
      .select(col("doc_id"), lit(3).as("snap"),
        when(col("doc_id") % 7 === 0, md5(concat(col("text"), lit("v2"))))
          .otherwise(md5(col("text"))).as("digest"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("snap"))
    val seg = snap1.union(snap2).union(snap3)
      .withColumn("p_snap", lag(col("snap"), 1).over(w))
      .withColumn("p_dig", lag(col("digest"), 1).over(w))
      .withColumn("is_new",
        when(col("p_snap").isNotNull && col("snap") === col("p_snap") + 1 &&
          col("digest") === col("p_dig"), 0L).otherwise(1L))
      .withColumn("version", sum(col("is_new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    seg.groupBy(col("doc_id"), col("version"))
      .agg(min(col("digest")).as("digest"),
        min(col("snap")).as("valid_from"),
        max(col("snap")).as("valid_to"),
        (max(col("snap")) === 3).as("is_current"))
      .orderBy(col("doc_id"), col("version"))
  }

  val q34Sql: String =
    """WITH snaps AS (
      |  SELECT doc_id, 1 AS snap, md5(text) AS digest FROM documents
      |  UNION ALL
      |  SELECT doc_id, 2, md5(text) FROM documents WHERE doc_id % 11 <> 0
      |  UNION ALL
      |  SELECT doc_id, 3,
      |    CASE WHEN doc_id % 7 = 0 THEN md5(text || 'v2') ELSE md5(text) END
      |  FROM documents WHERE doc_id % 13 <> 0
      |), marked AS (
      |  SELECT doc_id, snap, digest,
      |    CASE WHEN lag(snap) OVER w IS NOT NULL
      |              AND snap = lag(snap) OVER w + 1
      |              AND digest = lag(digest) OVER w THEN 0 ELSE 1 END AS is_new
      |  FROM snaps WINDOW w AS (PARTITION BY doc_id ORDER BY snap)
      |), segs AS (
      |  SELECT doc_id, snap, digest,
      |    CAST(sum(is_new) OVER (PARTITION BY doc_id ORDER BY snap
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS version
      |  FROM marked
      |)
      |SELECT doc_id, version, min(digest) AS digest,
      |  min(snap) AS valid_from, max(snap) AS valid_to,
      |  max(snap) = 3 AS is_current
      |FROM segs GROUP BY doc_id, version
      |ORDER BY doc_id, version""".stripMargin

  /** Number of fixed n_chars histogram bins for [[q33PsiDrift]]; the
    * add-half smoothing denominator term is 0.5 · this.
    */
  val PsiBins = 8

  /** Q33: population-stability-index drift between two corpus snapshots
    * — the monitoring check a pipeline runs when a new crawl lands:
    * bin a feature (n_chars, fixed 100-char edges) on both sides, then
    * PSI = Σ (p_a − p_b)·ln(p_a/p_b) with add-half smoothing so empty
    * bins stay finite. The fixture stands in the two snapshots with the
    * doc_id parity split (the q26/t23 hash-device doctrine: a
    * deterministic, content-independent partition). Per-bin
    * contributions are emitted (the actionable view — WHICH band
    * drifted); the scalar PSI is their sum.
    *
    * Scale shape: one map-side-combined (split, bin) count — ≤2·
    * [[PsiBins]] groups — then all arithmetic happens on the bounded
    * bin table against a cross-joined 1-row totals frame. The corpus is
    * scanned once, column-pruned to (doc_id, n_chars); nothing else
    * shuffles.
    */
  def q33PsiDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val binned = Tables.documents(s, dir)
      .select((col("doc_id") % 2 === 0).as("is_a"),
        least(lit(PsiBins - 1), floor(col("n_chars") / 100)).cast("long").as("bin"))
      .groupBy(col("is_a"), col("bin")).agg(count(lit(1)).as("cnt"))
    val bins = (0 until PsiBins).map(_.toLong).toDF("bin")
    val a = binned.filter(col("is_a")).select(col("bin"), col("cnt").as("ca"))
    val b = binned.filter(!col("is_a")).select(col("bin"), col("cnt").as("cb"))
    val tot = binned.agg(
      sum(when(col("is_a"), col("cnt")).otherwise(0L)).as("ta"),
      sum(when(!col("is_a"), col("cnt")).otherwise(0L)).as("tb"))
    val half = 0.5 * PsiBins
    val pa = (col("ca") + lit(0.5)) / (col("ta") + lit(half))
    val pb = (col("cb") + lit(0.5)) / (col("tb") + lit(half))
    bins.join(a, Seq("bin"), "left").join(b, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
      .crossJoin(tot)
      .select(col("bin"), col("ca"), col("cb"),
        round((pa - pb) * log(pa / pb), 6).as("psi_contrib"))
      .orderBy(col("bin"))
  }

  val q33Sql: String =
    s"""WITH binned AS (
      |  SELECT doc_id % 2 = 0 AS is_a,
      |         least(${PsiBins - 1}, n_chars // 100) AS bin, count(*) AS cnt
      |  FROM documents GROUP BY 1, 2
      |), bins AS (SELECT unnest(range(0, $PsiBins)) AS bin),
      |a AS (SELECT bin, cnt AS ca FROM binned WHERE is_a),
      |b AS (SELECT bin, cnt AS cb FROM binned WHERE NOT is_a),
      |tot AS (
      |  SELECT sum(CASE WHEN is_a THEN cnt ELSE 0 END) AS ta,
      |         sum(CASE WHEN NOT is_a THEN cnt ELSE 0 END) AS tb
      |  FROM binned
      |), j AS (
      |  SELECT bins.bin, coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb, ta, tb
      |  FROM bins LEFT JOIN a USING (bin) LEFT JOIN b USING (bin), tot
      |)
      |SELECT bin, ca, cb,
      |  round(((ca + 0.5) / (ta + ${0.5 * PsiBins}) - (cb + 0.5) / (tb + ${0.5 * PsiBins}))
      |        * ln(((ca + 0.5) / (ta + ${0.5 * PsiBins})) / ((cb + 0.5) / (tb + ${0.5 * PsiBins}))), 6) AS psi_contrib
      |FROM j ORDER BY bin""".stripMargin

  /** The snapshot number [[q36AsofCorpus]] reconstructs. */
  val Q36AsofSnap = 2

  /** Q36: as-of corpus reconstruction — the READ half of q34's SCD2
    * store: select every version whose validity interval covers the
    * requested snapshot and emit the corpus exactly as it stood then
    * (time-travel read, the Delta/Iceberg `VERSION AS OF` semantics
    * expressed over the history table). QueriesSpec proves round-trip
    * fidelity: the reconstruction equals the snapshot-2 derivation
    * computed directly from the source.
    *
    * 100 TB shape: q34's documented merge shapes plus one map-only
    * interval filter — on a materialized history table this is a
    * partition-pruned scan with the filter pushed to parquet, no
    * shuffle at all.
    */
  def q36AsofCorpus(s: SparkSession, dir: String): DataFrame =
    q34Scd2History(s, dir)
      .filter(col("valid_from") <= Q36AsofSnap &&
        col("valid_to") >= Q36AsofSnap)
      .select(col("doc_id"), col("digest"))
      .orderBy(col("doc_id"))

  lazy val q36Sql: String =
    "WITH hist AS (\n" + q34Sql + "\n)\n" +
      s"""SELECT doc_id, digest FROM hist
         |WHERE valid_from <= $Q36AsofSnap AND valid_to >= $Q36AsofSnap
         |ORDER BY doc_id""".stripMargin

  /** Q35: dataset card — the HF-dataset-card / datasheet summary table a
    * curation pipeline publishes with every corpus release: corpus size,
    * token budget, language/source/modality composition, mean quality,
    * and snapshot drift, as a tidy (section, metric, value) frame (the
    * q32 constraint-audit shape, but descriptive rather than pass/fail).
    * `HtmlReport.saveHtml` renders it to the one-file HTML artifact
    * (S11 doctrine); QueriesSpec exercises that rendering.
    *
    * Float doctrine: mean quality and total PSI go through exact
    * integer micro-unit sums (the w1 cent-sum device — the inputs are
    * already round-6, so ·1e6 is integral) making every aggregate
    * summation-order-independent; shares are single long/long
    * divisions. All other metrics are integer counts.
    *
    * 100 TB shape: each section is one map-side-combined aggregation
    * over a column-pruned scan (groupBys on lang/source/format are
    * low-cardinality by definition); the psi/quality sections reuse
    * q33/t10's documented map-only shapes. The card itself is a ≤ tens
    * of rows union — driver-sized output, corpus-sized nothing.
    */
  def q35DatasetCard(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    def row(section: String, metric: Column, value: Column) =
      struct(lit(section).as("section"), metric.as("metric"),
        value.as("value"))
    val base = Text.t9TokenCount(s, dir)
      .agg(count(lit(1)).as("n"), sum(col("n_tokens").cast("long")).as("t"))
    val corpus = base.select(explode(array(
      row("corpus", lit("n_docs"), col("n").cast("double")),
      row("corpus", lit("total_tokens"), col("t").cast("double")),
      row("corpus", lit("avg_doc_tokens"), round(col("t") / col("n"), 6))))
      .as("r")).select(col("r.section"), col("r.metric"), col("r.value"))
    val quality = Text.t10QualityScore(s, dir)
      .agg((sum(round(col("quality") * 1e6).cast("long")) / lit(1e6) /
        count(lit(1))).as("mq"))
      .select(lit("quality").as("section"), lit("mean_quality").as("metric"),
        round(col("mq"), 6).as("value"))
    val psi = q33PsiDrift(s, dir)
      .agg((sum(round(col("psi_contrib") * 1e6).cast("long")) / lit(1e6))
        .as("p"))
      .select(lit("drift").as("section"), lit("psi").as("metric"),
        round(col("p"), 6).as("value"))
    def shares(section: String, key: Column) =
      docs.groupBy(key.as("metric")).agg(count(lit(1)).as("c"))
        .crossJoin(broadcast(docs.agg(count(lit(1)).as("n"))))
        .select(lit(section).as("section"), col("metric"),
          round(col("c") / col("n"), 6).as("value"))
    val langs = shares("lang", col("lang"))
    val sources = shares("source", col("source"))
    val modality = shares("modality",
      when(col("doc_id") % 3 === 0, "png")
        .when(col("doc_id") % 3 === 1, "jpeg").otherwise("wav"))
    corpus.union(quality).union(psi).union(langs).union(sources)
      .union(modality)
      .orderBy(col("section"), col("metric"))
  }

  lazy val q35Sql: String =
    "WITH tq AS (\n" + Text.t10Sql + "\n), psibins AS (\n" + q33Sql + "\n)," +
      """
      |tot AS (
      |  SELECT count(*) AS n,
      |    sum(len(regexp_extract_all(text, '[A-Za-z0-9]+')))::BIGINT AS t
      |  FROM documents
      |)
      |SELECT * FROM (
      |  SELECT 'corpus' AS section, 'n_docs' AS metric, n::DOUBLE AS value FROM tot
      |  UNION ALL SELECT 'corpus', 'total_tokens', t::DOUBLE FROM tot
      |  UNION ALL SELECT 'corpus', 'avg_doc_tokens', round(t::DOUBLE / n, 6) FROM tot
      |  UNION ALL SELECT 'quality', 'mean_quality',
      |    round(sum(CAST(round(quality * 1000000) AS BIGINT)) / 1000000.0
      |          / count(*), 6) FROM tq
      |  UNION ALL SELECT 'drift', 'psi',
      |    round(sum(CAST(round(psi_contrib * 1000000) AS BIGINT)) / 1000000.0, 6)
      |  FROM psibins
      |  UNION ALL SELECT 'lang', lang,
      |    round(count(*) / (SELECT n FROM tot)::DOUBLE, 6)
      |  FROM documents GROUP BY lang
      |  UNION ALL SELECT 'source', source,
      |    round(count(*) / (SELECT n FROM tot)::DOUBLE, 6)
      |  FROM documents GROUP BY source
      |  UNION ALL SELECT 'modality',
      |    CASE WHEN doc_id % 3 = 0 THEN 'png'
      |         WHEN doc_id % 3 = 1 THEN 'jpeg' ELSE 'wav' END,
      |    round(count(*) / (SELECT n FROM tot)::DOUBLE, 6)
      |  FROM documents GROUP BY 1, 2
      |) ORDER BY section, metric""".stripMargin

  /** Q37: hierarchical ROLLUP — the OLAP subtotal surface (per-(lang,
    * source) cells, per-lang subtotals, grand total in ONE pass). Spark
    * plans rollup as a single Expand + one hash aggregate: each input
    * row is replicated once per grouping set BEFORE the partial
    * aggregate, so the shuffle carries |groups| partials per set, not
    * the corpus — the exact same one-pass shape GROUP BY ROLLUP has in
    * any MPP engine, and strictly better than the naive 3-query union
    * (3 scans). Subtotal keys surface as '<all>' markers via coalesce
    * (fixture keys are non-null, so the marker is unambiguous), which
    * keeps the twin engine-agnostic — SQL NULL-grouping flags
    * (grouping_id bit order) differ across engines.
    */
  def q37Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .rollup(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .select(coalesce(col("lang"), lit("<all>")).as("lang"),
        coalesce(col("source"), lit("<all>")).as("source"),
        col("n_docs"), col("total_chars"))
      .orderBy(col("lang"), col("source"))

  val q37Sql: String =
    """SELECT coalesce(lang, '<all>') AS lang,
      |       coalesce(source, '<all>') AS source,
      |       count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars
      |FROM documents GROUP BY ROLLUP(lang, source)
      |ORDER BY lang, source""".stripMargin

  /** Q38: PIVOT — long-to-wide reshaping (per-day event counts, one
    * column per event type), the dashboard/report shape every BI layer
    * asks of an engine. The pivot VALUES ARE DECLARED (the five fixture
    * event types): Spark's unvalued `pivot(col)` runs a blocking
    * distinct scan first and caps at
    * spark.sql.pivotMaxValues — an anti-pattern at 100 TB where the
    * declared-values form is one pass, planned as a single hash
    * aggregate over count(CASE WHEN ...) columns (exactly what the
    * twin spells out manually). An unexpected type would land in no
    * column — loud in reconciliation vs q10's value_counts, not
    * silently mixed in.
    */
  val Q38EventTypes = Seq("click", "error", "purchase", "signup", "view")
  def q38PivotDaily(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(to_date(col("ts")).as("day"), col("event_type"))
      .groupBy(col("day"))
      .pivot("event_type", Q38EventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, Q38EventTypes)
      .orderBy(col("day"))

  val q38Sql: String = {
    val cols = Q38EventTypes.map(t =>
      s"""count(*) FILTER (event_type = '$t') AS "$t"""").mkString(",\n      |       ")
    s"""SELECT CAST(ts AS DATE) AS day,
       |       $cols
       |FROM events GROUP BY 1 ORDER BY day""".stripMargin
  }

  /** Q39: incremental aggregate maintenance — the materialized-view
    * merge: per-(day, event_type) metrics are computed as PARTIAL
    * aggregates over two disjoint slices of the input (stand-ins for
    * "the stored aggregate state" and "the newly-arrived batch") and
    * MERGED by pure addition, exactly the mergeable-state contract that
    * lets a 100 TB pipeline maintain dashboards by folding each
    * micro-batch's partials into stored state instead of rescanning
    * history (Spark's own partial/final two-phase agg, lifted to the
    * storage layer; the streaming twin is w1 under foreachBatch).
    *
    * Everything additive is integer — counts plus the w1 cent device
    * (value folded as exact BIGINT cents) — so the merge is
    * order-independent and the oracle's direct one-shot aggregation
    * matches hash-exactly; the derived mean is one division at the
    * end. The oracle deliberately computes the DIRECT answer: the gate
    * row checks merge(partials) ≡ aggregate(all), the invariant
    * incremental maintenance rests on.
    */
  def q39IncrementalAgg(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(to_date(col("ts")).as("day"), col("event_type"),
        col("event_id"), round(col("value") * 100).cast("long").as("cents"))
    def partials(f: DataFrame): DataFrame =
      f.groupBy(col("day"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sc"))
    // "stored state" = even event ids; "arriving batch" = odd
    val merged = partials(ev.filter(col("event_id") % 2 === 0))
      .unionByName(partials(ev.filter(col("event_id") % 2 === 1)))
      .groupBy(col("day"), col("event_type"))
      .agg(sum(col("n")).as("n_events"), sum(col("sc")).as("sum_cents"))
    merged.select(col("day"), col("event_type"), col("n_events"),
      col("sum_cents"),
      round((col("sum_cents") / lit(100.0)) / col("n_events"), 6).as("avg_value"))
      .orderBy(col("day"), col("event_type"))
  }

  val q39Sql: String =
    """SELECT CAST(ts AS DATE) AS day, event_type,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
      |  round((sum(CAST(round(value * 100) AS BIGINT)) / 100.0)
      |        / count(*), 6) AS avg_value
      |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin

  // q40 entity-resolution parameters: blocking prefix length and the
  // edit-distance acceptance threshold.
  val Q40BlockLen = 3
  val Q40MaxDist = 2

  /** Q40: entity resolution via blocking + edit-distance verify — match
    * dirty records against a clean catalog without the O(n·m) cartesian
    * every naive fuzzy join hides. The canonical MDM/dedup operator for
    * STRUCTURED keys (names, addresses, product titles), next to the
    * d-family's set-similarity operators for long text. Following the
    * x1/x3 doctrine the fixture synthesizes the dirty side (three
    * deterministic corruption modes per part row: doubled last char,
    * squeezed space, case-flipped head — each edit distance 1 from its
    * source name) and the REAL operator runs distributed:
    *
    *  1. BLOCK: both sides key on the first [[Q40BlockLen]] chars of
    *     the alphanumeric-normalized name — chosen to SURVIVE the
    *     corruption modes, the property a real blocking key needs.
    *     Candidates exist only within a block, so the join is a keyed
    *     equi-join (AQE broadcasts the catalog side when it fits; at a
    *     100 TB record volume it shuffles on the block key, and a
    *     skewed block — every "Customer#..." in one bucket — is
    *     exactly what AQE skew-split handles).
    *  2. VERIFY: levenshtein ≤ [[Q40MaxDist]] inside the block only.
    *  3. RESOLVE: best match per record via a struct-min partial
    *     aggregate (min distance, then lexicographic name — exact
    *     integers, map-side combined, no per-record window).
    *
    * Near-threshold ambiguity is real and visible: "red bolt" sits at
    * distance 2 from "hot bolt", so the argmin (not the filter) is
    * what keeps the true distance-1 match. All comparisons integer,
    * the oracle window-ranks the same candidates — hash-exact.
    */
  def q40EntityMatch(s: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(s, dir)
    val catalog = parts.groupBy(col("p_name").as("clean_name"))
      .agg(min(col("p_partkey")).as("entity_id"))
    val dirtyName =
      when(col("p_partkey") % 3 === 0,
        concat(col("p_name"), substring(col("p_name"), -1, 1)))
        .when(col("p_partkey") % 3 === 1,
          regexp_replace(col("p_name"), " ", ""))
        .otherwise(concat(upper(substring(col("p_name"), 1, 1)),
          substring(col("p_name"), 2, 1000)))
    val dirty = parts.select(col("p_partkey").as("record_id"),
      dirtyName.as("dirty_name"))
    entityMatchFrame(dirty, catalog)
  }

  /** The q40 core over any dirty(record_id, dirty_name) /
    * catalog(clean_name, entity_id) pair — QueriesSpec drives it with a
    * planted single-mega-block fixture (every name sharing one blocking
    * key) to pin completion + correctness under the worst-case skew the
    * operator's scaladoc hands to AQE.
    */
  private[queries] def entityMatchFrame(dirty: DataFrame,
      catalog: DataFrame): DataFrame = {
    def blockKey(c: Column): Column =
      substring(regexp_replace(lower(c), "[^a-z0-9]", ""), 1, Q40BlockLen)
    dirty.withColumn("bk", blockKey(col("dirty_name")))
      .join(catalog.withColumn("bk", blockKey(col("clean_name"))), Seq("bk"))
      // distance projected ONCE before the filter references it — the
      // multi-reference recompute trap (filter + struct would each
      // re-run the O(|a|·|b|) DP per candidate row)
      .select(col("record_id"), col("dirty_name"), col("clean_name"),
        col("entity_id"),
        levenshtein(col("dirty_name"), col("clean_name")).as("d"))
      .filter(col("d") <= Q40MaxDist)
      .select(col("record_id"), col("dirty_name"),
        struct(col("d"), col("clean_name").as("nm"),
          col("entity_id").as("eid")).as("cand"))
      .groupBy(col("record_id"), col("dirty_name"))
      .agg(min(col("cand")).as("best"))
      .select(col("record_id"), col("dirty_name"),
        col("best.nm").as("matched_name"), col("best.eid").as("entity_id"),
        col("best.d").as("distance"))
      .orderBy(col("record_id"))
  }

  val q40Sql: String =
    s"""WITH catalog AS (
       |  SELECT p_name AS clean_name, min(p_partkey) AS entity_id
       |  FROM part GROUP BY 1
       |), dirty AS (
       |  SELECT p_partkey AS record_id,
       |    CASE WHEN p_partkey % 3 = 0 THEN p_name || substr(p_name, -1, 1)
       |         WHEN p_partkey % 3 = 1 THEN replace(p_name, ' ', '')
       |         ELSE upper(substr(p_name, 1, 1)) || substr(p_name, 2) END AS dirty_name
       |  FROM part
       |), cand AS (
       |  SELECT d.record_id, d.dirty_name, c.clean_name, c.entity_id,
       |    levenshtein(d.dirty_name, c.clean_name) AS distance,
       |    row_number() OVER (PARTITION BY d.record_id
       |      ORDER BY levenshtein(d.dirty_name, c.clean_name), c.clean_name) AS rn
       |  FROM dirty d JOIN catalog c
       |    ON substr(regexp_replace(lower(d.dirty_name), '[^a-z0-9]', '', 'g'), 1, $Q40BlockLen)
       |     = substr(regexp_replace(lower(c.clean_name), '[^a-z0-9]', '', 'g'), 1, $Q40BlockLen)
       |  WHERE levenshtein(d.dirty_name, c.clean_name) <= $Q40MaxDist
       |)
       |SELECT record_id, dirty_name, clean_name AS matched_name, entity_id,
       |  CAST(distance AS INT) AS distance
       |FROM cand WHERE rn = 1 ORDER BY record_id""".stripMargin

  /** Q41: ordered funnel conversion — of the users who viewed, how many
    * then clicked AFTER the view, then purchased after the click. The
    * product-analytics staple, implemented as CASCADED CONDITIONAL
    * AGGREGATES: stage k is one filter + keyed min-aggregate joined to
    * stage k−1's (user, ts) table, so per-user state is a single
    * timestamp — no per-user event arrays, no window over a user's full
    * history (the formulation that dies on heavy users at 100 TB).
    * Strict ts ordering (>) between stages; each stage's join is keyed
    * by user_id and left to AQE (stage tables shrink monotonically, so
    * later joins broadcast even when the first shuffles). Counts are
    * exact integers; rates are single divisions at the end — hash-exact.
    */
  def q41Funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"), col("event_type"), col("ts"))
    def stage(evType: String, prev: DataFrame): DataFrame =
      ev.filter(col("event_type") === evType)
        .join(prev, Seq("user_id"))
        .filter(col("ts") > col("t_prev"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_prev"))
    val viewed = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_prev"))
    val clicked = stage("click", viewed)
    val bought = stage("purchase", clicked)
    // all four counts are 1-row aggregates cross-joined into ONE job
    // (previously four separate driver .count() actions, each re-deriving
    // its whole cascade prefix); stack() pivots the single row into the
    // three stage rows — exact integers throughout, divisions unchanged
    val nTot = Tables.events(s, dir).select(col("user_id")).distinct()
      .agg(count(lit(1)).as("n0"))
    def n(df: DataFrame, name: String): DataFrame =
      df.agg(count(lit(1)).as(name))
    n(viewed, "n1").crossJoin(n(clicked, "n2")).crossJoin(n(bought, "n3"))
      .crossJoin(nTot)
      .select(expr("stack(3, 1, 'view', n1, n0, 2, 'click', n2, n1, " +
        "3, 'purchase', n3, n2) AS (stage, event_type, n_users, prev_users)"))
      .select(col("stage"), col("event_type"), col("n_users"),
        round(col("n_users") / col("prev_users").cast("double"), 6).as("conversion"))
      .orderBy(col("stage"))
  }

  val q41Sql: String =
    """WITH v AS (
      |  SELECT user_id, min(ts) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY 1
      |), c AS (
      |  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1
      |), p AS (
      |  SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1
      |), n AS (SELECT count(DISTINCT user_id)::BIGINT AS n0 FROM events)
      |SELECT * FROM (
      |  SELECT 1 AS stage, 'view' AS event_type,
      |    (SELECT count(*) FROM v)::BIGINT AS n_users,
      |    round((SELECT count(*) FROM v) / (SELECT n0 FROM n)::DOUBLE, 6) AS conversion
      |  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM c)::BIGINT,
      |    round((SELECT count(*) FROM c) / (SELECT count(*) FROM v)::DOUBLE, 6)
      |  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM p)::BIGINT,
      |    round((SELECT count(*) FROM p) / (SELECT count(*) FROM c)::DOUBLE, 6)
      |) ORDER BY stage""".stripMargin

  /** Sample size for [[q42WeightedSample]]. */
  val Q42K = 100

  /** Q42: weighted sampling WITHOUT replacement in one distributed pass —
    * the Efraimidis–Spirakis A-ES scheme (IPL 2006): each row draws
    * u ∈ (0,1] and the top-K rows by u^(1/w) are exactly a weighted
    * sample without replacement. Token-weighted subsampling is how a
    * curation pipeline downsamples a corpus while preserving the token
    * budget's composition (q26/t17 sample uniformly per stratum; q42
    * weights each ROW — here by n_chars, the document's cost).
    *
    * Determinism doctrine: u comes from the md5-bucket coin (q26's
    * device — a pure row function, reproducible across retries and
    * repartitioning, never an RNG), mapped to (0,1] via (v+1)/2^32. The
    * rank key is ln(u)/w — the same ordering as u^(1/w) (ln is monotone,
    * w > 0) without pow's cross-libm drift (the m17 sqrt argument: ln
    * and division are correctly rounded where pow is not). Top-K plans
    * as TakeOrderedAndProject: each partition keeps a K-row heap — the
    * one-pass distributed form of weighted reservoir sampling, no sort,
    * no shuffle beyond K rows per partition. Both engines compute
    * identical doubles from identical integers, so the cut and the
    * output hash match exactly.
    */
  def q42WeightedSample(s: SparkSession, dir: String): DataFrame = {
    val v = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long")
    val u = (v + lit(1L)) / lit(4294967296.0)
    val key = log(u) / col("n_chars")
    Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars"), key.as("es_key"))
      .orderBy(col("es_key").desc, col("doc_id"))
      .limit(Q42K)
      .select(col("doc_id"), col("n_chars"), round(col("es_key") * 1e6, 6).as("es_key_e6"))
  }

  val q42Sql: String =
    s"""WITH c AS (
       |  SELECT doc_id, n_chars,
       |    ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT + 1)
       |       / 4294967296.0) / n_chars AS es_key
       |  FROM documents
       |)
       |SELECT doc_id, n_chars, round(es_key * 1e6, 6) AS es_key_e6
       |FROM c ORDER BY es_key DESC, doc_id LIMIT $Q42K""".stripMargin

  /** Q43: winsorized robust statistics — per event type, clip values at
    * the exact [p1, p99] band and report the clip counts and the
    * winsorized mean: the outlier-robust summary a metrics pipeline
    * publishes when raw means are sensor-spike hostages (and the
    * data-cleaning primitive behind learned-feature clipping). Exact
    * percentiles (q24's parity: Spark `percentile` ≡ DuckDB
    * `quantile_cont`, both (n−1)p interpolation) broadcast back as a
    * |event_type|-row dim; the winsorized mean runs through the m26
    * micro-unit device — clamp(value) is the same IEEE expression in
    * both engines, so its 1e-6-grid integer sum is order-independent
    * and the twin hash-matches. One full scan + one bounded-dim
    * broadcast join; no second pass.
    */
  def q43Winsorize(s: SparkSession, dir: String): DataFrame = {
    val stats = Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.01)").as("p01"),
        expr("percentile(value, 0.99)").as("p99"))
    val clamped = least(greatest(col("value"), col("p01")), col("p99"))
    Tables.events(s, dir)
      .join(broadcast(stats), Seq("event_type"))
      .select(col("event_type"), col("p01"), col("p99"), col("value"),
        round(clamped * 1000000).cast("long").as("cu"))
      .groupBy(col("event_type"), col("p01"), col("p99"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") < col("p01"), 1L).otherwise(0L)).as("n_clip_lo"),
        sum(when(col("value") > col("p99"), 1L).otherwise(0L)).as("n_clip_hi"),
        sum(col("cu")).as("su"))
      .select(col("event_type"), round(col("p01"), 6).as("p01"),
        round(col("p99"), 6).as("p99"), col("n"), col("n_clip_lo"),
        col("n_clip_hi"),
        round((col("su") / lit(1000000.0)) / col("n"), 6).as("winsorized_mean"))
      .orderBy(col("event_type"))
  }

  val q43Sql: String =
    """WITH st AS (
      |  SELECT event_type, quantile_cont(value, 0.01) AS p01,
      |         quantile_cont(value, 0.99) AS p99
      |  FROM events GROUP BY 1
      |)
      |SELECT e.event_type, round(p01, 6) AS p01, round(p99, 6) AS p99,
      |  count(*) AS n,
      |  count(*) FILTER (value < p01)::BIGINT AS n_clip_lo,
      |  count(*) FILTER (value > p99)::BIGINT AS n_clip_hi,
      |  round((sum(CAST(round(least(greatest(value, p01), p99) * 1000000)
      |             AS BIGINT)) / 1000000.0) / count(*), 6) AS winsorized_mean
      |FROM events e JOIN st USING (event_type)
      |GROUP BY e.event_type, p01, p99 ORDER BY e.event_type""".stripMargin

  /** Q44: per-group OLS trend — for each event type, the least-squares
    * slope of value over time (cents/day) and the fit's R²: the trend
    * line every dashboard overlays and the drift detector's linear
    * sibling (w13 flags spikes; q44 quantifies sustained direction).
    * Closed form from five EXACT integer sums — x = epoch day, y =
    * cents, Σx, Σy, Σxy, Σx², Σy² all map-side-combined BIGINTs (one
    * pass, one |groups|-row aggregate), so the slope numerator
    * n·Σxy − Σx·Σy is exact integer arithmetic in both engines before
    * the single double division, and R² squares the same exact factors
    * after one deterministic int→double conversion. Magnitudes: at the
    * fixture's 10⁴ rows/group the factors sit near 10¹⁶ — inside
    * Long; a 100 TB deployment groups by finer windows first (w1) or
    * widens the sums to DECIMAL, the documented trade.
    */
  def q44TrendOls(s: SparkSession, dir: String): DataFrame = {
    val x = datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
      .cast("long")
    val y = round(col("value") * 100).cast("long")
    val d = Tables.events(s, dir)
      .select(col("event_type"), x.as("x"), y.as("y"))
    val agg = d.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val denX = col("n") * col("sxx") - col("sx") * col("sx")
    val denY = col("n") * col("syy") - col("sy") * col("sy")
    agg.select(col("event_type"), col("n"),
      round(num / denX.cast("double"), 6).as("slope_cents_per_day"),
      round((num.cast("double") * num.cast("double")) /
        (denX.cast("double") * denY.cast("double")), 6).as("r2"))
      .orderBy(col("event_type"))
  }

  val q44Sql: String =
    """WITH d AS (
      |  SELECT event_type,
      |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))::BIGINT AS x,
      |    CAST(round(value * 100) AS BIGINT) AS y
      |  FROM events
      |), a AS (
      |  SELECT event_type, count(*)::BIGINT AS n,
      |    sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
      |    sum(x * y)::BIGINT AS sxy, sum(x * x)::BIGINT AS sxx,
      |    sum(y * y)::BIGINT AS syy
      |  FROM d GROUP BY 1
      |)
      |SELECT event_type, n,
      |  round((n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE), 6)
      |    AS slope_cents_per_day,
      |  round((CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE))
      |        / (CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)), 6)
      |    AS r2
      |FROM a ORDER BY event_type""".stripMargin

  /** Q45: two-proportion A/B z-test — split users into arms by the
    * stable user_id parity (the deterministic stand-in for an
    * experiment assignment), measure a per-user binary outcome, and
    * report the pooled two-proportion z statistic: the experimentation
    * readout every product pipeline computes, and the statistical-test
    * primitive the engine was missing next to q33's PSI (distribution
    * drift) and w13's z-flags (volume anomalies). The outcome is
    * "more purchases than signups" — a comparison of two per-user
    * counts, so its base rate sits near ½ at EVERY fixture scale
    * (any has-an-event flag saturates to 1 on a dense event stream and
    * degenerates the test — measured: all 150 sf0.01 users have
    * purchases). One pass: per-user counts (map-side combined), then a
    * 2-row arm aggregate; z is a single IEEE expression over exact
    * integer counts, identical in both engines — hash-twinned, with a
    * null z when the pooled variance is zero (both sides guard alike).
    */
  def q45AbTest(s: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg((sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) >
        sum(when(col("event_type") === "signup", 1L).otherwise(0L)))
        .cast("long").as("converted"))
    val arms = perUser
      .groupBy((col("user_id") % 2).as("arm"))
      .agg(count(lit(1)).as("n"), sum(col("converted")).as("c"))
    val a = arms.filter(col("arm") === 0)
      .select(col("n").as("n_a"), col("c").as("c_a"))
    val b = arms.filter(col("arm") === 1)
      .select(col("n").as("n_b"), col("c").as("c_b"))
    val pa = col("c_a") / col("n_a")
    val pb = col("c_b") / col("n_b")
    val pp = (col("c_a") + col("c_b")) / (col("n_a") + col("n_b"))
    val se = sqrt(pp * (lit(1.0) - pp) *
      (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
    a.crossJoin(b)
      .select(col("n_a"), col("c_a"), col("n_b"), col("c_b"),
        round(pa, 6).as("p_a"), round(pb, 6).as("p_b"),
        round(pb - pa, 6).as("lift"),
        when(se > 0, round((pb - pa) / se, 6)).as("z"))
  }

  val q45Sql: String =
    """WITH pu AS (
      |  SELECT user_id,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >
      |         sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
      |         AS BIGINT) AS converted
      |  FROM events GROUP BY 1
      |), arms AS (
      |  SELECT user_id % 2 AS arm, count(*)::BIGINT AS n,
      |    sum(converted)::BIGINT AS c
      |  FROM pu GROUP BY 1
      |), a AS (SELECT n AS n_a, c AS c_a FROM arms WHERE arm = 0),
      |b AS (SELECT n AS n_b, c AS c_b FROM arms WHERE arm = 1)
      |SELECT n_a, c_a, n_b, c_b,
      |  round(c_a / n_a, 6) AS p_a, round(c_b / n_b, 6) AS p_b,
      |  round(c_b / n_b - c_a / n_a, 6) AS lift,
      |  CASE WHEN sqrt(((c_a + c_b) / (n_a + n_b)) * (1.0 - (c_a + c_b) / (n_a + n_b))
      |                 * (1.0 / n_a + 1.0 / n_b)) > 0
      |       THEN round((c_b / n_b - c_a / n_a)
      |         / sqrt(((c_a + c_b) / (n_a + n_b)) * (1.0 - (c_a + c_b) / (n_a + n_b))
      |                * (1.0 / n_a + 1.0 / n_b)), 6)
      |       END AS z
      |FROM a, b""".stripMargin

  /** Q46: clickstream transition matrix — per user, order events by
    * time and count consecutive (from → to) event-type pairs, then the
    * conditional transition probability per source state: the
    * first-order Markov model behind "what do users do after X"
    * analyses, next-event prediction baselines, and funnel discovery
    * (q41 checks ONE ordered path; q46 measures them all). The lead
    * window is partitioned per user (at 100 TB partition by
    * (user, session) via q21 first — a power user's full history in
    * one window partition is the documented bound); the transition
    * aggregate and the per-source totals are exact integer counts,
    * with the single probability division at the end — hash-twinned.
    */
  def q46Transitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val counts = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val totals = counts.groupBy(col("from_type"))
      .agg(sum(col("n_transitions")).as("tot"))
    counts.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n_transitions"),
        round(col("n_transitions") / col("tot").cast("double"), 6).as("p"))
      .orderBy(col("from_type"), col("to_type"))
  }

  val q46Sql: String =
    """WITH seq AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |                           ORDER BY ts, event_id) AS to_type
      |  FROM events
      |), c AS (
      |  SELECT from_type, to_type, count(*) AS n_transitions
      |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2
      |), t AS (
      |  SELECT from_type, sum(n_transitions) AS tot FROM c GROUP BY 1
      |)
      |SELECT from_type, to_type, n_transitions,
      |  round(n_transitions / tot::DOUBLE, 6) AS p
      |FROM c JOIN t USING (from_type)
      |ORDER BY from_type, to_type""".stripMargin

  val queries: ListMap[String, Q] = ListMap(
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q2_topk_by_date" -> (q2TopKByDate _),
    "q3_filter_project" -> (q3FilterProject _),
    "q4_broadcast_join_agg" -> (q4BroadcastJoinAgg _),
    "q5_left_join_count" -> (q5LeftJoinCount _),
    "q6_anti_join" -> (q6AntiJoin _),
    "q7_semi_join" -> (q7SemiJoin _),
    "q8_distinct_pairs" -> (q8DistinctPairs _),
    "q9_latest_per_key" -> (q9LatestPerKey _),
    "q10_value_counts" -> (q10ValueCounts _),
    "q11_count_distinct" -> (q11CountDistinct _),
    "q12_except_users" -> (q12ExceptUsers _),
    "q13_intersect_users" -> (q13IntersectUsers _),
    "q14_ts_range" -> (q14TsRange _),
    "q15_json_extract" -> (q15JsonExtract _),
    "q16_join_chain" -> (q16JoinChain _),
    "q17_non_empty" -> (q17NonEmpty _),
    "q18_pivot_status" -> (q18PivotStatus _),
    "q19_positional_join" -> (q19PositionalJoin _),
    "q20_approx_distinct" -> (q20ApproxDistinct _),
    "q21_sessionize" -> (q21Sessionize _),
    "q22_asof_join" -> (q22AsofJoin _),
    "q23_range_join" -> (q23RangeJoin _),
    "q24_percentiles" -> (q24Percentiles _),
    "q25_cube" -> (q25Cube _),
    "q26_stratified_sample" -> (q26StratifiedSample _),
    "q27_salted_count" -> (q27SaltedCount _),
    "q28_domain_mix" -> (q28DomainMix _),
    "q29_snapshot_diff" -> (q29SnapshotDiff _),
    "q30_approx_percentiles" -> (q30ApproxPercentiles _),
    "q31_temperature_mix" -> (q31TemperatureMix _),
    "q32_dq_audit" -> (q32DqAudit _),
    "q33_psi_drift" -> (q33PsiDrift _),
    "q34_scd2_history" -> (q34Scd2History _),
    "q35_dataset_card" -> (q35DatasetCard _),
    "q36_asof_corpus" -> (q36AsofCorpus _),
    "q37_rollup" -> (q37Rollup _),
    "q38_pivot_daily" -> (q38PivotDaily _),
    "q39_incremental_agg" -> (q39IncrementalAgg _),
    "q40_entity_match" -> (q40EntityMatch _),
    "q41_funnel" -> (q41Funnel _),
    "q42_weighted_sample" -> (q42WeightedSample _),
    "q43_winsorize" -> (q43Winsorize _),
    "q44_trend_ols" -> (q44TrendOls _),
    "q45_ab_test" -> (q45AbTest _),
    "q46_transitions" -> (q46Transitions _),
  )

  val oracle: ListMap[String, String] = ListMap(
    "q1_pricing_summary" -> q1Sql,
    "q2_topk_by_date" -> q2Sql,
    "q3_filter_project" -> q3Sql,
    "q4_broadcast_join_agg" -> q4Sql,
    "q5_left_join_count" -> q5Sql,
    "q6_anti_join" -> q6Sql,
    "q7_semi_join" -> q7Sql,
    "q8_distinct_pairs" -> q8Sql,
    "q9_latest_per_key" -> q9Sql,
    "q10_value_counts" -> q10Sql,
    "q11_count_distinct" -> q11Sql,
    "q12_except_users" -> q12Sql,
    "q13_intersect_users" -> q13Sql,
    "q14_ts_range" -> q14Sql,
    "q15_json_extract" -> q15Sql,
    "q16_join_chain" -> q16Sql,
    "q17_non_empty" -> q17Sql,
    "q18_pivot_status" -> q18Sql,
    "q19_positional_join" -> q19Sql,
    "q21_sessionize" -> q21Sql,
    "q22_asof_join" -> q22Sql,
    "q23_range_join" -> q23Sql,
    "q24_percentiles" -> q24Sql,
    "q25_cube" -> q25Sql,
    "q26_stratified_sample" -> q26Sql,
    "q27_salted_count" -> q27Sql,
    "q28_domain_mix" -> q28Sql,
    "q29_snapshot_diff" -> q29Sql,
    "q31_temperature_mix" -> q31Sql,
    "q32_dq_audit" -> q32Sql,
    "q33_psi_drift" -> q33Sql,
    "q34_scd2_history" -> q34Sql,
    "q35_dataset_card" -> q35Sql,
    "q36_asof_corpus" -> q36Sql,
    "q37_rollup" -> q37Sql,
    "q38_pivot_daily" -> q38Sql,
    "q39_incremental_agg" -> q39Sql,
    "q40_entity_match" -> q40Sql,
    "q41_funnel" -> q41Sql,
    "q42_weighted_sample" -> q42Sql,
    "q43_winsorize" -> q43Sql,
    "q44_trend_ols" -> q44Sql,
    "q45_ab_test" -> q45Sql,
    "q46_transitions" -> q46Sql,
  )
}
