package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Windowing + join-mode coverage beyond the tumbling core: sliding and
  * session windows (SURVEY W4 — unused by the reference, mandated
  * extension), right/semi/anti join modes (J7 family), and the typed
  * exact-distinct Aggregator (F4/A4).
  */
object WindowOps extends QueryModule {

  /** Sliding event-time window (30 s length, 10 s slide): each event lands
    * in 3 buckets. Emitted as epoch-second window starts. */
  def slidingWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "30 seconds", "10 seconds"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_timestamp(col("window.start")).as("wstart"),
        col("event_type"), col("n_events"))

  /** Session window (30-min inactivity gap) per user via the NATIVE
    * `session_window` primitive — same semantics as the ADS sessionization
    * query, exercising Spark's merging-session-state path. */
  def sessionWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("sess_start_us"),
        col("n_events"))

  /** Right outer join (J7): all orders, with customer attrs when present. */
  def rightJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "right")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("c_mktsegment")).as("n_segments"))

  /** Left-semi join (EXISTS): customers having at least one urgent order. */
  def semiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))

  /** Left-anti join (NOT EXISTS): customers with no urgent orders. */
  def antiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_inactive"))

  /** Exact distinct users per event type via the typed Set Aggregator
    * (F4/A4) — oracle is plain COUNT(DISTINCT). */
  def distinctViaAggregator(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select(col("event_type"), col("user_id").cast("string").as("uid"))
      .as[(String, String)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(graft.functions.Aggregators.distinctCount.toColumn.name("uv"))
      .toDF("event_type", "uv")
  }

  /** Per-group top-k (U3/U4 family, per-key form): top-3 customers by
    * total spend within each order priority. The rank predicate compiles
    * to Spark's `WindowGroupLimit` — each map task keeps only its local
    * top-3 per priority BEFORE the exchange, so the shuffle carries
    * O(partitions × groups × k) rows regardless of input size; at 100 TB
    * the full sort the naive window implies never happens. `row_number`
    * over (spend DESC, custkey ASC) pins ties in both engines. */
  def topkPerGroup(s: SparkSession, d: String): DataFrame = {
    val spend = Tables.orders(s, d)
      .groupBy(col("o_orderpriority"), col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double")
          .as("spend"))
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("spend").desc, col("o_custkey").asc)
    spend.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_orderpriority"), col("o_custkey"), col("n_orders"),
        col("spend"), col("rk").cast("long").as("rk"))
  }

  /** GROUPING SETS with explicit per-column grouping flags (A7 family
    * beyond rollup/cube): the four sets share ONE shuffle — Catalyst
    * expands the input once and aggregates all sets in a single
    * hash-aggregate pass, so the cost is one exchange regardless of how
    * many sets are requested. `grouping(col)` flags are emitted per
    * column (not the packed grouping_id) because the bit order of the
    * packed id is engine-specific while per-column flags are portable. */
  def groupingSetsGeo(s: SparkSession, d: String): DataFrame = {
    val base = Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
    base.groupingSets(
        Seq(Seq(col("r_name"), col("n_name")), Seq(col("r_name")),
          Seq(col("c_mktsegment")), Seq.empty[org.apache.spark.sql.Column]),
        col("r_name"), col("n_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"),
        sum(col("c_acctbal").cast(DecimalType(18, 2))).cast("double")
          .as("bal_sum"),
        grouping(col("r_name")).cast("int").as("g_r"),
        grouping(col("n_name")).cast("int").as("g_n"),
        grouping(col("c_mktsegment")).cast("int").as("g_m"))
  }

  /** Unpivot/melt (the inverse of `q_pivot_status`): wide status counts
    * back to long form. `unpivot` is a narrow projection — each input row
    * expands to 3 output rows with zero shuffle, so it composes with the
    * pivot's single exchange. Zero-count cells survive (na.fill in the
    * pivot), which a direct GROUP BY would drop — that asymmetry is the
    * point of gating the round-trip. */
  def unpivotStatus(s: SparkSession, d: String): DataFrame =
    pivotStatus0(s, d).unpivot(
      Array(col("o_orderpriority")),
      Array(col("F"), col("O"), col("P")),
      "status", "n_orders")

  private def pivotStatus0(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("F", "O", "P"))

  /** Equi-width histogram (16 buckets) over `events.value` — the
    * two-pass global-extent device: pass 1 is a 1-row min/max aggregate,
    * broadcast back over the scan (never a global window), pass 2 buckets
    * each row with pure IEEE arithmetic — `(v - vmin) * 16 / (vmax -
    * vmin)` is bit-identical cross-engine (no transcendentals), and the
    * gated column is the integer bucket. At 100 TB both passes are full
    * scans with map-side combine; nothing is collected to the driver. */
  def valueHist(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d).select(col("value"))
    val mm = e.agg(min(col("value")).as("vmin"), max(col("value")).as("vmax"))
    e.crossJoin(broadcast(mm))
      .withColumn("bucket",
        least(floor((col("value") - col("vmin")) * lit(16)
          / (col("vmax") - col("vmin"))), lit(15L)))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_events"),
        min(col("value")).as("b_lo"), max(col("value")).as("b_hi"))
  }

  /** 2-D Pareto frontier (skyline: minimize price, maximize size) over
    * distinct `(p_retailprice, p_size)` pairs — the distributed
    * prefix-max device. The classic sweep (sort by price ASC, size DESC;
    * survive iff size beats the running max) is a single global sort; at
    * 100 TB that is one all-data partition. Instead: (1) 1-row price
    * extent, broadcast; (2) range-bucket each pair by price (equal prices
    * always co-bucket, so earlier bucket ⇒ STRICTLY cheaper); (3)
    * per-bucket max-size (≤32 rows) → running max over strictly-earlier
    * buckets on the tiny frame; (4) broadcast it back and run the sweep
    * window PARTITIONED BY bucket — each bucket sweeps in parallel and a
    * point survives iff its size beats both the in-bucket prefix max and
    * the earlier-bucket running max. Output ≡ the single sweep (the
    * DuckDB oracle IS the single sweep; the hash gate proves the
    * decomposition, including strict-domination tie handling). */
  def skyline(s: SparkSession, d: String): DataFrame = {
    val pts = Tables.part(s, d)
      .select(col("p_retailprice").as("price"), col("p_size").as("sz"))
      .distinct()
    val mm = pts.agg(min(col("price")).as("pmin"), max(col("price")).as("pmax"))
    val bucketed = pts.crossJoin(broadcast(mm))
      .withColumn("bkt",
        least(floor((col("price") - col("pmin")) * lit(32)
          / (col("pmax") - col("pmin"))), lit(31L)))
      .drop("pmin", "pmax")
    val bucketMax = bucketed.groupBy(col("bkt"))
      .agg(max(col("sz")).as("bmax"))
    val prevW = Window.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // <=32 rows: the no-partition window is a bounded frame, not data
    val prevMax = bucketMax
      .withColumn("prev_max", max(col("bmax")).over(prevW))
      .select(col("bkt"), col("prev_max"))
    val sweepW = Window.partitionBy(col("bkt"))
      .orderBy(col("price").asc, col("sz").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(broadcast(prevMax), "bkt")
      .withColumn("wmax", max(col("sz")).over(sweepW))
      .filter(col("sz") > greatest(
        coalesce(col("wmax"), lit(Int.MinValue)),
        coalesce(col("prev_max"), lit(Int.MinValue))))
      .select(col("price"), col("sz"))
  }

  /** Time-series gap fill + forward fill (O6 family, warehouse staple):
    * per-user daily max event value, with missing days inside each
    * user's [first, last] day range materialized and forward-filled from
    * the most recent observed day. `sequence` + explode generates the
    * missing rows WITHOUT a join against a global calendar (each user's
    * range is local), and the fill is `last(ignoreNulls)` over a
    * per-user window — partition-parallel, frame bounded by the user's
    * own span. Day arithmetic is pure integer (epoch-day floor). */
  def gapFill(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .withColumn("day", floor(unix_timestamp(col("ts")) / lit(86400L)))
      .groupBy(col("user_id"), col("day"))
      .agg(max(col("value")).as("day_max"))
    val spans = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val calendar = spans
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    val fillW = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    calendar.join(daily, Seq("user_id", "day"), "left")
      .withColumn("filled", last(col("day_max"), ignoreNulls = true).over(fillW))
      .withColumn("is_gap", when(col("day_max").isNull, 1).otherwise(0))
      .select(col("user_id"), col("day"), col("filled"), col("is_gap"))
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_skyline"         -> skyline _,
    "q_gap_fill"        -> gapFill _,
    "q_topk_per_group"  -> topkPerGroup _,
    "q_grouping_sets"   -> groupingSetsGeo _,
    "q_unpivot_status"  -> unpivotStatus _,
    "q_value_hist"      -> valueHist _,
    "q_sliding_window"  -> slidingWindow _,
    "q_session_window"  -> sessionWindow _,
    "q_right_join"      -> rightJoin _,
    "q_semi_join"       -> semiJoin _,
    "q_anti_join"       -> antiJoin _,
    "q_distinct_agg"    -> distinctViaAggregator _,
  )

  override val oracles: Map[String, String] = Map(
    // the oracle IS the classic single sweep the Spark side decomposes:
    // sorted by (price ASC, sz DESC), a point survives iff its size beats
    // the prefix max over strictly-preceding rows (strict domination)
    "q_skyline" ->
      """WITH pts AS (
        |  SELECT DISTINCT p_retailprice AS price, p_size AS sz FROM part),
        |sw AS (SELECT price, sz,
        |  MAX(sz) OVER (ORDER BY price ASC, sz DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM pts)
        |SELECT price, sz FROM sw WHERE pmax IS NULL OR sz > pmax""".stripMargin,
    "q_gap_fill" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day,
        |    MAX(value) AS day_max
        |  FROM events GROUP BY 1, 2),
        |spans AS (
        |  SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1),
        |cal AS (
        |  SELECT user_id, d0 + CAST(i AS BIGINT) AS day
        |  FROM spans, UNNEST(range(d1 - d0 + 1)) AS u(i))
        |SELECT c.user_id, c.day,
        |  LAST_VALUE(day_max IGNORE NULLS) OVER (PARTITION BY c.user_id
        |    ORDER BY c.day ROWS UNBOUNDED PRECEDING) AS filled,
        |  CASE WHEN day_max IS NULL THEN 1 ELSE 0 END AS is_gap
        |FROM cal c LEFT JOIN daily dy
        |  ON c.user_id = dy.user_id AND c.day = dy.day""".stripMargin,
    "q_topk_per_group" ->
      """WITH spend AS (
        |  SELECT o_orderpriority, o_custkey, COUNT(*) AS n_orders,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        |  FROM orders GROUP BY 1, 2)
        |SELECT o_orderpriority, o_custkey, n_orders, spend,
        |  CAST(rk AS BIGINT) AS rk
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |        ORDER BY spend DESC, o_custkey) AS rk FROM spend)
        |WHERE rk <= 3""".stripMargin,
    "q_grouping_sets" ->
      """SELECT r_name, n_name, c_mktsegment, COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal_sum,
        |  CAST(GROUPING(r_name) AS INT) AS g_r,
        |  CAST(GROUPING(n_name) AS INT) AS g_n,
        |  CAST(GROUPING(c_mktsegment) AS INT) AS g_m
        |FROM customer
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name, n_name), (r_name),
        |  (c_mktsegment), ())""".stripMargin,
    "q_unpivot_status" ->
      """WITH p AS (SELECT o_orderpriority,
        |    COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS f_n,
        |    COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS o_n,
        |    COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS p_n
        |  FROM orders GROUP BY 1)
        |SELECT o_orderpriority, 'F' AS status, f_n AS n_orders FROM p
        |UNION ALL
        |SELECT o_orderpriority, 'O' AS status, o_n AS n_orders FROM p
        |UNION ALL
        |SELECT o_orderpriority, 'P' AS status, p_n AS n_orders FROM p""".stripMargin,
    "q_value_hist" ->
      """WITH mm AS (SELECT MIN(value) AS vmin, MAX(value) AS vmax FROM events)
        |SELECT CAST(LEAST(FLOOR((value - vmin) * 16 / (vmax - vmin)), 15)
        |    AS BIGINT) AS bucket,
        |  COUNT(*) AS n_events, MIN(value) AS b_lo, MAX(value) AS b_hi
        |FROM events CROSS JOIN mm GROUP BY 1""".stripMargin,
    // each event replicates into the 3 sliding buckets it belongs to
    "q_sliding_window" ->
      """SELECT CAST(FLOOR(epoch(ts)/10)*10 AS BIGINT) - 10*CAST(i AS BIGINT) AS wstart,
        |  event_type, COUNT(*) AS n_events
        |FROM events, UNNEST(range(3)) AS u(i)
        |GROUP BY 1, 2""".stripMargin,
    // gap-based sessions == session_window: windows [t, t+g) merge iff
    // next.t - t < g, so a gap >= g starts a session; microsecond epochs
    // keep the boundary semantics identical (Spark truncates parquet ns→µs,
    // epoch_us does the same floor).
    "q_session_window" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |m AS (SELECT *, LAG(us) OVER
        |        (PARTITION BY user_id ORDER BY us, event_id) AS prev_us FROM e),
        |f AS (SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us >= 1800000000
        |        THEN 1 ELSE 0 END AS is_start FROM m),
        |sq AS (SELECT *, SUM(is_start) OVER
        |        (PARTITION BY user_id ORDER BY us, event_id
        |         ROWS UNBOUNDED PRECEDING) AS session_seq FROM f)
        |SELECT user_id, MIN(us) AS sess_start_us, COUNT(*) AS n_events
        |FROM sq GROUP BY user_id, session_seq""".stripMargin,
    "q_right_join" ->
      """SELECT o_orderstatus, COUNT(*) AS n_orders,
        |  COUNT(DISTINCT c_mktsegment) AS n_segments
        |FROM customer RIGHT JOIN orders ON c_custkey = o_custkey
        |GROUP BY o_orderstatus""".stripMargin,
    "q_semi_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment""".stripMargin,
    "q_anti_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_inactive
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment""".stripMargin,
    "q_distinct_agg" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS uv
        |FROM events GROUP BY event_type""".stripMargin,
  )
}
