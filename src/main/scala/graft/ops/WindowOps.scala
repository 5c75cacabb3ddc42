package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sliding_window"  -> slidingWindow _,
    "q_session_window"  -> sessionWindow _,
    "q_right_join"      -> rightJoin _,
    "q_semi_join"       -> semiJoin _,
    "q_anti_join"       -> antiJoin _,
    "q_distinct_agg"    -> distinctViaAggregator _,
  )

  override val oracles: Map[String, String] = Map(
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
