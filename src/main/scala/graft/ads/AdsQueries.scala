package graft.ads

import graft.Tables
import graft.ops.QueryModule
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The ADS serving-layer catalog (SURVEY §2.10) re-expressed over the test
  * tables — the ~25 analytic SQL shapes the reference's Spring Boot
  * publisher runs against ClickHouse, each a parameter-free Spark query
  * with a DuckDB oracle.
  *
  * Mapping of the gmall domains onto the star schema:
  *   channel→event_type, keyword corpus→documents, province→nation,
  *   GMV→lineitem revenue, visitor day→event date, sku category→p_type.
  */
object AdsQueries extends QueryModule {

  /** /traffic/uvCt,svCt,pvPerSession analogs + ORDER BY DESC
    * (TrafficChannelStatsMapper.java:11-49): per-channel uv/pv + derived
    * per-uv ratio. */
  def channelStats(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type").as("ch"))
      .agg(countDistinct(col("user_id")).as("uv_ct"),
        count(lit(1)).as("pv_ct"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .withColumn("pv_per_uv", col("pv_ct").cast("double") / col("uv_ct"))

  /** /traffic/keywords (TrafficKeywordsMapper.java:10-21): keyword score =
    * sum of source-weighted hits (`multiIf` → CASE), top-20. */
  def keywordStats(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("lang"), explode(split(col("text"), " ")).as("keyword"))
      .filter(length(col("keyword")) >= 3)
      .groupBy(col("keyword"))
      .agg(sum(when(col("lang") === "en", 10)
          .when(col("lang") === "zh", 8)
          .otherwise(5)).as("score"),
        count(lit(1)).as("hits"))
      .orderBy(col("score").desc, col("keyword").asc)
      .limit(20)

  /** /traffic/visitorPerHr (TrafficVisitorStatsMapper.java:23-31): hourly
    * buckets with conditional sums (`if(is_new='1',uv_ct,0)` analog). */
  def visitorPerHour(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(hour(col("ts")).as("hr"))
      .agg(countDistinct(col("user_id")).as("uv_ct"),
        count(lit(1)).as("pv_ct"),
        sum(when(col("event_type") === "signup", 1).otherwise(0)).as("new_ct"))

  /** /trade/stats (TradeStatsMapper.java:18-37): 4-way UNION ALL of typed
    * metrics incl. count(distinct user). */
  def tradeStats(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    def m(name: String, v: DataFrame): DataFrame =
      v.select(lit(name).as("metric"), col("v"))
    // mixed money/count metrics unify on DOUBLE: the money sum accumulates
    // in exact decimal first; counts are integral so double is exact
    m("order_total_amount",
        o.agg(sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double").as("v")))
      .unionAll(m("order_ct",
        o.agg(count(lit(1)).cast("double").as("v"))))
      .unionAll(m("order_user_ct",
        o.agg(countDistinct(col("o_custkey")).cast("double").as("v"))))
      .unionAll(m("open_order_ct",
        o.filter(col("o_orderstatus") === "O")
          .agg(count(lit(1)).cast("double").as("v"))))
  }

  /** /trade/provinceOrderCt + Amount (TradeStatsMapper.java:39-53):
    * province rollup with null/'' guards — nation as the province analog. */
  def provinceOrders(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .filter(col("n_name").isNotNull && col("n_name") =!= "")
      .groupBy(col("n_name").as("province"))
      .agg(count(lit(1)).as("order_ct"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double").as("order_amount"))

  /** /commodity/spu (CommodityStatsMapper.java:93-120): category key via
    * `split(' ')[0]` (the §2.7 scalar) + top-k GMV per category head. */
  def spuCategoryGmv(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).select("l_partkey", "l_extendedprice")
      .join(broadcast(Tables.part(s, d).select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(element_at(split(col("p_type"), " "), 1).as("category1"))
      .agg(count(lit(1)).as("item_ct"),
        sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("double").as("gmv"))

  /** Legacy /gmv (SkuOrder.java:9): one scalar row. */
  def gmvScalar(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("double").as("gmv"),
        count(lit(1)).as("n_items"))

  /** Day-over-day retention: users active on day d AND d+1 (user-funnel
    * family, UserStatsMapper.java:12-63). */
  def userRetention(s: SparkSession, d: String): DataFrame = {
    val ud = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    ud.as("a").join(ud.as("b"),
        col("a.user_id") === col("b.user_id") &&
        col("b.day") === date_add(col("a.day"), 1))
      .groupBy(date_format(col("a.day"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("retained"))
  }

  /** Sessionization + bounce rate (ujRate, TrafficChannelStatsMapper + the
    * W6 bounce capability as a batch oracle): 30-min-gap sessions per user;
    * a 1-event session is a bounce. */
  def sessionStats(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("ts_s"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_s"), col("event_id"))
    val flagged = e
      .withColumn("prev_s", lag(col("ts_s"), 1).over(w))
      .withColumn("is_start",
        when(col("prev_s").isNull || col("ts_s") - col("prev_s") > 1800, 1)
          .otherwise(0))
    val sess = flagged.withColumn("session_seq",
      sum(col("is_start")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sess.groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("ts_s")) - min(col("ts_s"))).as("dur_s"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1, 1).otherwise(0)).as("n_bounces"),
        sum(col("n_events")).as("total_events"),
        sum(col("dur_s")).as("total_dur_s"))
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ads_channel_stats"  -> channelStats _,
    "q_ads_keyword_stats"  -> keywordStats _,
    "q_ads_visitor_hour"   -> visitorPerHour _,
    "q_ads_trade_stats"    -> tradeStats _,
    "q_ads_province_order" -> provinceOrders _,
    "q_ads_spu_category"   -> spuCategoryGmv _,
    "q_ads_gmv"            -> gmvScalar _,
    "q_ads_user_retention" -> userRetention _,
    "q_ads_session_stats"  -> sessionStats _,
  )

  override val oracles: Map[String, String] = Map(
    "q_ads_channel_stats" ->
      """SELECT event_type AS ch, COUNT(DISTINCT user_id) AS uv_ct,
        |  COUNT(*) AS pv_ct,
        |  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents,
        |  CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT user_id) AS pv_per_uv
        |FROM events GROUP BY event_type""".stripMargin,
    "q_ads_keyword_stats" ->
      """SELECT keyword,
        |  CAST(SUM(CASE WHEN lang='en' THEN 10 WHEN lang='zh' THEN 8 ELSE 5 END) AS BIGINT) AS score,
        |  COUNT(*) AS hits
        |FROM (SELECT lang, UNNEST(string_split(text,' ')) AS keyword FROM documents)
        |WHERE length(keyword) >= 3
        |GROUP BY keyword ORDER BY score DESC, keyword ASC LIMIT 20""".stripMargin,
    "q_ads_visitor_hour" ->
      """SELECT CAST(strftime(ts, '%H') AS INT) AS hr,
        |  COUNT(DISTINCT user_id) AS uv_ct, COUNT(*) AS pv_ct,
        |  CAST(SUM(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS BIGINT) AS new_ct
        |FROM events GROUP BY 1""".stripMargin,
    "q_ads_trade_stats" ->
      """SELECT 'order_total_amount' AS metric,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS v FROM orders
        |UNION ALL SELECT 'order_ct', CAST(COUNT(*) AS DOUBLE) FROM orders
        |UNION ALL SELECT 'order_user_ct', CAST(COUNT(DISTINCT o_custkey) AS DOUBLE) FROM orders
        |UNION ALL SELECT 'open_order_ct', CAST(COUNT(*) AS DOUBLE)
        |  FROM orders WHERE o_orderstatus = 'O'""".stripMargin,
    "q_ads_province_order" ->
      """SELECT n_name AS province, COUNT(*) AS order_ct,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS order_amount
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE n_name IS NOT NULL AND n_name <> ''
        |GROUP BY n_name""".stripMargin,
    "q_ads_spu_category" ->
      """SELECT string_split(p_type, ' ')[1] AS category1,
        |  COUNT(*) AS item_ct,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS gmv
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1""".stripMargin,
    "q_ads_gmv" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS gmv,
        |  COUNT(*) AS n_items FROM lineitem""".stripMargin,
    "q_ads_user_retention" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
        |SELECT strftime(a.day, '%Y-%m-%d') AS day, COUNT(*) AS retained
        |FROM ud a JOIN ud b
        |  ON a.user_id = b.user_id AND b.day = a.day + INTERVAL 1 DAY
        |GROUP BY 1""".stripMargin,
    "q_ads_session_stats" ->
      """WITH e AS (SELECT user_id, event_id,
        |             CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_s FROM events),
        |m AS (SELECT *, LAG(ts_s) OVER
        |        (PARTITION BY user_id ORDER BY ts_s, event_id) AS prev_s FROM e),
        |f AS (SELECT *, CASE WHEN prev_s IS NULL OR ts_s - prev_s > 1800
        |        THEN 1 ELSE 0 END AS is_start FROM m),
        |sq AS (SELECT *, SUM(is_start) OVER
        |        (PARTITION BY user_id ORDER BY ts_s, event_id
        |         ROWS UNBOUNDED PRECEDING) AS session_seq FROM f),
        |g AS (SELECT user_id, session_seq, COUNT(*) AS n_events,
        |        MAX(ts_s) - MIN(ts_s) AS dur_s FROM sq GROUP BY 1, 2)
        |SELECT user_id, COUNT(*) AS n_sessions,
        |  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
        |  CAST(SUM(n_events) AS BIGINT) AS total_events,
        |  CAST(SUM(dur_s) AS BIGINT) AS total_dur_s
        |FROM g GROUP BY user_id""".stripMargin,
  )
}
