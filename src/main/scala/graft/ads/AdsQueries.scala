package graft.ads

import graft.Tables
import graft.ops.{DwdStore, OrderWide, QueryModule}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** The same keyword shape through the SQL surface: the registered
    * `graft_tokenize` Generator via LATERAL VIEW — the reference's
    * SplitFunction UDTF + LATERAL TABLE parity (SplitFunction.java:12-27,
    * DwsTrafficSourceKeywordPageViewWindow.java). */
  def keywordLateral(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d).createOrReplaceTempView("documents_sqlv")
    s.sql(
      """SELECT keyword,
        |  CAST(SUM(CASE WHEN lang='en' THEN 10 WHEN lang='zh' THEN 8
        |    ELSE 5 END) AS BIGINT) AS score,
        |  COUNT(*) AS hits
        |FROM documents_sqlv
        |LATERAL VIEW graft_tokenize(text) t AS keyword
        |WHERE length(keyword) >= 3
        |GROUP BY keyword
        |ORDER BY score DESC, keyword ASC
        |LIMIT 20""".stripMargin)
  }

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

  // ── round-2 additions: the remaining ~16 mapper shapes ──────────────

  /** Shared DWS order-window analog (the §2.10 schema-gap fix: the
    * reference's ActivityStatsMapper queries order_activity_reduce_amount /
    * order_origin_total_amount columns its own DWS job never writes — we
    * add them): the MATERIALIZED wide rows are that window's input — one
    * DWD build per run, every consumer scans the store. */
  private def orderWindow(s: SparkSession, d: String): DataFrame =
    DwdStore.wide(s, d)

  private val zero4 = lit(0).cast("decimal(22,4)")

  /** /activity/stats (ActivityStatsMapper.java:10-17): per-window subsidy
    * rate = sum(activity_reduce) / sum(origin_total). */
  def activitySubsidy(s: SparkSession, d: String): DataFrame =
    orderWindow(s, d)
      .groupBy(substring(col("date_id"), 1, 7).as("stt"))
      .agg(
        sum(coalesce(col("split_activity_amount"), zero4))
          .cast("double").as("activity_reduce_amount"),
        sum(col("split_original_amount")).cast("double")
          .as("origin_total_amount"))
      .withColumn("subsidy_rate",
        col("activity_reduce_amount") / col("origin_total_amount"))

  /** /coupon/stats (CouponStatsMapper.java:10-17). */
  def couponSubsidy(s: SparkSession, d: String): DataFrame =
    orderWindow(s, d)
      .groupBy(substring(col("date_id"), 1, 7).as("stt"))
      .agg(
        sum(coalesce(col("split_coupon_amount"), zero4))
          .cast("double").as("coupon_reduce_amount"),
        sum(col("split_original_amount")).cast("double")
          .as("origin_total_amount"))
      .withColumn("coupon_subsidy_rate",
        col("coupon_reduce_amount") / col("origin_total_amount"))

  /** p_type is single-word in the testdata, so the 3-level category
    * hierarchy maps to the natural type → brand → size chain. */
  private def partDims(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(col("p_partkey"),
      col("p_brand").as("trademark"),
      col("p_type").as("category1"),
      col("p_brand").as("category2"),
      col("p_size").cast("string").as("category3"))

  /** Order-side vs refund-side (l_returnflag='R') aggregates joined FULL
    * OUTER per dim key — the CommodityStatsMapper.java:14-91 shape,
    * parameterized by the grouping key list.
    *
    * Computed as ONE conditional aggregation over a single scan (r16,
    * guide §2.4): the two-aggregate + full-outer spelling scanned the
    * fact table and ran the broadcast dim join TWICE, then paid a
    * key-grain join to glue the sides. Refund rows are a SUBSET of the
    * scan, so the outer join degenerates to per-key padding — and
    * `sum(when(isR, …))` reproduces the padding exactly: it is NULL
    * precisely on keys with no refund rows, where the full outer join
    * produced NULLs (never a spurious 0). The oracle keeps the
    * full-outer SQL verbatim, so the hash gate proves the algebra. */
  private def orderVsRefund(s: SparkSession, d: String,
                            keys: Seq[String]): DataFrame = {
    val li = Tables.lineitem(s, d)
      .join(broadcast(partDims(s, d)), col("l_partkey") === col("p_partkey"))
    val isR = col("l_returnflag") === "R"
    li.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("order_count"),
      sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
        .as("order_amount"),
      sum(when(isR, lit(1L))).as("refund_count"),
      sum(when(isR, col("l_extendedprice").cast("decimal(18,2)")))
        .cast("double").as("refund_amount"))
  }

  /** /commodity/trademark (CommodityStatsMapper.java:14-38). */
  def trademarkStats(s: SparkSession, d: String): DataFrame =
    orderVsRefund(s, d, Seq("trademark"))

  /** /commodity/category (CommodityStatsMapper.java:41-91): 3-level
    * category rollup keys. */
  def categoryStats(s: SparkSession, d: String): DataFrame =
    orderVsRefund(s, d, Seq("category1", "category2", "category3"))

  /** /commodity/tmPieGraph (CommodityStatsMapper.java:40-45). */
  def trademarkPie(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(broadcast(partDims(s, d)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("trademark"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double").as("order_amount"))

  /** /commodity/trademark2 (selectGmvByTm, CommodityStatsMapper.java:119):
    * top-k trademarks by GMV, ORDER BY DESC LIMIT. */
  def trademarkTop(s: SparkSession, d: String): DataFrame =
    trademarkPie(s, d)
      .orderBy(col("order_amount").desc, col("trademark").asc)
      .limit(5)

  /** The §2.10 missing window itself:
    * dws_trade_trademark_category_user_spu_order_window — per (trademark,
    * category1, user) order aggregates over the deduped wide rows. */
  def tmCatUserWindow(s: SparkSession, d: String): DataFrame =
    DwdStore.latest(s, d)
      .join(broadcast(partDims(s, d)), col("sku_id") === col("p_partkey"))
      .groupBy(col("trademark"), col("category1"), col("user_id"))
      .agg(countDistinct(col("order_id")).as("order_ct"),
        count(lit(1)).as("item_ct"),
        sum(col("split_total_amount")).cast("double").as("order_amount"))

  /** /user/userChangeCt (UserStatsMapper.java:41-57): 3-way UNION ALL —
    * returning users / active users / new users. backCt uses the true
    * 7-day-gap rule (the DWS formula [[userBack]] aggregates per day;
    * here: distinct users with ≥1 such gap on the login-analog view
    * stream) — round 2 approximated it with ">1 active day". */
  def userChangeCt(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    def m(name: String, v: DataFrame): DataFrame =
      v.select(lit(name).as("type"), col("ct"))
    val days = e.filter(col("event_type") === "view")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val gap = datediff(col("day"),
      lag(col("day"), 1).over(
        Window.partitionBy(col("user_id")).orderBy(col("day"))))
    m("backCt", days.withColumn("gap", gap)
        .filter(col("gap") > 7)
        .agg(countDistinct(col("user_id")).as("ct")))
      .unionAll(m("activeUserCt",
        e.agg(countDistinct(col("user_id")).as("ct"))))
      .unionAll(m("newUserCt",
        e.filter(col("event_type") === "signup")
          .agg(countDistinct(col("user_id")).as("ct"))))
  }

  /** The 7-day back-flow window (DwsUserUserLoginWindow.java:103-117):
    * per user, each first-event-of-a-day is a unique-visit (uuCt); it also
    * counts as a BACK visit when the user's previous active day lies more
    * than 7 days earlier (the `lastLoginDtState` gap check). Batch analog:
    * distinct (user, day) pairs, lag(day) per user, per-day rollup.
    *
    * The reference keys on LOGIN events only (its TODO-3 filter keeps
    * `page = 'login'` / session-start rows, not all traffic) — the `view`
    * stream is that analog here; over ALL events every testdata user is
    * active daily and the metric degenerates to constant zero.
    *
    * Scale: the distinct is a map-side-combining hash agg on (user, day);
    * the lag window repartitions by user_id once — the same keyed-state
    * partitioning the reference's KeyedStream uses. */
  def userBack(s: SparkSession, d: String): DataFrame = {
    val days = Tables.events(s, d)
      .filter(col("event_type") === "view")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val prevDay = lag(col("day"), 1).over(
      Window.partitionBy(col("user_id")).orderBy(col("day")))
    days.withColumn("prev_day", prevDay)
      .groupBy(date_format(col("day"), "yyyy-MM-dd").as("dt"))
      .agg(count(lit(1)).as("uu_ct"),
        sum(when(datediff(col("day"), col("prev_day")) > 7, 1).otherwise(0))
          .cast("long").as("back_ct"))
  }

  /** /user/uvPerPage (UserStatsMapper.java:12-39): the 5-way UNION ALL
    * funnel of per-stage unique users across two source tables. */
  def uvPerPage(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    def stage(name: String): DataFrame =
      e.filter(col("event_type") === name)
        .agg(countDistinct(col("user_id")).as("uv_ct"))
        .select(lit(name).as("page_id"), col("uv_ct"))
    stage("view")
      .unionAll(stage("click"))
      .unionAll(stage("signup"))
      .unionAll(stage("purchase"))
      .unionAll(Tables.orders(s, d)
        .agg(countDistinct(col("o_custkey")).as("uv_ct"))
        .select(lit("trade").as("page_id"), col("uv_ct")))
  }

  /** /user/userTradeCt (UserStatsMapper.java:59-75): order vs payment
    * unique-user funnel ('F' = fulfilled ≈ payment-success). */
  def userTradeCt(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    o.agg(countDistinct(col("o_custkey")).as("ct"))
      .select(lit("order").as("trade_type"), col("ct"))
      .unionAll(o.filter(col("o_orderstatus") === "F")
        .agg(countDistinct(col("o_custkey")).as("ct"))
        .select(lit("payment").as("trade_type"), col("ct")))
  }

  /** /traffic/visitorPerType (TrafficVisitorStatsMapper.java:11-21): new
    * vs returning visitors — is_new = the event falls on the user's first
    * active day. */
  def visitorPerType(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
    val firstDay = e.groupBy(col("user_id"))
      .agg(min(col("day")).as("first_day"))
    e.join(firstDay, Seq("user_id"))
      .withColumn("is_new",
        when(col("day") === col("first_day"), "1").otherwise("0"))
      .groupBy(col("is_new"))
      .agg(countDistinct(col("user_id")).as("uv_ct"),
        count(lit(1)).as("pv_ct"),
        sum(col("value").cast("decimal(18,6)")).cast("double")
          .as("dur_sum"))
  }

  /** /traffic per-channel derived-ratio bundle (TrafficChannelStatsMapper
    * .java:11-49): sessions (30-min gap) attributed to their entry
    * channel; svCt / pvPerSession / durPerSession / ujRate per channel. */
  def channelDerived(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("ts_s"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_s"), col("event_id"))
    val flagged = e
      .withColumn("prev_s", lag(col("ts_s"), 1).over(w))
      .withColumn("is_start",
        when(col("prev_s").isNull || col("ts_s") - col("prev_s") > 1800, 1)
          .otherwise(0))
      .withColumn("session_seq", sum(col("is_start")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val sessions = flagged
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        // exactly one is_start=1 row per session → max picks its channel
        max(when(col("is_start") === 1, col("event_type"))).as("ch"),
        count(lit(1)).as("n_events"),
        (max(col("ts_s")) - min(col("ts_s"))).as("dur_s"))
    sessions.groupBy(col("ch"))
      .agg(count(lit(1)).as("sv_ct"),
        sum(col("n_events")).as("pv_ct"),
        sum(when(col("n_events") === 1, 1).otherwise(0)).cast("long")
          .as("uj_ct"),
        sum(col("dur_s")).as("dur_sum"))
      .withColumn("pv_per_session",
        col("pv_ct").cast("double") / col("sv_ct"))
      .withColumn("dur_per_session",
        col("dur_sum").cast("double") / col("sv_ct"))
      .withColumn("uj_rate", col("uj_ct").cast("double") / col("sv_ct"))
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
    "q_ads_activity_subsidy" -> activitySubsidy _,
    "q_ads_coupon_subsidy"   -> couponSubsidy _,
    "q_ads_trademark_stats"  -> trademarkStats _,
    "q_ads_category_stats"   -> categoryStats _,
    "q_ads_trademark_pie"    -> trademarkPie _,
    "q_ads_trademark_top"    -> trademarkTop _,
    "q_ads_tm_cat_user"      -> tmCatUserWindow _,
    "q_ads_uv_page"          -> uvPerPage _,
    "q_ads_user_change"      -> userChangeCt _,
    "q_ads_user_back"        -> userBack _,
    "q_ads_user_trade"       -> userTradeCt _,
    "q_ads_visitor_type"     -> visitorPerType _,
    "q_ads_channel_derived"  -> channelDerived _,
    "q_ads_keyword_lateral"  -> keywordLateral _,
  )

  private val liDimsSql =
    """WITH li AS (
      |  SELECT l.*, p_brand AS trademark,
      |    p_type AS category1, p_brand AS category2,
      |    CAST(p_size AS VARCHAR) AS category3
      |  FROM lineitem l JOIN part ON l_partkey = p_partkey)""".stripMargin

  private def orderVsRefundSql(keys: String): String =
    liDimsSql +
      s""",
        |o AS (SELECT $keys, COUNT(*) AS order_count,
        |        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |          AS order_amount
        |      FROM li GROUP BY $keys),
        |r AS (SELECT $keys, COUNT(*) AS refund_count,
        |        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |          AS refund_amount
        |      FROM li WHERE l_returnflag = 'R' GROUP BY $keys)
        |SELECT ${keys.split(", ").map(k =>
             s"COALESCE(o.$k, r.$k) AS $k").mkString(", ")},
        |  order_count, order_amount, refund_count, refund_amount
        |FROM o FULL OUTER JOIN r
        |  ON ${keys.split(", ").map(k => s"o.$k = r.$k").mkString(" AND ")}
        |""".stripMargin

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
    "q_ads_keyword_lateral" ->
      """SELECT keyword,
        |  CAST(SUM(CASE WHEN lang='en' THEN 10 WHEN lang='zh' THEN 8 ELSE 5 END) AS BIGINT) AS score,
        |  COUNT(*) AS hits
        |FROM (SELECT lang, UNNEST(string_split(text,' ')) AS keyword FROM documents)
        |WHERE length(keyword) >= 3
        |GROUP BY keyword ORDER BY score DESC, keyword ASC LIMIT 20""".stripMargin,
    "q_ads_activity_subsidy" -> (OrderWide.wideSql +
      """
        |SELECT stt, activity_reduce_amount, origin_total_amount,
        |  activity_reduce_amount / origin_total_amount AS subsidy_rate
        |FROM (
        |  SELECT substr(date_id, 1, 7) AS stt,
        |    CAST(SUM(COALESCE(split_activity_amount,
        |      CAST(0 AS DECIMAL(22,4)))) AS DOUBLE)
        |      AS activity_reduce_amount,
        |    CAST(SUM(split_original_amount) AS DOUBLE)
        |      AS origin_total_amount
        |  FROM wide GROUP BY 1)""".stripMargin),
    "q_ads_coupon_subsidy" -> (OrderWide.wideSql +
      """
        |SELECT stt, coupon_reduce_amount, origin_total_amount,
        |  coupon_reduce_amount / origin_total_amount AS coupon_subsidy_rate
        |FROM (
        |  SELECT substr(date_id, 1, 7) AS stt,
        |    CAST(SUM(COALESCE(split_coupon_amount,
        |      CAST(0 AS DECIMAL(22,4)))) AS DOUBLE)
        |      AS coupon_reduce_amount,
        |    CAST(SUM(split_original_amount) AS DOUBLE)
        |      AS origin_total_amount
        |  FROM wide GROUP BY 1)""".stripMargin),
    "q_ads_trademark_stats" -> orderVsRefundSql("trademark"),
    "q_ads_category_stats" ->
      orderVsRefundSql("category1, category2, category3"),
    "q_ads_trademark_pie" -> (liDimsSql +
      """
        |SELECT trademark,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS order_amount
        |FROM li GROUP BY trademark""".stripMargin),
    "q_ads_trademark_top" -> (liDimsSql +
      """
        |SELECT trademark,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS order_amount
        |FROM li GROUP BY trademark
        |ORDER BY order_amount DESC, trademark ASC LIMIT 5""".stripMargin),
    "q_ads_tm_cat_user" -> (OrderWide.wideSql + OrderWide.latestSql +
      """
        |SELECT p_brand AS trademark,
        |  string_split(p_type, ' ')[1] AS category1, user_id,
        |  COUNT(DISTINCT order_id) AS order_ct, COUNT(*) AS item_ct,
        |  CAST(SUM(split_total_amount) AS DOUBLE) AS order_amount
        |FROM latest JOIN part ON sku_id = p_partkey
        |GROUP BY 1, 2, 3""".stripMargin),
    "q_ads_uv_page" ->
      """SELECT 'view' AS page_id, COUNT(DISTINCT user_id) AS uv_ct
        |FROM events WHERE event_type = 'view'
        |UNION ALL
        |SELECT 'click', COUNT(DISTINCT user_id) FROM events
        |WHERE event_type = 'click'
        |UNION ALL
        |SELECT 'signup', COUNT(DISTINCT user_id) FROM events
        |WHERE event_type = 'signup'
        |UNION ALL
        |SELECT 'purchase', COUNT(DISTINCT user_id) FROM events
        |WHERE event_type = 'purchase'
        |UNION ALL
        |SELECT 'trade', COUNT(DISTINCT o_custkey) FROM orders""".stripMargin,
    "q_ads_user_change" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |  WHERE event_type = 'view'),
        |wp AS (
        |  SELECT user_id,
        |    date_diff('day',
        |      LAG(day) OVER (PARTITION BY user_id ORDER BY day), day) AS gap
        |  FROM days)
        |SELECT 'backCt' AS type, COUNT(DISTINCT user_id) AS ct
        |FROM wp WHERE gap > 7
        |UNION ALL
        |SELECT 'activeUserCt', COUNT(DISTINCT user_id) FROM events
        |UNION ALL
        |SELECT 'newUserCt', COUNT(DISTINCT user_id) FROM events
        |WHERE event_type = 'signup'""".stripMargin,
    "q_ads_user_back" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |  WHERE event_type = 'view'),
        |wp AS (
        |  SELECT user_id, day,
        |    LAG(day) OVER (PARTITION BY user_id ORDER BY day) AS prev_day
        |  FROM days)
        |SELECT strftime(day, '%Y-%m-%d') AS dt, COUNT(*) AS uu_ct,
        |  CAST(SUM(CASE WHEN date_diff('day', prev_day, day) > 7
        |    THEN 1 ELSE 0 END) AS BIGINT) AS back_ct
        |FROM wp GROUP BY 1""".stripMargin,
    "q_ads_user_trade" ->
      """SELECT 'order' AS trade_type, COUNT(DISTINCT o_custkey) AS ct
        |FROM orders
        |UNION ALL
        |SELECT 'payment', COUNT(DISTINCT o_custkey) FROM orders
        |WHERE o_orderstatus = 'F'""".stripMargin,
    "q_ads_visitor_type" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day, value
        |           FROM events),
        |f AS (SELECT user_id, MIN(day) AS first_day FROM e GROUP BY 1)
        |SELECT CASE WHEN day = first_day THEN '1' ELSE '0' END AS is_new,
        |  COUNT(DISTINCT user_id) AS uv_ct, COUNT(*) AS pv_ct,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS dur_sum
        |FROM e JOIN f USING (user_id) GROUP BY 1""".stripMargin,
    "q_ads_channel_derived" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |             CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_s FROM events),
        |m AS (SELECT *, LAG(ts_s) OVER
        |        (PARTITION BY user_id ORDER BY ts_s, event_id) AS prev_s
        |      FROM e),
        |f AS (SELECT *, CASE WHEN prev_s IS NULL OR ts_s - prev_s > 1800
        |        THEN 1 ELSE 0 END AS is_start FROM m),
        |sq AS (SELECT *, SUM(is_start) OVER
        |        (PARTITION BY user_id ORDER BY ts_s, event_id
        |         ROWS UNBOUNDED PRECEDING) AS session_seq FROM f),
        |g AS (SELECT user_id, session_seq,
        |        MAX(CASE WHEN is_start = 1 THEN event_type END) AS ch,
        |        COUNT(*) AS n_events,
        |        MAX(ts_s) - MIN(ts_s) AS dur_s FROM sq GROUP BY 1, 2)
        |SELECT ch, COUNT(*) AS sv_ct,
        |  CAST(SUM(n_events) AS BIGINT) AS pv_ct,
        |  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS uj_ct,
        |  CAST(SUM(dur_s) AS BIGINT) AS dur_sum,
        |  CAST(SUM(n_events) AS DOUBLE) / COUNT(*) AS pv_per_session,
        |  CAST(SUM(dur_s) AS DOUBLE) / COUNT(*) AS dur_per_session,
        |  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(*) AS uj_rate
        |FROM g GROUP BY ch""".stripMargin,
  )
}
