package graft

import graft.ops.OrderWide
import graft.streaming.CdcOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The full DWD-db chain as ONE running streaming topology — the
  * DwdTradeOrderPreProcess.java:186-188 architecture end-to-end rather
  * than piecewise: raw Maxwell CDC envelope lines → `CdcOps.decode` →
  * table routing/type filters → typed order-detail rows → the
  * `OrderWide.buildWide` join chain (static dim sides) → versioned
  * parquet store → keep-latest dedup → `skuAgg` window, asserted equal to
  * the same chain built in batch. The stream carries a real UPDATE wave
  * (repriced rows under a later CDC ts) and cross-table noise, so the
  * equality also proves latest-version-wins and envelope routing through
  * the whole chain, not just the happy path. Runs on the session-wide
  * RocksDB state store like every streaming spec. */
class DwdChainSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val liCols = Seq("l_orderkey", "l_partkey", "l_suppkey",
    "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax")

  private def subset: DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") % 20 === 0)
      .select(liCols.map(col): _*)

  /** Maxwell-style envelope JSON for each row of `li`. */
  private def cdcLines(li: DataFrame, table: String, typ: String,
                       ts: Long): Seq[String] =
    li.select(to_json(struct(
        lit("gmall").as("database"), lit(table).as("table"),
        lit(typ).as("type"), lit(ts).as("ts"),
        map(liCols.flatMap(c => Seq(lit(c), col(c).cast("string"))): _*)
          .as("data"))))
      .as[String].collect().toSeq

  private def wideOf(lineitem: DataFrame): DataFrame =
    OrderWide.buildWide(
      OrderWide.detailFrom(lineitem),
      OrderWide.info(spark, dir),
      OrderWide.activityFrom(Tables.lineitem(spark, dir)),
      OrderWide.couponFrom(Tables.lineitem(spark, dir)),
      OrderWide.dic(spark, dir))

  test("CDC lines → decode → wide build → keep-latest store → sku " +
      "window ≡ the batch chain, updates winning by version") {
    implicit val sqlCtx = spark.sqlContext
    val wave1 = subset
    // the update wave reprices a third of the rows — visible in the final
    // window sums, so the assertion proves the update VERSION won
    val wave2 = subset.filter(col("l_orderkey") % 3 === 0)
      .withColumn("l_extendedprice", col("l_extendedprice") + 100.0)
    val store = java.nio.file.Files.createTempDirectory("dwdchain").toString

    val in = MemoryStream[String]
    val cdc = CdcOps.decode(in.toDF(), rawCol = "value")
    val detail = CdcOps.tableStream(cdc, "order_detail",
        types = Seq("insert", "update"))
      .select(col("ts") +:
        liCols.map(c => element_at(col("data"), c).as(c)): _*)
      .select(col("ts"),
        col("l_orderkey").cast("long"), col("l_partkey").cast("long"),
        col("l_suppkey").cast("long"), col("l_linenumber").cast("int"),
        col("l_quantity").cast("double"),
        col("l_extendedprice").cast("double"),
        col("l_discount").cast("double"), col("l_tax").cast("double"))
    val q = detail.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // version rows by their envelope ts (a batch may mix CDC waves)
        val tss = batch.select("ts").distinct().collect().map(_.getLong(0))
        tss.sorted.foreach { t =>
          wideOf(batch.filter(col("ts") === t).drop("ts"))
            .withColumn("op_ts", lit(t))
            .write.mode("append").parquet(store)
        }
      }
      .start()
    // wave 1: initial inserts, plus noise the router must drop — another
    // table's rows and a delete type
    in.addData(cdcLines(wave1, "order_detail", "insert", ts = 1L))
    in.addData(cdcLines(wave1.limit(5), "order_info", "insert", ts = 1L))
    q.processAllAvailable()
    // wave 2: repriced updates under a later version + delete-type noise
    in.addData(cdcLines(wave2, "order_detail", "update", ts = 2L))
    in.addData(cdcLines(wave2.limit(5), "order_detail", "delete", ts = 3L))
    q.processAllAvailable()
    q.stop()

    val part = Tables.part(spark, dir)
    val got = OrderWide.skuAgg(
      OrderWide.keepLatestBatch(spark.read.parquet(store)), part)
      .collect().map(_.toString).sorted.toSeq

    val batchStore = wideOf(wave1).withColumn("op_ts", lit(1L))
      .unionAll(wideOf(wave2).withColumn("op_ts", lit(2L)))
    val want = OrderWide.skuAgg(
      OrderWide.keepLatestBatch(batchStore), part)
      .collect().map(_.toString).sorted.toSeq
    assert(got === want)

    // and the updates genuinely flowed: wave-1-only disagrees
    val wave1Only = OrderWide.skuAgg(
      OrderWide.keepLatestBatch(wideOf(wave1).withColumn("op_ts", lit(1L))),
      part).collect().map(_.toString).sorted.toSeq
    assert(got !== wave1Only)
  }

  /** r16 store-probe rewrite invariant: the served q_dwd_order_wide face
    * (a DwdStore.wide scan + output projection) is row- and
    * schema-identical to the raw five-table join it replaced. The DuckDB
    * oracle proves this cross-engine every Verify run; this spec pins it
    * in-engine at test speed so a store-layout drift fails here first. */
  test("q_dwd_order_wide store probe ≡ the raw five-table join") {
    val got = SparkEntry.queries("q_dwd_order_wide")(spark, dir)
    val doubles = Set("split_original_amount", "split_activity_amount",
      "split_coupon_amount", "split_total_amount")
    val raw = OrderWide.buildWide(
        OrderWide.detail(spark, dir), OrderWide.info(spark, dir),
        OrderWide.activity(spark, dir), OrderWide.coupon(spark, dir),
        OrderWide.dic(spark, dir))
      .select(got.columns.toSeq.map { c =>
        if (doubles(c)) col(c).cast("double").as(c) else col(c)
      }: _*)
    assert(got.dtypes.toSeq === raw.dtypes.toSeq)
    assert(got.collect().map(_.toString).sorted.toSeq ===
      raw.collect().map(_.toString).sorted.toSeq)
  }
}
