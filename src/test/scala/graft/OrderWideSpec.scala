package graft

import graft.ops.OrderWide
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The composed DWD→DWS order pipeline driven as a real stream: the same
  * `buildWide` composition that the oracle checks in batch runs over a
  * MemoryStream of order-detail rows (the reference's Kafka topic), joined
  * against the static dim sides, across multiple micro-batches. */
object OrderWideSpec {
  case class LineRow(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
      l_linenumber: Int, l_quantity: Double, l_extendedprice: Double,
      l_discount: Double, l_tax: Double)
}

class OrderWideSpec extends AnyFunSuite {
  import OrderWideSpec.LineRow
  lazy val spark = TestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def subset: DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") % 20 === 0)
      .select($"l_orderkey", $"l_partkey", $"l_suppkey", $"l_linenumber",
        $"l_quantity", $"l_extendedprice", $"l_discount", $"l_tax")

  private def wideOf(lineitem: DataFrame): DataFrame =
    OrderWide.buildWide(
      OrderWide.detailFrom(lineitem),
      OrderWide.info(spark, dir),
      OrderWide.activityFrom(Tables.lineitem(spark, dir)),
      OrderWide.couponFrom(Tables.lineitem(spark, dir)),
      OrderWide.dic(spark, dir))

  private def sortedStrings(rows: Seq[Row]): Seq[String] =
    rows.map(_.toString).sorted

  test("DWD wide join: streamed micro-batches ≡ batch composition") {
    implicit val sqlCtx = spark.sqlContext
    val rows = subset.as[LineRow].collect().toSeq
    assert(rows.size > 50)

    val in = MemoryStream[LineRow]
    val got = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = wideOf(in.toDF()).writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        got.synchronized { got ++= batch.collect() }: Unit
      }
      .start()
    // three micro-batches, split arbitrarily
    val (a, rest) = rows.splitAt(rows.size / 3)
    val (b, c) = rest.splitAt(rest.size / 2)
    Seq(a, b, c).foreach { part =>
      in.addData(part)
      q.processAllAvailable()
    }
    q.stop()

    val want = wideOf(subset).collect().toSeq
    assert(sortedStrings(got.toSeq) === sortedStrings(want))
  }

  test("composed chain: keep-latest store makes re-delivery idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val rows = subset.as[LineRow].collect().toSeq
    val store = java.nio.file.Files.createTempDirectory("widestore").toString

    val in = MemoryStream[LineRow]
    val q = in.toDF().writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        wideOf(batch).withColumn("op_ts", lit(id + 1))
          .write.mode("append").parquet(store)
      }
      .start()
    in.addData(rows); q.processAllAvailable()
    in.addData(rows); q.processAllAvailable() // CDC re-delivery
    q.stop()

    val part = Tables.part(spark, dir)
    val gotDf = OrderWide.skuAgg(
      OrderWide.keepLatestBatch(spark.read.parquet(store)), part)
    val wantDf = OrderWide.skuAgg(
      OrderWide.keepLatestBatch(
        wideOf(subset).withColumn("op_ts", lit(1L))), part)
    assert(sortedStrings(gotDf.collect().toSeq) ===
      sortedStrings(wantDf.collect().toSeq))
  }

  test("SCD2 history: chains are contiguous, exactly one current version " +
      "per key, and the chain heads equal the keep-latest store") {
    val hist = OrderWide.scd2History(spark, dir).localCheckpoint()

    // exactly one open-ended (current) version per detail_id
    val multiCurrent = hist.filter(col("is_current") === 1)
      .groupBy("detail_id").count().filter(col("count") =!= 1)
    assert(multiCurrent.isEmpty, "a key with != 1 current version")
    assert(hist.filter(col("is_current") === 1).count() ===
      hist.select("detail_id").distinct().count())

    // interval contiguity: seq k's effective_to = seq k+1's effective_from
    val a = hist.select(col("detail_id"), col("version_seq"),
      col("effective_to"))
    val b = hist.select(col("detail_id"),
      (col("version_seq") - 1).as("version_seq"),
      col("effective_from").as("next_from"))
    val broken = a.join(b, Seq("detail_id", "version_seq"))
      .filter(col("effective_to") =!= col("next_from") ||
        col("effective_to").isNull)
    assert(broken.isEmpty, "a non-contiguous validity chain")

    // the current version of every chain is exactly what keep-latest keeps
    val heads = hist.filter(col("is_current") === 1)
      .select(col("detail_id"), col("order_status"),
        col("split_total_amount"))
    val latest = OrderWide.keepLatestBatch(
        OrderWide.versions(graft.ops.DwdStore.wide(spark, dir)))
      .select(col("detail_id"), col("order_status"),
        col("split_total_amount").cast("double").as("split_total_amount"))
    assert(heads.exceptAll(latest).isEmpty &&
      latest.exceptAll(heads).isEmpty,
      "SCD2 chain heads diverge from the keep-latest serving view")
  }
}
