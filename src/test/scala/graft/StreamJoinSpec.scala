package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY J1/J2 streaming forms: the DWD wide-row stream-stream joins
  * (order_detail ⋈ order_info) with watermarks + a join-time bound standing
  * in for Flink's `table.exec.state.ttl=905s`
  * (reference DwdTradeOrderPreProcess.java:25,141-149). */
object StreamJoinSpec {
  case class Info(id: String, userId: String, infoTs: java.sql.Timestamp)
  case class Detail(detailId: String, orderId: String, amountCents: Long,
                    detTs: java.sql.Timestamp)
}

class StreamJoinSpec extends AnyFunSuite {
  import StreamJoinSpec._
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)

  test("stream-stream inner join joins within the state horizon only") {
    implicit val sqlCtx = spark.sqlContext
    val infos = MemoryStream[Info]
    val details = MemoryStream[Detail]
    val joined = details.toDS()
      .withWatermark("detTs", "5 seconds")
      .join(
        infos.toDS().withWatermark("infoTs", "5 seconds"),
        expr("""orderId = id AND
                detTs BETWEEN infoTs - INTERVAL 30 SECONDS
                          AND infoTs + INTERVAL 30 SECONDS"""))
    val q = joined.writeStream.format("memory").queryName("ssj").start()
    // detail arrives in a LATER batch than its order header (the reference's
    // reason for keyed join state): must still join within the bound
    infos.addData(Info("o1", "u1", ts(100)), Info("o2", "u2", ts(100)))
    q.processAllAvailable()
    details.addData(
      Detail("d1", "o1", 500, ts(110)),   // within 30 s of o1 → joins
      Detail("d2", "o2", 700, ts(160)),   // 60 s after o2 → outside bound
      Detail("d3", "o9", 900, ts(111)))   // no matching header
    q.processAllAvailable()
    val got = spark.table("ssj").select("detailId", "id", "userId")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    q.stop()
    assert(got === Set(("d1", "o1", "u1")))
  }

  test("stream-stream left join pads unmatched details after the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val infos = MemoryStream[Info]
    val details = MemoryStream[Detail]
    val joined = details.toDS()
      .withWatermark("detTs", "0 seconds")
      .join(
        infos.toDS().withWatermark("infoTs", "0 seconds"),
        expr("""orderId = id AND
                detTs BETWEEN infoTs - INTERVAL 10 SECONDS
                          AND infoTs + INTERVAL 10 SECONDS"""),
        "left_outer")
    val q = joined.writeStream.format("memory").queryName("ssj_left").start()
    infos.addData(Info("o1", "u1", ts(100)))
    details.addData(
      Detail("d1", "o1", 500, ts(105)), // matches
      Detail("d2", "oX", 700, ts(105))) // no header → null-padded later
    q.processAllAvailable()
    // advance both watermarks far past the horizon so the unmatched row emits
    infos.addData(Info("zz", "z", ts(1000)))
    details.addData(Detail("dz", "zz", 1, ts(1000)))
    q.processAllAvailable()
    infos.addData(Info("zz2", "z", ts(2000)))
    details.addData(Detail("dz2", "zz2", 1, ts(2000)))
    q.processAllAvailable()
    val rows = spark.table("ssj_left")
      .filter(col("detailId").isin("d1", "d2"))
      .collect().map(r => (r.getAs[String]("detailId"), r.getAs[String]("id")))
      .toSet
    q.stop()
    assert(rows === Set(("d1", "o1"), ("d2", null)),
      s"left join should pad d2 with null after watermark, got $rows")
  }
}
