package graft

import graft.streaming.DwsWindows
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Batch ≡ streaming equivalence for the DWS window library: the same
  * transform over the same rows must produce identical window aggregates
  * whether executed as a bounded DataFrame or fed through a MemoryStream
  * with a watermark (all data on time ⇒ no drops). */
class DwsWindowSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("trafficChannelWindow: batch and streaming agree") {
    val batchIn = Tables.events(spark, TestSession.sf).limit(500)
      .select(col("ts"), col("event_type"), col("value")).cache()
    val expected = DwsWindows.trafficChannelWindow(batchIn)
      .collect().map(_.toSeq).toSet

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String, Double)]
    val streamDf = in.toDF().toDF("ts", "event_type", "value")
    val q = DwsWindows.trafficChannelWindow(streamDf, watermark = Some("2 seconds"))
      .writeStream.format("memory").queryName("dws_tw")
      .outputMode(OutputMode.Append).start()
    val rows = batchIn.collect().map(r =>
      (r.getTimestamp(0), r.getString(1), r.getDouble(2)))
    in.addData(rows.toSeq)
    q.processAllAvailable()
    // push the watermark beyond every window so all finals are emitted
    in.addData((java.sql.Timestamp.from(java.time.Instant.parse("2030-01-01T00:00:00Z")),
      "flush", 0.0))
    q.processAllAvailable()
    val got = spark.table("dws_tw")
      .filter(col("event_type") =!= "flush")
      .collect().map(_.toSeq).toSet
    q.stop()
    assert(got === expected)
  }

  test("drop-late default: a window agg ignores events behind the watermark") {
    // SURVEY W3 — the reference relies on Flink's drop-late default; the
    // Spark equivalent is watermark-based finalization: an event arriving
    // after the watermark passed its window must not resurrect it
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String, Double)]
    val streamDf = in.toDF().toDF("ts", "event_type", "value")
    val q = DwsWindows.trafficChannelWindow(streamDf, watermark = Some("2 seconds"))
      .writeStream.format("memory").queryName("dws_late")
      .outputMode(OutputMode.Append).start()
    def ts(sec: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    in.addData((ts(100), "on_time", 1.0))
    q.processAllAvailable()
    in.addData((ts(200), "advance", 1.0)) // watermark → 198 s
    q.processAllAvailable()
    in.addData((ts(50), "too_late", 1.0)) // behind the watermark → dropped
    q.processAllAvailable()
    in.addData((ts(10000), "flush", 1.0)) // finalize everything live
    q.processAllAvailable()
    val types = spark.table("dws_late")
      .select("event_type").collect().map(_.getString(0)).toSet
    q.stop()
    assert(types.contains("on_time") && types.contains("advance"))
    assert(!types.contains("too_late"), "late event resurrected a closed window")
  }

  test("native session_window: batch and streaming agree") {
    // the merging-session-state path (W4): same transform, bounded vs
    // watermark-append streaming — finalized sessions must be identical
    def sessions(df: org.apache.spark.sql.DataFrame,
                 watermark: Option[String]): org.apache.spark.sql.DataFrame = {
      val src = watermark.fold(df)(w => df.withWatermark("ts", w))
      src.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("sess_start_us"),
          col("n_events"))
    }
    val batchIn = Tables.events(spark, TestSession.sf)
      .filter(col("user_id") < 10)
      .select(col("ts"), col("user_id")).cache()
    val expected = sessions(batchIn, None).collect().map(_.toSeq).toSet

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Long)]
    val q = sessions(in.toDF().toDF("ts", "user_id"), Some("2 seconds"))
      .writeStream.format("memory").queryName("dws_sess")
      .outputMode(OutputMode.Append).start()
    in.addData(batchIn.collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSeq)
    q.processAllAvailable()
    // watermark far past every session end → all sessions finalize
    in.addData((java.sql.Timestamp.from(
      java.time.Instant.parse("2030-01-01T00:00:00Z")), 99999L))
    q.processAllAvailable()
    val got = spark.table("dws_sess")
      .filter(col("user_id") =!= 99999L)
      .collect().map(_.toSeq).toSet
    q.stop()
    assert(got === expected)
  }
}
