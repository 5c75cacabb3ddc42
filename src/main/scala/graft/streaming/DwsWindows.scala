package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The DWS window-aggregation library (SURVEY A1/A2/W1/W2): ONE
  * parameterized transform standing in for the reference's 12 copy-paste
  * window jobs (DwsTrafficVcChArIsNewPageViewWindow etc.). Batch-first,
  * streaming-second: the same function runs identically over a bounded
  * DataFrame (DuckDB-checkable) and a stream (add `watermark`, write with
  * foreachBatch) — the key idiom divergence from the per-job Flink code.
  *
  * Output carries `stt`/`edt` window bounds like the reference's DWS store
  * schemas (FIXTURES.md §4); the wall-clock `ts` column the reference adds
  * at window close is intentionally absent (non-deterministic, BASELINE.md
  * caveat).
  */
object DwsWindows {

  /** Tumbling event-time window agg.
    * @param watermark out-of-orderness bound, e.g. Some("2 seconds") for
    *                  streaming inputs; None for batch. */
  def tumblingAgg(df: DataFrame, tsCol: String, windowLength: String,
                  keys: Seq[Column], aggs: Seq[Column],
                  watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(df)(w => df.withWatermark(tsCol, w))
    val agged = src.groupBy(window(col(tsCol), windowLength) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
    val rest = agged.columns.filter(_ != "window").map(col)
    agged.select(
      (Seq(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
        date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("edt")) ++
        rest): _*)
  }

  /** The per-channel traffic page-view window
    * (DwsTrafficVcChArIsNewPageViewWindow analog over the events table). */
  def trafficChannelWindow(events: DataFrame,
                           watermark: Option[String] = None): DataFrame =
    tumblingAgg(events, "ts", "10 seconds",
      keys = Seq(col("event_type")),
      aggs = Seq(count(lit(1)).as("pv_ct"),
        sum(round(col("value") * 100).cast("long")).as("value_cents")),
      watermark = watermark)
}
