package graft.ops

import graft.Tables
import graft.streaming.DwsWindows
import org.apache.spark.sql.{DataFrame, SparkSession}

/** DWS-layer queries built on the shared window library
  * ([[graft.streaming.DwsWindows]]) — the same code path the streaming jobs
  * use, verified here in batch mode against DuckDB. */
object DwsOps extends QueryModule {

  /** The per-channel 10 s traffic window with stt/edt bounds — the
    * DwsTrafficVcChArIsNewPageViewWindow-shaped output (FIXTURES.md §4). */
  def trafficWindow(s: SparkSession, d: String): DataFrame =
    DwsWindows.trafficChannelWindow(Tables.events(s, d))

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dws_traffic_window" -> trafficWindow _,
  )

  override val oracles: Map[String, String] = Map(
    "q_dws_traffic_window" ->
      """SELECT
        |  strftime(make_timestamp(CAST(FLOOR(epoch(ts)/10)*10 AS BIGINT)*1000000),
        |           '%Y-%m-%d %H:%M:%S') AS stt,
        |  strftime(make_timestamp((CAST(FLOOR(epoch(ts)/10)*10 AS BIGINT)+10)*1000000),
        |           '%Y-%m-%d %H:%M:%S') AS edt,
        |  event_type,
        |  COUNT(*) AS pv_ct,
        |  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1, 2, 3""".stripMargin,
  )
}
