package graft.streaming

import org.apache.spark.sql.types._

/** Centralized schemas for the two ingest envelopes (SURVEY §1.2: the
  * reference declares schemas per job as Flink DDL strings / beans; here
  * they are StructType constants shared by batch and streaming paths).
  *
  * Behavior-log shape: reference BaseLogApp.java:119-176 (nested `common`/
  * `page`/`start`/`err` + `displays[]`/`actions[]` arrays, epoch-ms `ts`).
  * CDC envelope: reference MyKafkaUtil.java:88-98 (Maxwell-style
  * database/table/type/ts/data/old with map-typed images).
  */
object LogSchemas {

  val common: StructType = StructType(Seq(
    StructField("mid", StringType),
    StructField("uid", StringType),
    StructField("vc", StringType),
    StructField("ch", StringType),
    StructField("ar", StringType),
    StructField("is_new", StringType),
    StructField("ba", StringType),
    StructField("md", StringType),
    StructField("os", StringType)))

  val page: StructType = StructType(Seq(
    StructField("page_id", StringType),
    StructField("last_page_id", StringType),
    StructField("during_time", LongType),
    StructField("item", StringType),
    StructField("item_type", StringType)))

  val display: StructType = StructType(Seq(
    StructField("display_type", StringType),
    StructField("item", StringType),
    StructField("item_type", StringType),
    StructField("order", IntegerType),
    StructField("pos_id", IntegerType)))

  val action: StructType = StructType(Seq(
    StructField("action_id", StringType),
    StructField("item", StringType),
    StructField("item_type", StringType),
    StructField("ts", LongType)))

  val start: StructType = StructType(Seq(
    StructField("entry", StringType),
    StructField("open_ad_id", IntegerType),
    StructField("loading_time", LongType),
    StructField("open_ad_ms", LongType),
    StructField("open_ad_skip_ms", LongType)))

  val err: StructType = StructType(Seq(
    StructField("error_code", IntegerType),
    StructField("msg", StringType)))

  /** Full behavior-log event. */
  val logEvent: StructType = StructType(Seq(
    StructField("common", common),
    StructField("page", page),
    StructField("displays", ArrayType(display)),
    StructField("actions", ArrayType(action)),
    StructField("start", start),
    StructField("err", err),
    StructField("ts", LongType)))

  /** Maxwell-style CDC envelope (`topic_db`). */
  val cdcEnvelope: StructType = StructType(Seq(
    StructField("database", StringType),
    StructField("table", StringType),
    StructField("type", StringType),
    StructField("ts", LongType),
    StructField("data", MapType(StringType, StringType)),
    StructField("old", MapType(StringType, StringType))))
}
