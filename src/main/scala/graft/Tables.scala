package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All readers go through `spark.read.parquet` so Catalyst keeps full
  * pushdown/pruning freedom: a downstream `.select`/`.filter` reaches the
  * parquet scan as `ReadSchema`/`PushedFilters`. At 100 TB these would be
  * partitioned/bucketed table paths; the API surface stays the same.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` has shipped as BOTH parquet TIMESTAMP(NANOS) (earlier
    * driver rounds; with `spark.sql.legacy.parquet.nanosAsLong=true` set
    * by [[GraftSession]] it reads as LongType nanos) and TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) (regenerated round-6 data; Spark reads it as
    * TIMESTAMP_NTZ). Normalize BOTH to TimestampType here so every
    * consumer sees one type: the NTZ→TZ cast re-interprets the wall time
    * in the session zone, which GraftSession pins to UTC — exactly how
    * the DuckDB oracle treats the same naive micros. Functions like
    * `unix_micros` reject NTZ input, so skipping this cast breaks
    * downstream queries (q_session_window caught it when the round-6
    * regeneration landed). */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
