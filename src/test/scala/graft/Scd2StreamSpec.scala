package graft

import graft.ops.OrderWide
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SCD2 fold driven as a STREAM over the DWD changelog — the r7/r8
  * open ask: Scd2Spec proves `applyBatch` ≡ rebuild on random logs and
  * `q_scd2_incremental` shares `q_scd2_history`'s oracle for one cutoff;
  * this spec runs the operational loop — the wide changelog arrives in
  * micro-batches (a parquet FILE STREAM, one wave slice per file, so rows
  * flow with the real wide schema), each batch folds into the on-disk
  * history store via [[OrderWide.scd2Refresh]] (read → applyBatch →
  * overwrite, split by op_ts inside a mixed batch per the monotone-ingest
  * contract), and the maintained store must equal the one-shot rebuild
  * over everything ingested. Wave 1 is deliberately split across TWO
  * micro-batches by detail_id (uneven key slices — legal: the contract
  * binds (key, seq) pairs to one batch, not whole waves), and the wave-2
  * update slice proves close-out + append on a store that already has
  * open intervals. Runs on the session-wide RocksDB state store like
  * every streaming spec. */
class Scd2StreamSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def wideSubset: DataFrame =
    OrderWide.buildWide(
      OrderWide.detailFrom(Tables.lineitem(spark, TestSession.sf)
        .filter(col("l_orderkey") % 20 === 0)),
      OrderWide.info(spark, TestSession.sf),
      OrderWide.activityFrom(Tables.lineitem(spark, TestSession.sf)),
      OrderWide.couponFrom(Tables.lineitem(spark, TestSession.sf)),
      OrderWide.dic(spark, TestSession.sf))

  test("foreachBatch scd2Refresh over the wide changelog stream equals " +
      "the one-shot rebuild, update wave included") {
    val log = OrderWide.versions(wideSubset).localCheckpoint()
    val srcDir = java.nio.file.Files.createTempDirectory("scd2src").toString
    val histDir = java.nio.file.Files
      .createTempDirectory("scd2hist").toString + "/hist"

    val stream = spark.readStream.schema(log.schema).parquet(srcDir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // a micro-batch may mix CDC waves; fold strictly seq-ascending
        val tss = batch.select("op_ts").distinct()
          .collect().map(_.getLong(0)).sorted
        tss.foreach { t =>
          OrderWide.scd2Refresh(spark, histDir,
            batch.filter(col("op_ts") === t))
        }
      }
      .start()
    // wave 1 split by key across two micro-batches, then the update wave
    Seq(log.filter(col("op_ts") === 1L && col("detail_id") % 3 =!= 0),
        log.filter(col("op_ts") === 1L && col("detail_id") % 3 === 0),
        log.filter(col("op_ts") === 2L)).foreach { slice =>
      slice.coalesce(1).write.mode("append").parquet(srcDir)
      q.processAllAvailable()
    }
    q.stop()

    def sorted(df: DataFrame): Seq[String] = {
      val cols = df.columns.sorted.map(col)
      df.select(cols.toIndexedSeq: _*).collect().map(_.toString).sorted.toSeq
    }
    val maintained = sorted(spark.read.parquet(histDir))
    val rebuilt = sorted(OrderWide.scd2RebuildOf(log))
    assert(maintained === rebuilt,
      "maintained SCD2 store diverged from the one-shot rebuild")
    // and the update wave genuinely flowed: wave-1-only disagrees
    val wave1Only = sorted(
      OrderWide.scd2RebuildOf(log.filter(col("op_ts") === 1L)))
    assert(maintained !== wave1Only)
  }
}
