package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The scale story for the stores claims partition pruning: the DWS/dim
  * stores partition by their filter keys, and the LSH-bucketed embedding
  * table partitions by bucket so an ANN probe reads ONE bucket. These
  * tests materialize exactly those layouts and assert — at the
  * FileSourceScanExec level, not by plan-string grep — that a key filter
  * selects only the matching partition directories. */
class PartitionPruningSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def selectedPartitions(df: org.apache.spark.sql.DataFrame): Int = {
    val scans = df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "no file scan in plan")
    scans.map(_.selectedPartitions.partitionCount).sum
  }

  test("event_type-partitioned store: a type filter reads one partition") {
    val dir = java.nio.file.Files.createTempDirectory("pp_events").toString
    val ev = Tables.events(spark, TestSession.sf)
    ev.write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val nTypes = ev.select("event_type").distinct().count()

    val all = spark.read.parquet(dir)
    val one = all.filter(col("event_type") === "view")
    assert(selectedPartitions(all.filter(lit(true))) === nTypes)
    assert(selectedPartitions(one) === 1)
    // and the pruned read is still correct
    assert(one.count() ===
      ev.filter(col("event_type") === "view").count())
  }

  test("LSH-bucket-partitioned embeddings: a probe reads one bucket") {
    val dir = java.nio.file.Files.createTempDirectory("pp_lsh").toString
    val bucketed = graft.ops.VectorOps.lshBuckets(spark, TestSession.sf)
    bucketed.write.mode("overwrite").partitionBy("bucket").parquet(dir)
    val nBuckets = bucketed.select("bucket").distinct().count()

    val probeBucket = bucketed.filter(col("vec_id") === 0)
      .select("bucket").head().getInt(0)
    val pruned = spark.read.parquet(dir)
      .filter(col("bucket") === probeBucket)
    assert(selectedPartitions(pruned) === 1,
      s"probe should read 1 of $nBuckets bucket partitions")
    assert(pruned.count() ===
      bucketed.filter(col("bucket") === probeBucket).count())
  }
}
