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

  test("dynamic partition pruning: a selective dim filter prunes fact " +
      "partitions at RUNTIME through the join") {
    val dir = java.nio.file.Files.createTempDirectory("pp_dpp").toString
    val orders = Tables.orders(spark, TestSession.sf)
    orders.write.mode("overwrite").partitionBy("o_orderpriority")
      .parquet(dir)
    val nParts = orders.select("o_orderpriority").distinct().count()
    assert(nParts > 1, "degenerate: single-priority orders table")

    // dim carries the filter; the fact side has NO static predicate on
    // its partition column — only DPP can prune it
    import spark.implicits._
    val dim = orders.select(col("o_orderpriority").as("prio"))
      .distinct().withColumn("keep", col("prio").startsWith("1"))
    val fact = spark.read.parquet(dir)
    val joined = fact.join(broadcast(dim.filter(col("keep"))),
      fact("o_orderpriority") === dim("prio"))
    val expected = orders
      .filter(col("o_orderpriority").startsWith("1")).count()
    assert(joined.collect().length === expected)

    // the executed scan must carry a DynamicPruning partition filter and
    // have touched only the surviving partition (descend through the
    // AQE wrappers — the final plan lives inside them, not in children)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case f: FileSourceScanExec => Seq(f)
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case q: QueryStageExec => allScans(q.plan)
    }.flatten
    val scans = allScans(joined.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths
        .exists(_.toString.contains("pp_dpp")))
    assert(scans.nonEmpty, "no fact scan in plan")
    assert(scans.exists(_.partitionFilters.exists(
        _.find(_.isInstanceOf[
          org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression
        ]).isDefined)),
      "fact scan has no DynamicPruning partition filter — DPP not applied")
    val partsRead = scans.map(_.selectedPartitions.partitionCount).sum
    assert(partsRead === 1,
      s"DPP should read 1 of $nParts partitions, read $partsRead")
  }
}
