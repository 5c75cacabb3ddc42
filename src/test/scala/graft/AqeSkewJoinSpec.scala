package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the ENGINE's automatic skew-join path — `OptimizeSkewedJoin`
  * splitting an oversized shuffle partition at runtime — next to
  * PartitionPruningSpec/CboSpec on the mechanism shelf (VERDICT r12 #5).
  *
  * Why this matters operationally: [[graft.ops.Salting]] covers hot keys
  * you know A PRIORI; the zero-code path a real user hits FIRST on a
  * 100 TB skewed join is AQE noticing one reducer got 50× the median
  * bytes and splitting it into advisory-sized slices (duplicating the
  * matching build-side partition). If that never fires under this repo's
  * session config, every "AQE handles residual skew" note in the
  * scaladocs is an assumption — so this spec plants a skewed join,
  * observes the split marker in the executed plan, and proves the split
  * result equals the unsplit join.
  *
  * Thresholds are test-scaled (the defaults are 256 MB-class): the spec
  * lowers them conf-scoped and RESTORES them in `finally`, the
  * RocksDbStateSpec conf discipline. Broadcast is disabled both
  * statically and adaptively — a broadcast join has no shuffle partition
  * to skew, and SMJ is what production hits at these sizes anyway. */
class AqeSkewJoinSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("OptimizeSkewedJoin splits a planted skewed partition and the " +
      "result equals the unsplit join") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize"
    ).map(k => k -> conf.getOption(k)).toMap
    def restore(): Unit = saved.foreach { case (k, v) =>
      v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
    }
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      conf.set(
        "spark.sql.adaptive.coalescePartitions.minPartitionSize", "1KB")

      // 100k rows, 90% on ONE key, padded with an INCOMPRESSIBLE md5
      // column that the aggregate reads (so it survives pruning and the
      // lz4'd shuffle partition is genuinely megabytes against a
      // kilobyte median). The probe is a GLOBAL aggregate on purpose:
      // a groupBy on the join key would make downstream distribution
      // depend on the join's output partitioning, and OptimizeSkewedJoin
      // (correctly) refuses to split a partition someone downstream
      // relies on — measured in this spec's first cut.
      val left = spark.range(0, 100000)
        .select(
          when(col("id") < 90000, lit(0L)).otherwise(col("id")).as("k"),
          col("id").as("payload"),
          md5(col("id").cast("string")).as("pad"))
      val right = spark.range(0, 1000)
        .select(col("id").as("k"), (col("id") * 10L).as("dim"))
      val joined = left.join(right, "k")
        .agg(count(lit(1)).as("n"), sum(col("payload")).as("chk"),
          sum(length(col("pad"))).as("padlen"))

      val rows = joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(plan.contains("skew=true"),
        s"OptimizeSkewedJoin did not fire (no skew=true marker):\n$plan")

      // correctness of the split: only key 0 matches (hot side ids
      // >= 90000 miss the 0..999 dim) — 90000 rows of payload 0..89999
      assert(rows.length === 1)
      assert(rows.head.getLong(0) === 90000L)
      assert(rows.head.getLong(1) === (0L until 90000L).sum)
      assert(rows.head.getLong(2) === 32L * 90000L)
    } finally restore()
  }
}
