package graft

import graft.ops.Salting
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SaltingSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("salted join result equals plain join result") {
    val li = Tables.lineitem(spark, TestSession.sf)
      .select(col("l_orderkey"), col("l_quantity"))
    val o = Tables.orders(spark, TestSession.sf)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val plain = li.join(o, Seq("l_orderkey"))
      .groupBy("o_orderpriority").agg(sum("l_quantity").as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = Salting.saltedEquiJoin(li, o, "l_orderkey", shards = 7)
      .groupBy("o_orderpriority").agg(sum("l_quantity").as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted === plain)
  }

  test("salted left join keeps unmatched fact rows exactly once") {
    import spark.implicits._
    val facts = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("k", "v")
    val dim = Seq((1L, "x")).toDF("k", "w")
    val out = Salting.saltedEquiJoin(facts, dim, "k", shards = 5, "left")
      .collect()
    assert(out.length === 3) // 2 matched + the k=2 row once, not 5 times
    assert(out.count(_.isNullAt(2)) === 1)
  }

  test("right/full join types are rejected: replication would duplicate " +
      "unmatched rows per shard") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("k", "v")
    Seq("right", "full_outer", "full").foreach { jt =>
      val e = intercept[IllegalArgumentException] {
        Salting.saltedEquiJoin(df, df, "k", shards = 3, jt)
      }
      assert(e.getMessage.contains("per shard"))
    }
  }

  test("AQE skew join: the engine-native alternative to salting splits " +
      "the hot partition at runtime (skew=true in the executed SMJ)") {
    import spark.implicits._
    val conf = spark.conf
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      // shrink the skew thresholds to test-data scale; disable broadcast
      // so the join is a shuffle join AQE can re-plan
      conf.set(keys(0), "-1")
      conf.set(keys(1), "2")
      conf.set(keys(2), "64KB")
      conf.set(keys(3), "32KB")
      val n = 60000L
      val pad = "x" * 64
      // 90% of rows share key 7 — one shuffle partition dwarfs the rest
      val fact = spark.range(n).select(
        when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
        concat(lit(pad), col("id")).as("v"))
      val dim = spark.range(n / 10).select(col("id").as("k"),
        concat(lit(pad), col("id")).as("w"))
      val joined = fact.join(dim, Seq("k"))
      // collect() THIS DataFrame (count() would execute a different
      // query plan and leave joined's adaptive plan unfinalized)
      val got = joined.collect().length
      // hot rows (k=7) all match; a cold row k=10m matches iff 10m < n/10
      val expected = (n - n / 10) + n / 100
      assert(got === expected, s"join row count $got != $expected")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n${plan.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
