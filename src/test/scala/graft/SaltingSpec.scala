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
}
