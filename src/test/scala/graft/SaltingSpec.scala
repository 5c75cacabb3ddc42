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
}
