package graft

import graft.ops.{BucketStore, Relational}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The whole point of [[BucketStore]] is the PLAN, not just the numbers:
  * an orderkey equi-join of the two bucketed tables must execute as a
  * SortMergeJoin with NO shuffle exchange and NO explicit sort on either
  * side — the bucketed scan's HashPartitioning + one-sorted-file-per-
  * bucket layout satisfies the join's required distribution and ordering.
  * This spec pins that, plus result-equality against the plain-parquet
  * join (the oracle-level proof is the shared DuckDB SQL; this is the
  * faster in-JVM version of the same claim). */
class BucketJoinSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // materialize so AQE's FINAL plan is what we read
    df.queryExecution.executedPlan.toString
  }

  test("bucketed orderkey join runs with zero shuffle and zero sort") {
    val joined = BucketStore.lineitem(spark, sf).hint("merge")
      .select(col("l_orderkey"), col("l_extendedprice"))
      .join(BucketStore.orders(spark, sf).hint("merge")
          .select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
    val plan = executedPlan(joined)
    assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
    assert(!plan.contains("ShuffleExchange"),
      s"bucketed join must not shuffle:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not re-exchange:\n$plan")
    // one sorted file per bucket (pre-repartitioned write) ⇒ the scan
    // satisfies the SMJ's ordering requirement; no Sort node
    assert(!plan.contains("Sort "),
      s"bucketed+sorted scan should satisfy SMJ ordering:\n$plan")
  }

  test("bucketed basket self-join: the only exchange is the pair-grain " +
      "count, never the orderkey; result equals the plain spine") {
    val df = Relational.basketPairsBucketed(spark, sf)
    val plan = executedPlan(df)
    // the distinct and the items^2 self-join both ride the scan's
    // HashPartitioning(l_orderkey); what remains is the inherent
    // (p1, p2) support count (+ AQE reading its output) — no exchange
    // may hash the orderkey
    val exchanges = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.nonEmpty, s"pair-grain count must exchange:\n$plan")
    exchanges.foreach { e =>
      assert(!e.contains("ok#") && !e.contains("l_orderkey"),
        s"orderkey exchange survived bucketing: $e\n$plan")
      assert(e.contains("p1#") || e.contains("pk#"),
        s"unexpected exchange: $e\n$plan")
    }
    val a = Relational.basketPairs(spark, sf).collect().toSeq
    val b = df.collect().toSeq
    assert(a == b, "bucketed basket spine diverged from the plain one")
  }

  test("bucketed rewrite equals the plain-parquet join result") {
    val a = Relational.revenueByPriority(spark, sf)
      .orderBy("o_orderpriority").collect().toSeq
    val b = Relational.revenueByPriorityBucketed(spark, sf)
      .orderBy("o_orderpriority").collect().toSeq
    assert(a == b)
  }

  test("bucketed tables hold one file per bucket") {
    // the sort-elimination above is only sound when each bucket is a
    // single file; pin the writer's repartition-before-bucketBy contract
    BucketStore.lineitem(spark, sf) // ensure built
    val tbl = spark.catalog.listTables()
      .filter(col("name").startsWith("lineitem_bkt")).collect().head.name
    val loc = spark.sql(s"DESCRIBE FORMATTED $tbl")
      .filter(col("col_name") === "Location")
      .collect().head.getString(1)
    val dir = new java.io.File(new java.net.URI(loc))
    val parts = dir.listFiles().count(_.getName.endsWith(".parquet"))
    assert(parts == BucketStore.NBuckets,
      s"expected ${BucketStore.NBuckets} bucket files, found $parts in $dir")
  }

  test("bucketed per-key aggregation runs with ZERO exchanges; the plain " +
      "variant pays one") {
    val bucketed = Relational.orderLineStatsBucketed(spark, sf)
    val planB = executedPlan(bucketed)
    assert(!planB.contains("Exchange"),
      s"bucket-key groupBy must be exchange-free:\n$planB")

    val plain = Relational.orderLineStats(spark, sf)
    val planP = executedPlan(plain)
    assert(planP.contains("Exchange"),
      "baseline lost its exchange — the comparison is vacuous")

    val a = bucketed.orderBy("l_orderkey").collect().toSeq
    val b = plain.orderBy("l_orderkey").collect().toSeq
    assert(a == b)
  }
}
