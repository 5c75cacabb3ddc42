package graft

import org.apache.spark.sql.{Observation, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins Spark's `observe()` mechanism — data-quality counters that ride
  * the query itself (the Flink-metrics / Deequ-inline analog): metrics
  * are computed BY the running plan, so the audited scan is the
  * production scan, not a second pass (contrast `q_dq_checks`, which
  * pays dedicated table passes). Both faces are pinned:
  * batch (`Observation`) and streaming (observed metrics surfaced in the
  * progress events — the monitoring feed a 100 TB pipeline alarms on). */
class ObserveSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("batch: observed DQ counters equal direct aggregation, computed " +
      "by the same job") {
    val obs = Observation("dq")
    val df = Tables.orders(spark, TestSession.sf)
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L))
          .as("nonpositive_price"),
        // DISTINCT aggregates are rejected in observed metrics
        // (INVALID_OBSERVED_METRICS, measured) — cardinality watchers
        // must use a sketch (approx_count_distinct) or a dedicated pass
        max(col("o_totalprice")).as("max_price"))
      .filter(col("o_orderpriority").isNotNull)
    val consumed = df.count() // one action drives both result and metrics
    val m = obs.get
    assert(m("n_rows").asInstanceOf[Long] > 0)
    assert(consumed <= m("n_rows").asInstanceOf[Long],
      "metrics observe the pre-filter stream this plan wired them above")
    val direct = Tables.orders(spark, TestSession.sf).agg(
      count(lit(1)), sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)),
      max(col("o_totalprice"))).head()
    assert(m("n_rows") === direct.getLong(0))
    assert(m("nonpositive_price") === direct.getLong(1))
    assert(m("max_price") === direct.getDouble(2))
  }

  test("streaming: observed metrics surface per micro-batch in query " +
      "progress") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Double)]
    @volatile var seen = Vector.empty[(Long, Long)]
    val q = in.toDS().toDF("id", "price")
      .observe("dq",
        count(lit(1)).as("n_rows"),
        sum(when(col("price") <= 0, 1L).otherwise(0L)).as("bad_price"))
      .writeStream.format("noop").start()
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener
            .QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener
            .QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener
            .QueryProgressEvent): Unit = {
        val om = e.progress.observedMetrics
        if (om.containsKey("dq")) {
          val r: Row = om.get("dq")
          seen = seen :+ ((r.getAs[Long]("n_rows"), r.getAs[Long]("bad_price")))
        }
      }
    }
    spark.streams.addListener(listener)
    try {
      in.addData(Seq((1L, 10.0), (2L, -1.0), (3L, 5.0)))
      q.processAllAvailable()
      in.addData(Seq((4L, -2.0), (5L, -3.0)))
      q.processAllAvailable()
      // listener events are async; progress is pushed on the bus
      val deadline = System.currentTimeMillis() + 20000
      while (seen.size < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(seen.contains((3L, 1L)),
        s"batch-1 metrics (3 rows, 1 bad) not observed: $seen")
      assert(seen.contains((2L, 2L)),
        s"batch-2 metrics (2 rows, 2 bad) not observed: $seen")
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }
  }
}
