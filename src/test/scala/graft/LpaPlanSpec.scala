package graft

import graft.ops.Relational
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The co-partitioned LPA face ([[Relational.lpaIterateCopart]]) exists
  * for ONE reason: at 100 TB the label frame is vertex-grain and outgrows
  * broadcast long before the edge list stops fitting the cluster (VERDICT
  * r12 #1). So the mechanism itself is what this spec pins, the
  * BucketJoinSpec way: the executed round plan must contain NO broadcast
  * of the label frame — every round join is a ShuffledHashJoin whose
  * exchanges move only node-grain frames, and the checkpointed edge list
  * is never re-exchanged (its one up-front co-partitioning satisfies all
  * `rounds` joins). Output-equality with the broadcast face is proven
  * three ways: the hand-traced barbell here, whole-result equality on
  * testdata here, and the VERBATIM shared DuckDB oracle at the gate. */
class LpaPlanSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  test("copart face: barbell hand-trace and equality with the " +
      "broadcast face") {
    import spark.implicits._
    val barbell = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L)).toDF("p1", "p2")
    val bc = Relational.lpaIterate(barbell, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cp = Relational.lpaIterateCopart(barbell, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cp === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 3L, 11L -> 3L, 12L -> 3L),
      s"copart synchronous LPA trace diverged: $cp")
    assert(bc === cp, "broadcast and copart faces disagree on the barbell")
  }

  test("copart rounds never broadcast the label frame and never " +
      "re-exchange the co-partitioned edges") {
    import spark.implicits._
    val rounds = 3
    // a graph big enough to have real partitions but trivially
    // broadcast-SIZED — which is the point: only the shuffle_hash hint
    // stands between this plan and an AQE broadcast demotion, and the
    // hint must hold or the beyond-broadcast mechanism isn't real
    val pairs = (1 to 400)
      .map(i => (i.toLong, 1000L + (i % 97).toLong)).toDF("p1", "p2")
    val n = spark.sessionState.conf.numShufflePartitions
    val e = pairs.select(col("p1").as("v"), col("p2").as("u"))
      .unionAll(pairs.select(col("p2").as("v"), col("p1").as("u")))
      .repartition(n, col("u"))
      .persist()
    e.count()
    try {
      val out = Relational.lpaRoundsCopart(e, rounds)
      out.collect() // materialize so AQE's FINAL plan is what we read
      // assert on the final section only — the "== Initial Plan ==" tail
      // repeats every exchange under pre-AQE plan_ids
      val plan = out.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(plan.contains("ShuffledHashJoin"),
        s"round joins must be shuffled-hash:\n$plan")
      assert(!plan.contains("BroadcastExchange"),
        s"label frame must never broadcast:\n$plan")
      assert(!plan.contains("BroadcastHashJoin"),
        s"label frame must never broadcast:\n$plan")
      // the cached edges are read AS partitioned: an Exchange directly
      // above the cache scan means the co-partitioning was lost and
      // every round re-exchanges edge-grain data (exactly what a
      // localCheckpoint edge frame did in this spec's first cut —
      // LogicalRDD reports UnknownPartitioning under AQE)
      val lines = plan.linesIterator.toVector
      lines.zipWithIndex.foreach { case (l, i) =>
        // an Exchange whose DIRECT child is the cache stage is a
        // re-exchange of the full edge list (the vertex distinct also
        // exchanges above a cache read, but through its partial
        // aggregate — node-grain, legitimate)
        if (l.contains("Exchange hashpartitioning"))
          assert(!lines.slice(i + 1, i + 2).exists(x =>
              x.contains("TableCacheQueryStage") ||
                x.contains("InMemoryTableScan") ||
                x.contains("Scan ExistingRDD")),
            s"edge list re-exchanged at plan line $i:\n$plan")
      }
      // exchange budget (unique plan_ids — the cache build's one-time
      // exchange reprints inside every InMemoryRelation occurrence):
      // 1 cache co-partitioning + 1 initial vertex distinct + exactly
      // 1 node-grain exchange per round (the v re-key; the label frame
      // enters each join exchange-FREE because the previous round's
      // pinned re-key carries over, and both argmax aggregations ride
      // the re-key via subset clustering) + 1 slack; more means the
      // edges re-exchanged or an aggregation lost its co-partitioning
      val exchanges =
        """Exchange hashpartitioning[^\[]*\[plan_id=(\d+)\]""".r
          .findAllMatchIn(plan).map(_.group(1)).toSet.size
      assert(exchanges <= rounds + 3,
        s"expected <= ${rounds + 3} unique exchanges " +
          s"(got $exchanges — edge re-exchange or lost clustering?):\n$plan")
    } finally { e.unpersist(); () }
  }

  test("registered copart query equals the broadcast face on testdata") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bc = rows(Relational.basketCommunities(spark, sf))
    val cp = rows(Relational.basketCommunitiesCopart(spark, sf))
    assert(bc === cp,
      s"faces disagree: only-bc=${(bc -- cp).take(5)} " +
        s"only-cp=${(cp -- bc).take(5)}")
  }

  test("bucketed face: rounds ride the DISK layout — bucketed scan " +
      "provides the edge partitioning, no broadcast, no exchange above " +
      "the scan, equality with the broadcast face") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val out = Relational.basketCommunitiesBucketed(spark, sf)
    val got = rows(out)
    val bc = rows(Relational.basketCommunities(spark, sf))
    assert(got === bc,
      s"bucketed face disagrees: only-bc=${(bc -- got).take(5)} " +
        s"only-bkt=${(got -- bc).take(5)}")
    // re-run lazily for the executed plan (collect above consumed it,
    // but the DataFrame is re-executable; AQE final plan needs a run)
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("ShuffledHashJoin"),
      s"round joins must be shuffled-hash:\n$plan")
    assert(!plan.contains("BroadcastExchange") &&
      !plan.contains("BroadcastHashJoin"),
      s"label frame must never broadcast:\n$plan")
    // the edge scan must be the BUCKETED one (SelectedBucketsCount shows
    // only when the scan emits bucketed output) and no Exchange may sit
    // directly above a file scan — an edge re-exchange means the disk
    // layout's partitioning was lost and the mechanism is void
    assert(plan.contains("SelectedBucketsCount"),
      s"edge scan is not bucketed:\n$plan")
    val lines = plan.linesIterator.toVector
    lines.zipWithIndex.foreach { case (l, i) =>
      if (l.contains("Exchange hashpartitioning"))
        assert(!lines.slice(i + 1, i + 2).exists(_.contains("FileScan")),
          s"edge list re-exchanged above the bucketed scan at line $i:\n$plan")
    }
  }
}
