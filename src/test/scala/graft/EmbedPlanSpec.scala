package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan pin for the dense arm's store probe (the LpaPlanSpec discipline
  * applied to [[graft.ops.EmbedStore]]): the whole point of
  * materializing document embeddings is that query time touches the
  * store as a PROBE — candidate ids broadcast into a left-semi against
  * the sparse scan — so the store must never shuffle and the probe must
  * never degrade into a shuffled join. At 100 TB the store is the
  * corpus-sized artifact; an Exchange directly above its scan means the
  * layout is being re-partitioned per query, which is the failure mode
  * this spec exists to catch. */
class EmbedPlanSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  test("dense epilogue probes the embed store via a broadcast semi — " +
      "no exchange ever sits above the store scan") {
    val out = graft.ops.RetrievalOps.queries("q_hybrid_rrf_dense")(spark, sf)
    out.collect() // materialize so AQE's FINAL plan is what we read
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the candidate-id semi-probe must be broadcast (the id list is
    // candidate-grain by construction)
    assert(plan.linesIterator.exists(l =>
        l.contains("BroadcastHashJoin") && l.contains("LeftSemi")),
      s"embed-store probe is not a broadcast left-semi:\n$plan")
    // and no Exchange may sit directly above ANY file scan in the
    // epilogue — the store is read as laid out, never re-partitioned
    val lines = plan.linesIterator.toVector
    lines.zipWithIndex.foreach { case (l, i) =>
      if (l.contains("Exchange hashpartitioning"))
        assert(!lines.slice(i + 1, i + 2).exists(x =>
            x.contains("FileScan") || x.contains("Scan parquet")),
          s"store scan re-exchanged at plan line $i:\n$plan")
    }
  }
}
