package graft

import graft.ops.CatalogOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The OPTIMIZE executor's invariants beyond what the gated audit pins:
  * the compacted store is a row-for-row rewrite of the fragmented input
  * (full-column multiset equality, both directions), and every planned
  * bin landed — no partition silently skipped by the rewrite join. */
class CompactionSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("compaction rewrite preserves every row, both directions, " +
      "and covers every planned bin exactly once") {
    val audit = CatalogOps.compactionExec(spark, TestSession.sf).collect()
    assert(audit.nonEmpty)
    audit.foreach { r =>
      assert(r.getAs[Long]("rows_match") === 1L,
        s"bin ${r.getAs[Long]("bin_id")} row-count mismatch")
      assert(r.getAs[Long]("files_after") === 1L,
        s"bin ${r.getAs[Long]("bin_id")} fragmented output")
    }
    // the audit's join is inner — prove it dropped nothing: the audit
    // covers exactly the planned bin set
    val planned = CatalogOps.compactionPlan(spark, TestSession.sf)
      .select(col("event_type"), col("bin_id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val audited = audit
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("bin_id")))
      .toSet
    assert(audited === planned)
    // full-column multiset equality of input vs rewrite (day re-derived;
    // bin_id is the rewrite's own bookkeeping column)
    val ev = graft.Tables.events(spark, TestSession.sf)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    val cols = ev.columns.sorted.map(col(_))
    val before = ev.select(cols: _*)
    val after = CatalogOps.compactedStoreForTest(spark, TestSession.sf)
      .select(cols: _*)
    assert(before.exceptAll(after).count() === 0)
    assert(after.exceptAll(before).count() === 0)
  }

  test("z-order executor: both physical layouts hold every row exactly " +
      "once and the z-curve strictly dominates the linear strawman on " +
      "the probe") {
    val audit = CatalogOps.zorderExec(spark, TestSession.sf).collect()
    val byLayout = audit.groupBy(_.getAs[String]("layout"))
    assert(byLayout.keySet === Set("zorder", "linear"))
    val liRows = graft.Tables.lineitem(spark, TestSession.sf).count()
    byLayout.foreach { case (layout, rs) =>
      assert(rs.map(_.getAs[Long]("n_rows")).sum === liRows,
        s"$layout layout lost or duplicated rows")
      rs.foreach(r => assert(r.getAs[Long]("files_in_bucket") === 1L,
        s"$layout bucket ${r.getAs[Long]("file_id")} fragmented"))
    }
    def hits(l: String) =
      byLayout(l).count(_.getAs[Long]("probe_hit") == 1L)
    // the whole point of the rewrite: the point query reads strictly
    // fewer REAL files under the z layout
    assert(hits("zorder") < hits("linear"),
      s"z ${hits("zorder")} vs linear ${hits("linear")}")
  }
}
