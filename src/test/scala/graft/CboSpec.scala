package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ties `q_column_stats` to its consumer: the statistics that operator
  * computes (row counts, NDV, min/max, null counts) are exactly what
  * Spark's cost-based optimizer eats. This spec feeds ANALYZE statistics
  * to the catalog and pins the mechanism contract:
  *   1. ANALYZE attaches rowCount AND per-column stats (distinctCount,
  *      nullCount) that planning can see — the catalog-side shape of
  *      what `q_column_stats` derives in one scan;
  *   2. with stats present, a leaf's planner size comes from the
  *      statistics (rowCount-based), not the file-size fallback;
  *   3. enabling CBO + join reordering over analyzed tables is
  *      result-invariant on a 4-relation star chain (the optimizer may
  *      re-shape plans, never answers).
  * The reorder decision itself is cost-model-internal and data-sized, so
  * it is deliberately NOT asserted — the contract here is that the stats
  * pipeline feeds the CBO without changing semantics. */
class CboSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("ANALYZE-fed catalog stats attach to plans, size leaves, and " +
      "leave CBO-reordered results invariant") {
    val s = spark
    Tables.lineitem(s, TestSession.sf).write.mode("overwrite")
      .saveAsTable("cbo_lineitem")
    Tables.orders(s, TestSession.sf).write.mode("overwrite")
      .saveAsTable("cbo_orders")
    Tables.customer(s, TestSession.sf).write.mode("overwrite")
      .saveAsTable("cbo_customer")
    Tables.nation(s, TestSession.sf).write.mode("overwrite")
      .saveAsTable("cbo_nation")
    val tables = Seq("cbo_lineitem", "cbo_orders", "cbo_customer",
      "cbo_nation")
    try {
      tables.foreach(t =>
        s.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS"))
      // plan-level stats expose rowCount/column stats only under CBO —
      // without it the visitor propagates sizeInBytes alone (measured)
      s.conf.set("spark.sql.cbo.enabled", "true")
      // 1) rowCount + column-level stats visible to the planner
      val st = s.table("cbo_lineitem").queryExecution.optimizedPlan.stats
      assert(st.rowCount.isDefined && st.rowCount.get.toLong > 0,
        "ANALYZE did not attach a rowCount")
      assert(st.attributeStats.nonEmpty,
        "ANALYZE FOR ALL COLUMNS did not attach column-level stats")
      val colStats = st.attributeStats.find(_._1.name == "l_returnflag")
        .map(_._2)
      assert(colStats.exists(_.distinctCount.exists(_.toLong >= 1)),
        "l_returnflag NDV missing from catalog stats")
      assert(colStats.exists(_.nullCount.exists(_.toLong == 0)),
        "l_returnflag null count missing/wrong in catalog stats")
      // 2) tiny analyzed table: stats-based size, far below any
      //    file-size fallback ambiguity (25 rows)
      val nst = s.table("cbo_nation").queryExecution.optimizedPlan.stats
      assert(nst.rowCount.exists(_.toLong <= 25L))
      // 3) CBO + join reorder over the analyzed star chain is
      //    result-invariant
      val q =
        """SELECT n.n_name, COUNT(*) AS c
          |FROM cbo_lineitem l
          |JOIN cbo_orders o ON l.l_orderkey = o.o_orderkey
          |JOIN cbo_customer c ON o.o_custkey = c.c_custkey
          |JOIN cbo_nation n ON c.c_nationkey = n.n_nationkey
          |GROUP BY 1""".stripMargin
      def run(cbo: Boolean): Seq[String] = {
        s.conf.set("spark.sql.cbo.enabled", cbo.toString)
        s.conf.set("spark.sql.cbo.joinReorder.enabled", cbo.toString)
        try s.sql(q).collect().map(_.toString).sorted.toSeq
        finally {
          s.conf.set("spark.sql.cbo.enabled", "false")
          s.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
        }
      }
      val withCbo = run(cbo = true)
      val without = run(cbo = false)
      assert(withCbo.nonEmpty && withCbo === without,
        "CBO changed RESULTS, not just plans")
    } finally {
      s.conf.set("spark.sql.cbo.enabled", "false")
      s.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      tables.foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
