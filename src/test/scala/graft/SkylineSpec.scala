package graft

import graft.ops.WindowOps
import org.scalatest.funsuite.AnyFunSuite

/** Property check for the bucketed skyline decomposition, independent of
  * the DuckDB oracle's single-sweep formulation: on the real sf input,
  * (1) every returned point is strictly undominated (no other distinct
  * point has price ≤ and size ≥ with one strict), and (2) every distinct
  * point NOT returned is strictly dominated by some point. Together these
  * pin the skyline SET exactly, so a future edit to the bucketing (bucket
  * count, extent handling, tie policy) that silently shifts the frontier
  * fails here in-JVM even before the cross-engine gate runs. */
class SkylineSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("bucketed skyline equals the brute-force Pareto frontier") {
    import org.apache.spark.sql.functions._
    val pts = Tables.part(spark, TestSession.sf)
      .select(col("p_retailprice").cast("double"), col("p_size").cast("long"))
      .distinct()
      .collect()
      .map(r => (r.getAs[Number](0).doubleValue(), r.getAs[Number](1).longValue()))
      .toSet
    def dominates(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 <= b._1 && a._2 >= b._2 && (a._1 < b._1 || a._2 > b._2)
    val expected = pts.filter(p => !pts.exists(q => dominates(q, p)))

    val got = WindowOps.skyline(spark, TestSession.sf)
      .collect()
      .map(r => (r.getAs[Number](0).doubleValue(), r.getAs[Number](1).longValue()))
      .toSet
    assert(got == expected)
    // liveness: the frontier is non-trivial (neither empty nor everything)
    assert(got.nonEmpty && got.size < pts.size)
  }
}
