package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all specs (one JVM-wide session; suites are cheap). */
object TestSession {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder(master = "local[4]").getOrCreate()
    GraftSession.registerFunctions(s)
    s
  }
  val sf = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("every registered query runs and returns rows on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, TestSession.sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without queries: $dangling")
  }

  test("pricing summary sums accumulate exactly and emit as double") {
    // money accumulates in DECIMAL internally and is emitted as DOUBLE at
    // the query boundary (driver-hasher parity — see Relational scaladoc)
    val row = Relational0.pricing(spark).filter("l_returnflag = 'A'").head()
    assert(row.getAs[Double]("sum_base") > 0.0)
    assert(row.getAs[Double]("sum_disc_price") > 0.0)
  }
}

/** Small helper so the spec reads naturally. */
object Relational0 {
  def pricing(s: SparkSession) =
    graft.ops.Relational.pricingSummary(s, TestSession.sf)
}
