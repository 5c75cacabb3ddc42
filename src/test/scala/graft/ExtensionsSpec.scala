package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions entry point (`spark.sql.extensions=
  * graft.GraftExtensions`) must make the custom expressions reachable
  * from plain SQL with no programmatic registration — the way a deployed
  * library's users get them. `spark.sql.extensions` is a STATIC conf
  * read from the SparkContext at context build, so on the suite's shared
  * context the spec drives the identical hook through
  * `builder.withExtensions(new GraftExtensions)` and restores the suite
  * session after. */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("GraftExtensions injects graft_dot and graft_tokenize into a " +
      "session built from it") {
    val prior = spark // ensure the shared session (and context) exist
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val dot = s2.sql(
        "SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
          "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
        .collect().head.getDouble(0)
      assert(dot === 11.0)
      val words = s2.sql(
        "SELECT word FROM (SELECT 'a b c' AS t) " +
          "LATERAL VIEW graft_tokenize(t) x AS word")
        .collect().map(_.getString(0)).toSeq
      assert(words === Seq("a", "b", "c"))
      // wrong arity surfaces as a comprehensible error, not
      // IndexOutOfBounds from inside the builder
      val err = intercept[Exception] {
        s2.sql("SELECT graft_dot(array(CAST(1.0 AS FLOAT)))").collect()
      }
      assert(err.getMessage.contains("graft_dot expects 2 argument"))
    } finally {
      SparkSession.setDefaultSession(prior)
      SparkSession.setActiveSession(prior)
    }
  }
}
