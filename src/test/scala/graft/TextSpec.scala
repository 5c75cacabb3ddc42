package graft

import graft.functions.TextFunctions
import graft.ops.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private val dir = "/root/testdata/sf0.001"

  test("simhash: typed mapPartitions path is bit-identical to the " +
      "declarative Column path") {
    val fast = TextOps.simhashDocs(spark, dir)
    val declarative = Tables.documents(spark, dir).select(
      col("doc_id"),
      TextFunctions.simhash(TextFunctions.tokens(col("text")), 32)
        .as("simhash32"))
    assert(fast.exceptAll(declarative).isEmpty &&
      declarative.exceptAll(fast).isEmpty)
  }
}
