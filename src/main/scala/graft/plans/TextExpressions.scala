package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Table-generating tokenizer for the SQL surface — the reference's
  * keyword UDTF (gmall-realtime SplitFunction.java:12-27, a Flink
  * `TableFunction` used via `LATERAL TABLE`) maps to a Catalyst
  * [[Generator]] usable with `LATERAL VIEW graft_tokenize(text) t AS word`.
  *
  * Split semantics match [[graft.functions.TextFunctions.tokens]]
  * (single-space, trailing empties kept) so the SQL path and the
  * DataFrame tokens+explode path produce identical rows. Generators run
  * through `GenerateExec` which evaluates them row-at-a-time;
  * CodegenFallback is the normal shape here. */
case class TokenizeGenerator(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(StructField("word", StringType) :: Nil)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_tokenize expects string, got ${other.catalogString}")
    }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else v.asInstanceOf[UTF8String].toString.split(" ", -1).toSeq
      .map(w => InternalRow(UTF8String.fromString(w)))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  /** Register `graft_tokenize` for SQL / LATERAL VIEW use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_tokenize", exprs => {
        // arity check at analysis time — not NoSuchElement from the builder
        if (exprs.length != 1) throw new IllegalArgumentException(
          s"graft_tokenize expects 1 argument(s), got ${exprs.length}")
        TokenizeGenerator(exprs.head)
      }, "built-in")
}
