package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BooleanType, DataType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the fuzzy-join containment predicate
  * (SURVEY §7.4 "optional custom codegen'd Expression"): true iff
  * `haystack` contains `needle` after both drop the separator characters
  * ' ', ':', '_' (ref: movie_events_scraper.py:86 — the reference strips
  * separators from both sides before substring matching).
  *
  * Why an Expression rather than the translate()+contains() composition:
  * the composed form materializes two stripped copies of every row's
  * strings per comparison; this operator strips byte-wise into a reused
  * buffer and stays inside whole-stage codegen (no UDF/serialization).
  * Semantics are identical — FuzzyMatchSpec asserts equivalence.
  */
case class ContainsIgnoringSeparators(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "contains_ignoring_separators"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t == StringType || t == NullType // NULL literal → null result
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, string), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    ContainsIgnoringSeparators.containsStripped(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.ContainsIgnoringSeparators.containsStripped($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ContainsIgnoringSeparators =
    copy(left = newLeft, right = newRight)
}

object ContainsIgnoringSeparators {

  private def isSep(b: Byte): Boolean = b == ' ' || b == ':' || b == '_'

  /** Strip separators byte-wise (separators are single-byte in UTF-8, so
    * this is multibyte-safe) — called from generated code.
    */
  def strip(s: UTF8String): Array[Byte] = {
    val bytes = s.getBytes
    var n = 0
    var i = 0
    while (i < bytes.length) { if (!isSep(bytes(i))) n += 1; i += 1 }
    if (n == bytes.length) bytes
    else {
      val out = new Array[Byte](n)
      var j = 0
      i = 0
      while (i < bytes.length) {
        if (!isSep(bytes(i))) { out(j) = bytes(i); j += 1 }
        i += 1
      }
      out
    }
  }

  /** Entry point referenced by codegen. */
  def containsStripped(haystack: UTF8String, needle: UTF8String): Boolean =
    UTF8String.fromBytes(strip(haystack)).contains(UTF8String.fromBytes(strip(needle)))

  val FnName = "contains_ignoring_separators"

  /** Register in the session's function registry so both the DataFrame
    * API (via call_function) and the open SQL surface can use it.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => ContainsIgnoringSeparators(exprs(0), exprs(1)), "scala_udf")

  def apply(spark: SparkSession, haystack: Column, needle: Column): Column = {
    register(spark)
    call_function(FnName, haystack, needle)
  }
}
