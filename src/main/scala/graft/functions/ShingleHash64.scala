package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, NullType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct word-k-gram shingle hashes: token array → array of
  * xxhash64(shingle) longs, one tight codegen'd loop per document.
  *
  * Replaces the composed `array_distinct(transform(sequence(...),
  * i => concat_ws(" ", slice(tokens, i, k))))` + `xxhash64` chain, which
  * evaluates an interpreted lambda PER SHINGLE POSITION (higher-order
  * functions don't codegen) and materializes every shingle string twice
  * (once in the array, once to hash). Here each shingle is assembled into
  * a reused byte buffer and hashed in place — no per-position expression
  * interpretation, no intermediate string array.
  *
  * The hash value (seed 42 over the space-joined UTF-8 bytes) matches
  * Spark's `xxhash64` of the same shingle string, so downstream joins are
  * interchangeable with the composed form. Only hash CONSISTENCY matters
  * for Jaccard (both join sides and the per-doc counts use the same
  * function); the cross-engine oracle compares final jaccard/shared
  * numbers, not hashes.
  */
case class ShingleHash64(child: Expression, k: Int, distinct: Boolean = true)
    extends UnaryExpression {

  // k < 1 would drive the byte-assembly loop with a negative length and
  // hash garbage instead of failing — reject at construction so the SQL
  // surface (shingle_hash64(tokens, 0)) errors at analysis time.
  require(k >= 1, s"shingle_hash64: k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    ShingleHash64.shingles(v.asInstanceOf[ArrayData], k, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHash64.shingles($c, $k, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash64 =
    copy(child = newChild)
}

object ShingleHash64 {

  /** Called from generated code. With `distinct=true` the output keeps
    * first-occurrence order (irrelevant downstream — the array is
    * exploded); with `distinct=false` EVERY shingle position is emitted,
    * so output index i is exactly the 0-based start position of the
    * shingle — `posexplode` recovers (position, hash) pairs for
    * position-aware consumers like span-level dedup.
    */
  def shingles(arr: ArrayData, k: Int, distinct: Boolean): ArrayData = {
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      toks(i) = if (t == null) UTF8String.EMPTY_UTF8 else t
      i += 1
    }
    val seen = if (distinct) new java.util.HashSet[java.lang.Long]() else null
    val out = new Array[Long](n - k + 1)
    var m = 0
    var buf = new Array[Byte](256)
    i = 0
    while (i <= n - k) {
      var len = k - 1
      var j = 0
      while (j < k) { len += toks(i + j).numBytes(); j += 1 }
      if (buf.length < len) buf = new Array[Byte](math.max(len, buf.length * 2))
      var pos = 0
      j = 0
      while (j < k) {
        if (j > 0) { buf(pos) = ' '; pos += 1 }
        val t = toks(i + j)
        t.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + pos)
        pos += t.numBytes()
        j += 1
      }
      val h = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, 42L)
      if (seen == null || seen.add(h)) { out(m) = h; m += 1 }
      i += 1
    }
    new GenericArrayData(if (m == out.length) out else java.util.Arrays.copyOf(out, m))
  }

  val FnName = "shingle_hash64"
  val PosFnName = "shingle_hash64_pos"

  /** Builder for the SQL surface: validates that `k` is a foldable
    * non-null integer literal up front, instead of letting a column /
    * string / null second argument explode deep in analysis as an opaque
    * UnsupportedOperationException / ClassCastException.
    */
  def fromExprs(exprs: Seq[Expression]): ShingleHash64 =
    build(exprs, FnName, distinct = true)

  /** Positional variant: all shingle positions, no dedup (see `shingles`). */
  def fromExprsPos(exprs: Seq[Expression]): ShingleHash64 =
    build(exprs, PosFnName, distinct = false)

  private def build(exprs: Seq[Expression], name: String,
                    distinct: Boolean): ShingleHash64 = {
    require(exprs.length == 2, s"$name expects (tokens, k), got ${exprs.length} args")
    val kExpr = exprs(1)
    if (!kExpr.foldable)
      throw new IllegalArgumentException(s"$name: k must be an integer literal, got ${kExpr.sql}")
    kExpr.eval() match {
      // integral types only: a fractional literal (shingle_hash64(t, 2.5))
      // must error, not silently truncate to 2
      case n @ (_: java.lang.Byte | _: java.lang.Short | _: java.lang.Integer |
                _: java.lang.Long) =>
        val v = n.asInstanceOf[Number].longValue()
        if (v >= 1 && v <= Int.MaxValue) ShingleHash64(exprs.head, v.toInt, distinct)
        else throw new IllegalArgumentException(s"$name: k must be >= 1, got $v")
      case other => throw new IllegalArgumentException(
        s"$name: k must be an integer literal, got ${if (other == null) "NULL" else other}")
    }
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, fromExprs, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      PosFnName, fromExprsPos, "scala_udf")
  }

  def apply(spark: SparkSession, tokens: Column, k: Int): Column = {
    register(spark)
    call_function(FnName, tokens, lit(k))
  }

  /** Column of ALL shingle hashes in position order (index = 0-based
    * shingle start); pair with `posexplode` for (position, hash) rows.
    */
  def positional(spark: SparkSession, tokens: Column, k: Int): Column = {
    register(spark)
    call_function(PosFnName, tokens, lit(k))
  }
}
