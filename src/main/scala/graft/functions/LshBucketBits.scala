package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd LSH sign-projection bucket over ×10⁹ fixed-point
  * long vectors: output char p is '1' iff Σ_d sign(p,d)·v_d ≥ 0, with
  * the SAME deterministic hyperplane convention as
  * `Similarity.planeSigns` (sign(p,d) = +1 iff the first md5 hex digit
  * of "p_d" is odd) — the matrix is recomputed from (nPlanes, dim) on
  * each JVM, so nothing engine-private is shipped and the DuckDB oracle
  * reproduces it from md5 alone.
  *
  * Exactness: each element is a decimal(18,9) value ×10⁹ as a long
  * (`Similarity.fixedVectors`); a ±1-weighted long sum is exact
  * (|Σ| ≤ dim·10¹⁰ ≪ 2⁶³), so every bit equals the decimal
  * formulation's `proj >= 0` bit-for-bit.
  *
  * Why an Expression: the composed form ran nPlanes separate
  * higher-order `aggregate` lambdas per row — nPlanes×dim interpreted
  * Decimal allocations outside whole-stage codegen. On a test-scale
  * corpus that's noise; on the 10¹⁰-row corpus this operator is FOR,
  * per-row interpretation is the scan's dominant cost. This is one
  * tight long loop inside codegen, the [[DotFixedPoint]] discipline
  * applied to bucketing.
  */
case class LshBucketBits(child: Expression, nPlanes: Int, dim: Int)
    extends UnaryExpression {

  require(nPlanes >= 1, s"lsh_bucket_bits: nPlanes must be >= 1, got $nPlanes")
  require(dim >= 1, s"lsh_bucket_bits: dim must be >= 1, got $dim")

  override def dataType: DataType = StringType
  override def prettyName: String = "lsh_bucket_bits"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) | NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> (×10⁹ fixed-point), got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    LshBucketBits.buckets(v.asInstanceOf[ArrayData], nPlanes, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LshBucketBits.buckets($c, $nPlanes, $dim)")

  override protected def withNewChildInternal(newChild: Expression): LshBucketBits =
    copy(child = newChild)
}

object LshBucketBits {

  val FnName = "lsh_bucket_bits"

  /** Builder for the SQL surface: nPlanes and dim must be non-null
    * integer literals (the sign matrix is a plan-time constant).
    */
  def fromExprs(exprs: Seq[Expression]): LshBucketBits = {
    require(exprs.length == 3,
      s"$FnName expects (vec, nPlanes, dim), got ${exprs.length} args")
    def intLit(e: Expression, what: String): Int = {
      if (!e.foldable) throw new IllegalArgumentException(
        s"$FnName: $what must be an integer literal, got ${e.sql}")
      e.eval() match {
        // reject fractional literals instead of silently truncating
        // (lsh_bucket_bits(vec, 4.7, 64) must error, not mean 4 planes)
        case n: Number if n.doubleValue() == n.intValue().toDouble => n.intValue()
        case other => throw new IllegalArgumentException(
          s"$FnName: $what must be an integer literal, got ${if (other == null) "NULL" else other}")
      }
    }
    LshBucketBits(exprs.head, intLit(exprs(1), "nPlanes"), intLit(exprs(2), "dim"))
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, fromExprs, "scala_udf")

  def apply(spark: org.apache.spark.sql.SparkSession,
            vec: org.apache.spark.sql.Column, nPlanes: Int,
            dim: Int): org.apache.spark.sql.Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(FnName, vec,
      org.apache.spark.sql.functions.lit(nPlanes),
      org.apache.spark.sql.functions.lit(dim))
  }

  // sign matrices are tiny (nPlanes × dim bytes) and pure functions of
  // (nPlanes, dim): cache per shape so generated code pays a map lookup,
  // not an md5 per row
  private val cache = new ConcurrentHashMap[Long, Array[Array[Byte]]]()

  private[graft] def signMatrix(nPlanes: Int, dim: Int): Array[Array[Byte]] =
    cache.computeIfAbsent((nPlanes.toLong << 32) | dim.toLong, _ =>
      Array.tabulate(nPlanes, dim) { (p, d) =>
        val digest = java.security.MessageDigest.getInstance("MD5")
          .digest(s"${p}_${d}".getBytes("UTF-8"))
        if ((((digest(0) >> 4) & 0xF) % 2) == 1) 1.toByte else (-1).toByte
      })

  /** Called from generated code. Throws on length mismatch — a silent
    * wrong-length projection would put the vector in a garbage bucket
    * (the fail-loudly contract of the lambda form's raise_error).
    */
  def buckets(arr: ArrayData, nPlanes: Int, dim: Int): UTF8String = {
    val n = arr.numElements()
    if (n != dim) throw new IllegalArgumentException(
      s"lsh_bucket_bits: embedding length must be $dim, got $n")
    // enforced, not just documented (the DotFixedPoint discipline): with
    // every |v| ≤ Long.Max/dim the ±1-weighted sum cannot wrap, so a
    // silent sign flip is impossible; out-of-contract inputs from the
    // open SQL surface fail loudly instead
    val lim = Long.MaxValue / dim
    val signs = signMatrix(nPlanes, dim)
    val out = new Array[Byte](nPlanes)
    var p = 0
    while (p < nPlanes) {
      val sp = signs(p)
      var s = 0L
      var d = 0
      while (d < dim) {
        val v = arr.getLong(d)
        if (v > lim || v < -lim) throw new IllegalArgumentException(
          s"lsh_bucket_bits: |element| must be <= ${lim} for dim $dim, got $v")
        if (sp(d) > 0) s += v else s -= v
        d += 1
      }
      out(p) = if (s >= 0L) '1' else '0'
      p += 1
    }
    UTF8String.fromBytes(out)
  }
}
