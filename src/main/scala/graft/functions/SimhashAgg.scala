package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native SimHash aggregate: folds a group's md5-hex hashes into the
  * 64-bit fingerprint in ONE pass with a 64-int buffer.
  *
  * Semantics (identical to the 64-sum SQL formulation and the DuckDB
  * oracle): for bit j, balance_j = Σ_tokens (2·bit_j(md5) − 1) where
  * bit_j = (hexdigit_{j/4} >> (3 − j%4)) & 1; fingerprint_j = '1' iff
  * balance_j ≥ 0, MSB-first.
  *
  * Why a TypedImperativeAggregate: 64 parallel `sum(CASE…)` aggregates
  * carry 64 aggregation-buffer slots per group and evaluate 64 expression
  * trees per row; this buffer is one primitive array updated with integer
  * ops, and partial aggregation/merge works the usual way (the buffer is
  * element-wise additive), so map-side combine still happens before the
  * shuffle.
  */
case class SimhashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  override def prettyName: String = "simhash_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an md5 hex string input, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buffer: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val hex = v.asInstanceOf[UTF8String]
      // Reachable from the open SQL surface with arbitrary strings: enforce
      // the md5-hex contract at runtime. Without the length check the loop
      // would read past the UTF8String's bytes via unchecked Platform.getByte.
      if (hex.numBytes() < 16)
        throw new IllegalArgumentException(
          s"$prettyName expects an md5 hex string (>= 16 hex chars), " +
            s"got ${hex.numBytes()} bytes: '$hex'")
      var d = 0
      while (d < 16) {
        val hv = Character.digit(hex.getByte(d).toChar, 16)
        if (hv < 0)
          throw new IllegalArgumentException(
            s"$prettyName expects hex digits, got '${hex.getByte(d).toChar}' in '$hex'")
        var b = 0
        while (b < 4) {
          val bit = (hv >> (3 - b)) & 1
          buffer(4 * d + b) += 2 * bit - 1
          b += 1
        }
        d += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Int], other: Array[Int]): Array[Int] = {
    var j = 0
    while (j < 64) { buffer(j) += other(j); j += 1 }
    buffer
  }

  override def eval(buffer: Array[Int]): Any = {
    val out = new Array[Byte](64)
    var j = 0
    while (j < 64) {
      out(j) = if (buffer(j) >= 0) '1'.toByte else '0'.toByte
      j += 1
    }
    UTF8String.fromBytes(out)
  }

  override def serialize(buffer: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 4)
    buffer.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimhashAgg =
    copy(child = newChildren.head)
}

object SimhashAgg {
  val FnName = "simhash_agg"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => SimhashAgg(exprs.head).toAggregateExpression(), "scala_udf")

  /** md5-hex column → 64-char '0'/'1' SimHash per group. */
  def apply(spark: SparkSession, md5Hex: Column): Column = {
    register(spark)
    call_function(FnName, md5Hex)
  }
}
