package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Misra–Gries heavy-hitters sketch over a string column —
  * the CANDIDATE-GENERATION half of exact frequent-item mining at
  * 100 TB: a plain `groupBy(token)` exchanges one row per DISTINCT
  * token (vocabulary-sized — billions for web-scale n-grams), while
  * this aggregate's buffer is AT MOST k counters per partition
  * regardless of cardinality, so the exchange carries ≤ k rows per map
  * partition and the merge is the Agarwal et al. "Mergeable Summaries"
  * MG merge (pointwise sum, then subtract the (k+1)-largest count and
  * drop non-positives).
  *
  * Guarantee (the one the exact verify pass builds on): every item
  * with true frequency > n/(k+1) SURVIVES in the final summary; each
  * kept counter underestimates its true count by at most n/(k+1).
  * The survivor SET for sub-threshold items depends on merge order —
  * so the aggregate exposes only the candidate TOKENS (sorted, for a
  * deterministic array), and callers needing exact semantics re-count
  * the candidates exactly ([[graft.operators.TextAnalysis.heavyHitters]])
  * — approximate machinery, exact contract.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1, s"misra_gries k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "misra_gries"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buffer: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      buffer.get(s) match {
        case Some(c) => buffer.update(s, c + 1)
        case None if buffer.size < k => buffer.update(s, 1L)
        case None =>
          // classic MG decrement: every counter pays 1, zeros evicted
          val dead = mutable.ArrayBuffer.empty[String]
          buffer.foreach { case (key, c) =>
            if (c == 1L) dead += key else buffer.update(key, c - 1)
          }
          dead.foreach(buffer.remove)
      }
    }
    buffer
  }

  override def merge(buffer: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long])
      : mutable.HashMap[String, Long] = {
    other.foreach { case (key, c) =>
      buffer.update(key, buffer.getOrElse(key, 0L) + c)
    }
    if (buffer.size > k) {
      // subtract the (k+1)-largest count from everything; ≤ 0 evicts —
      // the mergeable-summaries shrink that preserves the n/(k+1) bound
      val counts = buffer.values.toArray.sorted(Ordering[Long].reverse)
      val sub = counts(k)
      val dead = mutable.ArrayBuffer.empty[String]
      buffer.foreach { case (key, c) =>
        if (c - sub <= 0L) dead += key else buffer.update(key, c - sub)
      }
      dead.foreach(buffer.remove)
    }
    buffer
  }

  override def eval(buffer: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buffer.keysIterator.toArray.sorted
        .map(UTF8String.fromString): Array[Any])

  override def serialize(buffer: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buffer.toArray
    val payload = entries.map { case (s, _) => s.getBytes(StandardCharsets.UTF_8) }
    val bb = ByteBuffer.allocate(4 + payload.map(_.length + 12).sum)
    bb.putInt(entries.length)
    entries.zip(payload).foreach { case ((_, c), bytes) =>
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val out = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val sb = new Array[Byte](len)
      bb.get(sb)
      out.update(new String(sb, StandardCharsets.UTF_8), bb.getLong())
      i += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}

object MisraGriesAgg {
  val FnName = "misra_gries"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName,
      exprs => {
        require(exprs.length == 2 && exprs(1).foldable &&
          exprs(1).dataType == IntegerType,
          s"$FnName(col, k) needs a literal integer k")
        MisraGriesAgg(exprs.head,
          exprs(1).eval(InternalRow.empty).asInstanceOf[Int])
          .toAggregateExpression()
      },
      "scala_udf")

  /** token column + literal k → sorted array of ≤ k candidate tokens. */
  def apply(spark: SparkSession, token: Column, k: Int): Column = {
    register(spark)
    call_function(FnName, token, lit(k))
  }
}
