package graft.kg.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** K-MINIMUM-VALUES distinct-cardinality sketch (Bar-Yossef et al.,
  * RANDOM'02 — the classic KMV/bottom-k estimator) as a native Catalyst
  * TypedImperativeAggregate — the same imperative-aggregate surface Spark's
  * own approx_count_distinct and percentile_approx use.
  *
  * Why an AGGREGATE and not a distinct+window pipeline: the sketch state is
  * ≤ k longs per group, and TypedImperativeAggregate gives it Spark's full
  * partial-aggregation machinery — map-side partials absorb the corpus
  * cardinality locally, the shuffle carries ≤ k values per (task, group),
  * and merge is a bounded sorted-set union. An exact count(DISTINCT x)
  * shuffles every distinct value; at 10^12 rows this shuffles ≤ k·tasks.
  *
  * The aggregate keeps the k SMALLEST DISTINCT values of its Long input
  * (callers feed it the portable 60-bit md5 hash — [[graft.ops.Dedup]]'s
  * conv(substring(md5(x),1,15),16,10) — so the DuckDB oracle reproduces the
  * identical values) and returns them ascending. Determinism: a set's
  * k-minima are insertion-order-free, so the result is identical across
  * partitionings/merge trees — what makes the declarative distinct+sort
  * oracle hash-exact. The estimator itself ((k−1)·2^60 div h_k, exact when
  * fewer than k distinct values were seen) lives in the caller
  * ([[graft.kg.query.TripleStore.predicateCardSketch]]) as exact integer
  * arithmetic on both engines.
  */
case class KMinValues(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, s"kmin_values needs k >= 2, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmin_values expects a BIGINT input, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buffer: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val l = v.asInstanceOf[Long]
      // skip values that can't enter the bottom-k — the hot path for a
      // full buffer is one comparison against the current k-th minimum
      if (buffer.size < k || l < buffer.last()) {
        buffer.add(l)
        if (buffer.size > k) buffer.pollLast()
      }
    }
    buffer
  }

  override def merge(
      buffer: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      val l = it.next()
      if (buffer.size < k || l < buffer.last()) {
        buffer.add(l)
        if (buffer.size > k) buffer.pollLast()
      }
    }
    buffer
  }

  override def eval(buffer: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buffer.size)
    val it = buffer.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.size)
    bb.putInt(buffer.size)
    val it = buffer.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinValues =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinValues =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KMinValues =
    copy(child = newChild)
  override def prettyName: String = "kmin_values"
}

object KMinValues {
  /** Column-API surface: the ascending array of the k smallest distinct
    * Long inputs of the group.
    */
  def kminValues(h: Column, k: Int): Column =
    Bridge.column(KMinValues(Bridge.expression(h), k).toAggregateExpression())
}
