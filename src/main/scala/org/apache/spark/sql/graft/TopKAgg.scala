// Lives in org.apache.spark.sql (like DotProduct.scala) because the
// Column bridge (classic.ExpressionUtils) is private[sql].
package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Bounded top-k buffer: (score, id) pairs kept best-first
  * (score desc, ties by lower id) in primitive arrays — the hot
  * `add` is scan + shift, no allocation.
  *
  * Exact (score, id) DUPLICATES are dropped at insert: the buffer is
  * sorted, so a duplicate lands exactly at its twin's position — one
  * equality check on the O(k) scan already paid. This is what lets
  * LSH-blocked producers (v08/e01b) feed MULTI-TABLE COLLISIONS
  * straight into the aggregate without a corpus-scale
  * dropDuplicates shuffle first: each partial keeps its k best
  * distinct entries, merge() re-dedups across partials, and the
  * distinct top-k is exact by the standard top-k merge argument. */
final class TopKState(val k: Int) {
  var n: Int = 0
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)

  @inline private def better(s: Double, id: Long, s2: Double, id2: Long): Boolean =
    s > s2 || (s == s2 && id < id2)

  def add(s: Double, id: Long): Unit = {
    if (n == k && !better(s, id, scores(k - 1), ids(k - 1))) return
    var pos = 0
    while (pos < n && better(scores(pos), ids(pos), s, id)) pos += 1
    if (pos < n && scores(pos) == s && ids(pos) == id) return // duplicate
    var i = math.min(n, k - 1)
    while (i > pos) { scores(i) = scores(i - 1); ids(i) = ids(i - 1); i -= 1 }
    scores(pos) = s; ids(pos) = id
    if (n < k) n += 1
  }
}

/** Native top-k aggregate: keeps the k (score, id) pairs with the
  * highest score per group, as a TypedImperativeAggregate — the
  * update path reads the input row directly (no Dataset encoder
  * round trip per row, unlike the typed `Aggregator` formulation)
  * and the partial buffer is two primitive arrays. Partial-
  * aggregatable: only k pairs per group cross the shuffle. Returns
  * array<struct<cos double, vec_id bigint>> sorted best-first.
  *
  * This is the 100 TB shape of the reference's get_closest_*
  * ranking (storage.py:266): all-pairs scoring streams map-side and
  * the exchange carries O(groups × k), never the scored rows.
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKState] {

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cos", DoubleType), StructField("vec_id", LongType))))

  override def createAggregationBuffer(): TopKState = new TopKState(k)

  override def update(buf: TopKState, input: InternalRow): TopKState = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKState, other: TopKState): TopKState = {
    var j = 0
    while (j < other.n) { buf.add(other.scores(j), other.ids(j)); j += 1 }
    buf
  }

  override def eval(buf: TopKState): Any =
    new GenericArrayData(Array.tabulate[Any](buf.n)(i =>
      InternalRow(buf.scores(i), buf.ids(i))))

  override def serialize(buf: TopKState): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.n * 16)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKState = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val st = new TopKState(k)
    st.n = n
    var i = 0
    while (i < n) { st.scores(i) = bb.getDouble; st.ids(i) = bb.getLong; i += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKAgg {
  /** Column wrapper: `topK(cosCol, idCol, 5)` → array<struct<cos, vec_id>>. */
  def topK(score: Column, id: Column, k: Int): Column =
    ExpressionUtils.column(TopKAgg(
      ExpressionUtils.expression(score),
      ExpressionUtils.expression(id), k).toAggregateExpression())
}
