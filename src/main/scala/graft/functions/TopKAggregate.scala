package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Bounded-heap per-group top-k aggregate (SURVEY.md §2.11 — the custom
 * AggregateFunction extension point): `graft_topk(ord, id, k)` keeps
 * the k largest (ord, id) pairs per group, ordered by ord DESC with id
 * ASC tiebreak, and evaluates to an array of (rank-ordered) structs.
 *
 * Why it exists at 100 TB: the window formulation
 * (`row_number() OVER (PARTITION BY g ORDER BY ord DESC)` + filter)
 * must SORT every group's full row set; this aggregate keeps a k-entry
 * heap per group and combines map-side (partial aggregation), so the
 * shuffle carries at most k pairs per (partition, group) instead of
 * every row — the same partial/final shape as the reference's
 * statistics merges (`ColumnStatisticsImpl` merge hierarchy).
 *
 * Buffer is a plain array of (Double, Long); serialization is a flat
 * ByteBuffer (no codegen needed — TypedImperativeAggregate runs in
 * ObjectHashAggregate, which Spark picks automatically).
 */
case class TopKAgg(
    ord: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.ArrayList[(Double, Long)]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(ord, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ord", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (ord.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (o, i) => TypeCheckResult.TypeCheckFailure(
        s"graft_topk requires (double, bigint) inputs, got " +
          s"${o.simpleString}, ${i.simpleString}")
    }

  // "a beats b" in the top-k order: higher ord, ties to lower id
  private def beats(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def createAggregationBuffer(): java.util.ArrayList[(Double, Long)] =
    new java.util.ArrayList[(Double, Long)](k + 1)

  /** Insert keeping at most k entries; the buffer stays small (≤ k),
    * so a linear worst-entry scan beats heap bookkeeping for the small
    * k this is meant for. */
  private def insert(buf: java.util.ArrayList[(Double, Long)],
      e: (Double, Long)): java.util.ArrayList[(Double, Long)] = {
    if (buf.size < k) { buf.add(e); return buf }
    var worst = 0
    var i = 1
    while (i < buf.size) {
      if (beats(buf.get(worst), buf.get(i))) worst = i
      i += 1
    }
    if (beats(e, buf.get(worst))) buf.set(worst, e)
    buf
  }

  override def update(buf: java.util.ArrayList[(Double, Long)],
      input: InternalRow): java.util.ArrayList[(Double, Long)] = {
    val o = ord.eval(input)
    val i = id.eval(input)
    // NaN has no position in the total order (`beats` would be false
    // both ways, letting a NaN squat in the buffer forever) — skip it,
    // like nulls
    if (o == null || i == null ||
      java.lang.Double.isNaN(o.asInstanceOf[Double])) buf
    else insert(buf, (o.asInstanceOf[Double], i.asInstanceOf[Long]))
  }

  override def merge(a: java.util.ArrayList[(Double, Long)],
      b: java.util.ArrayList[(Double, Long)])
      : java.util.ArrayList[(Double, Long)] = {
    var i = 0
    while (i < b.size) { insert(a, b.get(i)); i += 1 }
    a
  }

  override def eval(buf: java.util.ArrayList[(Double, Long)]): Any = {
    val arr = new Array[(Double, Long)](buf.size)
    var i = 0
    while (i < buf.size) { arr(i) = buf.get(i); i += 1 }
    val sorted = arr.sortWith(beats)
    new GenericArrayData(sorted.map { case (o, id) =>
      InternalRow(o, id)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: java.util.ArrayList[(Double, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putDouble(buf.get(i)._1); bb.putLong(buf.get(i)._2); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.ArrayList[(Double, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.ArrayList[(Double, Long)](math.max(n, k) + 1)
    var i = 0
    while (i < n) { buf.add((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(ord = newChildren(0), id = newChildren(1))
  override def prettyName: String = "graft_topk"
}
