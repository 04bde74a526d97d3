package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Bitmap distinct-set aggregate over dictionary-encoded ids (the
 * roaring-bitmap pattern of Chambi et al. 2016, in its dense form):
 * `graft_bitmap(id)` ORs each id into a bitset and returns the 64-bit
 * words. Unlike `count_distinct`, the RESULT is mergeable state:
 * per-group bitmaps re-aggregate to any rollup level by element-wise
 * OR (a `bit_or` over exploded words — no rescan), intersect by AND,
 * and count by popcount — the exact-set-algebra complement to the
 * approximate [[KmvAgg]]/HLL family.
 *
 * Why it exists at 100 TB: audience-overlap analyses (reach per
 * segment, cross-segment intersections, incremental reach rollups)
 * over dictionary-encoded user ids are the one place warehouses pay
 * for EXACT distinct at scale; the bitmap's partial/merge shape is the
 * same as sum()'s, and the buffer is bounded by the id-domain size
 * over 8 (bits), not the row count. Ids must be dictionary-encoded
 * and domain-bounded (enforced: [0, 2^26) ≈ 8 MB worst-case buffer);
 * production shards the dictionary per partition range, which keeps
 * each executor's buffers proportional to its id slice.
 */
case class BitmapAgg(
    id: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.BitSet] {

  override def children: Seq[Expression] = Seq(id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    id.dataType match {
      case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_bitmap requires an integral id, got " + other.simpleString)
    }

  override def createAggregationBuffer(): java.util.BitSet =
    new java.util.BitSet()

  override def update(buf: java.util.BitSet,
      input: InternalRow): java.util.BitSet = {
    val v = id.eval(input)
    if (v != null) {
      val i = v match {
        case l: java.lang.Long => l.longValue()
        case n: java.lang.Integer => n.longValue()
      }
      require(i >= 0 && i < (1L << 26),
        s"graft_bitmap id $i outside the dictionary domain [0, 2^26)")
      buf.set(i.toInt)
    }
    buf
  }

  override def merge(a: java.util.BitSet,
      b: java.util.BitSet): java.util.BitSet = {
    a.or(b)
    a
  }

  override def eval(buf: java.util.BitSet): Any = {
    val words = buf.toLongArray
    new GenericArrayData(words.map(w => w: Any))
  }

  override def serialize(buf: java.util.BitSet): Array[Byte] =
    buf.toByteArray

  override def deserialize(bytes: Array[Byte]): java.util.BitSet =
    java.util.BitSet.valueOf(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(id = newChildren(0))
  override def prettyName: String = "graft_bitmap"
}
