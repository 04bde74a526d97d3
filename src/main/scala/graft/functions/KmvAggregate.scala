package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * K-minimum-values distinct sketch (Bar-Yossef et al. 2002; the
 * Theta-sketch family): `graft_kmv(key)` keeps the k smallest distinct
 * 60-bit hashes of the keys. Distinct-count estimate
 * (k−1)/R_k (R_k = k-th minimum as a fraction of the hash space), and
 * — unlike HLL — the retained sample supports SET OPERATIONS: a union
 * sketch is the k smallest of the merged sets, and intersection
 * estimates come from membership of the union's sample in both sides.
 *
 * Why it exists at 100 TB: distinct counts and overlap estimates
 * across corpus versions/sources without an exact dedup pass; the
 * buffer is ≤ k longs per partition and merges by sorted-set union —
 * the same partial/final shape as sum().
 *
 * The hash is the top 60 bits of md5 (= the first 15 hex chars), so
 * DuckDB replays the sketch CONTENTS and the ESTIMATE exactly
 * (`('0x' || substring(md5(x),1,15))::BIGINT` — the q_heavy_hitters
 * gating idea applied to a distinct sketch).
 */
case class KmvAgg(
    key: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k > 1, "k must exceed 1")

  override def children: Seq[Expression] = Seq(key)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    key.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_kmv requires a string key, got " + other.simpleString)
    }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long],
      h: Long): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last()) {
      if (buf.add(h)) { buf.remove(buf.last()); () }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = key.eval(input)
    if (v != null) {
      val md = CmsAgg.md5Local.get()
      md.reset()
      val d = md.digest(
        v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
      // top 60 bits of the digest = the first 15 hex chars
      val h = (((d(0) & 0xFFL) << 56) | ((d(1) & 0xFFL) << 48) |
        ((d(2) & 0xFFL) << 40) | ((d(3) & 0xFFL) << 32) |
        ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
        ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)) >>> 4
      insert(buf, h)
    }
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) insert(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr) // ascending (TreeSet order)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(key = newChildren(0))
  override def prettyName: String = "graft_kmv"
}
