package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Count-min sketch aggregate over string keys (Cormode & Muthukrishnan,
 * "An improved data stream summary: the count-min sketch and its
 * applications", J. Algorithms 2005): `graft_cms(key)` builds a
 * depth×width counter matrix; the point estimate for a key is
 * min_j counters[j][h_j(key)], which never under-counts and
 * over-counts by more than ε·N with probability 1−δ.
 *
 * Why it exists at 100 TB: exact per-key counts of a high-cardinality
 * column (corpus vocabulary, URLs, user ids) shuffle every distinct
 * key; the sketch is a FIXED 8 KB buffer per partition that merges by
 * element-wise add — the same partial/final shape as sum(). Pair it
 * with [[TopKAgg]] for candidate keys and probe the sketch for their
 * frequencies.
 *
 * The row hashes are bytes 0..depth-1 of md5(key) — a fixed public
 * hash family that DuckDB replays exactly (byte j = hex chars 2j+1..2
 * of the md5 digest), so the ESTIMATE itself is oracle-checkable, not
 * just its error bound. A production deployment seeking formal
 * pairwise-independence guarantees would swap in seeded universal
 * hashes; the sketch mechanics (update, merge, min-probe) are
 * identical.
 */
case class CmsAgg(
    key: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  import CmsAgg.{Depth, Width}

  override def children: Seq[Expression] = Seq(key)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    key.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_cms requires a string key, got " + other.simpleString)
    }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](Depth * Width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val k = key.eval(input)
    if (k != null) {
      val md = CmsAgg.md5Local.get()
      md.reset()
      val d = md.digest(k.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
        .getBytes)
      var j = 0
      while (j < Depth) {
        buf(j * Width + (d(j) & 0xFF)) += 1L
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(Long.box).asInstanceOf[Array[Any]])

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(key = newChildren(0))
  override def prettyName: String = "graft_cms"
}

object CmsAgg {
  /** depth 4 × width 256: ε = e/256 ≈ 1.1%, δ = e^-4 ≈ 1.8%, 8 KB. */
  val Depth = 4
  val Width = 256

  private[functions] val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }
}
