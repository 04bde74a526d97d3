package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Bloom-filter membership sketch over string keys (Bloom, CACM 1970):
 * `graft_bloom(key)` folds keys into a fixed 64 Ki-bit array with
 * k=4 hash functions; `graft_bloom_might(bloom, key)` tests
 * membership with NO false negatives and a bounded false-positive
 * rate (1 − e^(−kn/m))^k ≈ 0.24% at n=4096, 1.2% at n=8192.
 *
 * Why it exists at 100 TB: incremental dedup of a new batch against a
 * historical corpus of billions of digests cannot afford to shuffle
 * the batch against the full digest store every refresh. The bloom is
 * a FIXED 8 KB buffer per partition merging by bitwise OR (the same
 * partial/final shape as sum()), broadcast to the batch as one row;
 * bloom-negative rows are PROVABLY new and skip the exact-verify join
 * entirely — only the small bloom-positive slice (true dups + ~1%
 * false positives) pays the shuffle against the corpus store.
 * Production sizing scales m with n (e.g. sharded per-partition
 * blooms unioned by OR, or a ~10 bits/key single filter); the
 * mechanics (update, OR-merge, k-probe) are identical at any m.
 *
 * The k hash positions are 16-bit big-endian slices of md5(key)
 * (position j = hex chars 4j+1..4j+4, the [[CmsAgg]] md5-byte-row
 * discipline), a fixed public hash family DuckDB replays exactly —
 * so bloom HITS (including each individual false positive) are
 * oracle-predictable, not just the exact final output.
 */
case class BloomAgg(
    key: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(key)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    key.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom requires a string key, got " + other.simpleString)
    }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](BloomAgg.Words)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val k = key.eval(input)
    if (k != null)
      BloomAgg.add(buf, k.asInstanceOf[UTF8String])
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = serialize(buf)

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

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(key = newChildren(0))
  override def prettyName: String = "graft_bloom"
}

object BloomAgg {
  /** 64 Ki bits = 1024 longs = 8 KB; k = 4 md5-derived positions. */
  val Bits = 65536
  val Words: Int = Bits / 64
  val K = 4

  /** Position j = big-endian 16-bit slice of md5 bytes 2j, 2j+1 —
    * identical to `('0x' || substring(md5(key), 4*j+1, 4))::INTEGER`
    * in the DuckDB oracle. */
  def positions(key: UTF8String): Array[Int] = {
    val md = CmsAgg.md5Local.get()
    md.reset()
    val d = md.digest(key.getBytes)
    val out = new Array[Int](K)
    var j = 0
    while (j < K) {
      out(j) = ((d(2 * j) & 0xFF) << 8) | (d(2 * j + 1) & 0xFF)
      j += 1
    }
    out
  }

  def add(buf: Array[Long], key: UTF8String): Unit = {
    val ps = positions(key)
    var j = 0
    while (j < K) {
      buf(ps(j) >>> 6) |= 1L << (ps(j) & 63)
      j += 1
    }
  }

  /** Static membership probe for codegen: all k bit positions set. */
  def mightJava(bloom: Array[Byte], key: UTF8String): Boolean = {
    val ps = positions(key)
    var j = 0
    while (j < K) {
      val p = ps(j)
      // serialize() wrote big-endian longs: byte index inside the long
      // is 7 − (word-relative byte); equivalently flip bits 3..5.
      val byteIdx = (p >>> 6) * 8 + (7 - ((p >>> 3) & 7))
      if ((bloom(byteIdx) & (1 << (p & 7))) == 0) return false
      j += 1
    }
    true
  }
}

/** `graft_bloom_might(bloom, key)`: true iff every one of the key's k
  * md5-derived bit positions is set in the 8 KB bloom produced by
  * [[BloomAgg]] — no false negatives by construction. */
case class BloomMight(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_might requires (binary, string), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(bloom: Any, key: Any): Any =
    BloomAgg.mightJava(bloom.asInstanceOf[Array[Byte]],
      key.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, k) =>
      s"graft.functions.BloomAgg.mightJava($b, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_bloom_might"
}
