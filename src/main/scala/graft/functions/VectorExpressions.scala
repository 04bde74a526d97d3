package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}
import org.apache.spark.sql.SparkSessionExtensions

/**
 * Native Catalyst expressions (with `doGenCode`) for the vector-math hot
 * loop of similarity search / embedding dedup. The `zip_with`/`aggregate`
 * higher-order-function formulation in [[VectorOps]] is semantically
 * identical but evaluates interpreted, one boxed lambda call per element;
 * these compile to a tight primitive loop inside whole-stage codegen —
 * ~10x on the 64-dim corpus (measured via graft.Bench q_ann_ivf /
 * q_dedup_embedding).
 *
 * Accumulation is double-precision in index order, matching both the HOF
 * formulation and the DuckDB oracle's `list_dot_product`, so results are
 * bit-identical to the previous implementation.
 *
 * Null semantics: a null array yields null (nullSafeEval); null *elements*
 * contribute 0.0 (embeddings never contain null elements; documented for
 * completeness). Length mismatch uses the common prefix, like `zip_with`
 * ignoring the null-padded tail.
 */
object VectorKernels {

  /** Shared dot/norms loop. Locals are `ctx.freshName`d: with two
    * non-nullable kernels in one whole-stage-codegen scope,
    * `nullSafeCodeGen` inlines the block unbraced at method scope, and
    * fixed names would collide (javac error → silent interpreted
    * fallback). Returns (code, dotVar, naVar, nbVar). */
  private def loopCode(ctx: CodegenContext, a: String, b: String)
      : (String, String, String, String) = {
    val n = ctx.freshName("n"); val i = ctx.freshName("i")
    val dot = ctx.freshName("dot")
    val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
    val x = ctx.freshName("x"); val y = ctx.freshName("y")
    val code =
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.isNullAt($i) ? 0.0 : (double) $a.getFloat($i);
         |  double $y = $b.isNullAt($i) ? 0.0 : (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |""".stripMargin
    (code, dot, na, nb)
  }

  private def accumulate(a: ArrayData, b: ArrayData): (Double, Double, Double) = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (a.isNullAt(i)) 0.0 else a.getFloat(i).toDouble
      val y = if (b.isNullAt(i)) 0.0 else b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    (dot, na, nb)
  }

  /** Σ aᵢ·bᵢ over float vectors, double accumulation. */
  case class FloatVecDot(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (Seq(left, right).forall(_.dataType match {
        case ArrayType(FloatType, _) => true; case _ => false }))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> inputs, got " +
          Seq(left, right).map(_.dataType.simpleString).mkString(", "))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_dot"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      accumulate(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])._1
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val (code, dot, _, _) = loopCode(ctx, a, b)
        code + s"${ev.value} = $dot;"
      })
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Cosine similarity; null on zero-norm input (0/0 is undefined). */
  case class FloatVecCosine(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (Seq(left, right).forall(_.dataType match {
        case ArrayType(FloatType, _) => true; case _ => false }))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> inputs, got " +
          Seq(left, right).map(_.dataType.simpleString).mkString(", "))
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_cosine"
    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val (dot, na, nb) =
        accumulate(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      if (na == 0.0 || nb == 0.0) null
      else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val (code, dot, na, nb) = loopCode(ctx, a, b)
        code +
          s"""
             |if ($na == 0.0 || $nb == 0.0) {
             |  ${ev.isNull} = true;
             |} else {
             |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
             |}
             |""".stripMargin
      })
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Squared L2 distance. */
  case class FloatVecL2Sq(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (Seq(left, right).forall(_.dataType match {
        case ArrayType(FloatType, _) => true; case _ => false }))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> inputs, got " +
          Seq(left, right).map(_.dataType.simpleString).mkString(", "))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_l2sq"
    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0; var i = 0
      while (i < n) {
        val xv = if (x.isNullAt(i)) 0.0 else x.getFloat(i).toDouble
        val yv = if (y.isNullAt(i)) 0.0 else y.getFloat(i).toDouble
        val d = xv - yv; s += d * d; i += 1
      }
      s
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val s = ctx.freshName("s"); val d = ctx.freshName("d")
        val x = ctx.freshName("x"); val y = ctx.freshName("y")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $x = $a.isNullAt($i) ? 0.0 : (double) $a.getFloat($i);
           |  double $y = $b.isNullAt($i) ? 0.0 : (double) $b.getFloat($i);
           |  double $d = $x - $y; $s += $d * $d;
           |}
           |${ev.value} = $s;
           |""".stripMargin
      })
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** ‖a‖₂ (double). */
  case class FloatVecNorm(child: Expression)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float> input, got " + other.simpleString)
      }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_norm"
    override protected def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      var s = 0.0; var i = 0
      while (i < x.numElements()) {
        val xv = if (x.isNullAt(i)) 0.0 else x.getFloat(i).toDouble
        s += xv * xv; i += 1
      }
      math.sqrt(s)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a =>
        s"graft.functions.VectorKernels.normJava($a)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Codegen helper for [[FloatVecNorm]] (call-out keeps generated code tiny). */
  def normJava(x: ArrayData): Double = {
    var s = 0.0; var i = 0
    while (i < x.numElements()) {
      val xv = if (x.isNullAt(i)) 0.0 else x.getFloat(i).toDouble
      s += xv * xv; i += 1
    }
    math.sqrt(s)
  }

  /** splitmix64 finalizer: the per-seed hash family for minhash. */
  @inline private def mix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** MinHash: sig[j] = min over elements of mix64(h ^ seed_j). */
  def minhashJava(arr: ArrayData, k: Int): ArrayData = {
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var j = 0
        while (j < k) {
          val v = mix64(h ^ (j.toLong * 0xA24BAED4963EE407L))
          if (v < sig(j)) sig(j) = v
          j += 1
        }
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(sig)
  }

  /** SimHash: per-bit ±1 votes over pre-hashed tokens, sign → bit. */
  def simhashJava(hashes: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    while (i < hashes.numElements()) {
      if (!hashes.isNullAt(i)) {
        val h = hashes.getLong(i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Agreement count between two equal-length signature arrays (the
    * minhash Jaccard estimator numerator). */
  def sigAgreeJava(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0; var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  /**
   * Word n-gram shingles of a document, 64-bit-hashed (FNV-1a over
   * chars) and deduplicated, in one native pass. Tokenization and
   * shingle-window semantics replicate the SQL formulation the DuckDB
   * oracle replays (split on single space keeping empties; for docs
   * with fewer than n tokens, one shingle of all tokens):
   * Jaccard over these hash sets equals Jaccard over the string sets
   * (collision p ≈ n²/2⁶⁵ per pair).
   */
  def shingleHashesJava(text: org.apache.spark.unsafe.types.UTF8String,
      n: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val count = math.max(toks.length - n, 0) + 1
    val seen = new java.util.HashSet[java.lang.Long](count * 2)
    val out = new Array[Long](count)
    var m = 0
    var i = 0
    while (i < count) {
      // FNV-1a 64 over the chars of tok[i] + " " + ... + tok[i+n-1]
      var h = 0xCBF29CE484222325L
      var k = 0
      val end = math.min(i + n, toks.length)
      var j = i
      while (j < end) {
        if (j > i) { h = (h ^ ' '.toLong) * 0x100000001B3L }
        val t = toks(j)
        k = 0
        while (k < t.length) {
          h = (h ^ t.charAt(k).toLong) * 0x100000001B3L
          k += 1
        }
        j += 1
      }
      if (seen.add(h)) { out(m) = h; m += 1 }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      java.util.Arrays.copyOf(out, m))
  }

  /** FNV-1a 64 over the chars of one string (the [[shingleHashesJava]]
    * hash, factored out for the segment-dedup kernels). */
  def fnv1aJava(s: String): Long = {
    var h = 0xCBF29CE484222325L
    var k = 0
    while (k < s.length) {
      h = (h ^ s.charAt(k).toLong) * 0x100000001B3L
      k += 1
    }
    h
  }

  /** Non-overlapping k-word chunks of a text (split on single space
    * keeping empties, last chunk may be short) — the native form of the
    * HOF `transform(sequence…, slice…)` chunker, which costs ~1ms of
    * interpreted lambdas per document. Order preserved, duplicates
    * kept. */
  def wordChunksJava(text: org.apache.spark.unsafe.types.UTF8String,
      k: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val count = (toks.length + k - 1) / k
    val out = new Array[org.apache.spark.unsafe.types.UTF8String](count)
    var c = 0
    while (c < count) {
      val sb = new java.lang.StringBuilder
      val end = math.min((c + 1) * k, toks.length)
      var j = c * k
      while (j < end) {
        if (j > c * k) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out(c) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
      c += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** See [[wordChunksJava]]. */
  case class WordChunks(child: Expression, k: Int) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case org.apache.spark.sql.types.StringType =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string input, got " + other.simpleString)
      }
    override def dataType: DataType =
      ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
    override def prettyName: String = "graft_word_chunks"
    override protected def nullSafeEval(a: Any): Any =
      wordChunksJava(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a =>
        s"graft.functions.VectorKernels.wordChunksJava($a, $k)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** FNV-1a 64 of every element of a string array (order preserved,
    * duplicates kept) — one native pass replacing the interpreted
    * `transform(segs, xxhash64)` lambda. */
  def segHashesJava(segs: ArrayData): ArrayData = {
    val n = segs.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (segs.isNullAt(i)) fnv1aJava("")
        else fnv1aJava(segs.getUTF8String(i).toString)
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** See [[segHashesJava]]. */
  case class SegHashes(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(org.apache.spark.sql.types.StringType, _) =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string> input, got " + other.simpleString)
      }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_seg_hashes"
    override protected def nullSafeEval(a: Any): Any =
      segHashesJava(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a =>
        s"graft.functions.VectorKernels.segHashesJava($a)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Drop segments whose FNV-1a hash is in the SORTED `boiler` array
    * (binary search per segment), re-join keepers with `delim` (' '
    * for word chunks, '\n' for line segments): the segment-dedup
    * removal pass as one native kernel — (n_segments, n_removed,
    * clean). The boiler set arrives as a regular column (it is
    * data-dependent, broadcast via a 1-row crossJoin), so this is a
    * binary expression, not a literal-bound one. */
  def segStripJava(segs: ArrayData, boiler: ArrayData, delim: String)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val nb = boiler.numElements()
    val b = new Array[Long](nb)
    var i = 0
    while (i < nb) { b(i) = boiler.getLong(i); i += 1 }
    val n = segs.numElements()
    val sb = new java.lang.StringBuilder
    var removed = 0
    var kept = 0
    i = 0
    while (i < n) {
      val s = if (segs.isNullAt(i)) "" else segs.getUTF8String(i).toString
      if (java.util.Arrays.binarySearch(b, fnv1aJava(s)) >= 0) removed += 1
      else {
        if (kept > 0) sb.append(delim)
        sb.append(s)
        kept += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, removed,
        org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)))
  }

  /** See [[segStripJava]]. `delim` rides the expression as model
    * material (like [[ShingleHashes]]'s `n`), not a child column. */
  case class SegStrip(left: Expression, right: Expression,
      delim: String = " ")
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(org.apache.spark.sql.types.StringType, _),
            ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<string>, array<bigint>), got " + other)
      }
    override def dataType: DataType = org.apache.spark.sql.types.StructType(
      Seq(
        org.apache.spark.sql.types.StructField("n_segments", IntegerType,
          nullable = false),
        org.apache.spark.sql.types.StructField("n_removed", IntegerType,
          nullable = false),
        org.apache.spark.sql.types.StructField("clean",
          org.apache.spark.sql.types.StringType, nullable = false)))
    override def prettyName: String = "graft_seg_strip"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      segStripJava(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
        delim)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val d = ctx.addReferenceObj("segDelim", delim, "java.lang.String")
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.VectorKernels.segStripJava($a, $b, $d)")
    }
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** See [[shingleHashesJava]]. */
  case class ShingleHashes(child: Expression, n: Int)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case org.apache.spark.sql.types.StringType =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string input, got " + other.simpleString)
      }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_shingles"
    override protected def nullSafeEval(a: Any): Any =
      shingleHashesJava(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a =>
        s"graft.functions.VectorKernels.shingleHashesJava($a, $n)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Word n-grams as strings (order preserved, duplicates kept) — the
    * vocabulary-statistics primitive. Same tokenize+window semantics as
    * [[shingleHashesJava]] but emitting the strings themselves. */
  def ngramsJava(text: org.apache.spark.unsafe.types.UTF8String,
      n: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val count = math.max(toks.length - n + 1, 0)
    val out = new Array[org.apache.spark.unsafe.types.UTF8String](count)
    var i = 0
    while (i < count) {
      val sb = new java.lang.StringBuilder
      var j = i
      while (j < i + n) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(
        sb.toString)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.asInstanceOf[Array[Any]])
  }

  /** See [[ngramsJava]]. */
  case class NGrams(child: Expression, n: Int) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case org.apache.spark.sql.types.StringType =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string input, got " + other.simpleString)
      }
    override def dataType: DataType =
      ArrayType(org.apache.spark.sql.types.StringType,
        containsNull = false)
    override def prettyName: String = "graft_ngrams"
    override protected def nullSafeEval(a: Any): Any =
      ngramsJava(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a =>
        s"graft.functions.VectorKernels.ngramsJava($a, $n)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /**
   * 64-bit polynomial rolling hash over a string's code points:
   * h = fold((h·131 + cp) mod 1e9+7, 0) — the Rabin-Karp fingerprint
   * primitive. Code-point semantics match the DuckDB oracle
   * (`list_transform(string_split(text,''), ascii)` iterates code
   * points); they diverge from the Spark HOF form
   * (`aggregate(transform(split(text,''), ascii), ...)`) on
   * supplementary (non-BMP) characters, where Spark's split('')
   * yields UTF-16 surrogate halves. One native pass instead of a
   * boxed interpreted lambda per character.
   * M < 2^31, so h·B + cp never overflows.
   */
  def rollingHashJava(text: org.apache.spark.unsafe.types.UTF8String): Long = {
    val s = text.toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 131L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    h
  }

  /**
   * DEFLATE-compressed size of a string's UTF-8 bytes (zlib level 6,
   * raw Deflater reset per call from a thread-local) — the
   * compression-ratio quality signal: repetitive/templated junk
   * compresses far better than natural prose, so
   * deflate_size/byte_length separates them (the RefinedWeb/Dolma
   * heuristic). The absolute length depends on the zlib build, so
   * gates hash only INEQUALITIES on it, never the raw size.
   */
  def deflateSizeJava(
      text: org.apache.spark.unsafe.types.UTF8String): Int = {
    val d = deflaterLocal.get()
    d.reset()
    val in = text.getBytes
    d.setInput(in)
    d.finish()
    var total = 0
    val out = new Array[Byte](8192)
    while (!d.finished()) total += d.deflate(out)
    total
  }

  private val deflaterLocal = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, false)
  }

  /** See [[deflateSizeJava]]: string → int. */
  case class DeflateSize(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case org.apache.spark.sql.types.StringType =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string input, got " + other.simpleString)
      }
    override def dataType: DataType = IntegerType
    override def prettyName: String = "graft_deflate_size"
    override protected def nullSafeEval(a: Any): Any =
      deflateSizeJava(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a =>
        s"graft.functions.VectorKernels.deflateSizeJava($a)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** See [[rollingHashJava]]: string → bigint. */
  case class RollingHash(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case org.apache.spark.sql.types.StringType =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string input, got " + other.simpleString)
      }
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_rolling_hash"
    override protected def nullSafeEval(a: Any): Any =
      rollingHashJava(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a =>
        s"graft.functions.VectorKernels.rollingHashJava($a)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Unicode NFC canonical composition (UAX #15) — see [[NfcNormalize]].
    * Fast path: an already-composed string (every pure-ASCII string is)
    * returns the input buffer untouched, so the overwhelmingly common
    * case does zero allocation; only rows that actually carry combining
    * marks pay the normalizer. The JDK and DuckDB's utf8proc implement
    * the same Unicode algorithm, so the oracle comparison is exact. */
  def nfcJava(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** See [[nfcJava]]: string → NFC-normalized string. The canonical-
    * composition pass every web-scale text pipeline runs before hashing
    * or dedup (decomposed e+U+0301 must hash like precomposed é). */
  case class NfcNormalize(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case org.apache.spark.sql.types.StringType =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string input, got " + other.simpleString)
      }
    override def dataType: DataType = org.apache.spark.sql.types.StringType
    override def prettyName: String = "graft_nfc"
    override protected def nullSafeEval(a: Any): Any =
      nfcJava(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a =>
        s"graft.functions.VectorKernels.nfcJava($a)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the
    * MOSS algorithm) over word k-grams: hash every k-gram (first 32
    * bits of its md5, so the SQL oracle reproduces the hash exactly),
    * slide a window of `w` hashes, keep each window's minimum; the
    * fingerprint set is the sorted distinct minima. Guarantees: any
    * shared substring of ≥ w+k-1 words between two documents yields at
    * least one shared fingerprint, at ~1/w the storage of the full
    * hash sequence — substring-granularity overlap detection without
    * shipping every shingle.
    *
    * Short-input convention mirrors the SQL formulation: fewer than k
    * words → ONE k-gram of all available words; fewer than w hashes →
    * one window over them all. One pass, no allocation beyond the
    * gram strings and the result set. */
  def winnowJava(text: org.apache.spark.unsafe.types.UTF8String,
      k: Int, w: Int): ArrayData = {
    val words = text.toString.split(" ", -1)
    val n = words.length
    val nGrams = math.max(n - k + 1, 1)
    val hashes = new Array[Long](nGrams)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < nGrams) {
      val sb = new java.lang.StringBuilder
      var j = i
      val end = math.min(i + k, n)
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(words(j))
        j += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes
        (java.nio.charset.StandardCharsets.UTF_8))
      hashes(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    val minima = new java.util.TreeSet[java.lang.Long]()
    val nWin = math.max(nGrams - w + 1, 1)
    i = 0
    while (i < nWin) {
      var min = Long.MaxValue
      var j = i
      val end = math.min(i + w, nGrams)
      while (j < end) {
        if (hashes(j) < min) min = hashes(j)
        j += 1
      }
      minima.add(min)
      i += 1
    }
    val out = new Array[Long](minima.size)
    val it = minima.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** Content-defined chunk CUT POINTS (code-point offsets) in one
    * native pass — the kernel behind `Dedup.cdcChunksOver`. A cut
    * lands after code point i+8 when the polynomial hash of the
    * 8-code-point window starting at i — Σ_j cp(i+j)·31^j — is
    * ≡ 0 (mod 64). Semantics are EXACTLY the SQL formulation's
    * `ascii(substr(text, i+j, 1))` (code points, not UTF-16 chars or
    * bytes), so the DuckDB oracle replays the boundary rule
    * bit-for-bit; the kernel exists because the HOF lambda
    * formulation re-evaluates an O(L) transform per downstream
    * reference once the optimizer inlines it (O(L²) per document —
    * measured 15 s for the sf0.1 gate vs sub-second here). */
  def cdcCutsJava(text: org.apache.spark.unsafe.types.UTF8String)
      : ArrayData = {
    val s = text.toString
    // code points once (supplementary-safe), then one rolling pass
    val n = s.codePointCount(0, s.length)
    val cp = new Array[Long](n)
    var ci = 0; var off = 0
    while (off < s.length) {
      val c = s.codePointAt(off)
      cp(ci) = c.toLong
      ci += 1
      off += Character.charCount(c)
    }
    if (n < 8) return org.apache.spark.sql.catalyst.util.ArrayData
      .toArrayData(new Array[Long](0))
    val out = new java.util.ArrayList[java.lang.Long]()
    var i = 0
    while (i <= n - 8) {
      var h = 0L; var j = 7
      while (j >= 0) { h = h * 31L + cp(i + j); j -= 1 }
      if (h % 64L == 0L) out.add(i + 8L)
      i += 1
    }
    val arr = new Array[Long](out.size)
    var k2 = 0
    while (k2 < arr.length) { arr(k2) = out.get(k2); k2 += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(arr)
  }

  /** See [[winnowJava]]: string → sorted distinct window-min hashes. */
  case class Winnow(child: Expression, k: Int, w: Int)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case org.apache.spark.sql.types.StringType =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string input, got " + other.simpleString)
      }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_winnow"
    override protected def nullSafeEval(a: Any): Any =
      winnowJava(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a =>
        s"graft.functions.VectorKernels.winnowJava($a, $k, $w)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** See [[cdcCutsJava]]: string → content-defined cut points. */
  case class CdcCuts(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case org.apache.spark.sql.types.StringType =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string input, got " + other.simpleString)
      }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_cdc_cuts"
    override protected def nullSafeEval(a: Any): Any =
      cdcCutsJava(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a =>
        s"graft.functions.VectorKernels.cdcCutsJava($a)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /**
   * First-fit-decreasing bin packing over ONE rank-ordered segment of
   * documents — the per-group kernel of the FFD packing operator
   * ([[graft.operators.Curation.ffdPackQuery]]). Input: the segment's
   * docs as array<struct<rk, doc_id, n_tok>> already sorted by rank
   * (global length-desc order, ties doc_id). Classic FFD: each doc
   * goes to the FIRST open pack whose load + n_tok fits the budget,
   * else opens a new pack; its intra-pack offset is the pack's load
   * before insertion. A doc longer than the budget takes a dedicated
   * pack sealed at `budget` (truncation is the caller's concern).
   * Output, in input order: array<struct<doc_id, pack, offset,
   * n_tok>> with 0-based segment-local pack ids. Sequential by
   * construction (FFD's state is the open-pack loads), which is
   * exactly why it runs per bounded segment as a kernel instead of
   * pretending to be a prefix aggregate.
   */
  def ffdPackJava(docs: ArrayData, budget: Long): ArrayData = {
    val n = docs.numElements()
    val loads = new scala.collection.mutable.ArrayBuffer[Long](16)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val row = docs.getStruct(i, 3)
      val docId = row.getLong(1)
      val nt = row.getLong(2)
      var pack = -1
      var off = 0L
      if (nt > budget) {
        pack = loads.length
        loads += budget
      } else {
        var j = 0
        while (j < loads.length && pack < 0) {
          if (loads(j) + nt <= budget) {
            pack = j; off = loads(j); loads(j) += nt
          }
          j += 1
        }
        if (pack < 0) { pack = loads.length; loads += nt }
      }
      out(i) = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](docId, pack.toLong, off, nt))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** See [[ffdPackJava]]: array<struct<rk,doc_id,n_tok>> →
    * array<struct<doc_id,pack,offset,n_tok>>. `budget` rides the
    * expression as a foldable literal (the [[ShingleHashes]] rule). */
  case class FfdPack(child: Expression, budget: Long)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(s: org.apache.spark.sql.types.StructType, _)
            if s.length == 3 &&
              s.forall(_.dataType == LongType) =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<struct<bigint,bigint,bigint>>, " +
            "got " + other.simpleString)
      }
    override def dataType: DataType = ArrayType(
      org.apache.spark.sql.types.StructType(
        Seq("doc_id", "pack", "offset", "n_tok").map(
          org.apache.spark.sql.types.StructField(_, LongType,
            nullable = false))),
      containsNull = false)
    override def prettyName: String = "graft_ffd_pack"
    override protected def nullSafeEval(a: Any): Any =
      ffdPackJava(a.asInstanceOf[ArrayData], budget)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a =>
        s"graft.functions.VectorKernels.ffdPackJava($a, ${budget}L)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  private def longArrayCheck(e: Expression, name: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires array<bigint> input, got " + other.simpleString)
    }

  /**
   * MinHash signature over a 64-bit-hashed shingle set: k splitmix64
   * seed-mixed minima in one native pass (the `aggregate`/`zip_with`
   * formulation evaluates k×|shingles| interpreted lambdas per row —
   * ~10x slower at sf0.1).
   */
  case class MinHashSignature(child: Expression, k: Int)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      longArrayCheck(child, prettyName)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_minhash"
    override protected def nullSafeEval(a: Any): Any =
      minhashJava(a.asInstanceOf[ArrayData], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a =>
        s"graft.functions.VectorKernels.minhashJava($a, $k)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** 64-bit SimHash over pre-hashed tokens (array<long> → long). */
  case class SimHash64(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      longArrayCheck(child, prettyName)
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_simhash"
    override protected def nullSafeEval(a: Any): Any =
      simhashJava(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a =>
        s"graft.functions.VectorKernels.simhashJava($a)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Count of agreeing positions between two signature arrays. */
  case class SignatureAgreement(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = {
      val l = longArrayCheck(left, prettyName)
      if (l != TypeCheckResult.TypeCheckSuccess) l
      else longArrayCheck(right, prettyName)
    }
    override def dataType: DataType = IntegerType
    override def prettyName: String = "graft_sig_agree"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      sigAgreeJava(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.VectorKernels.sigAgreeJava($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /**
   * Top-n nearest centroid indices by cosine, one pass over a small
   * centroid matrix (the IVF coarse quantizer): returns cell ids
   * 0..k-1 ordered by similarity desc, ties to the lower index.
   * The matrix rides along as a reference object — k×dims floats —
   * so assignment is a narrow projection: no join, no shuffle, and
   * codegen-friendly (the loop is O(k·dims) per row, not an
   * expression-tree blowup).
   */
  def nearestCellsJava(emb: ArrayData, cents: Array[Array[Float]],
      n: Int): ArrayData = {
    val k = cents.length
    val sims = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cent = cents(c)
      val d = math.min(emb.numElements(), cent.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < d) {
        val x = if (emb.isNullAt(i)) 0.0 else emb.getFloat(i).toDouble
        val y = cent(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      sims(c) =
        if (na == 0.0 || nb == 0.0) Double.NegativeInfinity
        else dot / (math.sqrt(na) * math.sqrt(nb))
      c += 1
    }
    val out = new Array[Int](math.min(n, k))
    val taken = new Array[Boolean](k)
    var j = 0
    while (j < out.length) {
      var best = -1; var bestSim = Double.NegativeInfinity
      var m = 0
      while (m < k) {
        if (!taken(m) && sims(m) > bestSim) { best = m; bestSim = sims(m) }
        m += 1
      }
      taken(best) = true; out(j) = best
      j += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** Index of the L2-nearest centroid (the product-quantization
    * assignment rule — unlike the IVF coarse quantizer, PQ must honor
    * sub-vector MAGNITUDE, so cosine is the wrong metric here). Ties
    * to the lower index; one O(k·dims) pass, same shape as
    * [[nearestCellsJava]]. */
  def nearestCellL2Java(emb: ArrayData, cents: Array[Array[Float]]): Int = {
    val k = cents.length
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < k) {
      val cent = cents(c)
      val d = math.min(emb.numElements(), cent.length)
      var acc = 0.0
      var i = 0
      while (i < d) {
        val x = if (emb.isNullAt(i)) 0.0 else emb.getFloat(i).toDouble
        val diff = x - cent(i)
        acc += diff * diff
        i += 1
      }
      if (acc < bestD) { bestD = acc; best = c }
      c += 1
    }
    best
  }

  /** See [[nearestCellL2Java]]. */
  case class NearestCellL2(child: Expression, cents: Array[Array[Float]])
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float> input, got " + other.simpleString)
      }
    override def dataType: DataType = IntegerType
    override def prettyName: String = "graft_nearest_cell_l2"
    override protected def nullSafeEval(a: Any): Any =
      nearestCellL2Java(a.asInstanceOf[ArrayData], cents)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val centsRef = ctx.addReferenceObj("cents", cents, "float[][]")
      defineCodeGen(ctx, ev, a =>
        s"graft.functions.VectorKernels.nearestCellL2Java($a, $centsRef)")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** See [[nearestCellsJava]]. */
  case class NearestCells(child: Expression, cents: Array[Array[Float]],
      n: Int) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float> input, got " + other.simpleString)
      }
    override def dataType: DataType =
      ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "graft_nearest_cells"
    override protected def nullSafeEval(a: Any): Any =
      nearestCellsJava(a.asInstanceOf[ArrayData], cents, n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val centsRef = ctx.addReferenceObj("cents", cents, "float[][]")
      defineCodeGen(ctx, ev, a =>
        s"graft.functions.VectorKernels.nearestCellsJava($a, $centsRef, $n)")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // ----------------------------------------------- beam-tree assignment

  /** Beam width / branching / leaf size for [[buildCentTree]]. Beam 4
    * over branch 16 keeps per-row work ≈ branch + depth·beam·branch +
    * beam·leafCap dot products — O(log k), not O(k) — while measured
    * top-1 agreement with the exact scan stays ≥97% on clustered
    * corpora (CentTreeSpec). */
  val TreeBranch = 16
  val TreeLeafCap = 128
  val TreeBeam = 4

  /** Deterministic driver-side build of the centroid search tree:
    * recursive k-means over the CENTROIDS (k points — trivial at any
    * k the dynamic-k law produces), stride seeding, 3 Lloyd rounds
    * per node, groups in ascending-seed order so the structure is a
    * pure function of the input matrix. */
  def buildCentTree(cents: Array[Array[Float]],
      branch: Int = TreeBranch, leafCap: Int = TreeLeafCap,
      l2: Boolean = false): CentTree = {
    import scala.collection.mutable.ArrayBuffer
    val nodeVec = ArrayBuffer[Array[Float]]()
    val childStart = ArrayBuffer[Int]()
    val childEnd = ArrayBuffer[Int]()
    val leafIds = ArrayBuffer[Array[Int]]()
    def sim(a: Array[Float], b: Array[Float]): Double = {
      val d = math.min(a.length, b.length)
      if (l2) {
        var acc = 0.0; var i = 0
        while (i < d) { val df = a(i).toDouble - b(i); acc += df * df; i += 1 }
        -acc
      } else {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < d) {
          val x = a(i).toDouble; val y = b(i).toDouble
          dot += x * y; na += x * x; nb += y * y; i += 1
        }
        if (na == 0.0 || nb == 0.0) Double.NegativeInfinity
        else dot / (math.sqrt(na) * math.sqrt(nb))
      }
    }
    def groupMean(ids: Array[Int]): Array[Float] = {
      val dims = cents(ids(0)).length
      val acc = new Array[Double](dims)
      ids.foreach { id =>
        val v = cents(id); var i = 0
        while (i < math.min(dims, v.length)) { acc(i) += v(i); i += 1 }
      }
      acc.map(x => (x / ids.length).toFloat)
    }
    // returns the node-id range of the children created from `ids`
    def build(ids: Array[Int]): (Int, Int) = {
      val b = math.min(branch, ids.length)
      var mats = Array.tabulate(b)(j =>
        cents(ids((j.toLong * ids.length / b).toInt)).clone())
      val assign = new Array[Int](ids.length)
      var iter = 0
      while (iter < 3) {
        var i = 0
        while (i < ids.length) {
          var best = 0; var bestS = Double.NegativeInfinity; var j = 0
          while (j < b) {
            val s = sim(cents(ids(i)), mats(j))
            if (s > bestS) { bestS = s; best = j }
            j += 1
          }
          assign(i) = best; i += 1
        }
        val next = mats.map(_.clone())
        var j = 0
        while (j < b) {
          val members = ids.indices.filter(assign(_) == j)
          if (members.nonEmpty)
            next(j) = groupMean(members.map(ids).toArray)
          j += 1
        }
        mats = next; iter += 1
      }
      val groups: Seq[Array[Int]] = (0 until b)
        .map(j => ids.indices.filter(assign(_) == j).map(ids).toArray)
        .filter(_.nonEmpty)
      val start = nodeVec.length
      groups.foreach { g =>
        nodeVec += groupMean(g); childStart += -1; childEnd += -1
        leafIds += null
      }
      val end = nodeVec.length
      groups.zipWithIndex.foreach { case (g, gi) =>
        val nid = start + gi
        // a group that failed to split (identical vectors) must leaf
        // out even above leafCap, or the recursion never terminates
        if (g.length <= leafCap || g.length == ids.length)
          leafIds(nid) = g
        else {
          val (cs, ce) = build(g)
          childStart(nid) = cs; childEnd(nid) = ce
        }
      }
      (start, end)
    }
    val all = Array.range(0, cents.length)
    val (rs, re) =
      if (cents.length <= leafCap) {
        nodeVec += groupMean(all); childStart += -1; childEnd += -1
        leafIds += all
        (0, 1)
      } else build(all)
    new CentTree(cents, nodeVec.toArray, childStart.toArray,
      childEnd.toArray, leafIds.toArray, rs, re, l2)
  }

  /**
   * Tree-accelerated [[nearestCellsJava]]: beam search down the
   * centroid tree, then the EXACT metric over only the candidate
   * leaves' centroids — same output shape and tie rule (sim desc,
   * ties to the lower centroid index). Falls back to the exhaustive
   * scan when the beam gathers fewer than n candidates. Approximate
   * by construction (a query near a node boundary can descend the
   * wrong subtree); the deviation bound is spec-measured, and every
   * consumer is a candidate-blocking step whose completeness gate
   * catches recall loss.
   */
  def nearestCellsTreeJava(emb: ArrayData, tree: CentTree, n: Int)
      : ArrayData = {
    val dims = emb.numElements()
    val q = new Array[Double](dims)
    var qi = 0
    while (qi < dims) {
      q(qi) = if (emb.isNullAt(qi)) 0.0 else emb.getFloat(qi).toDouble
      qi += 1
    }
    var qn = 0.0
    qi = 0
    while (qi < dims) { qn += q(qi) * q(qi); qi += 1 }
    def simTo(c: Array[Float]): Double = {
      val d = math.min(dims, c.length)
      if (tree.l2) {
        var acc = 0.0; var i = 0
        while (i < d) { val df = q(i) - c(i); acc += df * df; i += 1 }
        -acc
      } else {
        var dot = 0.0; var nb = 0.0; var i = 0
        while (i < d) {
          val y = c(i).toDouble; dot += q(i) * y; nb += y * y; i += 1
        }
        if (qn == 0.0 || nb == 0.0) Double.NegativeInfinity
        else dot / (math.sqrt(qn) * math.sqrt(nb))
      }
    }
    val cands = scala.collection.mutable.ArrayBuffer[Int]()
    var frontier = Array.range(tree.rootStart, tree.rootEnd)
    while (frontier.nonEmpty) {
      val sims = frontier.map(nid => simTo(tree.nodeVec(nid)))
      val take = math.min(TreeBeam, frontier.length)
      val taken = new Array[Boolean](frontier.length)
      val next = scala.collection.mutable.ArrayBuffer[Int]()
      var t = 0
      while (t < take) {
        var best = -1; var bestS = Double.NegativeInfinity; var i = 0
        while (i < frontier.length) {
          if (!taken(i) && sims(i) > bestS) { best = i; bestS = sims(i) }
          i += 1
        }
        taken(best) = true
        val nid = frontier(best)
        if (tree.leafIds(nid) != null) cands ++= tree.leafIds(nid)
        else {
          var c = tree.childStart(nid)
          while (c < tree.childEnd(nid)) { next += c; c += 1 }
        }
        t += 1
      }
      frontier = next.toArray
    }
    if (cands.length < n)
      return nearestCellsJava(emb, tree.cents, n)
    // exact metric over candidates, ascending id order so ties break
    // to the lower centroid index exactly like the exhaustive scan
    val ids = cands.toArray
    java.util.Arrays.sort(ids)
    val sims = ids.map(id => simCent(emb, tree.cents(id), tree.l2))
    val out = new Array[Int](math.min(n, ids.length))
    val taken = new Array[Boolean](ids.length)
    var j = 0
    while (j < out.length) {
      var best = -1; var bestS = Double.NegativeInfinity; var m = 0
      while (m < ids.length) {
        if (!taken(m) && sims(m) > bestS) { best = m; bestS = sims(m) }
        m += 1
      }
      taken(best) = true; out(j) = ids(best); j += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /**
   * Per-group sub-quantizer assignment (r18, VERDICT r17 #2): top-n
   * nearest SUB-centroids within the row's group, where each group
   * (an oversized level-1 IVF cell) carries its own small matrix.
   * Rows whose group has no sub-quantizer get sub 0 — callers only
   * apply this to rows of re-blocked groups, the guard is defensive.
   * Cosine metric, same tie rule as [[nearestCellsJava]].
   */
  def nearestCellsGrpJava(group: Long, emb: ArrayData,
      mats: java.util.HashMap[java.lang.Long, Array[Array[Float]]],
      n: Int): ArrayData = {
    val m = mats.get(group)
    if (m == null)
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(0))
    else nearestCellsJava(emb, m, n)
  }

  /** See [[nearestCellsGrpJava]]. `groups`/`mats` are parallel
    * (group id → its sub-centroid matrix), shipped as one HashMap
    * reference object. */
  case class NearestCellsGrouped(left: Expression, right: Expression,
      groups: Seq[Long], mats: Seq[Array[Array[Float]]], n: Int)
      extends BinaryExpression {
    @transient private lazy val map = {
      val h = new java.util.HashMap[java.lang.Long, Array[Array[Float]]]()
      groups.zip(mats).foreach { case (g, m) => h.put(g, m) }
      h
    }
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (LongType, ArrayType(FloatType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (bigint, array<float>), got " + other)
      }
    override def dataType: DataType =
      ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "graft_nearest_cells_grp"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      nearestCellsGrpJava(a.asInstanceOf[Long],
        b.asInstanceOf[ArrayData], map, n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val mapRef = ctx.addReferenceObj("grpmats", map, "java.util.HashMap")
      defineCodeGen(ctx, ev, (g, e) =>
        s"graft.functions.VectorKernels.nearestCellsGrpJava($g, $e, $mapRef, $n)")
    }
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** One query↔centroid similarity under the EXACT kernel metric —
    * shared by the tree's candidate rescoring so its doubles match
    * [[nearestCellsJava]] / [[nearestCellL2Java]] bit-for-bit. */
  private def simCent(emb: ArrayData, cent: Array[Float],
      l2: Boolean): Double = {
    val d = math.min(emb.numElements(), cent.length)
    if (l2) {
      var acc = 0.0; var i = 0
      while (i < d) {
        val x = if (emb.isNullAt(i)) 0.0 else emb.getFloat(i).toDouble
        val diff = x - cent(i); acc += diff * diff; i += 1
      }
      -acc
    } else {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < d) {
        val x = if (emb.isNullAt(i)) 0.0 else emb.getFloat(i).toDouble
        val y = cent(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      if (na == 0.0 || nb == 0.0) Double.NegativeInfinity
      else dot / (math.sqrt(na) * math.sqrt(nb))
    }
  }

  /** See [[nearestCellsTreeJava]]. The tree builds lazily on the
    * driver (once per expression) and ships as a reference object. */
  case class NearestCellsTree(child: Expression,
      cents: Array[Array[Float]], n: Int, l2: Boolean)
      extends UnaryExpression {
    @transient private lazy val tree = buildCentTree(cents, l2 = l2)
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float> input, got " + other.simpleString)
      }
    override def dataType: DataType =
      ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "graft_nearest_cells_tree"
    override protected def nullSafeEval(a: Any): Any =
      nearestCellsTreeJava(a.asInstanceOf[ArrayData], tree, n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val treeRef = ctx.addReferenceObj("ctree", tree,
        "graft.functions.CentTree")
      defineCodeGen(ctx, ev, a =>
        s"graft.functions.VectorKernels.nearestCellsTreeJava($a, $treeRef, $n)")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Random-hyperplane signature: bit p of the result is the sign of
    * Σᵢ emb[i]·signs[p][i]. Signs are ±1 from a splitmix64 of
    * (p·1000003 + d) — deterministic, shared with the SQL-visible
    * definition. One native pass; the HOF formulation
    * (transform × zip_with × aggregate) costs planes×dims interpreted
    * lambda calls per row. */
  def hyperplaneSigJava(emb: ArrayData, signs: Array[Array[Float]]): Long = {
    var sig = 0L
    var p = 0
    while (p < signs.length) {
      val plane = signs(p)
      val d = math.min(emb.numElements(), plane.length)
      var acc = 0.0
      var i = 0
      while (i < d) {
        val x = if (emb.isNullAt(i)) 0.0 else emb.getFloat(i).toDouble
        acc += x * plane(i)
        i += 1
      }
      if (acc >= 0.0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** Deterministic ±1 plane-sign matrix (same splitmix64 scheme the
    * previous HOF formulation used — signatures are unchanged). */
  def planeSigns(planes: Int, dims: Int): Array[Array[Float]] =
    Array.tabulate(planes, dims) { (p, d) =>
      if (mix64(p.toLong * 1000003L + d) % 2 == 0) 1.0f else -1.0f
    }

  /** See [[hyperplaneSigJava]]. */
  case class HyperplaneSig(child: Expression, planes: Int, dims: Int)
      extends UnaryExpression {
    require(planes <= 63, "signature packs into one long")
    @transient private lazy val signs = planeSigns(planes, dims)
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float> input, got " + other.simpleString)
      }
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_hyperplane"
    override protected def nullSafeEval(a: Any): Any =
      hyperplaneSigJava(a.asInstanceOf[ArrayData], signs)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val signsRef = ctx.addReferenceObj("signs", signs, "float[][]")
      defineCodeGen(ctx, ev, a =>
        s"graft.functions.VectorKernels.hyperplaneSigJava($a, $signsRef)")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /**
   * One-pass token statistics: (n_tok, n_stop, n_short, n_distinct)
   * over single-space tokens (empties kept — identical universe to
   * `string_split(text, ' ')` in the oracle). The HOF formulation
   * (filter×2 + array_distinct over a materialized split array)
   * evaluates interpreted lambdas per token and builds three
   * intermediate arrays; this is one scan, zero array materialization.
   * Short-token length counts codepoints (Spark `length` semantics).
   */
  def tokenStatsJava(text: org.apache.spark.unsafe.types.UTF8String,
      stop: java.util.HashSet[String])
      : org.apache.spark.sql.catalyst.InternalRow = {
    val toks = text.toString.split(" ", -1)
    var nStop = 0; var nShort = 0
    val seen = new java.util.HashSet[String](toks.length * 2)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (stop.contains(t)) nStop += 1
      if (t.codePointCount(0, t.length) <= 2) nShort += 1
      seen.add(t)
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](toks.length, nStop, nShort, seen.size))
  }

  /** See [[tokenStatsJava]]. Stopword set must be a foldable
    * array<string> literal. */
  case class TokenStats(child: Expression, stopwords: Seq[String])
      extends UnaryExpression {
    @transient private lazy val stopSet = {
      val s = new java.util.HashSet[String](stopwords.size * 2)
      stopwords.foreach(s.add)
      s
    }
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case org.apache.spark.sql.types.StringType =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string input, got " + other.simpleString)
      }
    override def dataType: DataType = org.apache.spark.sql.types.StructType(
      Seq("n_tok", "n_stop", "n_short", "n_distinct").map(
        org.apache.spark.sql.types.StructField(_, IntegerType,
          nullable = false)))
    override def prettyName: String = "graft_token_stats"
    override protected def nullSafeEval(a: Any): Any =
      tokenStatsJava(
        a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], stopSet)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val stopRef = ctx.addReferenceObj("stopSet", stopSet,
        "java.util.HashSet")
      defineCodeGen(ctx, ev, a =>
        s"graft.functions.VectorKernels.tokenStatsJava($a, $stopRef)")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /**
   * One-pass int8 quantization statistics for an embedding: symmetric
   * max-abs scaling (scale = max|v|/127), round-half-up quantization
   * `clamp(floor(v/scale + 0.5), -127, 127)`, and the cosine between
   * the original vector and its dequantized reconstruction — the
   * quality gate run before shipping a quantized vector store. All
   * arithmetic is double-precision in index order, replicable in SQL
   * (`floor(x + 0.5)` avoids engine-specific round-half-even).
   * Zero vectors yield scale 0 and null cosine.
   */
  def int8QuantJava(emb: ArrayData)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val n = emb.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val x = if (emb.isNullAt(i)) 0.0 else math.abs(emb.getFloat(i).toDouble)
      if (x > maxAbs) maxAbs = x
      i += 1
    }
    val scale = maxAbs / 127.0
    if (scale == 0.0)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0.0, null))
    var dot = 0.0; var na = 0.0; var nb = 0.0
    i = 0
    while (i < n) {
      val x = if (emb.isNullAt(i)) 0.0 else emb.getFloat(i).toDouble
      var q = math.floor(x / scale + 0.5)
      if (q > 127.0) q = 127.0
      if (q < -127.0) q = -127.0
      val d = q * scale
      dot += x * d; na += x * x; nb += d * d
      i += 1
    }
    val cos =
      if (na == 0.0 || nb == 0.0) null
      else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](scale, cos))
  }

  /** See [[int8QuantJava]]: array<float> → struct(scale, cos). */
  case class Int8QuantStats(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float> input, got " + other.simpleString)
      }
    override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("scale", DoubleType,
        nullable = false),
      org.apache.spark.sql.types.StructField("cos", DoubleType,
        nullable = true)))
    override def prettyName: String = "graft_int8_quant"
    override protected def nullSafeEval(a: Any): Any =
      int8QuantJava(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a =>
        s"graft.functions.VectorKernels.int8QuantJava($a)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /**
   * One-pass word-n-gram repetition statistics:
   * (n_grams, n_distinct, top_count) where top_count is the highest
   * multiplicity of any single n-gram — the Gopher-style repetition
   * gates (duplicate-n-gram fraction, top-n-gram mass) derive from
   * these. Same tokenize+window semantics as [[ngramsJava]]; counting
   * is a per-row hash map, so the whole operator is a narrow
   * projection — no explode, no shuffle.
   */
  def ngramRepJava(text: org.apache.spark.unsafe.types.UTF8String,
      n: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = text.toString.split(" ", -1)
    val count = math.max(toks.length - n + 1, 0)
    val freq = new java.util.HashMap[String, Integer](count * 2)
    var top = 0
    var i = 0
    while (i < count) {
      val sb = new java.lang.StringBuilder
      var j = i
      while (j < i + n) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      val c = freq.merge(sb.toString, 1, (a, b) => a + b)
      if (c > top) top = c
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](count, freq.size, top))
  }

  /** See [[ngramRepJava]]: string → struct(n_grams, n_distinct,
    * top_count). */
  case class NGramRepetition(child: Expression, n: Int)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case org.apache.spark.sql.types.StringType =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string input, got " + other.simpleString)
      }
    override def dataType: DataType = org.apache.spark.sql.types.StructType(
      Seq("n_grams", "n_distinct", "top_count").map(
        org.apache.spark.sql.types.StructField(_, IntegerType,
          nullable = false)))
    override def prettyName: String = "graft_ngram_rep"
    override protected def nullSafeEval(a: Any): Any =
      ngramRepJava(
        a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a =>
        s"graft.functions.VectorKernels.ngramRepJava($a, $n)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /**
   * Feature-hashing text embedding (hashing trick): token → bucket =
   * first md5 byte mod dims, counts L2-normalized — a deterministic,
   * cross-engine-replicable text vectorizer (the oracle computes the
   * same buckets via `('0x' || substring(md5(t),1,2))::INTEGER`; the
   * first MD5 byte IS the first two hex chars). Output plugs into the
   * [[graft.operators.Similarity]] family after a float cast. Zero
   * tokens → zero vector (no NaNs).
   */
  def featureHashJava(text: org.apache.spark.unsafe.types.UTF8String,
      dims: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val counts = new Array[Double](dims)
    val md = md5Local.get()
    var i = 0
    while (i < toks.length) {
      md.reset()
      val d = md.digest(
        toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      counts((d(0) & 0xFF) % dims) += 1.0
      i += 1
    }
    var s = 0.0
    var j = 0
    while (j < dims) { s += counts(j) * counts(j); j += 1 }
    if (s > 0.0) {
      val n = math.sqrt(s)
      j = 0
      while (j < dims) { counts(j) /= n; j += 1 }
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(counts)
  }

  /**
   * Raw md5-bucket token counts (the un-normalized half of
   * [[featureHashJava]]): token → bucket = first md5 byte mod dims,
   * counts as integer-valued doubles. The per-document feature the
   * importance-weighting (DSIR-style) scorer dots against a
   * log-likelihood-ratio vector — kept as exact integers-in-doubles so
   * the cross-engine dot product is reproducible bit-for-bit.
   */
  def bucketCountsJava(text: org.apache.spark.unsafe.types.UTF8String,
      dims: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val counts = new Array[Double](dims)
    val md = md5Local.get()
    var i = 0
    while (i < toks.length) {
      md.reset()
      val d = md.digest(
        toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      counts((d(0) & 0xFF) % dims) += 1.0
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(counts)
  }

  /** See [[bucketCountsJava]]: string → array<double> (raw counts). */
  case class BucketCounts(child: Expression, dims: Int)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case org.apache.spark.sql.types.StringType =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string input, got " + other.simpleString)
      }
    override def dataType: DataType =
      ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "graft_bucket_counts"
    override protected def nullSafeEval(a: Any): Any =
      bucketCountsJava(
        a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], dims)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a =>
        s"graft.functions.VectorKernels.bucketCountsJava($a, $dims)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /**
   * Hashed char-trigram bucket counts (the language-ID feature of
   * [[graft.operators.TextAnalysis.langId2Over]]): trigram → bucket =
   * first 6 md5 hex chars (= first 3 digest bytes) as a 24-bit
   * integer mod `dims`; returns per-bucket trigram counts
   * (array<long>, size dims). Trigrams are CODE-POINT triples,
   * matching the `substring`/`substr` semantics of the SQL oracle
   * replay on both engines. One tight codegen'd pass replaces the
   * interpreted transform(sequence)+substring lambda, which is O(L²)
   * per row (the q_cdc_chunks lesson).
   */
  def triBucketCountsJava(text: org.apache.spark.unsafe.types.UTF8String,
      dims: Int): ArrayData = {
    val s = text.toString
    val n = s.codePointCount(0, s.length)
    val counts = new Array[Long](dims)
    if (n >= 3) {
      val off = new Array[Int](n + 1)
      var i = 0
      var ci = 0
      while (ci < n) {
        off(ci) = i
        i = s.offsetByCodePoints(i, 1)
        ci += 1
      }
      off(n) = s.length
      val md = md5Local.get()
      var t = 0
      while (t + 3 <= n) {
        md.reset()
        val d = md.digest(s.substring(off(t), off(t + 3))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val b = (((d(0) & 0xFF) << 16) | ((d(1) & 0xFF) << 8) |
          (d(2) & 0xFF)) % dims
        counts(b) += 1L
        t += 1
      }
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(counts)
  }

  /** Exact dot product of two BIGINT arrays — the integer-space
    * scorer for models whose weights are 10-dp-floored decimals
    * (weight·10¹⁰ is an exact long, the count-weighted sum stays far
    * inside long range, and the caller rescales the result back to
    * DECIMAL — bit-identical to the decimal-sum formulation, without
    * a per-(row × candidate) aggregate). */
  def dotLongJava(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    s
  }

  /** See [[dotLongJava]]: (array<bigint>, array<bigint>) → bigint. */
  case class LongVecDot(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<bigint> inputs, got " + other)
      }
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_dot_long"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      dotLongJava(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.VectorKernels.dotLongJava($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** See [[triBucketCountsJava]]: string → array<long> (size dims). */
  case class TriBucketCounts(child: Expression, dims: Int)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case org.apache.spark.sql.types.StringType =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string input, got " + other.simpleString)
      }
    override def dataType: DataType =
      ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_tri_buckets"
    override protected def nullSafeEval(a: Any): Any =
      triBucketCountsJava(
        a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], dims)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a =>
        s"graft.functions.VectorKernels.triBucketCountsJava($a, $dims)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** See [[featureHashJava]]: string → array<double> (unit-norm). */
  case class FeatureHash(child: Expression, dims: Int)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case org.apache.spark.sql.types.StringType =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string input, got " + other.simpleString)
      }
    override def dataType: DataType =
      ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "graft_feature_hash"
    override protected def nullSafeEval(a: Any): Any =
      featureHashJava(
        a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], dims)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a =>
        s"graft.functions.VectorKernels.featureHashJava($a, $dims)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /**
   * URL canonicalization (RFC 3986-lite, the web-curation dedup key):
   * lowercase scheme+host, strip default ports (http:80 / https:443),
   * drop the fragment, collapse duplicate path slashes and the
   * trailing slash, remove tracking parameters (utm_*, fbclid, gclid),
   * and sort the surviving query parameters. Real `java.net.URI`
   * parsing — malformed input returns null rather than garbage.
   */
  def urlNormalizeJava(url: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    try {
      val u = java.net.URI.create(url.toString)
      if (u.getScheme == null || u.getHost == null) return null
      val scheme = u.getScheme.toLowerCase(java.util.Locale.ROOT)
      val host = u.getHost.toLowerCase(java.util.Locale.ROOT)
      val port = u.getPort match {
        case -1 => ""
        case 80 if scheme == "http" => ""
        case 443 if scheme == "https" => ""
        case p => ":" + p
      }
      var path = Option(u.getPath).getOrElse("")
        .replaceAll("/{2,}", "/")
      if (path.endsWith("/")) path = path.substring(0, path.length - 1)
      val query = Option(u.getQuery).map { q =>
        val kept = q.split("&").filter { kv =>
          val k = kv.split("=", 2)(0)
          !k.startsWith("utm_") && k != "fbclid" && k != "gclid"
        }.sorted
        if (kept.isEmpty) "" else "?" + kept.mkString("&")
      }.getOrElse("")
      org.apache.spark.unsafe.types.UTF8String.fromString(
        scheme + "://" + host + port + path + query)
    } catch {
      case _: IllegalArgumentException => null
    }
  }

  /** See [[urlNormalizeJava]]. */
  case class UrlNormalize(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case org.apache.spark.sql.types.StringType =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string input, got " + other.simpleString)
      }
    override def dataType: DataType = org.apache.spark.sql.types.StringType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_url_normalize"
    override protected def nullSafeEval(a: Any): Any =
      urlNormalizeJava(
        a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => s"""
        ${ev.value} = graft.functions.VectorKernels.urlNormalizeJava($a);
        if (${ev.value} == null) { ${ev.isNull} = true; }
      """)
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /**
   * Byte-pair-encoding segmentation of one word (Sennrich et al.,
   * "Neural Machine Translation of Rare Words with Subword Units",
   * ACL 2016): start from characters, repeatedly merge the
   * highest-priority adjacent pair (priority = merge index), until no
   * merge applies. Shared by the pair-count (training) and tokenize
   * (serving) kernels so fit and apply can never disagree.
   */
  private def bpeSegment(word: String,
      rank: java.util.HashMap[String, Integer]): java.util.ArrayList[String] = {
    val syms = new java.util.ArrayList[String](word.length)
    var ci = 0
    while (ci < word.length) {
      val cp = word.codePointAt(ci)
      val n = Character.charCount(cp)
      syms.add(word.substring(ci, ci + n))
      ci += n
    }
    if (rank.isEmpty) return syms
    var changed = true
    while (changed && syms.size > 1) {
      changed = false
      var best = Integer.MAX_VALUE
      var a: String = null
      var b: String = null
      var i = 0
      while (i < syms.size - 1) {
        val r = rank.get(syms.get(i) + " " + syms.get(i + 1))
        if (r != null && r < best) {
          best = r
          a = syms.get(i)
          b = syms.get(i + 1)
        }
        i += 1
      }
      if (best != Integer.MAX_VALUE) {
        changed = true
        var j = 0
        while (j < syms.size - 1) {
          if (syms.get(j) == a && syms.get(j + 1) == b) {
            syms.set(j, a + b)
            syms.remove(j + 1)
          } else j += 1
        }
      }
    }
    syms
  }

  private def buildRank(merges: Seq[String])
      : java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case (p, i) =>
      if (!m.containsKey(p)) m.put(p, i)
    }
    m
  }

  /** BPE-tokenize `text`: whitespace words → per-word BPE segmentation
    * under the given ordered merge list → concatenated token stream. */
  def bpeTokensJava(text: org.apache.spark.unsafe.types.UTF8String,
      rank: java.util.HashMap[String, Integer]): ArrayData = {
    val words = text.toString.split(" ", -1)
    val out = new java.util.ArrayList[org.apache.spark.unsafe.types.UTF8String]()
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) {
        val syms = bpeSegment(words(i), rank)
        var j = 0
        while (j < syms.size) {
          out.add(org.apache.spark.unsafe.types.UTF8String
            .fromString(syms.get(j)))
          j += 1
        }
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      out.toArray(new Array[org.apache.spark.unsafe.types.UTF8String](out.size)))
  }

  /** Adjacent symbol pairs of the BPE segmentation (the statistic the
    * trainer counts): one "a b" string per adjacent pair per word. */
  def bpePairsJava(text: org.apache.spark.unsafe.types.UTF8String,
      rank: java.util.HashMap[String, Integer]): ArrayData = {
    val words = text.toString.split(" ", -1)
    val out = new java.util.ArrayList[org.apache.spark.unsafe.types.UTF8String]()
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) {
        val syms = bpeSegment(words(i), rank)
        var j = 0
        while (j < syms.size - 1) {
          out.add(org.apache.spark.unsafe.types.UTF8String
            .fromString(syms.get(j) + " " + syms.get(j + 1)))
          j += 1
        }
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      out.toArray(new Array[org.apache.spark.unsafe.types.UTF8String](out.size)))
  }

  /** See [[bpeTokensJava]]. Merges must be a foldable array<string>
    * literal of "a b" pairs in priority order. */
  case class BpeTokens(child: Expression, merges: Seq[String])
      extends UnaryExpression {
    @transient private lazy val rank = buildRank(merges)
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case org.apache.spark.sql.types.StringType =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string input, got " + other.simpleString)
      }
    override def dataType: DataType =
      ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
    override def prettyName: String = "graft_bpe"
    override protected def nullSafeEval(a: Any): Any =
      bpeTokensJava(
        a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], rank)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val rankRef = ctx.addReferenceObj("bpeRank", rank, "java.util.HashMap")
      defineCodeGen(ctx, ev, a =>
        s"graft.functions.VectorKernels.bpeTokensJava($a, $rankRef)")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** See [[bpePairsJava]]. Merges must be a foldable array<string>
    * literal of "a b" pairs in priority order. */
  case class BpePairs(child: Expression, merges: Seq[String])
      extends UnaryExpression {
    @transient private lazy val rank = buildRank(merges)
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case org.apache.spark.sql.types.StringType =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string input, got " + other.simpleString)
      }
    override def dataType: DataType =
      ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
    override def prettyName: String = "graft_bpe_pairs"
    override protected def nullSafeEval(a: Any): Any =
      bpePairsJava(
        a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], rank)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val rankRef = ctx.addReferenceObj("bpeRank", rank, "java.util.HashMap")
      defineCodeGen(ctx, ev, a =>
        s"graft.functions.VectorKernels.bpePairsJava($a, $rankRef)")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Unknown-character fallback log-probability for [[unigramTokensJava]]:
    * far below any real piece score so known pieces always win, but
    * finite so every word segments and corpus log-likelihood stays
    * summable (the EM monotonicity argument needs finite scores). */
  val UnigramUnkLogProb: Double = -100.0

  /** Piece→logprob model for [[UnigramTokens]], plus the max piece
    * length that bounds the Viterbi inner loop. */
  def buildUnigramModel(pieces: Seq[String], logps: Seq[Double])
      : (java.util.HashMap[String, java.lang.Double], Int) = {
    val m = new java.util.HashMap[String, java.lang.Double]()
    var maxLen = 1
    pieces.zip(logps).foreach { case (p, lp) =>
      if (!m.containsKey(p)) m.put(p, lp)
      if (p.length > maxLen) maxLen = p.length
    }
    (m, maxLen)
  }

  /** Unigram-LM tokenize `text`: whitespace words → per-word Viterbi
    * segmentation (max total piece log-probability) → concatenated
    * token stream. Ties break toward the longer piece (the candidate
    * with the smaller start index wins on equal score), so the
    * segmentation is deterministic. Characters outside the model fall
    * back to single-char pieces at [[UnigramUnkLogProb]]. */
  def unigramTokensJava(text: org.apache.spark.unsafe.types.UTF8String,
      model: java.util.HashMap[String, java.lang.Double], maxLen: Int)
      : ArrayData = {
    val words = text.toString.split(" ", -1)
    val out = new java.util.ArrayList[org.apache.spark.unsafe.types.UTF8String]()
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (w.nonEmpty) {
        val n = w.length
        val best = new Array[Double](n + 1)
        val back = new Array[Int](n + 1)
        java.util.Arrays.fill(best, Double.NegativeInfinity)
        best(0) = 0.0
        var e = 1
        while (e <= n) {
          var s = math.max(0, e - maxLen)
          while (s < e) {
            val lpBoxed = model.get(w.substring(s, e))
            val lp: Double =
              if (lpBoxed != null) lpBoxed.doubleValue()
              else if (e - s == 1) UnigramUnkLogProb
              else Double.NaN
            if (lp == lp && best(s) + lp > best(e)) {
              best(e) = best(s) + lp
              back(e) = s
            }
            s += 1
          }
          e += 1
        }
        val pieces = new java.util.ArrayList[String]()
        var p = n
        while (p > 0) { pieces.add(w.substring(back(p), p)); p = back(p) }
        var j = pieces.size - 1
        while (j >= 0) {
          out.add(org.apache.spark.unsafe.types.UTF8String
            .fromString(pieces.get(j)))
          j -= 1
        }
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      out.toArray(new Array[org.apache.spark.unsafe.types.UTF8String](out.size)))
  }

  /** Forward-backward expected piece counts for one whitespace word
    * stream (the true Kudo/SentencePiece E-step, upgrading hard
    * Viterbi counts): for every lattice edge (s, e) with piece
    * log-prob lp, ec(piece) += exp(fwd[s] + lp + bwd[e] − fwd[n]).
    * Emits one struct<piece, ec> row per distinct piece per word (in
    * sorted piece order — deterministic row set), plus one sentinel
    * row (piece = "", ec = Σ fwd[n]) carrying the text's marginal
    * log-likelihood: "" can never be a real piece, and the trainer
    * splits it off for the monotone-EM objective. All per-word math
    * is fixed-iteration-order double arithmetic, so every emitted
    * double is a pure function of (word, model) — the aggregation
    * above this kernel casts to DECIMAL for order-free exact sums. */
  def unigramECountsJava(text: org.apache.spark.unsafe.types.UTF8String,
      model: java.util.HashMap[String, java.lang.Double], maxLen: Int)
      : ArrayData = {
    def lse(a: Double, b: Double): Double =
      if (a == Double.NegativeInfinity) b
      else if (b == Double.NegativeInfinity) a
      else if (a > b) a + math.log1p(math.exp(b - a))
      else b + math.log1p(math.exp(a - b))
    val words = text.toString.split(" ", -1)
    val ec = new java.util.TreeMap[String, Double]()
    var llSum = 0.0
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        val n = w.length
        def lp(s: Int, e: Int): Double = {
          val boxed = model.get(w.substring(s, e))
          if (boxed != null) boxed.doubleValue()
          else if (e - s == 1) UnigramUnkLogProb
          else Double.NaN
        }
        val fwd = new Array[Double](n + 1)
        val bwd = new Array[Double](n + 1)
        java.util.Arrays.fill(fwd, Double.NegativeInfinity)
        java.util.Arrays.fill(bwd, Double.NegativeInfinity)
        fwd(0) = 0.0
        bwd(n) = 0.0
        var e = 1
        while (e <= n) {
          var s = math.max(0, e - maxLen)
          while (s < e) {
            val l = lp(s, e)
            if (l == l) fwd(e) = lse(fwd(e), fwd(s) + l)
            s += 1
          }
          e += 1
        }
        var s2 = n - 1
        while (s2 >= 0) {
          var e2 = s2 + 1
          val cap = math.min(n, s2 + maxLen)
          while (e2 <= cap) {
            val l = lp(s2, e2)
            if (l == l) bwd(s2) = lse(bwd(s2), l + bwd(e2))
            e2 += 1
          }
          s2 -= 1
        }
        llSum += fwd(n)
        var e3 = 1
        while (e3 <= n) {
          var s3 = math.max(0, e3 - maxLen)
          while (s3 < e3) {
            val l = lp(s3, e3)
            if (l == l) {
              val p = math.exp(fwd(s3) + l + bwd(e3) - fwd(n))
              val piece = w.substring(s3, e3)
              val prev = ec.get(piece)
              ec.put(piece, (if (prev == null) 0.0 else prev.doubleValue) + p)
            }
            s3 += 1
          }
          e3 += 1
        }
      }
      wi += 1
    }
    ec.put("", llSum)
    val rows = new java.util.ArrayList[Any]()
    val it = ec.entrySet().iterator()
    while (it.hasNext) {
      val kv = it.next()
      rows.add(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](org.apache.spark.unsafe.types.UTF8String
          .fromString(kv.getKey), kv.getValue.doubleValue())))
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      rows.toArray)
  }

  /** See [[unigramECountsJava]]. Same foldable-model contract as
    * [[UnigramTokens]]. */
  case class UnigramECounts(child: Expression, pieces: Seq[String],
      logps: Seq[Double]) extends UnaryExpression {
    @transient private lazy val built = buildUnigramModel(pieces, logps)
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case org.apache.spark.sql.types.StringType =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string input, got " + other.simpleString)
      }
    override def dataType: DataType = ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("piece",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("ec", DoubleType,
          nullable = false))), containsNull = false)
    override def prettyName: String = "graft_unigram_ecounts"
    override protected def nullSafeEval(a: Any): Any =
      unigramECountsJava(
        a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        built._1, built._2)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val modelRef = ctx.addReferenceObj("unigramModel", built._1,
        "java.util.HashMap")
      defineCodeGen(ctx, ev, a =>
        s"graft.functions.VectorKernels.unigramECountsJava($a, $modelRef, ${built._2})")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** See [[unigramTokensJava]]. Pieces and logps must be foldable
    * array literals of equal length (the fitted unigram model). */
  case class UnigramTokens(child: Expression, pieces: Seq[String],
      logps: Seq[Double]) extends UnaryExpression {
    @transient private lazy val built = buildUnigramModel(pieces, logps)
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case org.apache.spark.sql.types.StringType =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string input, got " + other.simpleString)
      }
    override def dataType: DataType =
      ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
    override def prettyName: String = "graft_unigram"
    override protected def nullSafeEval(a: Any): Any =
      unigramTokensJava(
        a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        built._1, built._2)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val modelRef = ctx.addReferenceObj("unigramModel", built._1,
        "java.util.HashMap")
      defineCodeGen(ctx, ev, a =>
        s"graft.functions.VectorKernels.unigramTokensJava($a, $modelRef, ${built._2})")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Jaro–Winkler similarity (Jaro 1989; Winkler 1990) of two strings
    * — canonical parameters: match window ⌊max(|a|,|b|)/2⌋ − 1,
    * transpositions = half the out-of-order matched positions (kept
    * fractional), prefix scale p = 0.1 over at most 4 common leading
    * characters, boost applied only when jaro > 0.7. Either input
    * empty → 0 (the DuckDB `jaro_winkler_similarity` convention the
    * oracle compares against). */
  def jaroWinklerJava(left: org.apache.spark.unsafe.types.UTF8String,
      right: org.apache.spark.unsafe.types.UTF8String): Double = {
    val a = left.toString; val b = right.toString
    val m1 = a.length; val m2 = b.length
    if (m1 == 0 || m2 == 0) return 0.0
    val window = math.max(0, math.max(m1, m2) / 2 - 1)
    val used1 = new Array[Boolean](m1)
    val used2 = new Array[Boolean](m2)
    var m = 0
    var i = 0
    while (i < m1) {
      var j = math.max(0, i - window)
      val hi = math.min(m2 - 1, i + window)
      var matched = false
      while (j <= hi && !matched) {
        if (!used2(j) && a.charAt(i) == b.charAt(j)) {
          used1(i) = true; used2(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // out-of-order matched positions
    var k = 0
    var j2 = 0
    i = 0
    while (i < m1) {
      if (used1(i)) {
        while (!used2(j2)) j2 += 1
        if (a.charAt(i) != b.charAt(j2)) k += 1
        j2 += 1
      }
      i += 1
    }
    val t = k / 2.0
    val jaro = (m.toDouble / m1 + m.toDouble / m2 + (m - t) / m) / 3.0
    var l = 0
    while (l < 4 && l < m1 && l < m2 && a.charAt(l) == b.charAt(l)) l += 1
    if (jaro > 0.7) jaro + l * 0.1 * (1.0 - jaro) else jaro
  }

  /** See [[jaroWinklerJava]]. */
  case class JaroWinkler(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (Seq(left, right).forall(
          _.dataType == org.apache.spark.sql.types.StringType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string inputs, got " +
          Seq(left, right).map(_.dataType.simpleString).mkString(", "))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_jaro_winkler"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      jaroWinklerJava(
        a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.VectorKernels.jaroWinklerJava($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Full (unrestricted) Damerau–Levenshtein distance — the
    * Lowrance–Wagner 1975 algorithm: edits are insert/delete/
    * substitute plus transposition of two ADJACENT characters, and
    * unlike the restricted OSA variant a substring may be edited
    * after a transposition (DL("CA","ABC") = 2 where OSA says 3).
    * The `da` map tracks, per alphabet character, the last row of
    * `a` where it occurred; `db` the last matching column in the
    * current row — the (d[k-1][l-1] + (i-k-1) + 1 + (j-l-1)) arm
    * charges a transposition plus the characters skipped over. This
    * is the variant DuckDB's `damerau_levenshtein` implements, which
    * is what the cross-engine gate compares against. */
  def damerauLevenshteinJava(left: org.apache.spark.unsafe.types.UTF8String,
      right: org.apache.spark.unsafe.types.UTF8String): Long = {
    val a = left.toString; val b = right.toString
    val la = a.length; val lb = b.length
    if (la == 0) return lb.toLong
    if (lb == 0) return la.toLong
    val inf = la + lb
    // matrix indexed from -1 via a +1 shift: d(0)(*) is the inf rail
    val d = Array.ofDim[Int](la + 2, lb + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= la) { d(i + 1)(1) = i; d(i + 1)(0) = inf; i += 1 }
    var j = 0
    while (j <= lb) { d(1)(j + 1) = j; d(0)(j + 1) = inf; j += 1 }
    val da = new java.util.HashMap[Character, Integer]()
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val k: Int = {
          val v = da.get(b.charAt(j - 1)); if (v == null) 0 else v
        }
        val l = db
        var cost = 1
        if (a.charAt(i - 1) == b.charAt(j - 1)) { cost = 0; db = j }
        var best = d(i)(j) + cost                       // substitute/keep
        val ins = d(i + 1)(j) + 1                       // insert
        if (ins < best) best = ins
        val del = d(i)(j + 1) + 1                       // delete
        if (del < best) best = del
        val tr = d(k)(l) + (i - k - 1) + 1 + (j - l - 1) // transpose
        if (tr < best) best = tr
        d(i + 1)(j + 1) = best
        j += 1
      }
      da.put(a.charAt(i - 1), i)
      i += 1
    }
    d(la + 1)(lb + 1).toLong
  }

  /** See [[damerauLevenshteinJava]]. */
  case class DamerauLevenshtein(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (Seq(left, right).forall(
          _.dataType == org.apache.spark.sql.types.StringType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string inputs, got " +
          Seq(left, right).map(_.dataType.simpleString).mkString(", "))
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_damerau"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      damerauLevenshteinJava(
        a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.VectorKernels.damerauLevenshteinJava($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Token emitted by [[wordpieceTokensJava]] when a word contains a
    * character outside the vocabulary (the BERT convention: the whole
    * word collapses to one unknown token rather than a partial
    * segmentation). */
  val WordpieceUnk: String = "[UNK]"

  /** Vocabulary index for [[WordpieceTokens]]: membership set plus the
    * max piece length that bounds the longest-match scan. */
  def buildWordpieceVocab(vocab: Seq[String])
      : (java.util.HashSet[String], Int) = {
    val s = new java.util.HashSet[String]()
    var maxLen = 1
    vocab.foreach { p =>
      s.add(p)
      if (p.length > maxLen) maxLen = p.length
    }
    (s, maxLen)
  }

  /** WordPiece-tokenize `text` (Schuster & Nakajima, ICASSP 2012; the
    * BERT serving algorithm): whitespace words → greedy
    * longest-match-first against the vocabulary — at each position take
    * the LONGEST vocab piece starting there; if no piece matches (a
    * character outside the vocabulary) the entire word becomes one
    * [[WordpieceUnk]] token. Greedy matching is deterministic by
    * construction (no scores, no ties). */
  def wordpieceTokensJava(text: org.apache.spark.unsafe.types.UTF8String,
      vocab: java.util.HashSet[String], maxLen: Int): ArrayData = {
    val words = text.toString.split(" ", -1)
    val out = new java.util.ArrayList[org.apache.spark.unsafe.types.UTF8String]()
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        val n = w.length
        val pieces = new java.util.ArrayList[String]()
        var i = 0
        var failed = false
        while (i < n && !failed) {
          var j = math.min(n, i + maxLen)
          var hit: String = null
          while (j > i && hit == null) {
            val cand = w.substring(i, j)
            if (vocab.contains(cand)) hit = cand else j -= 1
          }
          if (hit == null) failed = true
          else { pieces.add(hit); i += hit.length }
        }
        if (failed) {
          out.add(org.apache.spark.unsafe.types.UTF8String
            .fromString(WordpieceUnk))
        } else {
          var k = 0
          while (k < pieces.size) {
            out.add(org.apache.spark.unsafe.types.UTF8String
              .fromString(pieces.get(k)))
            k += 1
          }
        }
      }
      wi += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      out.toArray(new Array[org.apache.spark.unsafe.types.UTF8String](out.size)))
  }

  /** See [[wordpieceTokensJava]]. Vocab must be a foldable
    * array<string> literal (the fitted WordPiece vocabulary). */
  case class WordpieceTokens(child: Expression, vocab: Seq[String])
      extends UnaryExpression {
    @transient private lazy val built = buildWordpieceVocab(vocab)
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case org.apache.spark.sql.types.StringType =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string input, got " + other.simpleString)
      }
    override def dataType: DataType =
      ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
    override def prettyName: String = "graft_wordpiece"
    override protected def nullSafeEval(a: Any): Any =
      wordpieceTokensJava(
        a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        built._1, built._2)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val vocabRef = ctx.addReferenceObj("wpVocab", built._1,
        "java.util.HashSet")
      defineCodeGen(ctx, ev, a =>
        s"graft.functions.VectorKernels.wordpieceTokensJava($a, $vocabRef, ${built._2})")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** One-pass membership counts against several word sets (the
    * language-ID vote kernel): result[i] = tokens of `text` contained
    * in set i. One tokenize + one hash probe per token, versus one
    * interpreted filter-lambda pass per set. */
  def countInSetsJava(text: org.apache.spark.unsafe.types.UTF8String,
      index: java.util.HashMap[String, Array[Int]], nSets: Int): ArrayData = {
    val counts = new Array[Int](nSets)
    val toks = text.toString.split(" ", -1)
    var i = 0
    while (i < toks.length) {
      val ids = index.get(toks(i))
      if (ids != null) {
        var j = 0
        while (j < ids.length) { counts(ids(j)) += 1; j += 1 }
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(counts)
  }

  /** See [[countInSetsJava]]. Sets must be foldable literals. */
  case class CountInSets(child: Expression, sets: Seq[Seq[String]])
      extends UnaryExpression {
    @transient private lazy val index = {
      val m = new java.util.HashMap[String, Array[Int]]()
      sets.zipWithIndex.foreach { case (words, i) =>
        words.foreach { w =>
          m.merge(w, Array(i), (a, b) => a ++ b)
        }
      }
      m
    }
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case org.apache.spark.sql.types.StringType =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string input, got " + other.simpleString)
      }
    override def dataType: DataType =
      ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "graft_count_in_sets"
    override protected def nullSafeEval(a: Any): Any =
      countInSetsJava(
        a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        index, sets.size)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val idxRef = ctx.addReferenceObj("setIndex", index,
        "java.util.HashMap")
      defineCodeGen(ctx, ev, a =>
        s"graft.functions.VectorKernels.countInSetsJava($a, $idxRef, ${sets.size})")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** ArrayData array<string> literal → Seq[String]. */
  private def toStringSeq(v: Any): Seq[String] = {
    val arr = v.asInstanceOf[ArrayData]
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  /** ArrayData array<double> literal → Seq[Double]. */
  private def toDoubleSeq(v: Any): Seq[Double] = {
    val arr = v.asInstanceOf[ArrayData]
    (0 until arr.numElements()).map(arr.getDouble)
  }

  /** ArrayData array<array<string>> literal → Seq[Seq[String]]. */
  private def toStringSeqs(v: Any): Seq[Seq[String]] = {
    val outer = v.asInstanceOf[ArrayData]
    (0 until outer.numElements()).map(i => toStringSeq(outer.getArray(i)))
  }

  /** ArrayData array<bigint> literal → Seq[Long]. */
  private def toLongSeq(v: Any): Seq[Long] = {
    val a = v.asInstanceOf[ArrayData]
    (0 until a.numElements()).map(a.getLong)
  }

  /** ArrayData array<array<array<float>>> literal → matrices. */
  private def toMatrices(v: Any): Seq[Array[Array[Float]]] = {
    val outer = v.asInstanceOf[ArrayData]
    (0 until outer.numElements()).map(i => toMatrix(outer.getArray(i)))
  }

  /** ArrayData array<array<float>> literal → matrix. */
  private def toMatrix(v: Any): Array[Array[Float]] = {
    val outer = v.asInstanceOf[ArrayData]
    (0 until outer.numElements()).map { i =>
      val inner = outer.getArray(i)
      (0 until inner.numElements()).map(inner.getFloat).toArray
    }.toArray
  }

  private def fn(name: String, builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) =
    (new FunctionIdentifier(name),
      new ExpressionInfo("graft.functions.VectorKernels", name),
      builder)

  /** All registrations, shared by the session extension and tests. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      FunctionRegistry.FunctionBuilder)] = Seq(
    fn("graft_dot", es => FloatVecDot(es(0), es(1))),
    fn("graft_cosine", es => FloatVecCosine(es(0), es(1))),
    fn("graft_l2sq", es => FloatVecL2Sq(es(0), es(1))),
    fn("graft_norm", es => FloatVecNorm(es.head)),
    // k must be a foldable int literal, e.g. graft_minhash(sh, 64)
    fn("graft_minhash", es => MinHashSignature(es(0),
      es(1).eval().asInstanceOf[Int])),
    fn("graft_simhash", es => SimHash64(es.head)),
    // n must be a foldable int literal, e.g. graft_shingles(text, 3)
    // k must be a foldable int literal
    fn("graft_word_chunks", es => WordChunks(es(0),
      es(1).eval().asInstanceOf[Int])),
    fn("graft_seg_hashes", es => SegHashes(es(0))),
    // optional 3rd arg: foldable string literal join delimiter
    fn("graft_seg_strip", es => SegStrip(es(0), es(1),
      if (es.length > 2) es(2).eval().toString else " ")),
    fn("graft_shingles", es => ShingleHashes(es(0),
      es(1).eval().asInstanceOf[Int])),
    fn("graft_ngrams", es => NGrams(es(0),
      es(1).eval().asInstanceOf[Int])),
    fn("graft_sig_agree", es => SignatureAgreement(es(0), es(1))),
    fn("graft_rolling_hash", es => RollingHash(es.head)),
    fn("graft_deflate_size", es => DeflateSize(es.head)),
    fn("graft_nfc", es => NfcNormalize(es.head)),
    // k and w must be foldable int literals, e.g. graft_winnow(text, 3, 4)
    fn("graft_winnow", es => Winnow(es(0),
      es(1).eval().asInstanceOf[Int], es(2).eval().asInstanceOf[Int])),
    fn("graft_cdc_cuts", es => CdcCuts(es.head)),
    // budget must be a foldable bigint literal
    fn("graft_ffd_pack", es => FfdPack(es(0),
      es(1).eval().asInstanceOf[Long])),
    // centroid matrix must be a foldable array<array<float>> literal
    // (typedLit), n a foldable int
    fn("graft_nearest_cells", es => NearestCells(es(0),
      toMatrix(es(1).eval()), es(2).eval().asInstanceOf[Int])),
    fn("graft_nearest_cell_l2", es => NearestCellL2(es(0),
      toMatrix(es(1).eval()))),
    // beam-tree variant for dynamic-k matrices: matrix foldable, n a
    // foldable int, optional 4th foldable boolean switches to the L2
    // metric (default cosine, matching graft_nearest_cells)
    fn("graft_nearest_cells_tree", es => NearestCellsTree(es(0),
      toMatrix(es(1).eval()), es(2).eval().asInstanceOf[Int],
      if (es.length > 3) es(3).eval().asInstanceOf[Boolean] else false)),
    // per-group sub-quantizers: args (group bigint col, emb col,
    // foldable array<bigint> group ids, foldable 3-level float array
    // of parallel sub-matrices, foldable int n)
    fn("graft_nearest_cells_grp", es => NearestCellsGrouped(es(0), es(1),
      toLongSeq(es(2).eval()), toMatrices(es(3).eval()),
      es(4).eval().asInstanceOf[Int])),
    // planes and dims must be foldable int literals
    fn("graft_hyperplane", es => HyperplaneSig(es(0),
      es(1).eval().asInstanceOf[Int], es(2).eval().asInstanceOf[Int])),
    // stopwords must be a foldable array<string> literal
    fn("graft_token_stats", es => TokenStats(es(0),
      toStringSeq(es(1).eval()))),
    // sets must be a foldable array<array<string>> literal
    fn("graft_count_in_sets", es => CountInSets(es(0),
      toStringSeqs(es(1).eval()))),
    fn("graft_int8_quant", es => Int8QuantStats(es.head)),
    // dims must be a foldable int literal
    fn("graft_feature_hash", es => FeatureHash(es(0),
      es(1).eval().asInstanceOf[Int])),
    // dims must be a foldable int literal
    fn("graft_bucket_counts", es => BucketCounts(es(0),
      es(1).eval().asInstanceOf[Int])),
    // dims must be a foldable int literal
    fn("graft_tri_buckets", es => TriBucketCounts(es(0),
      es(1).eval().asInstanceOf[Int])),
    fn("graft_dot_long", es => LongVecDot(es(0), es(1))),
    // n must be a foldable int literal, e.g. graft_ngram_rep(text, 2)
    fn("graft_ngram_rep", es => NGramRepetition(es(0),
      es(1).eval().asInstanceOf[Int])),
    // custom AggregateFunction (SURVEY §2.11): k must be a foldable int
    fn("graft_topk", es => TopKAgg(es(0), es(1),
      es(2).eval().asInstanceOf[Int])),
    // count-min sketch aggregate: fixed 4×256 md5-byte rows
    fn("graft_cms", es => CmsAgg(es(0))),
    // KMV distinct sketch: k must be a foldable int literal
    fn("graft_kmv", es => KmvAgg(es(0),
      es(1).eval().asInstanceOf[Int])),
    // exact bitmap distinct-set aggregate (dictionary-encoded ids)
    fn("graft_bitmap", es => BitmapAgg(es(0))),
    // Bloom membership sketch: 64Ki-bit OR-merged filter + probe
    fn("graft_bloom", es => BloomAgg(es(0))),
    fn("graft_bloom_might", es => BloomMight(es(0), es(1))),
    fn("graft_url_normalize", es => UrlNormalize(es(0))),
    // merges must be a foldable array<string> literal ("a b" pairs)
    fn("graft_bpe", es => BpeTokens(es(0), toStringSeq(es(1).eval()))),
    fn("graft_bpe_pairs", es => BpePairs(es(0), toStringSeq(es(1).eval()))),
    // pieces (array<string>) and logps (array<double>) must be
    // foldable literals of equal length — the fitted unigram model
    fn("graft_unigram", es => UnigramTokens(es(0),
      toStringSeq(es(1).eval()), toDoubleSeq(es(2).eval()))),
    fn("graft_unigram_ecounts", es => UnigramECounts(es(0),
      toStringSeq(es(1).eval()), toDoubleSeq(es(2).eval()))),
    // vocab must be a foldable array<string> literal
    fn("graft_wordpiece", es => WordpieceTokens(es(0),
      toStringSeq(es(1).eval()))),
    fn("graft_jaro_winkler", es => JaroWinkler(es(0), es(1))),
    fn("graft_damerau", es => DamerauLevenshtein(es(0), es(1))),
  )

  /** SparkSessionExtensions hook: `.withExtensions(VectorKernels.register)`. */
  def register(extensions: SparkSessionExtensions): Unit =
    functions.foreach(extensions.injectFunction)
}

/**
 * Flattened centroid search tree for [[VectorKernels.nearestCellsTreeJava]]
 * (top-level so generated Java can name the type without `$` mangling).
 * Internal nodes hold their member-centroid mean in `nodeVec` and a
 * child node-id range; leaves hold the fine-centroid ids directly.
 */
final class CentTree(
    val cents: Array[Array[Float]],
    val nodeVec: Array[Array[Float]],
    val childStart: Array[Int],
    val childEnd: Array[Int],
    val leafIds: Array[Array[Int]],
    val rootStart: Int,
    val rootEnd: Int,
    val l2: Boolean) extends Serializable
