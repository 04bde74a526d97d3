package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
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

  private def loopCode(a: String, b: String): String =
    s"""
       |int n = java.lang.Math.min($a.numElements(), $b.numElements());
       |double dot = 0.0, na = 0.0, nb = 0.0;
       |for (int i = 0; i < n; i++) {
       |  double x = $a.isNullAt(i) ? 0.0 : (double) $a.getFloat(i);
       |  double y = $b.isNullAt(i) ? 0.0 : (double) $b.getFloat(i);
       |  dot += x * y; na += x * x; nb += y * y;
       |}
       |""".stripMargin

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
      nullSafeCodeGen(ctx, ev, (a, b) =>
        loopCode(a, b) + s"${ev.value} = dot;")
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
      nullSafeCodeGen(ctx, ev, (a, b) =>
        loopCode(a, b) +
          s"""
             |if (na == 0.0 || nb == 0.0) {
             |  ${ev.isNull} = true;
             |} else {
             |  ${ev.value} = dot / (java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb));
             |}
             |""".stripMargin)
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
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"""
           |int n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double s = 0.0;
           |for (int i = 0; i < n; i++) {
           |  double x = $a.isNullAt(i) ? 0.0 : (double) $a.getFloat(i);
           |  double y = $b.isNullAt(i) ? 0.0 : (double) $b.getFloat(i);
           |  double d = x - y; s += d * d;
           |}
           |${ev.value} = s;
           |""".stripMargin)
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
  )

  /** SparkSessionExtensions hook: `.withExtensions(VectorKernels.register)`. */
  def register(extensions: SparkSessionExtensions): Unit =
    functions.foreach(extensions.injectFunction)
}
