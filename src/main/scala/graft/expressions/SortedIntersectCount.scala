package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, NullType, StringType}

/** |a ∩ b| for two SORTED, DISTINCT string arrays, as one linear
  * two-pointer merge — the dedup verify-stage primitive.
  *
  * The built-in route, `size(array_intersect(a, b))`, builds a per-row
  * string hash set of one side and probes it with the other: an
  * allocation per row plus a hash of every element. On d1's ×10
  * candidate-pair verify (~235k pairs × ~100–300-shingle sets) that
  * made the exact-Jaccard stage the probe suite's single heaviest leg.
  * The merge below does zero allocation and compares adjacent
  * UTF8Strings directly (binary lexicographic — exactly the order
  * `array_sort` applies to StringType, which is the caller's input
  * contract, established once per document in `Dedup.shingleSets`).
  *
  * Contract (the VecDot doctrine — no per-element branch for cases the
  * callers never produce): both inputs sorted ascending with no
  * duplicate elements and no null elements. Unsorted input under-counts
  * (a merge can't look back); null elements would NPE rather than
  * silently miscount. Count semantics on distinct inputs are identical
  * to `size(array_intersect(a, b))` — exact integers, so downstream
  * Jaccard/containment doubles are bit-identical and the DuckDB twins
  * need no change.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  private def ok(t: DataType): Boolean = t match {
    case ArrayType(StringType, _) | ArrayType(NullType, _) | NullType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, array<string>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < nx && j < ny) {
      val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (cmp == 0) { c += 1L; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val cmp = ctx.freshName("cmp")
      s"""
         |int $i = 0, $j = 0;
         |long $c = 0L;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
