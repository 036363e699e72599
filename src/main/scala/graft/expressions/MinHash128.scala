package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 128-permutation MinHash signature of a string array (Broder 1997) in
  * ONE codegen pass per row: each element is hashed once (FNV-1a 64),
  * then the 128 "permutations" are cheap splitmix64 finalizer mixes of
  * that base hash with a per-permutation constant — the standard
  * one-hash + k universal-mixes construction, so the cost per row is
  * O(n·(1 hash + 128 mixes)) instead of the O(n·128 full hashes) the
  * relational form pays.
  *
  * Replaces d2's explode → 128 grouped min-aggregates formulation: that
  * plan shuffles the exploded (doc, shingle) stream (map-side combined,
  * but still a corpus-sized exchange at 100 TB) where this expression
  * makes signatures strictly MAP-ONLY — the only shuffle left in
  * MinHash-LSH is the band equi-join itself.
  */
case class MinHash128(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash128"

  // analysis-time rejection of non-array<string> input (a SQL caller can
  // reach this expression with any type); null ELEMENTS are legal input
  // and skipped in compute()
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHash128.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.MinHash128.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHash128 {

  val K = 128

  /** splitmix64 finalizer — full-avalanche mix of the seeded base hash. */
  private def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Shared by interpreted eval and generated code. Empty input yields a
    * signature of Long.MaxValue sentinels (callers filter empty sets).
    */
  def compute(arr: ArrayData): ArrayData = {
    val mins = Array.fill(K)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      // null elements contribute nothing (containsNull=true arrays are
      // constructible via SQL even though shingleSets never emits them)
      if (!arr.isNullAt(i)) {
        val base = SimHash64.fnv1a64(arr.getUTF8String(i).getBytes)
        var k = 0
        while (k < K) {
          val h = mix(base ^ (k * 0x9E3779B97F4A7C15L))
          if (h < mins(k)) mins(k) = h
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
