package graft.expressions

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed byte length of a string — the primitive behind the
  * compression-ratio quality signal (t28): template/boilerplate text
  * compresses far below natural prose, so z_bytes/n_bytes separates
  * machine-generated junk from content with one cheap, language-agnostic
  * number (the working-set heuristic next to the Gopher/C4 batteries).
  *
  * Fixed level 6 and the zlib wrapper make the value deterministic for a
  * given input on a given JDK zlib; the ratio is a HEURISTIC feature,
  * not a portable checksum, so the t28 query is rows-only (no DuckDB
  * twin) and its spec asserts ordering properties, not exact bytes.
  *
  * Scale: per-row scalar, map-only; a fresh Deflater per call keeps the
  * expression thread-safe under whole-stage codegen's task parallelism
  * (Deflater instances are not shareable), and `end()` releases the
  * native zlib stream eagerly rather than waiting for finalization.
  */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "deflate_len"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    DeflateLen.deflateLen(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.expressions.DeflateLen.deflateLen($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateLen {
  def deflateLen(s: UTF8String): Int = {
    val in = s.getBytes
    val d = new Deflater(6)
    try {
      d.setInput(in)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}
