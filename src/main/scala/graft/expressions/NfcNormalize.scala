package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (UAX #15) as a codegen scalar — the first
  * repair a raw crawl's text needs (decomposed accents from mixed
  * editors, fullwidth compatibility forms) before any hash-based
  * operator runs: t8's exact-dedup fingerprint, d1-d3's shingles, and
  * m20's hashed features all treat "café" (NFC) and "cafe" + U+0301
  * (NFD) as DIFFERENT documents unless this pass runs first.
  *
  * The JDK normalizer is the reference UAX #15 implementation, and
  * DuckDB's `nfc_normalize` implements the same algorithm, so t27's
  * twin is value-exact. The quick-check fast path (`isNormalized`)
  * returns the input buffer untouched for already-NFC text — the
  * overwhelming case on a real corpus, so the per-row cost is a scan,
  * not an allocation.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.expressions.NfcNormalize.nfc($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
