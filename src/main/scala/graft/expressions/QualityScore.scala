package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Pre-round quality score of a document — the four-component heuristic
  * (length band, alpha ratio, stop-word ratio band, mean-token-length
  * band) in ONE pass over the text. Declaratively this is a Column tree
  * that references `tokenize` three times (size / stop-filter / length
  * aggregate); Catalyst re-inlines every reference, so the regex split
  * ran 3× per row and the stop-word probe was an interpreted
  * array_contains scan over a 179-element literal per token — measured
  * 5.8 s for t20 at sf0.1. This expression replaces that tree inside
  * whole-stage codegen with a single split + one HashSet probe per
  * token.
  *
  * VALUE CONTRACT (pinned in TextFunctionsSpec): bit-identical to the
  * original combinator formula, including edge semantics —
  *  - `split(trim, "\s+")` of an empty string yields [""] (one empty
  *    token), exactly like Spark's split with limit -1;
  *  - token lowering uses UTF8String.toLowerCase, Spark's own lower();
  *  - char counts are UTF8String.numChars (code points, not UTF-16
  *    units);
  *  - a NULL document scores 0.0, because every `when` condition in the
  *    original tree evaluates null→false and falls through to
  *    otherwise(0.0) — hence nullable=false here, NOT null-propagating;
  *  - callers apply Spark's round(_, 6) on top, so rounding is Spark's.
  */
case class QualityScore(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "quality_raw"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.catalogString}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0.0
    else QualityScore.compute(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
            |${c.code}
            |double ${ev.value} = ${c.isNull} ? 0.0 :
            |  graft.expressions.QualityScore.compute(${c.value});
            |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QualityScore {

  private val trimRe = java.util.regex.Pattern.compile("^\\s+|\\s+$")
  private val wsRe = java.util.regex.Pattern.compile("\\s+")

  private val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    graft.functions.TextFunctions.stopWords.foreach(s.add)
    s
  }

  def compute(text: UTF8String): Double = {
    val str = text.toString
    val nChars = text.numChars()
    // count of [A-Za-z] chars == numChars(regexp_replace(c,"[^A-Za-z]",""))
    var alpha = 0
    var i = 0
    while (i < str.length) {
      val ch = str.charAt(i)
      if ((ch >= 'A' && ch <= 'Z') || (ch >= 'a' && ch <= 'z')) alpha += 1
      i += 1
    }
    val toks = wsRe.split(trimRe.matcher(str).replaceAll(""), -1)
    val nTok = toks.length
    var nStop = 0
    var sumLen = 0L
    var t = 0
    while (t < toks.length) {
      val u = UTF8String.fromString(toks(t))
      if (stopSet.contains(u.toLowerCase.toString)) nStop += 1
      sumLen += u.numChars()
      t += 1
    }
    val lengthOk =
      if (nTok >= 50 && nTok <= 10000) 1.0
      else if ((nTok >= 10 && nTok < 50) || (nTok > 10000 && nTok <= 20000)) 0.5
      else 0.0
    val alphaRatio = if (nChars > 0) alpha.toDouble / nChars else 0.0
    val stopRatio = if (nTok > 0) nStop.toDouble / nTok else 0.0
    val stopOk = if (stopRatio >= 0.05 && stopRatio <= 0.6) 1.0 else 0.0
    val meanTokLen = if (nTok > 0) sumLen.toDouble / nTok else 0.0
    val tokLenOk = if (meanTokLen >= 3.0 && meanTokLen <= 10.0) 1.0 else 0.0
    (lengthOk + alphaRatio + stopOk + tokLenOk) / 4.0
  }
}
