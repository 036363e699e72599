package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Gopher quality-rule battery (Rae et al. '21, Appendix A) as ONE
  * codegen'd pass — seven document-level filters packed into an INT
  * bitmask (bit set = rule passed):
  *
  *   bit 0  word count in [50, 100k]
  *   bit 1  mean word length in [3, 10]
  *   bit 2  symbol-to-word ratio ('#', '…', '...') ≤ 0.1
  *   bit 3  ≤ 90% of lines start with a bullet (•, ‣, ▪, -, *)
  *   bit 4  ≤ 30% of lines end with an ellipsis
  *   bit 5  ≥ 80% of words contain an alphabetic character
  *   bit 6  ≥ 2 distinct Gopher stop words present
  *
  * keep = mask == 127. All comparisons are INTEGER cross-multiplied
  * (10·nSym ≤ n, not nSym/n ≤ 0.1), so the DuckDB twin is hash-exact
  * with no float grid. Declaratively each rule would re-reference the
  * tokenize split (the re-inline trap quality_raw exists for); here the
  * split runs once per row. Bullet/ellipsis checks are EXACT prefix/
  * suffix matches (no whitespace strip) — RE2's \s and Java's \s
  * disagree on VT, so a strip would un-twin the oracle; documented
  * divergence from Gopher's informal "starts with".
  *
  * NULL CONTRACT (quality_raw's, pinned in GopherFlagsSpec): a NULL
  * document passes no rules — mask 0, keep false — because the DuckDB
  * twin's CASE WHENs all evaluate null→false and fall to 0. Hence
  * nullable=false here, NOT null-propagating.
  */
case class GopherFlags(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "gopher_flags"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.catalogString}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0
    else GopherFlags.compute(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
            |${c.code}
            |int ${ev.value} = ${c.isNull} ? 0 :
            |  graft.expressions.GopherFlags.compute(${c.value});
            |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GopherFlags {

  private val trimRe = java.util.regex.Pattern.compile("^\\s+|\\s+$")
  private val wsRe = java.util.regex.Pattern.compile("\\s+")
  private val gopherStops =
    Set("the", "be", "to", "of", "and", "that", "have", "with")
  private val bullets = "•‣▪-*"

  private def countOccurrences(s: String, sub: String): Int = {
    var n = 0
    var i = s.indexOf(sub)
    while (i >= 0) { n += 1; i = s.indexOf(sub, i + sub.length) }
    n
  }

  def compute(text: UTF8String): Int = {
    val str = text.toString
    val toks = wsRe.split(trimRe.matcher(str).replaceAll(""), -1)
    val n = toks.length.toLong
    var sumLen = 0L
    var nAlphaW = 0L
    val stopsSeen = new java.util.HashSet[String]()
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      val u = UTF8String.fromString(tok)
      sumLen += u.numChars()
      var hasAlpha = false
      var i = 0
      while (i < tok.length && !hasAlpha) {
        val c = tok.charAt(i)
        hasAlpha = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
        i += 1
      }
      if (hasAlpha) nAlphaW += 1
      val low = u.toLowerCase.toString
      if (gopherStops.contains(low)) stopsSeen.add(low)
      t += 1
    }
    var nHash = 0
    var i = 0
    while (i < str.length) { if (str.charAt(i) == '#') nHash += 1; i += 1 }
    val nSym = nHash.toLong + countOccurrences(str, "…") +
      countOccurrences(str, "...")
    val lines = str.split("\n", -1)
    val nLines = lines.length.toLong
    var nBullet = 0L
    var nEllEnd = 0L
    var l = 0
    while (l < lines.length) {
      val line = lines(l)
      if (line.nonEmpty && bullets.indexOf(line.charAt(0)) >= 0) nBullet += 1
      if (line.endsWith("...") || line.endsWith("…")) nEllEnd += 1
      l += 1
    }
    var mask = 0
    if (n >= 50 && n <= 100000) mask |= 1
    if (sumLen >= 3L * n && sumLen <= 10L * n) mask |= 2
    if (10L * nSym <= n) mask |= 4
    if (10L * nBullet <= 9L * nLines) mask |= 8
    if (10L * nEllEnd <= 3L * nLines) mask |= 16
    if (5L * nAlphaW >= 4L * n) mask |= 32
    if (stopsSeen.size >= 2) mask |= 64
    mask
  }
}
