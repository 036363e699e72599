package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** C4 line-level filter (Raffel et al. '20 §2.2, the C4 construction
  * rules) as ONE codegen'd pass: keep a line iff
  *
  *   1. its trimmed form ends in a terminal punctuation mark
  *      (`.` `!` `?` `"` — C4's "period, exclamation mark, question
  *      mark, or end quotation mark");
  *   2. it contains at least 3 whitespace words ("only retained lines
  *      that contained at least 3 words");
  *   3. it does not mention "javascript" case-insensitively ("removed
  *      any line with the word Javascript").
  *
  * Returns the SURVIVING lines joined by `\n` — the line-cleaned page
  * the t25 page-level rules then judge. Kept lines are the ORIGINAL
  * (untrimmed) lines, exactly like the DuckDB twin's `list_filter`.
  *
  * Declaratively this is a `filter(split(text,'\n'), l -> ...)` HOF
  * chain — interpreted, and the trim regex would run once per
  * predicate reference (the re-inline trap quality_raw documents).
  * Here each line is trimmed once and scanned once, inside
  * whole-stage codegen.
  *
  * NULL CONTRACT (pinned in C4LinesSpec): NULL text → empty string
  * (page keeps zero lines, so every page-level rule downstream sees
  * the same empty page in both engines) — nullable=false, NOT
  * null-propagating, the gopher_flags/quality_raw doctrine.
  */
case class C4Lines(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "c4_lines"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.catalogString}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) UTF8String.EMPTY_UTF8
    else C4Lines.compute(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
            |${c.code}
            |UTF8String ${ev.value} = ${c.isNull}
            |  ? UTF8String.EMPTY_UTF8
            |  : graft.expressions.C4Lines.compute(${c.value});
            |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object C4Lines {

  private val trimRe = java.util.regex.Pattern.compile("^\\s+|\\s+$")
  private val wsRe = java.util.regex.Pattern.compile("\\s+")
  private val terminal = ".!?\""

  /** True iff the line survives all three C4 line rules. */
  def keepLine(line: String): Boolean = {
    val trimmed = trimRe.matcher(line).replaceAll("")
    if (trimmed.isEmpty) return false
    if (terminal.indexOf(trimmed.charAt(trimmed.length - 1)) < 0) return false
    // >= 3 whitespace words (trimmed is non-empty so split yields no "")
    if (wsRe.split(trimmed, -1).length < 3) return false
    // case-insensitive "javascript" scan without allocating a lowered copy
    var i = 0
    val limit = line.length - 10
    while (i <= limit) {
      if (line.regionMatches(true, i, "javascript", 0, 10)) return false
      i += 1
    }
    true
  }

  def compute(text: UTF8String): UTF8String = {
    val lines = text.toString.split("\n", -1)
    val sb = new java.lang.StringBuilder
    var l = 0
    while (l < lines.length) {
      val line = lines(l)
      if (keepLine(line)) {
        if (sb.length > 0) sb.append('\n')
        sb.append(line)
      }
      l += 1
    }
    UTF8String.fromString(sb.toString)
  }
}
