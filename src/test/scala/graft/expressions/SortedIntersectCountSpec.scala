package graft.expressions

import graft.TestSpark
import org.apache.spark.sql.GraftNative
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native sorted-merge intersect count (the d1/d2/d16 verify
  * primitive): checked for exact agreement with the built-in
  * `size(array_intersect(a, b))` on sorted distinct arrays — the input
  * contract `Dedup.shingleSets` establishes — across randomized and
  * edge-case inputs, on BOTH the codegen and interpreted paths.
  */
class SortedIntersectCountSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cnt(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    GraftNative.column(SortedIntersectCount(
      GraftNative.expression(a), GraftNative.expression(b)))

  test("matches size(array_intersect) on randomized sorted distinct arrays") {
    // deterministic pseudo-random word sets (no RNG state — the q26
    // doctrine): word universe of 40 tokens, membership by hash parity
    val rows = (0 until 200).map { i =>
      val a = (0 until 40).filter(w => (w * 2654435761L + i) % 3 == 0)
        .map(w => f"w$w%03d").sorted
      val b = (0 until 40).filter(w => (w * 40503L + i * 7) % 4 == 0)
        .map(w => f"w$w%03d").sorted
      (a, b)
    }
    val df = rows.toDF("a", "b")
      .select(cnt(col("a"), col("b")).as("got"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("exp"))
    val bad = df.filter(col("got") =!= col("exp")).count()
    assert(bad == 0L, s"$bad disagreements vs array_intersect")
  }

  test("edge cases: empty, disjoint, identical, containment, unicode") {
    val rows = Seq(
      (Seq.empty[String], Seq.empty[String]),
      (Seq.empty[String], Seq("a", "b")),
      (Seq("a", "b", "c"), Seq("x", "y")),
      (Seq("a", "b", "c"), Seq("a", "b", "c")),
      (Seq("b"), Seq("a", "b", "c")),
      // array_sort's binary UTF8 order, same as the merge comparator
      (Seq("café", "naïve", "zebra"), Seq("café", "zebra")),
      (Seq("", "a"), Seq("", "b")))
    val df = rows.toDF("a", "b")
      .select(sort_array(col("a")).as("a"), sort_array(col("b")).as("b"))
      .select(cnt(col("a"), col("b")).as("got"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("exp"))
    assert(df.filter(col("got") =!= col("exp")).count() == 0L)
  }

  test("interpreted path (nullSafeEval) agrees with codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val t = ArrayType(StringType)
    val a = Literal.create(Seq("alpha", "beta", "delta", "gamma"), t)
    val b = Literal.create(Seq("beta", "epsilon", "gamma"), t)
    assert(SortedIntersectCount(a, b).eval(null) == 2L)
    // null input → null out (BinaryExpression null semantics)
    assert(SortedIntersectCount(Literal.create(null, t), b).eval(null) == null)
  }
}
