package graft.expressions

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Native vector expressions: SQL-registered via GraftExtensions,
  * checked against driver-side sequential folds.
  */
class VecExpressionsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("vec_dot and vec_norm match driver-side sequential folds") {
    val rng = new scala.util.Random(17)
    val a = Array.fill(64)(rng.nextDouble() * 2 - 1)
    val b = Array.fill(64)(rng.nextDouble() * 2 - 1)
    def lit(v: Array[Double]) = v.mkString("array(", "d, ", "d)") // d = double literals, not decimal
    val Seq(dot, na) = spark.sql(
      s"SELECT vec_dot(${lit(a)}, ${lit(b)}), vec_norm(${lit(a)})")
      .collect().head.toSeq.map(_.asInstanceOf[Double])
    var expDot = 0.0; var expN = 0.0
    for (i <- a.indices) { expDot += a(i) * b(i); expN += a(i) * a(i) }
    assert(dot == expDot) // bit-identical, not approximate
    assert(na == math.sqrt(expN))
  }

  test("minhash128 skips null elements and rejects non-array<string> input") {
    // a null element contributes nothing: signature equals the
    // null-free array's
    val row = spark.sql(
      """SELECT minhash128(array('ab', CAST(NULL AS STRING), 'cd')),
        |       minhash128(array('ab', 'cd'))""".stripMargin)
      .collect().head
    assert(row.getSeq[Long](0) == row.getSeq[Long](1))
    // non-array<string> input is an analysis-time error, not a runtime
    // ClassCastException
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT minhash128(array(1, 2, 3))").collect()
    }
    assert(err.getMessage.toLowerCase.contains("array<string>"))
  }

  test("native expressions reject wrong input types at analysis time") {
    // each would otherwise surface as an executor ClassCastException
    Seq(
      "simhash64(array(1, 2))",
      "word_ngrams(array('a', 'b'), CAST(2 AS BIGINT))",
      "winnow_fingerprints(array('a'))",
      "vec_dot(array('a'), array('b'))",
      "vec_norm(array('a'))",
    ).foreach { exprSql =>
      intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(s"SELECT $exprSql").collect()
      }
    }
  }

  test("simhash64 skips null elements; word_ngrams handles non-positive n") {
    val r = spark.sql(
      """SELECT simhash64(array('ab', CAST(NULL AS STRING), 'cd')),
        |       simhash64(array('ab', 'cd')),
        |       word_ngrams(array('a', 'b'), 0)""".stripMargin)
      .collect().head
    assert(r.getLong(0) == r.getLong(1))
    assert(r.getSeq[String](2).isEmpty)
  }

  test("edge cases: empty arrays and length mismatch") {
    val r = spark.sql(
      """SELECT vec_dot(array(), array()),
        |       vec_dot(array(1.0d, 2.0d, 3.0d), array(10.0d)),
        |       vec_norm(array()),
        |       vec_dot(NULL, array(1.0d))""".stripMargin)
      .collect().head
    assert(r.getDouble(0) == 0.0)
    assert(r.getDouble(1) == 10.0) // min-length semantics
    assert(r.getDouble(2) == 0.0)
    assert(r.isNullAt(3))
  }
}
