package graft.expressions

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Native fnv64 scalar: SQL-registered via GraftExtensions, checked
  * against the shared driver-side FNV-1a fold (the same function the
  * SimHash/MinHash expressions hash elements with).
  */
class Fnv64Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fnv64 matches the driver-side FNV-1a fold bit-for-bit") {
    val samples = Seq("", "a", "alpha beta", "the quick brown fox",
      "naïve café — utf8 bytes", "0123456789" * 20)
    val got = samples.toDF("s")
      .selectExpr("fnv64(s)").collect().map(_.getLong(0)).toSeq
    val exp = samples.map(s => SimHash64.fnv1a64(s.getBytes("UTF-8")))
    assert(got == exp)
  }

  test("fnv64 rejects non-string input at analysis time; null maps to null") {
    val err = intercept[Exception] {
      spark.sql("SELECT fnv64(42)").collect()
    }
    assert(err.getMessage.contains("fnv64") ||
      err.getMessage.toLowerCase.contains("type"), err.getMessage)
    val r = spark.sql("SELECT fnv64(CAST(NULL AS STRING))").collect().head
    assert(r.isNullAt(0))
  }

  test("pmod(fnv64, 2^k) equals the unsigned low-k-bit bucket (oracle contract)") {
    // the DuckDB twin buckets with unsigned HUGEINT % 4096; Spark with
    // signed pmod — these agree exactly BECAUSE 4096 divides 2^64
    val samples = Seq("x", "negative-hash seeker", "zz top", "αβγ")
    val got = samples.toDF("s")
      .selectExpr("pmod(fnv64(s), 4096L)").collect().map(_.getLong(0)).toSeq
    val exp = samples.map { s =>
      val h = SimHash64.fnv1a64(s.getBytes("UTF-8"))
      java.lang.Long.remainderUnsigned(h, 4096L)
    }
    assert(got == exp)
  }
}
