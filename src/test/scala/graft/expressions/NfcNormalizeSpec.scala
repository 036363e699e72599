package graft.expressions

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Native nfc_normalize scalar: SQL-registered via GraftExtensions,
  * checked against the JDK reference normalizer and the UAX #15
  * composition cases a crawl actually hits.
  */
class NfcNormalizeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("nfc_normalize composes NFD input and round-trips NFC input untouched") {
    val cases = Seq(
      "Cafe\u0301",             // e + combining acute -> \u00e9
      "Caf\u00e9",              // already NFC -> unchanged
      "A\u030angstro\u0308m",  // ring + diaeresis compose
      "\uff21" + "60",          // fullwidth A is NOT recomposed by NFC
      "",                        // empty
      "plain ascii stays put")
    val got = cases.toDF("s").selectExpr("nfc_normalize(s)")
      .collect().map(_.getString(0)).toSeq
    val exp = cases.map(s =>
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    assert(got == exp)
    assert(got.head == "Caf\u00e9", "combining pair did not compose")
    assert(got(1) == "Caf\u00e9", "NFC input changed")
    assert(got(2) == "\u00c5ngstr\u00f6m")
  }

  test("null maps to null; quick-check fast path returns identical content") {
    val r = spark.sql("SELECT nfc_normalize(CAST(NULL AS STRING))").collect().head
    assert(r.isNullAt(0))
    // already-normalized long string: content unchanged through the
    // isNormalized fast path
    val s = ("the quick brown fox " * 50).trim
    val out = Seq(s).toDF("s").selectExpr("nfc_normalize(s)")
      .collect().head.getString(0)
    assert(out == s)
  }
}
