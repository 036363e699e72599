package graft.expressions

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Native deflate_len scalar: SQL-registered via GraftExtensions,
  * checked against a driver-side Deflater replay and the ordering
  * property the t28 compression-ratio filter relies on.
  */
class DeflateLenSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("deflate_len matches the driver-side zlib fold; repetition compresses") {
    val repetitive = "click here click here click here " * 30
    val prose = "the library catalogues forgotten rivers, maps " +
      "unexpected journeys, and argues with its own marginalia until dawn"
    val samples = Seq(repetitive, prose, "", "x")
    val got = samples.toDF("s").selectExpr("deflate_len(s)")
      .collect().map(_.getInt(0)).toSeq
    val exp = samples.map(s => DeflateLen.deflateLen(
      org.apache.spark.unsafe.types.UTF8String.fromString(s)))
    assert(got == exp, "executor and driver zlib folds disagree")
    // the signal: boilerplate compresses far below prose
    val repRatio = got.head.toDouble / repetitive.getBytes("UTF-8").length
    val proseRatio = got(1).toDouble / prose.getBytes("UTF-8").length
    assert(repRatio < 0.15, s"repetitive ratio $repRatio not small")
    assert(proseRatio > repRatio * 3, s"prose $proseRatio vs boilerplate $repRatio")
  }

  test("t28 scores every document with a positive, bounded ratio") {
    val rows = graft.queries.Text.t28CompressRatio(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, z, ratio) =>
      assert(n > 0 && z > 0, s"doc $id degenerate sizes")
      assert(ratio > 0.0 && ratio < 1.5, s"doc $id ratio $ratio out of band")
      assert(math.abs(ratio - z.toDouble / n) < 1e-6, s"doc $id ratio mismatch")
    }
  }
}
