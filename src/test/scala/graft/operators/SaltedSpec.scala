package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted aggregation must be value-identical to the plain form. */
class SaltedSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("saltedCount equals plain groupBy count") {
    val ev = Tables.events(spark, dir)
    val got = Salted.saltedCount(ev, col("event_type"), salts = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exp = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exp)
  }

  test("saltedAvg equals plain groupBy avg within fp tolerance") {
    val ev = Tables.events(spark, dir)
    val got = Salted.saltedAvg(ev, col("event_type"), col("value"), salts = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exp = ev.groupBy(col("event_type")).agg(avg(col("value")).as("a"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == exp.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - exp(k)) < 1e-9, k) }
  }

  test("a single hot key spreads across multiple partial groups") {
    import spark.implicits._
    val hot = Seq.fill(10000)("hot").toDF("k")
    val n = Salted.saltedCount(hot, col("k"), salts = 8)
      .collect().head.getLong(1)
    assert(n == 10000)
  }
}
