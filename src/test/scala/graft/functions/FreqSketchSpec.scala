package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra–Gries sketch guarantees under Spark's partial/merge execution:
  * undercount-only estimates within n/(k+1), guaranteed inclusion of
  * genuinely heavy items under ANY partitioning, bounded size, and the
  * t32 two-pass query's exactness against brute force.
  */
class FreqSketchSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir
  import spark.implicits._

  // skewed synthetic stream: one heavy item at ~8%, a mid item at ~2%,
  // and a long uniform tail (deterministic)
  private val stream: Seq[String] = {
    val rng = new scala.util.Random(7)
    val base = (0 until 5000).map { i =>
      if (i % 12 == 0) "HEAVY"
      else if (i % 50 == 0) "mid"
      else s"tail${rng.nextInt(2000)}"
    }
    rng.shuffle(base)
  }

  private val K = 50

  test("inclusion + undercount bound hold under every partitioning") {
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = stream.size
    val bound = n.toDouble / (K + 1)
    for (parts <- Seq(1, 7, 32)) {
      val sk = stream.toDF("w").repartition(parts)
        .agg(FreqSketch.freqSketch(K)(col("w"))).first()
        .getMap[String, Long](0)
      assert(sk.size <= K, s"parts=$parts size ${sk.size}")
      // estimates never overcount, and undercount at most n/(k+1)
      sk.foreach { case (x, est) =>
        assert(est <= truth(x), s"parts=$parts overcount on $x")
        assert(truth(x) - est <= bound + 1e-9, s"parts=$parts bound on $x")
      }
      // anything truly heavier than n/(k+1) MUST be present
      truth.filter(_._2 > bound).keys.foreach { x =>
        assert(sk.contains(x), s"parts=$parts lost heavy item $x")
      }
      assert(sk.contains("HEAVY") && sk.contains("mid"))
    }
  }

  test("t32 two-pass heavy hitters equal brute force on the fixture") {
    val got = graft.queries.Text.t32HeavyHitters(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val toks = graft.Tables.documents(spark, dir)
      .select(col("text")).collect()
      .flatMap(_.getString(0).trim.split("\\s+")).filter(_.nonEmpty)
    val n = toks.length.toLong
    val want = toks.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * graft.queries.Text.T32Denom > n }
      .toSeq.sortBy { case (w, c) => (-c, w) }
    assert(got.toSeq == want, s"${got.length} vs ${want.length}")
    assert(got.nonEmpty, "fixture has no heavy tokens — threshold vacuous")
  }
}
