package graft.functions

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** c_v coherence building blocks vs hand-computed counts. */
class CoherenceSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("windowCounts matches hand-computed sliding-window incidence") {
    // doc1: 5 tokens, window 3 → windows [a b c][b c a][c a d]
    val df = Seq((1L, Seq("a", "b", "c", "a", "d"))).toDF("doc_id", "tokens")
    val (single, pairs, tot) = Coherence.windowCounts(df, Set("a", "b", "d"), 3)
    assert(tot == 3)
    assert(single == Map("a" -> 3, "b" -> 2, "d" -> 1))
    assert(pairs == Map(("a", "b") -> 2, ("a", "d") -> 1))
  }

  test("short docs form a single window") {
    val df = Seq((1L, Seq("x", "y"))).toDF("doc_id", "tokens")
    val (single, pairs, tot) = Coherence.windowCounts(df, Set("x", "y"), 110)
    assert(tot == 1 && single == Map("x" -> 1, "y" -> 1) && pairs == Map(("x", "y") -> 1))
  }

  test("perfectly co-occurring topic words score near 1, disjoint score lower") {
    // corpus A: {sun moon} always together; corpus B: {cat} and {dog}
    // never co-occur
    val docs = (0 until 30).map(i => (i.toLong, Seq("sun", "moon", s"pad$i"))) ++
      (30 until 45).map(i => (i.toLong, Seq("cat", s"pad$i"))) ++
      (45 until 60).map(i => (i.toLong, Seq("dog", s"pad$i")))
    val df = docs.toDF("doc_id", "tokens")
    val Seq(cohesive, fragmented) =
      Coherence.cv(df, Seq(Seq("sun", "moon"), Seq("cat", "dog")), 110)
    assert(cohesive > 0.9, s"cohesive $cohesive")
    assert(fragmented < cohesive, s"fragmented $fragmented vs $cohesive")
  }
}
