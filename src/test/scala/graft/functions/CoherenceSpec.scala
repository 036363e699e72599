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

  test("event-sweep windowCounts matches brute-force window materialization") {
    // the production path never materializes windows; this oracle does,
    // over seeded random docs spanning the n<=window and n>window regimes
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g")
    val words = Set("a", "b", "c")
    val win = 5
    val docs = (0L until 40L).map { i =>
      val n = 1 + rnd.nextInt(14) // lengths 1..14 straddle win=5
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))))
    }
    // brute force: materialize every sliding window
    var tot = 0L
    val single = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val pairs =
      scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    docs.foreach { case (_, toks) =>
      val wins = if (toks.length <= win) Seq(toks) else toks.sliding(win).toSeq
      wins.foreach { w =>
        tot += 1
        val present = w.filter(words.contains).distinct.sorted
        present.foreach(x => single(x) += 1)
        for (i <- present.indices; j <- i + 1 until present.size)
          pairs((present(i), present(j))) += 1
      }
    }
    val (gotSingle, gotPairs, gotTot) =
      Coherence.windowCounts(docs.toDF("doc_id", "tokens"), words, win)
    assert(gotTot == tot)
    assert(gotSingle == single.toMap)
    assert(gotPairs == pairs.toMap)
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

  test("cvMany over one pass is bit-identical to per-model cv calls") {
    val rng = new scala.util.Random(3)
    val vocab = (0 until 40).map(i => s"w$i")
    val docs = (0 until 50).map { i =>
      (i.toLong, Seq.fill(30)(vocab(rng.nextInt(vocab.size))))
    }
    val df = docs.toDF("doc_id", "tokens").cache()
    // two "models" with overlapping and disjoint topic words
    val m1 = Seq(Seq("w0", "w1", "w2"), Seq("w3", "w4"))
    val m2 = Seq(Seq("w2", "w5", "w6"), Seq("w7", "w8", "w9"))
    val combined = Coherence.cvMany(df, Seq(m1, m2), 10)
    // tracking the UNION of words must not perturb either model's counts
    assert(combined(0) == Coherence.cv(df, m1, 10))
    assert(combined(1) == Coherence.cv(df, m2, 10))
  }
}
