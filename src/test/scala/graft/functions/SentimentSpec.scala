package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pinned-pair tests for the sentiment scalar — the algebra (averaging,
  * negation dampening, intensifier scaling, bounds, empty-match zero)
  * mirrors TextBlob's analyzer; absolute values come from our own
  * lexicon.
  */
class SentimentSpec extends AnyFunSuite {
  import Sentiment.score

  test("single lexicon word returns its lexicon entry") {
    assert(score("good") == (0.7, 0.6))
    assert(score("bad") == (-0.7, 0.67))
  }

  test("multiple words average") {
    val (p, s) = score("good bad")
    assert(math.abs(p - 0.0) < 1e-12)
    assert(math.abs(s - (0.6 + 0.67) / 2) < 1e-12)
  }

  test("no lexicon match gives (0,0)") {
    assert(score("the quarterly fiscal report was published") == (0.0, 0.0))
    assert(score("") == (0.0, 0.0))
    assert(score(null) == (0.0, 0.0))
  }

  test("negation multiplies polarity by -0.5, subjectivity unchanged") {
    assert(score("not good") == (0.7 * -0.5, 0.6))
    assert(score("isn't good") == (0.7 * -0.5, 0.6))
  }

  test("intensifier scales and is consumed, not scored") {
    val (p, s) = score("very good")
    assert(math.abs(p - 0.7 * 1.3) < 1e-12)
    assert(math.abs(s - math.min(1.0, 0.6 * 1.3)) < 1e-12)
  }

  test("negated intensified phrase: scale then flip-dampen") {
    val (p, _) = score("not very good")
    assert(math.abs(p - (0.7 * 1.3 * -0.5)) < 1e-12)
  }

  test("clamping keeps polarity in [-1,1] and subjectivity in [0,1]") {
    val (p, s) = score("extremely excellent") // 1.0 * 1.5 → clamp 1.0
    assert(p == 1.0 && s == 1.0)
  }

  test("case-insensitive and punctuation-tolerant") {
    assert(score("GOOD!") == (0.7, 0.6))
    assert(score("Good, bad.") == score("good bad"))
  }

  test("scores are bounded on arbitrary text") {
    val rng = new scala.util.Random(5)
    val words = Sentiment.lexicon.keys.toIndexedSeq ++ Seq("not", "very", "xyz")
    (0 until 200).foreach { _ =>
      val text = Seq.fill(rng.nextInt(30))(words(rng.nextInt(words.size))).mkString(" ")
      val (p, s) = score(text)
      assert(p >= -1.0 && p <= 1.0 && s >= 0.0 && s <= 1.0, s"out of bounds for: $text")
    }
  }
}
