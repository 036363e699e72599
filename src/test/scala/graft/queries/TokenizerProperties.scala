package graft.queries

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Tokenizer-kernel properties that need queries-package access
  * (bpeMerges/bpeEncode/unigramTrain/unigramSegment are
  * private[queries]).
  */
object TokenizerProperties extends Properties("graft.tokenizer") {

  private val wordGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString).suchThat(_.nonEmpty)

  property("BPE encode is lossless for any word under any learned merge prefix") = {
    val corpusGen = Gen.nonEmptyListOf(
      Gen.zip(wordGen.map(_.take(8)), Gen.choose(1L, 50L)))
    forAll(corpusGen, wordGen.map(_.take(12)), Gen.choose(0, 8)) { (corpus, w, k) =>
      val learned = Topics.bpeMerges(corpus.toArray, k)
        .map(m => (m._2, m._3)).toArray
      val pieces = Topics.bpeEncode(w, learned)
      pieces.mkString.replace("</w>", "") == w
    }
  }

  property("unigram segmentation is lossless incl. OOV characters") = {
    val corpusGen = Gen.nonEmptyListOf(
      Gen.zip(wordGen.map(_.take(8)), Gen.choose(1L, 50L)))
    val probeGen = Gen.nonEmptyListOf(
      Gen.oneOf(Gen.alphaLowerChar, Gen.oneOf('z', 'q', 'x'))).map(_.mkString.take(12))
    forAll(corpusGen, probeGen) { (corpus, w) =>
      val trained = Topics.unigramTrain(corpus.toArray)
      val tot = math.max(1L, trained.map(_._2).sum).toDouble
      val probs = trained.map { case (p, u, _) => p -> math.max(u / tot, 1e-12) }.toMap
      Topics.unigramSegment(w, probs).mkString == w
    }
  }

}
