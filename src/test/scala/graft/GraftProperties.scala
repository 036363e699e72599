package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the driver-side kernels (run by sbt's
  * native ScalaCheck support alongside the ScalaTest suites).
  */
object GraftProperties extends Properties("graft") {

  private val wordGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString).suchThat(_.nonEmpty)
  private val textGen: Gen[String] =
    Gen.listOf(Gen.oneOf(wordGen, Gen.oneOf("not", "very", "good", "bad", "the")))
      .map(_.mkString(" "))

  property("sentiment stays bounded") = forAll(textGen) { t =>
    val (p, s) = functions.Sentiment.score(t)
    p >= -1.0 && p <= 1.0 && s >= 0.0 && s <= 1.0
  }

  property("lemmatize never lengthens a token") =
    forAll(wordGen, Gen.oneOf("NN", "NNS", "VB", "VBD", "JJ", "RB")) { (w, tag) =>
      functions.PosLemma.lemmatize(w, tag).length <= w.length
    }

  property("posTag is total and keep() decides every tag") = forAll(wordGen) { w =>
    val tag = functions.PosLemma.posTag(w)
    tag.nonEmpty && (functions.PosLemma.keep(tag) || !functions.PosLemma.keep(tag))
  }

  property("winnow: a shared >=31-byte substring implies a shared fingerprint") =
    forAll(wordGen, wordGen, Gen.choose(31, 120)) { (pre, post, n) =>
      val core = Iterator.continually("abcdefghij kl mno pqr stuvw xyz ")
        .flatten.take(n).mkString
      val f1 = expressions.WinnowFingerprints.compute(core.getBytes).toSet
      val f2 = expressions.WinnowFingerprints
        .compute((pre + " " + core + " " + post).getBytes).toSet
      f1.isEmpty || f1.intersect(f2).nonEmpty
    }

  property("winnow fingerprints are deterministic") = forAll(textGen) { t =>
    expressions.WinnowFingerprints.compute(t.getBytes).toSeq ==
      expressions.WinnowFingerprints.compute(t.getBytes).toSeq
  }

  property("TopKAggregator equals sort-take under arbitrary chunking") =
    forAll(
      Gen.listOf(Gen.zip(Gen.choose(0, 30).map(_ / 10.0), Gen.choose(0L, 50L))),
      Gen.choose(1, 10)) { (data, k) =>
      val items = data.map { case (s, i) => functions.ScoredId(s, i) }
      val agg = new functions.TopKAggregator(k)
      val ord = Ordering.by((s: functions.ScoredId) => (-s.score, s.id))
      val chunks = items.grouped(math.max(1, items.size / 3 + 1)).toSeq
      val merged = chunks.map(c => c.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      agg.finish(merged) == items.sorted(ord).take(k)
    }

  property("xml_fields round-trips random leaf documents") = {
    val valGen = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const(' ')))
      .map(_.mkString.trim)
    forAll(valGen, valGen, Gen.nonEmptyListOf(valGen)) { (a, b, ps) =>
      val doc = s"<root><alpha>$a</alpha><beta q=\"$b\">x</beta>" +
        ps.map(p => s"<p>$p</p>").mkString + "</root>"
      val specs = Array("alpha", "beta@q", "p[]").map(expressions.XmlFields.parseSpec)
      val row = expressions.XmlFields.compute(doc, specs)
      val gotPs = row.getArray(2)
      row.getUTF8String(0).toString == a &&
        row.getUTF8String(1).toString == b &&
        gotPs.numElements() == ps.length &&
        ps.indices.forall(i => gotPs.getUTF8String(i).toString == ps(i))
    }
  }

  property("xml_fields never throws on arbitrary junk input") =
    forAll(Gen.listOf(Gen.oneOf(Gen.alphaNumChar,
      Gen.oneOf('<', '>', '/', '"', '\'', '&', '=', ' '))).map(_.mkString)) { junk =>
      val specs = Array("a", "b@c", "d[]").map(expressions.XmlFields.parseSpec)
      val row = expressions.XmlFields.compute(junk, specs)
      row != null && row.numFields == 3
    }

  property("fnv1a64 matches the published reference vectors") = Prop {
    // draft-eastlake-fnv test vectors (64-bit FNV-1a)
    expressions.SimHash64.fnv1a64("".getBytes) == 0xcbf29ce484222325L &&
    expressions.SimHash64.fnv1a64("a".getBytes) == 0xaf63dc4c8601ec8cL &&
    expressions.SimHash64.fnv1a64("foobar".getBytes) == 0x85944171f73967e8L
  }

  property("t16 chunk grid (128/96) covers every token; full chunks overlap by 32") =
    forAll(Gen.choose(1, 5000)) { n =>
      val starts = (0 to (n - 1) / 96).map(_ * 96)
      val covered = Array.fill(n)(false)
      starts.foreach(s => (s until math.min(s + 128, n)).foreach(covered(_) = true))
      val overlapsOk = starts.sliding(2).forall {
        case Seq(a, b) =>
          val aEnd = math.min(a + 128, n)
          aEnd <= b || aEnd - b == math.min(32, n - b)
        case _ => true
      }
      starts.last < n && covered.forall(identity) && overlapsOk
    }

  property("t15 pack bins are contiguous from 0 and never split a fitting prefix") =
    forAll(Gen.nonEmptyListOf(Gen.choose(1, 400))) { ntoks =>
      val bins = ntoks.scanLeft(0L)(_ + _).zip(ntoks)
        .map { case (before, _) => before / 512 }
      val contiguous = bins.head == 0L &&
        bins.sliding(2).forall { case Seq(a, b) => b == a || b == a + 1; case _ => true }
      // any doc whose tokens fit wholly under the next bin boundary
      // shares its bin with the previous doc (greedy fill, no waste)
      val noWaste = ntoks.scanLeft(0L)(_ + _).zip(ntoks).zip(bins).forall {
        case ((before, nt), b) => (before + nt - 1) / 512 != b || (before / 512) == b
      }
      contiguous && noWaste
    }

  property("PII chain leaves no residual email/phone/IP in arbitrary text") = {
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    val emailG = Gen.zip(word, word).map { case (l, d) => s"$l@$d.com" }
    val ipG = Gen.listOfN(4, Gen.choose(0, 255)).map(_.mkString("."))
    val phoneG = Gen.choose(0, 99).map(n => s"+1-555-01$n")
    forAll(Gen.listOf(word), emailG, ipG, phoneG) { (ws, em, ip, ph) =>
      val text = (ws :+ em :+ ip :+ ph).mkString(" ")
      val red = text
        .replaceAll("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
        .replaceAll("\\+?[0-9][0-9()\\- ]{6,}[0-9]", "<PHONE>")
        .replaceAll("\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "<IP>")
      !red.contains("@") &&
        "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b".r.findFirstIn(red).isEmpty &&
        "\\+?[0-9][0-9()\\- ]{6,}[0-9]".r.findFirstIn(red).isEmpty &&
        ws.forall(red.contains)
    }
  }

  property("simhash-style bit fold round-trips sign sums") =
    forAll(Gen.listOfN(64, Gen.oneOf(-3L, -1L, 1L, 3L))) { sums =>
      // reconstructing bits from the packed long matches the sign rule
      val packed = sums.zipWithIndex.foldLeft(0L) { case (acc, (s, j)) =>
        if (s >= 0) acc | (1L << j) else acc
      }
      sums.zipWithIndex.forall { case (s, j) =>
        (((packed >> j) & 1L) == 1L) == (s >= 0)
      }
    }

  property("activity run-length stats are consistent for any flag sequence") =
    forAll(Gen.listOf(Gen.oneOf(true, false))) { flags =>
      // driver replay of mm8's runStats invariants without exposing it:
      // longest quiet run computed two independent ways must agree
      var cur = 0L; var best = 0L; var active = 0L
      flags.foreach { a =>
        if (a) { active += 1; cur = 0 } else { cur += 1; best = math.max(best, cur) }
      }
      // gaps-and-islands replay (the mm8 oracle's device): consecutive
      // inactive positions share i − rank-among-inactive
      val byGroups = {
        val keys = flags.zipWithIndex.collect {
          case (false, i) => i - flags.take(i).count(x => !x)
        }
        if (keys.isEmpty) 0L
        else keys.groupBy(identity).values.map(_.size).max.toLong
      }
      active + flags.count(!_) == flags.length && best == byGroups
    }
}
