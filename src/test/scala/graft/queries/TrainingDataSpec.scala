package graft.queries

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force checks for the training-data-pipeline operators added in
  * round 3 (stratified hash sampling, PII redaction, repetition metrics,
  * sequence packing, decontamination, label centroids) on the sf0.001
  * fixtures — driver-side recomputation on the collected (tiny) data.
  */
class TrainingDataSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def docs: Array[(Long, String, String, String)] =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))

  test("q26 stratified sample matches driver-side md5 bucketing exactly") {
    val kept = Relational.q26StratifiedSample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = docs.flatMap { case (id, _, lang, _) =>
      val hex = md.digest(s"$id$lang".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val bucket = java.lang.Long.parseLong(hex.take(8), 16) % 1000
      val rate = if (lang == "en") 200 else 1000
      if (bucket < rate) Some((id, lang)) else None
    }.toSet
    assert(kept == expected)
    // non-en strata pass through untouched; en is genuinely downsampled
    val (en, other) = docs.partition(_._3 == "en")
    assert(other.map(d => (d._1, d._3)).toSet.subsetOf(kept))
    assert(en.count(d => kept.contains((d._1, d._3))) < en.length)
  }

  test("t13 redaction leaves no residual email/phone/IP and is idempotent") {
    val out = Text.t13PiiRedact(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.nonEmpty)
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}".r
    val phone = "\\+?[0-9][0-9()\\- ]{6,}[0-9]".r
    val ip = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b".r
    out.foreach { case (id, red) =>
      assert(email.findFirstIn(red).isEmpty, s"doc $id leaks an email")
      assert(phone.findFirstIn(red).isEmpty, s"doc $id leaks a phone")
      assert(ip.findFirstIn(red).isEmpty, s"doc $id leaks an IP")
      // the synthesized contact line was actually present and redacted
      assert(red.contains("<EMAIL>") && red.contains("<PHONE>") && red.contains("<IP>"))
    }
  }

  test("t14 repetition fractions match brute-force token counting") {
    val out = Text.t14Repetition(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getDouble(1), r.getDouble(2)))).toMap
    docs.foreach { case (id, text, _, _) =>
      val toks = text.trim.split("\\s+").filter(_.nonEmpty)
      val counts = toks.groupBy(identity).map(_._2.length)
      val top = counts.max.toDouble / toks.length
      val dup = 1.0 - counts.size.toDouble / toks.length
      val (gotTop, gotDup) = (out(id)._1, out(id)._2)
      assert(math.abs(gotTop - top) < 5e-7, s"doc $id top_token_frac")
      assert(math.abs(gotDup - dup) < 5e-7, s"doc $id dup_word_frac")
    }
    assert(out.size == docs.length)
  }

  test("t15 packing fills bins contiguously per source within budget semantics") {
    val rows = Text.t15SeqPack(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
    rows.groupBy(_._2).foreach { case (_, grp) =>
      val sorted = grp.sortBy(_._1)
      var cum = 0L
      sorted.foreach { case (id, _, ntok, bin) =>
        assert(bin == cum / 512, s"doc $id bin")
        cum += ntok
      }
      // bins are non-decreasing in doc order and start at 0
      assert(sorted.head._4 == 0L)
      assert(sorted.map(_._4).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    }
  }

  test("d6 decontamination matches brute-force 4-gram overlap") {
    val flagged = Dedup.d6Decontaminate(spark, dir).collect().map(_.getLong(0)).toSet
    val grams = docs.map { case (id, text, _, _) =>
      id -> text.trim.split("\\s+").filter(_.nonEmpty)
        .sliding(4).filter(_.length == 4).map(_.mkString(" ")).toSet
    }
    val bench = grams.filter(_._1 % 97 == 0).flatMap(_._2).toSet
    val expected = grams.collect {
      case (id, g) if id % 97 != 0 && g.exists(bench.contains) => id
    }.toSet
    assert(flagged == expected)
    assert(flagged.forall(_ % 97 != 0))
  }

  test("s4 label centroids match brute-force per-dimension means") {
    val out = Similarity.s4LabelCentroid(spark, dir).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    val embs = Tables.embeddings(spark, dir)
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    val dims = embs.head._2.length
    embs.groupBy(_._1).foreach { case (label, vs) =>
      (0 until dims).foreach { d =>
        val mean = vs.map(_._2(d).toDouble).sum / vs.length
        assert(math.abs(out((label, d + 1)) - mean) < 5e-7, s"label $label dim $d")
      }
    }
    assert(out.size == embs.map(_._1).distinct.length * dims)
  }
}
