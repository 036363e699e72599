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

  test("t16 chunks reconstruct every doc with exact 32-token overlap") {
    val chunks = Text.t16Chunk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    chunks.groupBy(_._1).foreach { case (id, cs) =>
      val toks = docs.find(_._1 == id).get._2.trim.split("\\s+").filter(_.nonEmpty)
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == sorted.indices.toSeq, s"doc $id chunk ids")
      sorted.foreach { case (_, cid, chunk, ntok) =>
        val expect = toks.slice(cid * 96, cid * 96 + 128)
        assert(chunk == expect.mkString(" "), s"doc $id chunk $cid")
        assert(ntok == expect.length)
      }
      // stride < size ⇒ consecutive chunks share exactly 32 tokens
      sorted.sliding(2).foreach {
        case Array((_, _, a, na), (_, _, b, _)) if na == 128 =>
          assert(a.split(" ").drop(96).sameElements(b.split(" ").take(32)))
        case _ =>
      }
    }
    assert(chunks.map(_._1).distinct.length == docs.count(_._2.trim.nonEmpty))
  }

  test("t23 split: every near-dup cluster lands whole in one split, fractions sane") {
    val split = Text.t23LeakageSafeSplit(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val clusters = Dedup.d7DupClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(clusters.nonEmpty, "fixture lost its planted near-dup clusters")
    // the leakage invariant: one split per cluster
    clusters.groupBy(_._2).foreach { case (c, members) =>
      val splits = members.map(m => split(m._1)).toSet
      assert(splits.size == 1, s"cluster $c straddles splits $splits")
    }
    // every document is assigned, and no split is empty or dominant
    // beyond the 80/10/10 coin's plausible range on this corpus size
    val counts = split.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(split.size == graft.Tables.documents(spark, dir).count())
    assert(counts.keySet == Set("train", "val", "test"), counts.toString)
    val n = split.size.toDouble
    assert(counts("train") / n > 0.6 && counts("train") / n < 0.95)
  }

  test("t19 paragraph dedup keeps first occurrences and drops all-boilerplate docs") {
    import spark.implicits._
    // planted corpus: 16-token paragraphs A/B/C/D — doc 0 = A+B, doc 1 =
    // A+C (A is boilerplate), doc 2 = A+B (pure duplicate of doc 0: must
    // VANISH), doc 3 = D (untouched)
    def p(ch: String) = (1 to 16).map(i => s"$ch$i").mkString(" ")
    val (a, b, c, d) = (p("a"), p("b"), p("c"), p("d"))
    val docs = Seq(
      (0L, s"$a $b"), (1L, s"$a $c"), (2L, s"$a $b"), (3L, d))
    val tmp = java.nio.file.Files.createTempDirectory("t19").toString
    docs.toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("source", lit("s"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Text.t19ParagraphDedup(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (0L, 2L, 2L, s"$a $b"), // first occurrence of A and B: intact
      (1L, 2L, 1L, c),        // boilerplate A stripped, C survives
      // doc 2 vanished: every paragraph was already seen
      (3L, 1L, 1L, d)))
  }

  test("t20 quality-weighted sample keeps exactly the md5-coin winners") {
    val q = Text.t10QualityScore(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val kept = Text.t20QualitySample(spark, dir).collect()
      .map(_.getLong(0)).toSet
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 1000000L
    }
    val exp = q.filter { case (id, quality) =>
      bucket(id) < math.floor(quality * 1000000).toLong
    }.keySet
    assert(kept == exp)
    // the sample is genuinely weighted: non-trivial on both sides
    assert(kept.nonEmpty && kept.size < q.size)
  }

  test("m8 BPE pair counts match brute-force adjacent-pair counting") {
    val out = Topics.m8BpePairs(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val counts = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { case (_, text, _, _) =>
      val t = text.trim.split("\\s+").filter(_.nonEmpty)
      t.sliding(2).filter(_.length == 2)
        .foreach(p => counts(p.mkString(" ")) = counts.getOrElse(p.mkString(" "), 0L) + 1)
    }
    val expected = counts.toArray.sortBy { case (p, n) => (-n, p) }.take(100)
    assert(out.toSeq == expected.toSeq)
  }

  test("s5 quantization is exact per cell and inverts within one step") {
    val out = Similarity.s5Quantize(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getInt(2))).toMap
    val embs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val dims = embs.head._2.length
    val mn = (0 until dims).map(d => embs.map(_._2(d).toDouble).min)
    val mx = (0 until dims).map(d => embs.map(_._2(d).toDouble).max)
    embs.foreach { case (id, v) =>
      (0 until dims).foreach { d =>
        val q = math.min(255.0, math.floor((v(d) - mn(d)) * 256.0 / (mx(d) - mn(d)))).toInt
        assert(out((id, d + 1)) == q, s"vec $id dim $d")
        assert(q >= 0 && q <= 255)
        // dequantized midpoint lands within one quantization step
        val deq = mn(d) + (q + 0.5) * (mx(d) - mn(d)) / 256.0
        assert(math.abs(deq - v(d)) <= (mx(d) - mn(d)) / 256.0)
      }
    }
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

  test("m17 weights: sum to 1, temperature-flattened vs raw token share") {
    val rows = Topics.m17SourceMix(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == docs.map(_._4).distinct.length)
    val wSum = rows.map(_._3).sum
    assert(math.abs(wSum - 1.0) < 1e-4, s"weights sum to $wSum")
    // sqrt-temperature COMPRESSES shares: the max/min weight ratio must
    // sit strictly between 1 and the raw token-share ratio (the whole
    // point of sampling-temperature rebalancing), and equal √ of it
    val (cMax, cMin) = (rows.map(_._2).max, rows.map(_._2).min)
    val (wMax, wMin) = (rows.map(_._3).max, rows.map(_._3).min)
    assert(cMax > cMin, "fixture sources are exactly uniform — test is vacuous")
    val rawRatio = cMax.toDouble / cMin
    val wRatio = wMax / wMin
    assert(wRatio < rawRatio && wRatio > 1.0, s"$wRatio vs raw $rawRatio")
    assert(math.abs(wRatio - math.sqrt(rawRatio)) < 1e-3)
    // monotone: more tokens never means less weight
    val sorted = rows.sortBy(_._2)
    sorted.sliding(2).foreach { case Array((_, _, w1), (_, _, w2)) =>
      assert(w2 >= w1 - 1e-9)
    }
  }

  test("t26 mix sample equals driver-side replay of rate table + md5 device") {
    val weights = Topics.m17SourceMix(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val totTokens = weights.map(_._2).sum
    val rate = weights.map { case (src, toks, w) =>
      src -> math.min(1.0, w * Text.MixSampleFrac * totTokens / toks)
    }.toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    val exp = docs.flatMap { case (id, _, _, src) =>
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val bucket = java.lang.Long.parseLong(hex.take(8), 16) % 1000000L
      if (bucket < math.floor(rate(src) * 1000000).toLong) Some((id, src))
      else None
    }.toSet
    val got = Text.t26MixSample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == exp)
    // the sample must actually subsample (budget < corpus) yet keep
    // every source represented at these fixture sizes
    assert(got.size < docs.length)
    assert(got.map(_._2) == docs.map(_._4).toSet,
      "a source fell out of the mix entirely")
  }

  test("m19 bigram NLL matches a brute-force Jelinek-Mercer model replay") {
    val toks = Topics.corpus(spark, dir)
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toVector)).toMap
    val bigrams = toks.toSeq.flatMap { case (id, ts) =>
      ts.zip(ts.drop(1)).map(bg => (id, bg))
    }
    val cb = bigrams.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val c1 = cb.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val uni = toks.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = uni.values.sum; val v = uni.size.toLong
    val exp = bigrams.groupBy(_._1).map { case (id, bgs) =>
      val lps = bgs.map { case (_, (w1, w2)) =>
        math.log(Topics.M19Lambda * (cb((w1, w2)).toDouble / c1(w1)) +
          Topics.M19Mu * ((uni(w2) + 1.0) / (total + v)))
      }
      id -> (bgs.size.toLong, -lps.sum / bgs.size)
    }
    val got = Topics.m19BigramNll(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == exp.keySet, "per-doc coverage differs")
    got.foreach { case (id, (nBig, nll)) =>
      assert(nBig == exp(id)._1, s"doc $id bigram count")
      // the query folds distinct-bigram partial sums in sorted order;
      // the replay folds raw bigrams — identical up to float assoc
      assert(math.abs(nll - exp(id)._2) < 1e-6, s"doc $id nll")
    }
    // the signal separates: scores vary across the corpus (not constant)
    val nlls = got.values.map(_._2).toSeq
    assert(nlls.max - nlls.min > 0.1, "bigram NLL carries no signal")
  }

  test("m20 classifier separates the target domain; scores are calibrated probs") {
    val rows = Topics.m20QualityClassifier(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getInt(3)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).distinct.length == rows.length, "one score per doc")
    rows.foreach { case (id, label, score, pred) =>
      assert(score >= 0.0 && score <= 1.0, s"doc $id score out of [0,1]")
      assert(pred == (if (score >= 0.5) 1 else 0), s"doc $id pred/score mismatch")
      assert(label == 0 || label == 1)
    }
    val pos = rows.filter(_._2 == 1).map(_._3)
    val neg = rows.filter(_._2 == 0).map(_._3)
    assert(pos.nonEmpty && neg.nonEmpty, "fixture lost a class")
    // rank-based AUC (ties at 0.5): the hashed-bigram linear model must
    // genuinely rank src0 above the rest (0.999 measured at sf0.01/0.001)
    val auc = neg.map(n => pos.map(p =>
      if (n < p) 1.0 else if (n == p) 0.5 else 0.0).sum).sum / (pos.length.toLong * neg.length)
    assert(auc > 0.9, s"AUC $auc: classifier fails to separate the target domain")
    assert(pos.sum / pos.length > neg.sum / neg.length + 0.2,
      "mean target score not separated from the rest")
  }

  test("t29 flags exactly the per-source shared paragraphs, every copy") {
    import spark.implicits._
    // planted corpus: srcA docs 0/1 share a 16-token footer (boilerplate);
    // doc 2 in srcB carries the SAME footer — cross-source, so NOT flagged
    // for srcB; doc 3 is all-unique content
    val footer = (1 to 16).map(i => s"footer$i").mkString(" ")
    def words(tag: String) = (1 to 16).map(i => s"$tag$i").mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("t29").toString
    Seq(
      (0L, s"${words("a")} $footer", "en", "srcA", 10L),
      (1L, s"${words("b")} $footer", "en", "srcA", 10L),
      (2L, s"${words("c")} $footer", "en", "srcB", 10L),
      (3L, words("d"), "en", "srcB", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Text.t29Boilerplate(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out(0L) == ((2L, 1L, 0.5)), s"doc 0 ${out(0L)}")
    assert(out(1L) == ((2L, 1L, 0.5)), s"doc 1 ${out(1L)}")
    assert(out(2L)._2 == 0L, s"doc 2 cross-source footer flagged: ${out(2L)}")
    assert(out(3L) == ((1L, 0L, 0.0)), s"doc 3 ${out(3L)}")
    // fixture smoke: every ratio well-formed, flags present at sf levels
    val fix = Text.t29Boilerplate(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(fix.forall { case (np, nb, f) =>
      nb >= 0 && nb <= np && math.abs(f - nb.toDouble / np) < 1e-6 })
  }

  test("t30 manifest: checksums are order-independent xors of doc digests") {
    val manifest = Text.t30ShardManifest(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    // driver-side replay: t15's bin assignment + xor of fnv64 digests
    val bins = Text.t15SeqPack(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
    val byText = docs.map(d => d._1 -> d._2).toMap
    val expected = bins.groupBy(b => (b._2, b._4)).map { case (k, ds) =>
      k -> (ds.length.toLong, ds.map(_._3.toLong).sum,
        ds.map(d => graft.expressions.SimHash64.fnv1a64(
          byText(d._1).getBytes("UTF-8"))).reduce(_ ^ _),
        ds.map(_._1).min, ds.map(_._1).max)
    }
    assert(manifest.keySet == expected.keySet, "shard key sets differ")
    expected.foreach { case (k, v) =>
      assert(manifest(k) == v, s"shard $k: ${manifest(k)} vs $v")
    }
    // integrity property: every doc's digest participates — xor over all
    // shards of a source equals xor over that source's docs directly
    val bySource = expected.toSeq.groupBy(_._1._1)
    bySource.foreach { case (src, shards) =>
      val fromShards = shards.map(_._2._3).reduce(_ ^ _)
      val direct = docs.filter(_._4 == src)
        .map(d => graft.expressions.SimHash64.fnv1a64(d._2.getBytes("UTF-8")))
        .reduce(_ ^ _)
      assert(fromShards == direct, s"source $src checksum chain broken")
    }
  }

  test("w9 gap fill: planted gaps zero-fill with provenance, no-gap is identity") {
    import spark.implicits._
    val daily = Seq(
      (java.sql.Date.valueOf("2024-03-01"), 5L),
      (java.sql.Date.valueOf("2024-03-02"), 7L),
      // 03-03 and 03-04 missing
      (java.sql.Date.valueOf("2024-03-05"), 2L))
      .toDF("day", "n")
    val out = Windows.gapFillFrame(daily).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getBoolean(2)))
    assert(out.map(_._1).toSeq == (1 to 5).map(d => s"2024-03-0$d"))
    assert(out.filter(_._3).map(_._1).toSeq == Seq("2024-03-03", "2024-03-04"))
    assert(out.filter(_._3).forall(_._2 == 0L))
    assert(out.filter(!_._3).map(_._2).toSeq == Seq(5L, 7L, 2L))
    // fixture: contiguous 30-day window → pure identity with w1's days
    val fix = Windows.w9GapFill(spark, dir).collect()
    assert(fix.length == Windows.w1DailyAvg(spark, dir).count())
    assert(fix.forall(!_.getBoolean(2)))
  }

  test("t31 domain cap: bounded-agg selection equals the window-rank formulation") {
    val got = graft.queries.Text.t31DomainCap(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // cap respected and ranks contiguous per source
    got.groupBy(_._1).foreach { case (src, rows) =>
      assert(rows.length <= graft.queries.Text.T31Cap, s"source $src over cap")
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length), s"source $src ranks")
    }
    // driver-side replay of the md5-coin window rank
    val docs = graft.Tables.documents(spark, dir)
      .select(col("source"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def coin(id: Long): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
          .take(4).map(b => f"$b%02x").mkString, 16)
    val want = docs.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      rows.map(_._2).sortBy(id => (coin(id), id))
        .take(graft.queries.Text.T31Cap).zipWithIndex
        .map { case (id, i) => (src, (i + 1).toLong, id) }
    }.toSet
    assert(got.toSet == want, s"${got.length} vs ${want.size}")
    // selection is a pure function of keys: stable across a second run
    val again = graft.queries.Text.t31DomainCap(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(again.toSet == got.toSet)
  }

  test("w11 cusum: step-change fires the flag exactly past the K-mean-days excess") {
    import spark.implicits._
    // planted series: 20 quiet days at 10/day, then a sustained step to
    // 100/day. nd=30, total=1200, mean=40: quiet-day deviations are
    // negative (cusum pinned at 0), step days add 1800 scaled units each,
    // so the flag (cusum > 2*total = 2400) fires from the SECOND step day
    val daily = ((1 to 20).map(d => ("a", f"2024-01-$d%02d", 10L)) ++
      (21 to 30).map(d => ("a", f"2024-01-$d%02d", 100L)))
      .toDF("event_type", "day", "x")
    val out = graft.queries.Windows.cusumFrame(daily).collect()
      .map(r => (r.getString(1), r.getLong(3), r.getBoolean(4)))
      .sortBy(_._1)
    assert(out.take(20).forall(t => t._2 == 0L && !t._3), "quiet days must stay at 0")
    val step = out.drop(20)
    assert(step.head._2 == 1800L && !step.head._3, s"first step day ${step.head}")
    assert(step.drop(1).forall(_._3), "flag must stay on past the second step day")
    assert(step.map(_._2).toSeq == (1 to 10).map(_ * 1800L), "cusum ramp wrong")
    // the fixture: the statistic is nonzero and varies (the fold is
    // exercised; whether flags fire depends on the sf's volume profile —
    // sf0.001's small daily counts do, sf0.01's stationary ones don't)
    val fix = graft.queries.Windows.w11Cusum(spark, dir).collect()
      .map(r => (r.getLong(3), r.getBoolean(4)))
    assert(fix.exists(_._1 > 0) && fix.exists(_._1 == 0))
  }
}
