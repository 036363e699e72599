package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: binary payloads, metadata struct, batch feature
  * extraction shape, and the REAL javax.imageio decode path on injected
  * PNG/JPEG frames (the fixture's synthetic payloads take the
  * histogram fallback; audio remains a documented stub).
  */
class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  /** A genuine encoded image: 5×3, left half red, right half blue. */
  private def encodedImage(format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      5, 3, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 3; x <- 0 until 5)
      img.setRGB(x, y, if (x < 3) 0xff0000 else 0x0000ff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  test("mm1's partition pass decodes real PNG/JPEG payloads via imageio") {
    import spark.implicits._
    val media = Seq(
      (1L, encodedImage("png"), "png"),
      (2L, encodedImage("jpeg"), "jpeg"),
      (3L, "not an image at all".getBytes("UTF-8"), "png"))
      .toDF("media_id", "payload", "format")
      .select(col("media_id"), col("payload"),
        struct(col("format"), lit(5).as("width"), lit(3).as("height"),
          lit(0).as("n_frames")).as("meta"))
    val feats = Multimodal.featureFrame(media).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](2)).toMap
    // real decode: [width, height, mean luma] read from the DECODED
    // pixels, not the metadata struct
    for (id <- Seq(1L, 2L)) {
      assert(feats(id).length == 3, s"media $id took the fallback path")
      assert(feats(id)(0) == 5.0 && feats(id)(1) == 3.0)
      // 3/5 red (luma .299) + 2/5 blue (luma .114) ≈ 0.225; JPEG is
      // lossy so allow a loose band
      assert(feats(id)(2) > 0.1 && feats(id)(2) < 0.4,
        s"media $id luma ${feats(id)(2)}")
    }
    // undecodable bytes fall back to the 8-bucket histogram
    assert(feats(3L).length == 8)
    assert(math.abs(feats(3L).sum - 1.0) < 1e-9)
  }

  test("media table exposes binary payload + typed metadata struct") {
    val df = Multimodal.mediaTable(spark, dir)
    val schema = df.schema
    assert(schema("payload").dataType.typeName == "binary")
    val meta = schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq == Seq("format", "width", "height", "n_frames"))
    // payload round-trips the source text bytes
    val r = df.select(col("media_id"), col("payload")).filter(col("media_id") === 1).collect().head
    val text = graft.Tables.documents(spark, dir)
      .filter(col("doc_id") === 1).select("text").collect().head.getString(0)
    assert(new String(r.getAs[Array[Byte]](1), "UTF-8") == text)
  }

  test("mm1 features are L1-normalized histograms: energy in (0,1]") {
    val rows = Multimodal.mm1MediaFeatures(spark, dir).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("jpeg", "png", "wav"))
    rows.foreach { r =>
      val e = r.getDouble(2)
      assert(e > 0.0 && e <= 1.0, s"${r.getString(0)} energy $e")
    }
    // formats partition the corpus
    val total = rows.map(_.getLong(1)).sum
    assert(total == graft.Tables.documents(spark, dir).count())
  }

  test("mm2 samples every 4th frame within metadata bounds") {
    val rows = Multimodal.mm2FrameSample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, frames) =>
      val idx = frames.map(_._2).sorted
      assert(idx.head == 0)
      assert(idx.zip(idx.tail).forall { case (a, b) => b - a == 4 })
    }
    rows.foreach { case (_, idx, off) => assert(off == idx * 100) }
  }

  test("mm3 resize targets preserve aspect ratio within the 224 budget") {
    val rows = Multimodal.mm3ResizePlan(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, w, h, tw, th, bytes) =>
      assert(tw >= 1 && tw <= 224 && th >= 1 && th <= 224, s"media $id bounds")
      // exact integer-math recompute (aspect-preserving fit, min side 1)
      val side = math.max(w, h)
      assert(tw == math.max(1L, w * 224 / side), s"media $id target_w")
      assert(th == math.max(1L, h * 224 / side), s"media $id target_h")
      assert(bytes == tw * th * 3)
    }
  }

  test("byteAHash: deterministic, edit-local, collides on identical payloads") {
    val base = ("the quick brown fox jumps over the lazy dog " * 8).getBytes("UTF-8")
    val h1 = Multimodal.byteAHash(base)
    assert(h1.length == 64 && h1.forall(c => c == '0' || c == '1'))
    assert(Multimodal.byteAHash(base.clone()) == h1) // identical bytes collide
    // a single-byte in-place edit flips at most the touched block's bits
    // (plus blocks whose global-mean comparison sits exactly on the edge)
    val edited = base.clone(); edited(10) = 'X'.toByte
    val h2 = Multimodal.byteAHash(edited)
    val hamming = h1.zip(h2).count { case (a, b) => a != b }
    assert(hamming <= 4, s"single-byte edit moved $hamming bits")
    // a different payload does not collide
    val other = ("entirely different content with other letter statistics " * 6)
      .getBytes("UTF-8")
    assert(Multimodal.byteAHash(other) != h1)
  }

  test("imageAHash reads decoded pixels: left/right halves drive the bits") {
    // 16×16, left half black, right half white → row-major 8×8 grid has
    // '0' bits in columns 0-3 and '1' bits in columns 4-7 of every row
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16)
      img.setRGB(x, y, if (x < 8) 0x000000 else 0xffffff)
    val h = Multimodal.imageAHash(img)
    assert(h.length == 64)
    for (row <- 0 until 8) {
      assert(h.substring(row * 8, row * 8 + 4) == "0000", s"row $row left")
      assert(h.substring(row * 8 + 4, row * 8 + 8) == "1111", s"row $row right")
    }
  }

  test("mm6 finds planted near-identical payloads, injected and built-in") {
    import spark.implicits._
    // docs 0/1: one payload and its single-byte edit (hamming ≤ 4 by the
    // byteAHash locality property); doc 2: unrelated content. mm6 also
    // self-plants '~'-edited variants (ids +1e9) for docs 0..7, so the
    // expected pair set is the injected pair, each doc's own variant,
    // and the cross pairs among {0, 1, v0, v1} (all four payloads are
    // within a couple of edits of each other).
    val off = Multimodal.Mm6PlantOffset
    val base = "the quick brown fox jumps over the lazy dog " * 8
    val edited = base.updated(10, 'X')
    val other = "entirely different content with other letter statistics " * 6
    val tmp = java.nio.file.Files.createTempDirectory("mm6").toString
    Seq((0L, base, "en", "srcA", base.length.toLong),
      (1L, edited, "en", "srcA", edited.length.toLong),
      (2L, other, "en", "srcB", other.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pairs = Multimodal.mm6PhashPairs(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ids = pairs.map(p => (p._1, p._2)).toSet
    assert(ids.contains((0L, 1L)), s"injected pair not found: ${pairs.toSeq}")
    assert(ids.contains((0L, off)) && ids.contains((1L, off + 1)),
      s"self-planted variants not paired: ${pairs.toSeq}")
    // doc 2 pairs only with its own '~' variant, never with the 0/1 family
    val fam2 = Set(2L, off + 2)
    assert(!ids.exists(p => fam2.contains(p._1) ^ fam2.contains(p._2)),
      s"unrelated doc 2 paired across families: ${pairs.toSeq}")
    assert(pairs.forall(_._3 <= Multimodal.Mm6MaxHamming))
    // the FIXTURE answer is non-empty end-to-end: exactly the 8
    // self-planted (doc, variant) pairs — organic cross pairs sit at
    // hamming ≥ 12 and are verified away
    val fx = Multimodal.mm6PhashPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(fx.map(p => (p._1, p._2)).toSet ==
      (0 until 8).map(i => (i.toLong, off + i)).toSet, s"fixture: ${fx.toSeq}")
    assert(fx.forall(_._3 <= Multimodal.Mm6MaxHamming))
  }

  test("mm6 banded join survives band skew: one hot phash bucket with 10% of items") {
    import spark.implicits._
    // 50 of 500 payloads are byte-identical → one phash, so every one of
    // the 4 16-bit bands has a bucket holding 10% of the corpus. The
    // C(50,2)·4 raw hits must flow through the positionwise verify and
    // come out as exactly the hot clique at hamming 0 (plus each doc's
    // mm6 self-planted '~' variant for doc_id < 8).
    val off = Multimodal.Mm6PlantOffset
    val hot = "identical syndicated media payload body repeated across mirrors " * 2
    val docs = (0 until 500).map { i =>
      // non-hot payloads are per-doc pseudo-random ASCII so their block
      // means (and hence aHash bits) are independent across docs —
      // structurally-similar English-like fillers all hash within a few
      // bits of each other and would drown the clique in junk pairs
      val t = if (i % 10 == 0) hot
      else { val rng = new scala.util.Random(i)
        (0 until 128).map(_ => (33 + rng.nextInt(90)).toChar).mkString }
      (i.toLong, t, "en", "src", t.length.toLong)
    }
    val tmp = java.nio.file.Files.createTempDirectory("mm6skew").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = Multimodal.mm6PhashPairs(spark, tmp).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    val hotIds = (0 until 500 by 10).map(_.toLong)
    val clique = (for (a <- hotIds; b <- hotIds if a < b) yield (a, b)).toSet
    val gotRealPairs = rows.map(_._1).filter(p => p._2 < off).toSet
    assert(gotRealPairs == clique,
      s"expected ${clique.size} hot-clique pairs, got ${gotRealPairs.size}")
    assert(rows.filter(p => p._1._2 < off).forall(_._2 == 0))
    // doc 0 is hot AND < 8, so its variant pairs with doc 0 (and, at
    // hamming ≤ 6, possibly other clique members) — just bound those
    assert(rows.filter(p => p._1._2 >= off).forall(_._2 <= Multimodal.Mm6MaxHamming))
  }

  test("mm7 decodes real PCM WAVs (rate, frames, analytic RMS); text takes the byte fallback") {
    import spark.implicits._
    def wavBytes(samples: Array[Short], rate: Float): Array[Byte] = {
      val data = new Array[Byte](samples.length * 2)
      val bb = java.nio.ByteBuffer.wrap(data)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      samples.foreach(bb.putShort)
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    // constant half-scale signal: every sample 16384/32768 = 0.5 → RMS 0.5
    val half = wavBytes(Array.fill[Short](8000)(16384), 8000f)
    val silence = wavBytes(new Array[Short](4000), 16000f)
    val text = "not audio at all, just bytes pretending".getBytes("UTF-8")
    val media = Seq((1L, half), (2L, silence), (3L, text))
      .toDF("media_id", "payload")
    val rows = Multimodal.wavFeatureFrame(media).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getDouble(2),
        r.getInt(3), r.getLong(4), r.getDouble(5)))).toMap
    val (d1, rate1, ch1, fr1, rms1) = rows(1L)
    assert(d1 && rate1 == 8000.0 && ch1 == 1 && fr1 == 8000L)
    assert(math.abs(rms1 - 0.5) < 1e-9, s"half-scale rms $rms1")
    val (d2, rate2, _, fr2, rms2) = rows(2L)
    assert(d2 && rate2 == 16000.0 && fr2 == 4000L && rms2 == 0.0)
    val (d3, _, _, fr3, rms3) = rows(3L)
    assert(!d3 && fr3 == text.length.toLong)
    val expRms = math.sqrt(text.map(b => (b & 0xff).toLong).map(v => (v * v).toDouble).sum / text.length)
    assert(math.abs(rms3 - expRms) < 1e-9, s"fallback rms $rms3 vs $expRms")
  }

  test("mm8 segments real PCM into active and quiet windows with exact runs") {
    import spark.implicits._
    def wavBytes(samples: Array[Short], rate: Float): Array[Byte] = {
      val data = new Array[Byte](samples.length * 2)
      val bb = java.nio.ByteBuffer.wrap(data)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      samples.foreach(bb.putShort)
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val W = Multimodal.Mm8Window
    // 2W loud, 3W silent, 1W loud, 2W silent → flags T T F F F T F F
    val pattern = Array.fill[Short](2 * W)(16384.toShort) ++
      new Array[Short](3 * W) ++ Array.fill[Short](W)(16384.toShort) ++
      new Array[Short](2 * W)
    val allQuiet = new Array[Short](4 * W)
    val text = "definitely not a riff container".getBytes("UTF-8")
    val media = Seq((1L, wavBytes(pattern, 8000f)),
      (2L, wavBytes(allQuiet, 8000f)), (3L, text))
      .toDF("media_id", "payload")
    val rows = Multimodal.activityFrame(media).collect()
      .map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rows(1L) === ((true, 8L, 3L, 3L)))
    assert(rows(2L) === ((true, 4L, 0L, 4L)))
    // text fallback: byte-path replay
    val flags = text.grouped(W).map { w =>
      w.map(b => { val v = (b & 0xff).toLong; v * v }).sum >
        w.length * Multimodal.Mm8ByteMeanSq
    }.toArray
    val expQuiet = {
      var cur = 0L; var best = 0L
      flags.foreach(a => if (a) cur = 0 else { cur += 1; best = math.max(best, cur) })
      best
    }
    assert(rows(3L) === ((false, flags.length.toLong,
      flags.count(identity).toLong, expQuiet)))
  }

  test("mulCmpGt matches BigInt semantics including Long-overflow products") {
    val cases = Seq(
      (3L, 4L, 2L, 6L), (5L, 7L, 36L, 1L),
      // products beyond Long.MaxValue: 4e9 * 4e9 ≈ 1.6e19 wraps a Long
      (4000000000L, 4000000000L, 4000000001L, 3999999999L),
      (Long.MaxValue / 2, 5L, Long.MaxValue / 3, 7L),
      (6074001000L, 6074001000L, 6074001001L, 6074000999L),
      (0L, 5L, 0L, 7L), (1L, 0L, 0L, 0L))
    for ((a, b, c, d) <- cases) {
      val expect = BigInt(a) * BigInt(b) > BigInt(c) * BigInt(d)
      assert(Multimodal.mulCmpGt(a, b, c, d) == expect, s"($a,$b,$c,$d)")
      assert(Multimodal.mulCmpGt(c, d, a, b) == (BigInt(c) * BigInt(d) > BigInt(a) * BigInt(b)))
    }
  }

  test("mm5 groups by hash: planted identical payloads are flagged as dups") {
    val out = Multimodal.mm5PhashDups(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    assert(out.nonEmpty)
    // group-size bookkeeping is consistent: n_same equals the actual
    // multiplicity of the hash, and is_dup ⇔ n_same > 1
    val byHash = out.groupBy(_._2)
    out.foreach { case (id, ph, n, dup) =>
      assert(n == byHash(ph).length, s"media $id n_same")
      assert(dup == (n > 1), s"media $id is_dup")
    }
    // every payload ≥64 bytes appears exactly once
    val expected = Multimodal.mediaTable(spark, dir)
      .filter(length(col("payload")) >= 64).count()
    assert(out.length == expected)
  }

  test("mm9 incremental gate: persisted index reproduces inline; plants surface") {
    val inline = Multimodal.mm9IncrementalPhash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // the planted one-byte variants of corpus docs must be gated (plant
    // k pairs with original k for k whose original is corpus-side)
    assert(inline.nonEmpty, "no planted pair surfaced")
    inline.keys.foreach { case (n, d) =>
      assert(n >= Multimodal.Mm6PlantOffset || n % 10 == 7, s"$n not a batch id")
      assert(d < Multimodal.Mm6PlantOffset && d % 10 != 7, s"$d not a corpus id")
    }
    assert(inline.exists { case ((n, d), h) =>
      n == d + Multimodal.Mm6PlantOffset && h <= Multimodal.Mm6MaxHamming })

    // parquet round-trip of the band index reproduces the verdicts —
    // the index is fully self-contained (phash rides the band rows)
    val all = Multimodal.mediaTable(spark, dir)
      .select(col("media_id"), col("payload"), col("meta.format").as("format"))
    val corpus = all.filter(col("media_id") % 10 =!= 7)
    val tmp = java.nio.file.Files.createTempDirectory("mm9-index-")
    try {
      Multimodal.phashBands(Multimodal.phashOf(corpus))
        .write.parquet(tmp.resolve("bands").toString)
      val batch = all.filter(col("media_id") % 10 === 7)
      val fresh = Multimodal.mm9Frame(corpus, batch).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val loaded = Multimodal.mm9Probe(batch,
        spark.read.parquet(tmp.resolve("bands").toString)).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(loaded == fresh)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
    }
  }

  test("mm9 multi-probe dial: recall is monotone in depth with EXACT planted hammings; depth 0 is byte-identical to the single-probe path") {
    import spark.implicits._
    // chunk-controlled payloads: 64 chunks × 4 bytes, even chunks 'z'
    // (sum 488), odd chunks '!' (sum 132) — the chunk sums sit so far
    // from the global mean (310 + h·5.57 after h flips) that flipping
    // an odd chunk to 'z' flips EXACTLY its own hash bit. Planted
    // variants therefore have hamming == h by construction, with the
    // flip positions chosen to control the per-band diff distribution
    // (16 bits per band, 4 bands).
    def payload(flips: Seq[Int]): Array[Byte] = {
      val bytes = new Array[Byte](256)
      for (k <- 0 until 64; j <- 0 until 4)
        bytes(4 * k + j) =
          if (k % 2 == 0 || flips.contains(k)) 'z'.toByte else '!'.toByte
      bytes
    }
    val base = payload(Nil)
    // h=2 spread (1,1,0,0): two bands clean → depth 0 finds it
    // h=5 spread (2,1,1,1): min band diff 1 → depth 0 misses, 1 finds
    // h=9 spread (3,2,2,2): min band diff 2 → depth 1 misses, 2 finds
    //      (only reachable when maxHamming raises the verify radius)
    val variants = Map(
      102L -> Seq(1, 17),
      105L -> Seq(1, 3, 17, 33, 49),
      109L -> Seq(1, 3, 5, 17, 19, 33, 35, 49, 51))
    val corpus = Seq((1L, base, "bin")).toDF("media_id", "payload", "format")
    val batch = variants.toSeq.map { case (id, f) => (id, payload(f), "bin") }
      .toDF("media_id", "payload", "format")
    val index = Multimodal.mm9IndexRows(corpus)
    def found(depth: Int, radius: Int): Map[Long, Long] =
      Multimodal.mm9Probe(batch, index, depth, radius).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // exact hammings prove the construction
    assert(found(2, 11) == Map(102L -> 2L, 105L -> 5L, 109L -> 9L))
    // recall-monotone at the widened radius: {h2} ⊂ {h2,h5} ⊂ all three
    assert(found(0, 11).keySet == Set(102L))
    assert(found(1, 11).keySet == Set(102L, 105L))
    assert(found(2, 11).keySet == Set(102L, 105L, 109L))
    // at the default radius 6, depth 1 certifies FULL recall (pigeonhole:
    // h ≤ 6 over 4 bands leaves some band within 1 bit); h=9 verifies out
    assert(found(0, Multimodal.Mm6MaxHamming).keySet == Set(102L))
    assert(found(1, Multimodal.Mm6MaxHamming).keySet == Set(102L, 105L))
    assert(found(2, Multimodal.Mm6MaxHamming).keySet == Set(102L, 105L))
    // depth 0 IS the single-probe path: same rows as the 2-arg probe
    val d0 = Multimodal.mm9Probe(batch, index, 0).collect().map(_.toSeq).toSet
    val orig = Multimodal.mm9Probe(batch, index).collect().map(_.toSeq).toSet
    assert(d0 == orig)
    // an out-of-range dial fails fast
    intercept[IllegalArgumentException] {
      Multimodal.mm9Probe(batch, index, 3)
    }
  }
}
