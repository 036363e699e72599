package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: binary payloads, metadata struct, batch feature
  * extraction shape. The decoder is a documented stub — tests pin the
  * Spark-side semantics, not codec output.
  */
class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

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
}
