package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.collection.immutable.ListMap

/** Multimodal-column operators for a training-data pipeline: media
  * payloads as opaque BINARY columns with a typed metadata struct,
  * partition-wise batch "decode" / feature extraction / frame sampling.
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A
  * DETERMINISTIC FAKE (byte-histogram features, length-based "frames") —
  * clearly marked below. Everything Spark-side is real and tested: the
  * binary column representation, the metadata struct schema, the
  * mapPartitions batch shape (the Scala analog of mapInPandas: one
  * iterator pass per partition, amortizing per-batch decoder setup), and
  * the downstream relational handling of the extracted features.
  *
  * Scale: payloads never shuffle — features are extracted map-side and
  * only the small feature vectors/metadata flow into joins/aggregates.
  */
object Multimodal {

  type Q = (SparkSession, String) => DataFrame

  /** The media table: fixture text re-encoded as a binary payload with
    * deterministic metadata (the synthesis stands in for reading real
    * image/audio bytes; schema and plumbing are the operator).
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("payload"),
        struct(
          when(col("doc_id") % 3 === 0, lit("png"))
            .when(col("doc_id") % 3 === 1, lit("jpeg"))
            .otherwise(lit("wav")).as("format"),
          (col("n_chars") % 640).cast("int").as("width"),
          (col("n_chars") % 480).cast("int").as("height"),
          (length(col("text")) / 100).cast("int").as("n_frames")
        ).as(("meta")))

  private val featureSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("format", StringType),
    StructField("features", ArrayType(DoubleType))))

  /** STUB DECODER — stands in for a real image/audio decode (no codecs
    * in this container). Deterministic 8-bucket byte histogram,
    * L1-normalized. A real implementation would decode pixels/samples
    * here; the signature (bytes → fixed-width feature vector) is what a
    * real decoder plugs into.
    */
  private def fakeDecodeFeatures(payload: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](8)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) >> 5) += 1.0
      i += 1
    }
    val n = math.max(1.0, payload.length.toDouble)
    hist.map(v => v / n)
  }

  /** MM1: partition-wise batch feature extraction over binary payloads —
    * mapPartitions so a real decoder would initialize once per partition
    * (the Scala analog of mapInPandas' batch shape), then features
    * aggregated per format. Value-checked: the stub decoder's byte
    * histogram is reproducible in SQL via codepoints because the fixture
    * text is pure ASCII (max codepoint 121, so UTF-8 bytes ==
    * codepoints — verified at sf0.01/sf0.1; a non-ASCII corpus would
    * need the oracle dropped, not the operator changed).
    * MultimodalSpec additionally pins the histogram math and batch
    * behavior.
    */
  def mm1MediaFeatures(s: SparkSession, dir: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    val feats = mediaTable(s, dir)
      .select(col("media_id"), col("payload"), col("meta.format").as("format"))
      .mapPartitions { rows =>
        // per-partition decoder setup would go here (once, not per row)
        rows.map { r =>
          val id = r.getLong(0)
          // null payload (null source text) → empty media, zero features
          val payload = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          Row(id, r.getString(2), fakeDecodeFeatures(payload).toSeq)
        }
      }(enc)
    feats
      .select(col("media_id"), col("format"),
        round(aggregate(col("features"), lit(0.0), (a, x) => a + x * x), 6).as("energy"))
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n_media"),
        round(avg(col("energy")), 6).as("avg_energy"))
      .orderBy(col("format"))
  }

  /** MM2: frame sampling — every k-th frame index from the metadata
    * frame count (a real video pipeline samples frames the same way; the
    * frame PAYLOAD slice is stubbed as a byte range). Demonstrates
    * metadata-driven explode without touching payload bytes until the
    * sampled frames are selected.
    */
  def mm2FrameSample(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir)
      .filter(col("meta.format") === "wav" && col("meta.n_frames") >= 4)
      .select(col("media_id"), col("meta.n_frames").as("n_frames"),
        explode(sequence(lit(0), col("meta.n_frames") - 1, lit(4))).as("frame_idx"))
      .select(col("media_id"), col("frame_idx"),
        // stubbed frame payload slice: 100 "samples" per frame
        (col("frame_idx") * 100).as("offset"))
      .orderBy(col("media_id"), col("frame_idx"))

  /** MM3: resize planning — aspect-preserving target dimensions fitting a
    * 224×224 budget, from metadata alone (integer arithmetic, so the
    * oracle is exact). A real resize kernel consumes (payload, tw, th)
    * inside the mm1 mapPartitions batch shape; planning dims relationally
    * first means the pixel pass touches each payload exactly once and
    * payloads still never shuffle. out_bytes = tw·th·3 is the stubbed
    * RGB decode size a batch scheduler would pack buffers by.
    */
  def mm3ResizePlan(s: SparkSession, dir: String): DataFrame = {
    val w = greatest(col("meta.width").cast("long"), lit(1L))
    val h = greatest(col("meta.height").cast("long"), lit(1L))
    val side = greatest(w, h)
    val tw = greatest(floor(w * 224 / side), lit(1L))
    val th = greatest(floor(h * 224 / side), lit(1L))
    mediaTable(s, dir)
      .filter(col("meta.format") =!= "wav")
      .select(col("media_id"), w.as("w"), h.as("h"),
        tw.as("target_w"), th.as("target_h"),
        (tw * th * 3).as("out_bytes"))
      .orderBy(col("media_id"))
  }

  val mm3Sql: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id,
      |    greatest(n_chars % 640, 1) AS w, greatest(n_chars % 480, 1) AS h
      |  FROM documents WHERE doc_id % 3 <> 2
      |)
      |SELECT media_id, w, h,
      |  greatest(w * 224 // greatest(w, h), 1) AS target_w,
      |  greatest(h * 224 // greatest(w, h), 1) AS target_h,
      |  greatest(w * 224 // greatest(w, h), 1)
      |    * greatest(h * 224 // greatest(w, h), 1) * 3 AS out_bytes
      |FROM m ORDER BY media_id""".stripMargin

  val mm1Sql: String =
    """WITH f AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'png'
      |         WHEN doc_id % 3 = 1 THEN 'jpeg' ELSE 'wav' END AS format,
      |    list_transform(range(1, length(text)+1), i -> ord(substr(text, i, 1)) // 32) AS bs,
      |    greatest(1.0::DOUBLE, length(text)::DOUBLE) AS n
      |  FROM documents
      |), feats AS (
      |  SELECT doc_id, format,
      |    list_transform(range(0, 8), b -> len(list_filter(bs, o -> o = b))::DOUBLE / n) AS fs
      |  FROM f
      |), energy AS (
      |  SELECT doc_id, format,
      |    round(list_reduce(list_transform(fs, x -> x * x), (a, x) -> a + x), 6) AS energy
      |  FROM feats
      |)
      |SELECT format, count(*) AS n_media, round(avg(energy), 6) AS avg_energy
      |FROM energy GROUP BY format ORDER BY format""".stripMargin

  val mm2Sql: String =
    """SELECT doc_id AS media_id, frame_idx, frame_idx * 100 AS offset
      |FROM (
      |  SELECT doc_id, unnest(range(0, len(text) // 100, 4)) AS frame_idx
      |  FROM documents
      |  WHERE doc_id % 3 = 2 AND len(text) // 100 >= 4
      |)
      |ORDER BY media_id, frame_idx""".stripMargin

  /** MM4: modality-mix accounting — the dataset-card numbers for a
    * multimodal corpus (items, payload bytes, mean size per modality)
    * and the input to capacity planning / storage budgeting. STRICTLY
    * metadata-only: the aggregation reads `length(payload)` and the
    * format tag, never decodes, and the shuffle carries |formats|
    * partial rows — payloads stay where they were written, same as
    * mm1-mm3's planning passes.
    */
  def mm4ModalityMix(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir)
      .select(col("meta.format").as("format"),
        length(col("payload")).cast("long").as("bytes"))
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("bytes")).as("total_bytes"),
        round(avg(col("bytes")), 6).as("avg_bytes"))
      .orderBy(col("format"))

  val mm4Sql: String =
    """SELECT
      |  CASE WHEN doc_id % 3 = 0 THEN 'png'
      |       WHEN doc_id % 3 = 1 THEN 'jpeg' ELSE 'wav' END AS format,
      |  count(*) AS n_items,
      |  sum(octet_length(encode(text)))::BIGINT AS total_bytes,
      |  round(avg(octet_length(encode(text))), 6) AS avg_bytes
      |FROM documents GROUP BY 1 ORDER BY format""".stripMargin

  val queries: ListMap[String, Q] = ListMap(
    "mm1_media_features" -> (mm1MediaFeatures _),
    "mm2_frame_sample" -> (mm2FrameSample _),
    "mm3_resize_plan" -> (mm3ResizePlan _),
    "mm4_modality_mix" -> (mm4ModalityMix _),
  )

  val oracle: ListMap[String, String] = ListMap(
    "mm1_media_features" -> mm1Sql,
    "mm2_frame_sample" -> mm2Sql,
    "mm3_resize_plan" -> mm3Sql,
    "mm4_modality_mix" -> mm4Sql,
  )
}
