package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import graft.functions.SimFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap

/** Near-duplicate detection over `documents` — the LLM-training-data
  * dedup operators (exact dedup is t8_fingerprint in Text.scala).
  *
  * Scale design notes (the point of each query is the 100 TB shape):
  *  - d1 exact n-gram Jaccard: inverted-index join on shingle — only
  *    docs sharing a shingle are ever paired; never an all-pairs product.
  *  - d2 MinHash+LSH: signatures are map-only; the only shuffle keys are
  *    (band, 64-bit hash); candidate verification touches candidate rows
  *    only. This is the standard sub-quadratic near-dup path.
  *  - d3 SimHash: 64-bit signature per doc via one explode + grouped
  *    sum; pigeonhole banding join finds low-hamming pairs without
  *    comparing all pairs.
  */
object Dedup {

  type Q = (SparkSession, String) => DataFrame

  /** doc_id → distinct 3-shingle set (docs with ≥1 shingle). */
  private def shingleSets(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        array_distinct(shingles(tokenize(col("text")), 3)).as("sh"))
      .filter(size(col("sh")) > 0)

  /** DuckDB: same shingle sets via list comprehension. */
  private val shingleCte: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |         string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS t
      |  FROM documents
      |), sh AS (
      |  SELECT doc_id,
      |         list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS s
      |  FROM toks WHERE len(t) >= 3
      |)""".stripMargin

  /** D1: exact n-gram Jaccard near-dup pairs (threshold 0.2) via an
    * inverted shingle index: explode shingles, equi-join on the shingle,
    * count common per pair, Jaccard from set sizes. The join key is the
    * shingle string — frequency-skewed shingles are the scale hazard; at
    * 100 TB add a doc-frequency cap on shingles (drop shingles in >p% of
    * docs) before the join, which only removes pairs already similar via
    * other shingles.
    */
  def d1JaccardPairs(s: SparkSession, dir: String): DataFrame = {
    val sh = shingleSets(s, dir).cache()
    val inv = sh.select(col("doc_id"), size(col("sh")).as("n"),
      explode(col("sh")).as("shingle"))
    val a = inv.select(col("doc_id").as("id1"), col("n").as("n1"), col("shingle"))
    val b = inv.select(col("doc_id").as("id2"), col("n").as("n2"), col("shingle"))
    a.join(b, Seq("shingle"))
      .filter(col("id1") < col("id2"))
      .groupBy(col("id1"), col("id2"), col("n1"), col("n2"))
      .agg(count(lit(1)).as("common"))
      .withColumn("j",
        col("common").cast("double") / (col("n1") + col("n2") - col("common")))
      .filter(col("j") >= 0.2)
      .select(col("id1"), col("id2"), round(col("j"), 6).as("jaccard"))
      .orderBy(col("id1"), col("id2"))
  }

  val d1Sql: String =
    s"""$shingleCte, inv AS (
       |  SELECT doc_id, len(s) AS n, unnest(s) AS shingle FROM sh
       |), pairs AS (
       |  SELECT a.doc_id AS id1, b.doc_id AS id2, a.n AS n1, b.n AS n2,
       |         count(*) AS common
       |  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2, 3, 4
       |)
       |SELECT id1, id2, round(common * 1.0 / (n1 + n2 - common), 6) AS jaccard
       |FROM pairs WHERE common * 1.0 / (n1 + n2 - common) >= 0.2
       |ORDER BY id1, id2""".stripMargin

  /** D2: MinHash + LSH banding near-dup (threshold 0.5). 128 hashes,
    * 64 bands × 2 rows → P(candidate | j=0.5) ≈ 1-1e-8, so on a fixed
    * dataset the verified output deterministically equals the exact
    * all-pairs answer the oracle computes — while the plan never forms
    * all pairs: band buckets are the only join keys, and the exact
    * Jaccard check runs on candidate pairs only.
    */
  def d2MinHashPairs(s: SparkSession, dir: String): DataFrame = {
    val K = 128; val B = 64; val R = 2
    val sh = shingleSets(s, dir).cache()
    // Signature via explode + K grouped min-aggregates, NOT a nested
    // higher-order expression: the HOF form gets re-inlined at every
    // element_at reference during banding and recomputes the K min-hashes
    // per band member (observed 170s vs 3s on sf0.001). The grouped-agg
    // form is codegen'd, partially aggregates map-side, and its shuffle
    // output is materialized — band hashes then read plain columns.
    val exploded = sh.select(col("doc_id"), explode(col("sh")).as("s"))
    val minAggs = (0 until K).map(i => min(xxhash64(col("s"), lit(i))).as(s"h$i"))
    val sig = exploded.groupBy("doc_id").agg(minAggs.head, minAggs.tail: _*)
    val bandCols = array((0 until B).map(b =>
      xxhash64(col(s"h${b * R}"), col(s"h${b * R + 1}"))): _*)
    val bands = sig.select(col("doc_id"),
      posexplode(bandCols).as(Seq("band", "bh")))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()
    cand
      .join(sh.select(col("doc_id").as("id1"), col("sh").as("sh1")), Seq("id1"))
      .join(sh.select(col("doc_id").as("id2"), col("sh").as("sh2")), Seq("id2"))
      .withColumn("j", jaccard(col("sh1"), col("sh2")))
      .filter(col("j") >= 0.5)
      .select(col("id1"), col("id2"), round(col("j"), 6).as("jaccard"))
      .orderBy(col("id1"), col("id2"))
  }

  /** Oracle: exact all-pairs ≥ 0.5 — LSH recall at these parameters makes
    * the two answers identical on fixed data (verified at sf0.01).
    */
  val d2Sql: String =
    s"""$shingleCte, pairs AS (
       |  SELECT a.doc_id AS id1, b.doc_id AS id2,
       |         len(list_intersect(a.s, b.s)) AS common,
       |         len(a.s) AS n1, len(b.s) AS n2
       |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |)
       |SELECT id1, id2, round(common * 1.0 / (n1 + n2 - common), 6) AS jaccard
       |FROM pairs WHERE common * 1.0 / (n1 + n2 - common) >= 0.5
       |ORDER BY id1, id2""".stripMargin

  /** doc_id → 64-bit SimHash, computed distributively: explode shingle
    * hashes, one grouped aggregation with 64 per-bit sign sums (partial
    * agg map-side), fold the sums into the signature. No per-row 64×N
    * expression blowup.
    */
  def simHashSignatures(s: SparkSession, dir: String): DataFrame = {
    val h = Tables.documents(s, dir)
      .select(col("doc_id"), shingles(tokenize(col("text")), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
      .select(col("doc_id"), shingleHash(col("shingle")).as("h"))
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"b$j")
    }
    h.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        simHashFromBitSums(j => col(s"b$j")).as("simhash"))
  }

  /** D3: SimHash near-dup pairs within hamming distance 6, via the
    * 4-chunk pigeonhole banding join (hamming ≤ 3 pairs are guaranteed
    * candidates; 4-6 probabilistically). Rows-only oracle — xxhash64 has
    * no DuckDB counterpart; correctness is covered by DedupSpec
    * (identical docs → identical signatures; planted near-dups found).
    */
  def d3SimHashPairs(s: SparkSession, dir: String): DataFrame = {
    val sig = simHashSignatures(s, dir)
      .select(col("doc_id"), col("simhash"),
        posexplode(simHashChunks(col("simhash"), 4)).as(Seq("ci", "cv")))
    val cand = sig.as("a").join(sig.as("b"),
        col("a.ci") === col("b.ci") && col("a.cv") === col("b.cv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        col("a.simhash").as("s1"), col("b.simhash").as("s2"))
      .distinct()
    cand.withColumn("hamming", hamming(col("s1"), col("s2")))
      .filter(col("hamming") <= 6)
      .select(col("id1"), col("id2"), col("hamming"))
      .orderBy(col("id1"), col("id2"))
  }

  val queries: ListMap[String, Q] = ListMap(
    "d1_jaccard_pairs" -> (d1JaccardPairs _),
    "d2_minhash_pairs" -> (d2MinHashPairs _),
    "d3_simhash_pairs" -> (d3SimHashPairs _),
  )

  val oracle: ListMap[String, String] = ListMap(
    "d1_jaccard_pairs" -> d1Sql,
    "d2_minhash_pairs" -> d2Sql,
  )
}
