package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash-based near-duplicate / similarity primitives for the
  * training-data-pipeline operators (dedup, ANN). All pure Column
  * combinators over built-in hash functions — map-only, codegen'd, no
  * UDFs — so signature computation costs one streaming pass per
  * partition at any corpus size.
  */
object SimFunctions {

  /** MinHash signature: K permutation-free min-hashes over a shingle
    * array. Hash function i is xxhash64 salted with the index column, so
    * one expression yields K independent hashes; `array_min` folds each
    * pass. Null-safe: empty shingle arrays must be filtered by the caller
    * (array_min(empty) = null).
    */
  def minHashSignature(shingleCol: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingleCol, s => xxhash64(s, i))))

  /** LSH band hashes for a MinHash signature: b bands of r consecutive
    * signature entries, each band collapsed to one 64-bit hash. Two docs
    * land in the same (band, hash) bucket iff their signatures agree on
    * all r rows of that band — P(bucket | jaccard s) = 1-(1-s^r)^b.
    * With r=2, b=64 a pair at s=0.5 is caught with p ≈ 1-1e-8.
    */
  def lshBandHashes(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => {
        val members = (0 until rows).map(r => element_at(sig, b * rows + r + 1))
        xxhash64(members: _*)
      })

  /** Set Jaccard over two (already-distinct) shingle arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Per-shingle 64-bit hashes for SimHash (hash once, fold bits later
    * via an explode + 64-way grouped sum — see Dedup.simHashSignatures).
    */
  def shingleHash(shingle: Column): Column = xxhash64(shingle)

  /** Fold 64 per-bit sign sums (columns b0..b63, each the count of
    * +1/-1 votes for that bit across a doc's shingle hashes) into the
    * 64-bit SimHash value.
    */
  def simHashFromBitSums(bitSum: Int => Column): Column =
    (0 until 64).foldLeft(lit(0L)) { (acc, j) =>
      acc.bitwiseOR(
        when(bitSum(j) >= 0, shiftleft(lit(1L), j)).otherwise(lit(0L)))
    }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Split a 64-bit SimHash into `chunks` equal bit-slices for the
    * pigeonhole banding join: two signatures within hamming distance
    * (chunks-1) MUST share at least one identical chunk, so an equi-join
    * on (chunk_idx, chunk_value) finds all such pairs without an
    * all-pairs comparison.
    */
  def simHashChunks(sig: Column, chunks: Int): Column = {
    val width = 64 / chunks
    val mask = (1L << width) - 1
    array((0 until chunks).map(i =>
      shiftright(sig, i * width).bitwiseAND(lit(mask))): _*)
  }

  /** Cast a float embedding to double — all similarity arithmetic runs
    * in double so results are bit-identical to the DuckDB oracle's
    * sequential fold.
    */
  def toDoubleVec(c: Column): Column = transform(c, x => x.cast("double"))

  /** Sequential-fold dot product of two double arrays (matches DuckDB
    * list_dot_product accumulation order exactly — verified). Backed by
    * the native codegen expression graft.expressions.VecDot (requires
    * GraftExtensions on the session): the built-in
    * aggregate(zip_with(...)) HOF form evaluates interpreted at ~250×
    * the cost on the candidate-pair hot path.
    */
  def dot(a: Column, b: Column): Column = call_udf("vec_dot", a, b)

  /** L2 norm, same sequential fold (native VecNorm expression). */
  def l2Norm(c: Column): Column = call_udf("vec_norm", c)
}
