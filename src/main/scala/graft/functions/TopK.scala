package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate for top-k selection. Ordering is
  * (score desc, id asc) — callers feed an already-rounded score so
  * tie-breaks are reproducible against the DuckDB oracle.
  */
case class ScoredId(score: Double, id: Long)

/** Bounded top-k aggregator: keeps at most `cap` candidates in its
  * buffer at any time, so the partial (map-side) aggregate ships O(k)
  * rows per group per partition instead of the full candidate list.
  *
  * This is the 100 TB-scale replacement for the window-rank top-k
  * pattern: `row_number().over(partitionBy(q).orderBy(score))` shuffles
  * EVERY scored pair (|corpus| × |queries| rows), while this aggregator
  * map-side-combines each partition down to k rows per query before the
  * shuffle — the shuffle carries |queries| × partitions × k rows only.
  */
class TopKAggregator(k: Int)
    extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {

  private val ord: Ordering[ScoredId] =
    Ordering.by((s: ScoredId) => (-s.score, s.id))
  // prune lazily at 4k to amortize the sort cost over insertions
  private val cap = 4 * k

  override def zero: Seq[ScoredId] = Vector.empty

  override def reduce(buf: Seq[ScoredId], a: ScoredId): Seq[ScoredId] = {
    val appended = buf :+ a
    if (appended.length > cap) appended.sorted(ord).take(k) else appended
  }

  override def merge(b1: Seq[ScoredId], b2: Seq[ScoredId]): Seq[ScoredId] = {
    val all = b1 ++ b2
    if (all.length > k) all.sorted(ord).take(k) else all
  }

  override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r.sorted(ord).take(k)

  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    ExpressionEncoder[Seq[ScoredId]]()
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    ExpressionEncoder[Seq[ScoredId]]()
}

object TopK {
  /** Untyped column function: topK(k)(scoreCol, idCol) → array<struct>. */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKAggregator(k), Encoders.product[ScoredId])
}
