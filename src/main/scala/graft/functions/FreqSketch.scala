package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items sketch as a mergeable Spark Aggregator
  * (Misra & Gries 1982; merge rule per Agarwal et al., "Mergeable
  * Summaries", PODS 2012): at most `k` counters at any time, so the
  * partial (map-side) aggregate ships O(k) entries per partition — the
  * 100 TB shape for "what are the frequent tokens/domains" questions,
  * where an exact groupBy would shuffle the full vocabulary.
  *
  * Guarantees (the properties FreqSketchSpec pins):
  *  - undercount only: est(x) ≤ true(x), and true(x) − est(x) ≤ n/(k+1);
  *  - therefore every item with true frequency > n/(k+1) is PRESENT in
  *    the final sketch, under any partitioning of the stream — which is
  *    what makes the sketch a sound CANDIDATE GENERATOR for the exact
  *    two-pass heavy-hitters query (t32): pass 1 finds ≤ k candidates,
  *    pass 2 counts exactly only those.
  *
  * The estimates themselves depend on stream order (all MG variants
  * do), so consumers wanting deterministic output use the two-pass
  * form; the sketch's set-inclusion guarantee is order-independent.
  */
class FreqSketchAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
    buf.get(item) match {
      case Some(c) => buf.updated(item, c + 1)
      case None if buf.size < k => buf.updated(item, 1L)
      case None =>
        // decrement-all step: every tracked count gives up one unit to
        // absorb the untracked arrival; zeros vacate their counter
        buf.flatMap { case (x, c) => if (c > 1) Some(x -> (c - 1)) else None }
    }

  override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
    val sum = b2.foldLeft(b1) { case (acc, (x, c)) =>
      acc.updated(x, acc.getOrElse(x, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest count from everything and drop
      // non-positives — the PODS'12 mergeable-summaries rule, which
      // preserves the n/(k+1) undercount bound
      val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
      sum.flatMap { case (x, c) => if (c > cut) Some(x -> (c - cut)) else None }
    }
  }

  override def finish(r: Map[String, Long]): Map[String, Long] = r

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

object FreqSketch {
  /** freqSketch(k)(itemCol) → map<string, long> of ≤ k surviving counters. */
  def freqSketch(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new FreqSketchAggregator(k), Encoders.STRING)
}
