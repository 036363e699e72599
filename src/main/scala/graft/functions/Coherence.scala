package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** O-M3: c_v topic coherence (Röder, Both & Hinneburg 2015 — the measure
  * gensim's CoherenceModel(coherence='c_v') implements, used by the
  * reference for LDA model selection at topic_modelling.ipynb lines
  * 366-371). MLlib has no counterpart, so this is a composed DataFrame
  * job plus a driver-side finish on the tiny topic-word statistics:
  *
  *  1. virtual documents: sliding windows of `windowSize` (110, the c_v
  *     default) token positions over each document's token sequence;
  *  2. window occurrence counts N(w) and N(wi,wj) restricted to the
  *     topic words (≤ k×topN distinct strings — the only data that
  *     leaves the corpus scan is per-window topic-word incidence);
  *  3. NPMI(wi,wj) with gensim's epsilon=1e-12;
  *  4. S_one_set segmentation: per topic word, the NPMI context vector
  *     against ALL topic words; topic coherence = mean cosine between
  *     each word's vector and the topic's summed vector.
  *
  * Scale: the corpus pass is one explode + grouped distinct count —
  * shuffle keys are (window, word∈topicWords) pairs only, so cost scales
  * with corpus size × topN density, never vocabulary². The driver-side
  * finish touches a k×topN×topN matrix (∼10⁴ doubles).
  */
object Coherence {

  /** Per-window incidence counts for the given word set. Returns
    * (singleCounts, pairCounts, totalWindows) — pair keys are (lo, hi)
    * sorted.
    *
    * Semantics: c_v slides a window of `windowSize` (110) positions over
    * each doc; docs shorter than the window form a single window (gensim
    * behavior). N(w) = #windows containing w; N(wi,wj) = #windows
    * containing both.
    *
    * Implementation: NO window is ever materialized. Only topic-word
    * POSITIONS matter — an occurrence at position p is visible from
    * window-starts [p-windowSize+1, p], so per doc we turn occurrences
    * into enter/leave events over the start index, sweep them once, and
    * credit each constant-content run's length to the words/pairs
    * present (round 2 materialized every 110-token window and filtered
    * each against the word set — ~100× this work; 291 s → this form).
    * Per-doc work is O(tokens + events·present²); what leaves the scan
    * is one (key, count) pair per distinct word/pair per doc — the same
    * shuffle volume as before, map-side combined.
    */
  def windowCounts(
      tokens: DataFrame, // (doc_id, tokens: array<string>)
      words: Set[String],
      windowSize: Int): (Map[String, Long], Map[(String, String), Long], Long) = {
    val spark = tokens.sparkSession
    import spark.implicits._
    val wordsB = spark.sparkContext.broadcast(words)
    val totKey = "\u00010"  // total-window tally ('\u0001' sorts below any token)
    val sep = "\u0000"    // cannot occur in a token

    val counted = tokens.select(col("doc_id"), col("tokens"))
      .as[(Long, Seq[String])]
      .flatMap { case (_, toks) =>
        val wordSet = wordsB.value
        val n = toks.length
        if (n == 0) Iterator.empty
        else {
          val local = new scala.collection.mutable.HashMap[String, Long]()
          // credit `len` windows to every word and unordered pair in `present`
          def credit(present: Array[String], len: Long): Unit = {
            var i = 0
            while (i < present.length) {
              local.updateWith("1" + sep + present(i))(v => Some(v.getOrElse(0L) + len))
              var j = i + 1
              while (j < present.length) {
                local.updateWith("2" + sep + present(i) + sep + present(j))(v =>
                  Some(v.getOrElse(0L) + len))
                j += 1
              }
              i += 1
            }
          }
          if (n <= windowSize) {
            local(totKey) = 1L
            credit(toks.iterator.filter(wordSet.contains).toArray.distinct.sorted, 1L)
          } else {
            val starts = n - windowSize + 1
            local(totKey) = starts.toLong
            // enter/leave events over the window-start index
            val events = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Int)]
            var p = 0
            while (p < n) {
              val t = toks(p)
              if (wordSet.contains(t)) {
                events += ((math.max(0, p - windowSize + 1), t, 1))
                events += ((math.min(p, starts - 1) + 1, t, -1))
              }
              p += 1
            }
            if (events.nonEmpty) {
              val sorted = events.sortBy(_._1)
              val live = new scala.collection.mutable.HashMap[String, Int]()
              var idx = 0
              var sPrev = 0
              while (idx < sorted.length) {
                val sCur = math.min(sorted(idx)._1, starts)
                if (sCur > sPrev)
                  credit(live.keysIterator.toArray.sorted, (sCur - sPrev).toLong)
                while (idx < sorted.length && math.min(sorted(idx)._1, starts) == sCur) {
                  val (_, w, d) = sorted(idx)
                  val c = live.getOrElse(w, 0) + d
                  if (c == 0) live.remove(w) else live(w) = c
                  idx += 1
                }
                sPrev = sCur
              }
              // trailing word-free run contributes no counts
            }
          }
          local.iterator
        }
      }
      .toDF("k", "n")
      .groupBy("k").agg(sum(col("n")).as("n"))
      .collect()

    var totalWindows = 0L
    val single = Map.newBuilder[String, Long]
    val pairs = Map.newBuilder[(String, String), Long]
    counted.foreach { r =>
      val k = r.getString(0); val n = r.getLong(1)
      if (k == totKey) totalWindows = n
      else if (k.startsWith("1" + sep)) single += (k.substring(2) -> n)
      else {
        val parts = k.substring(2).split(sep)
        pairs += ((parts(0), parts(1)) -> n)
      }
    }
    (single.result(), pairs.result(), totalWindows)
  }

  /** c_v coherence per topic. `topicWords`: topN terms per topic. */
  def cv(
      tokens: DataFrame,
      topicWords: Seq[Seq[String]],
      windowSize: Int = 110): Seq[Double] =
    cvMany(tokens, Seq(topicWords), windowSize).head

  /** c_v for MANY models over ONE corpus pass: occurrence counts are
    * tracked for the union of every model's topic words, and each
    * model's NPMI reads exactly the counts a solo pass would produce
    * (a window count doesn't depend on which other words are tracked),
    * so per-model scores are bit-identical to [[cv]] while a k-sweep
    * pays one corpus scan instead of |ks|.
    */
  def cvMany(
      tokens: DataFrame,
      models: Seq[Seq[Seq[String]]],
      windowSize: Int = 110): Seq[Seq[Double]] = {
    val eps = 1e-12
    val all = models.flatten.flatten.toSet
    val (single, pairs, totW) = windowCounts(tokens, all, windowSize)
    def p(w: String): Double = single.getOrElse(w, 0L).toDouble / totW
    def pj(a: String, b: String): Double = {
      val key = if (a < b) (a, b) else (b, a)
      pairs.getOrElse(key, 0L).toDouble / totW
    }
    def npmi(a: String, b: String): Double = {
      if (a == b) 1.0
      else {
        val joint = pj(a, b)
        val pa = p(a); val pb = p(b)
        if (pa == 0.0 || pb == 0.0) 0.0
        else {
          val pmi = math.log((joint + eps) / (pa * pb))
          pmi / -math.log(joint + eps)
        }
      }
    }
    def cos(x: Array[Double], y: Array[Double]): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < x.length) { d += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1 }
      if (nx == 0.0 || ny == 0.0) 0.0 else d / math.sqrt(nx * ny)
    }
    models.map { topicWords =>
      topicWords.map { words =>
        val ctx = words.map(w => words.map(o => npmi(w, o)).toArray)
        val setVec = ctx.transpose.map(_.sum).toArray
        val sims = ctx.map(v => cos(v, setVec))
        if (sims.isEmpty) 0.0 else sims.sum / sims.size
      }
    }
  }
}
