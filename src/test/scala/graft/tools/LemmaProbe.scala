package graft.tools

import graft.functions.PosLemma

/** Dev probe for the fidelity-narrowing loop (VERDICT r6 item 8): runs
  * the offline tagger+lemmatizer over the reference golden corpus'
  * title vocabulary and dumps every (word, tag, lemma, freq) row to
  * /tmp/lemma_pairs.tsv, frequency-sorted, so suspicious lemmas (over-
  * stemming, wrong-POS routing) can be mined into
  * resources/graft/lemma-exceptions.tsv via tools/gen_lemma_exceptions.py.
  *
  *   python3 -c "... extract titles ... > /tmp/titles.txt"
  *   sbt -batch "Test/runMain graft.tools.LemmaProbe"
  */
object LemmaProbe {
  def main(args: Array[String]): Unit = {
    val in = if (args.nonEmpty) args(0) else "/tmp/titles.txt"
    val outPath = if (args.length > 1) args(1) else "/tmp/lemma_pairs.tsv"
    val src = scala.io.Source.fromFile(in, "UTF-8")
    val titles = try src.getLines().toVector finally src.close()
    val words = titles.flatMap(_.toLowerCase.split("[^a-z]+"))
      .filter(_.length > 2)
    val freq = words.groupBy(identity).view.mapValues(_.size).toMap
    val out = new java.io.PrintWriter(outPath)
    freq.toSeq.sortBy(-_._2).foreach { case (w, c) =>
      val t = PosLemma.posTag(w)
      val l = PosLemma.lemmatize(w, t)
      out.println(s"$w\t$t\t$l\t$c")
    }
    out.close()
    println(s"LemmaProbe: ${freq.size} distinct words -> $outPath")
  }
}
