package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.{C4Lines, DeflateLen, Fnv64, GopherFlags, MinHash128, NfcNormalize, QualityScore, SimHash64, VecDot, VecNorm, WinnowFingerprints, WordNgrams, XmlFields}

/** Session extension registering graft's native Catalyst expressions —
  * enable with `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * (Verify, Bench, and the test harness all do). After injection the
  * functions are usable from both the Column API (`expr("vec_dot(a,b)")`)
  * and plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    // the Rule half: domain-algebra rewrites over the native functions
    // (NFC idempotence, sqrt∘self-dot → fused norm) — see
    // expressions/GraftOptimizations.scala
    e.injectOptimizerRule(_ => graft.expressions.GraftOptimizations)
    e.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo("graft.expressions.VecDot", "vec_dot"),
      (children: Seq[Expression]) => VecDot(children(0), children(1))))
    e.injectFunction((
      new FunctionIdentifier("vec_norm"),
      new ExpressionInfo("graft.expressions.VecNorm", "vec_norm"),
      (children: Seq[Expression]) => VecNorm(children.head)))
    e.injectFunction((
      new FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo("graft.expressions.WinnowFingerprints", "winnow_fingerprints"),
      (children: Seq[Expression]) => WinnowFingerprints(children.head)))
    e.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo("graft.expressions.SimHash64", "simhash64"),
      (children: Seq[Expression]) => SimHash64(children.head)))
    e.injectFunction((
      new FunctionIdentifier("xml_fields"),
      new ExpressionInfo("graft.expressions.XmlFields", null, "xml_fields",
        "xml_fields(doc, spec, ...) - extracts fields from an XML/HTML " +
          "string in one scan; spec is 'tag', 'tag@attr', 'tag#id', or " +
          "'tag[]' (all occurrences).",
        "Text extraction is LEAF-ONLY: an element's text is read up to " +
          "its next '<', so nested markup inside the element is not " +
          "concatenated. Attribute lookup tokenizes the start tag into " +
          "(name, value) pairs (quoted values are opaque). Designed for " +
          "machine-generated sitemap/article markup, not arbitrary HTML."),
      (children: Seq[Expression]) => XmlFields(children)))
    e.injectFunction((
      new FunctionIdentifier("minhash128"),
      new ExpressionInfo("graft.expressions.MinHash128", "minhash128"),
      (children: Seq[Expression]) => MinHash128(children.head)))
    e.injectFunction((
      new FunctionIdentifier("gopher_flags"),
      new ExpressionInfo("graft.expressions.GopherFlags", "gopher_flags"),
      (children: Seq[Expression]) => GopherFlags(children.head)))
    e.injectFunction((
      new FunctionIdentifier("quality_raw"),
      new ExpressionInfo("graft.expressions.QualityScore", "quality_raw"),
      (children: Seq[Expression]) => QualityScore(children.head)))
    e.injectFunction((
      new FunctionIdentifier("fnv64"),
      new ExpressionInfo("graft.expressions.Fnv64", "fnv64"),
      (children: Seq[Expression]) => Fnv64(children.head)))
    e.injectFunction((
      new FunctionIdentifier("c4_lines"),
      new ExpressionInfo("graft.expressions.C4Lines", "c4_lines"),
      (children: Seq[Expression]) => C4Lines(children.head)))
    e.injectFunction((
      new FunctionIdentifier("word_ngrams"),
      new ExpressionInfo("graft.expressions.WordNgrams", "word_ngrams"),
      (children: Seq[Expression]) => WordNgrams(children(0), children(1))))
    e.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo("graft.expressions.NfcNormalize", "nfc_normalize"),
      (children: Seq[Expression]) => NfcNormalize(children.head)))
    e.injectFunction((
      new FunctionIdentifier("deflate_len"),
      new ExpressionInfo("graft.expressions.DeflateLen", "deflate_len"),
      (children: Seq[Expression]) => DeflateLen(children.head)))
  }
}
