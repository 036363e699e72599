package graft.queries

import graft.functions.TextFunctions.stopWords

/** Shared DuckDB SQL fragments for the text-pipeline oracles — ONE
  * definition of the clean chain and stop-word list, so a change to the
  * Spark implementation has exactly one SQL counterpart to keep in sync
  * (previously the same nested regexp chain was copy-pasted into four
  * oracle strings).
  *
  * All fragments are raw strings (single backslashes, as DuckDB reads
  * them); compose by concatenation, not s-interpolation.
  */
object OracleSql {

  /** The stop-word list as a DuckDB list literal. */
  val stopWordsList: String =
    stopWords.map(w => "'" + w.replace("'", "''") + "'").mkString("[", ", ", "]")

  /** cleanChain(text) — O-T2..T10 (data_preparation.py:34-42) over the
    * column `text`.
    */
  val cleanChain: String =
    """regexp_replace(
      |    regexp_replace(
      |      regexp_replace(
      |        regexp_replace(
      |          regexp_replace(
      |            regexp_replace(
      |              regexp_replace(lower(regexp_replace(text, '^\s+|\s+$', '', 'g')), 'http\S+', '', 'g'),
      |              '<.*?>', '', 'g'),
      |            '[^ 0-9a-z]', ' ', 'g'),
      |          '\b(\d+\d)\b', '', 'g'),
      |        'http|https|www', '', 'g'),
      |      '\b[a-z]\b', '', 'g'),
      |    ' +', ' ', 'g')""".stripMargin

  /** clean → tokenize → stop-word + length filter (O-T11..T14): the
    * content-token list of `text`.
    */
  val cleanTokens: String =
    "list_filter(string_split_regex(trim(" + cleanChain + "), '\\s+'),\n" +
      "      t -> len(t) > 2 AND NOT list_contains(" + stopWordsList + ", t))"
}
