package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import scala.collection.immutable.ListMap

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one name per implemented SURVEY.md §2 operator to a
  * function (spark, sfDir) => DataFrame over the parquet fixtures in sfDir.
  * `oracleSql` carries the DuckDB-equivalent SQL where the operator is
  * SQL-expressible; non-SQL operators (ML, custom UDFs, sketches) are
  * covered by ScalaTest specs instead and get a rows-only check here.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The E3 sentiment-trend slice (SURVEY §7.3): scan → clean chain →
    * sentiment UDF → daily agg → rolling window — the reference's
    * headline pipeline end-to-end.
    */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Analytics.a2SentimentTrend(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.Windows.queries ++
      graft.queries.Text.queries ++
      graft.queries.Dedup.queries ++
      graft.queries.Similarity.queries ++
      graft.queries.Analytics.queries ++
      graft.queries.Topics.queries ++
      graft.queries.Extraction.queries ++
      graft.queries.Multimodal.queries ++
      graft.queries.Graph.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
      graft.queries.Windows.oracle ++
      graft.queries.Text.oracle ++
      graft.queries.Dedup.oracle ++
      graft.queries.Similarity.oracle ++
      graft.queries.Analytics.oracle ++
      graft.queries.Topics.oracle ++
      graft.queries.Extraction.oracle ++
      graft.queries.Multimodal.oracle ++
      graft.queries.Graph.oracle
}
