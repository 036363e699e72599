package graft.queries

import graft.{Checkpoints, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap

/** Link-graph operators over the crawl corpus — the frontier-ranking
  * side of a scraping pipeline (the reference crawls page-by-page;
  * at 100 TB the crawler needs to ORDER its frontier, and PageRank
  * over the already-crawled link graph is the classic signal).
  *
  * Iterative-graph discipline is the same as d7's connected
  * components: one keyed shuffle per round, rank state re-materialized
  * through tracked local checkpoints (flat lineage, superseded blocks
  * released), never a driver-side adjacency structure.
  */
object Graph {

  type Q = (SparkSession, String) => DataFrame

  // 12 rounds: rank ORDERING stabilizes geometrically (damping^k) and
  // is what frontier prioritization consumes; each extra round costs a
  // fixed local-mode job latency that dominates wall time at fixture
  // scale while the per-round plan (one keyed shuffle + one
  // materialization) is already the 100 TB shape
  val PrIters = 12
  val Damping = 0.85

  /** G1: PageRank over a deterministic synthetic link graph (each doc
    * links to three affine-hash neighbors — the fixture has no real
    * anchors, and the operator, not the edge list, is the point).
    * Fixed 20 power iterations, damping 0.85, dangling mass
    * redistributed uniformly each round. Rows-only oracle (iterative
    * double arithmetic cannot be hash-twinned); GraphSpec pins the
    * structural invariants on injected graphs.
    */
  def g1PageRank(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id").as("id"))
    val n = docs.count()
    val edges = docs.select(col("id").as("src"),
      explode(array(
        (col("id") * 7 + 1) % n,
        (col("id") * 13 + 3) % n,
        (col("id") * 29 + 7) % n)).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    pageRankFrame(docs, edges, PrIters)
      .select(col("id").as("doc_id"), round(col("rank"), 8).as("rank"))
      .orderBy(col("rank").desc, col("doc_id"))
      .limit(100)
  }

  /** Power iteration over (nodes(id), edges(src, dst)).
    *
    * Per round: contributions = one equi-join edges⋈ranks on src (AQE
    * picks broadcast while ranks are small, shuffle at web scale — both
    * correct) + one map-side-combined sum keyed by dst; the dangling
    * mass (rank parked on nodes with no outlinks) is a scalar
    * aggregation redistributed uniformly, keeping Σrank = 1 exactly.
    * Rank state is corpus-sized and re-materializes each round via
    * Checkpoints.eager with the superseded round released — executor
    * storage holds ONE copy of the rank vector at any time, and the
    * lineage never nests (the d7 loop discipline).
    */
  private[queries] def pageRankFrame(nodes: DataFrame, edges: DataFrame,
      iters: Int): DataFrame = {
    val n = nodes.count()
    val outDeg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    var ranks = Checkpoints.eager(
      nodes.select(col("id"), lit(1.0 / n).as("rank")))
    var it = 0
    while (it < iters) {
      // dangling mass rides the SAME action as the rank update (1-row
      // agg cross-joined in), so each round is exactly one job: the
      // checkpoint materialization
      val dangling = ranks.df
        .join(outDeg.withColumnRenamed("src", "id"), Seq("id"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("m"))
      val contribs = edges
        .join(ranks.df.withColumnRenamed("id", "src"), Seq("src"))
        .join(outDeg, Seq("src"))
        .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("in_sum"))
      val next = Checkpoints.eager(
        nodes.join(contribs, Seq("id"), "left").crossJoin(dangling)
          .select(col("id"),
            (lit((1 - Damping) / n) + lit(Damping) *
              (coalesce(col("in_sum"), lit(0.0)) + col("m") / n))
              .as("rank")))
      ranks.release()
      ranks = next
      it += 1
    }
    ranks.df
  }

  val queries: ListMap[String, Q] = ListMap(
    "g1_pagerank" -> (g1PageRank _),
  )

  val oracle: ListMap[String, String] = ListMap.empty
}
