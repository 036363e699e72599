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

  // Convergence-terminated: stop when the L1 delta Σ|r_t − r_{t−1}|
  // falls below n·PrNodeTol (average per-node movement under 1e-8 —
  // the resolution g1 rounds its output to), with a max-iter guard.
  // A fixed round count tuned to fixture-scale job latency would not
  // transfer to a skewed 100× graph, where the spectral gap (and so
  // the number of rounds to a stable ordering) depends on structure.
  val PrMaxIters = 40
  val PrNodeTol = 1e-8
  val Damping = 0.85

  /** G1: PageRank over a deterministic synthetic link graph (each doc
    * links to three affine-hash neighbors — the fixture has no real
    * anchors, and the operator, not the edge list, is the point).
    * Power iteration to convergence (L1 delta < n·1e-8, max 40
    * rounds), damping 0.85, dangling mass redistributed uniformly
    * each round. Rows-only oracle (iterative double arithmetic cannot
    * be hash-twinned); GraphSpec pins the structural invariants and
    * convergence behavior on injected graphs.
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
    pageRankFrame(docs, edges)
      .select(col("id").as("doc_id"), round(col("rank"), 8).as("rank"))
      .orderBy(col("rank").desc, col("doc_id"))
      .limit(100)
  }

  /** Power iteration over (nodes(id), edges(src, dst)) to convergence.
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
    *
    * Termination: the previous rank rides the round's frame (replacing
    * the nodes join — ranks carries exactly the node ids), so the
    * materialized checkpoint holds (id, rank, |rank − prev|) and the
    * L1 delta is a partial-agg sum over the just-pinned in-memory
    * blocks — no recompute, no extra shuffle of corpus-sized state.
    * Stop at Σ|r_t − r_{t−1}| < n·nodeTol or maxIters.
    */
  private[queries] def pageRankFrame(nodes: DataFrame, edges: DataFrame,
      maxIters: Int = PrMaxIters,
      nodeTol: Double = PrNodeTol): DataFrame =
    pageRankConverged(nodes, edges, maxIters, nodeTol)._1

  /** As [[pageRankFrame]], additionally returning the number of rounds
    * actually run — GraphSpec pins that this varies with structure.
    */
  private[queries] def pageRankConverged(nodes: DataFrame,
      edges: DataFrame, maxIters: Int = PrMaxIters,
      nodeTol: Double = PrNodeTol): (DataFrame, Int) = {
    val n = nodes.count()
    val tol = nodeTol * n
    val outDeg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    var ranks = Checkpoints.eager(
      nodes.select(col("id"), lit(1.0 / n).as("rank")))
    var it = 0
    var delta = Double.MaxValue
    while (it < maxIters && delta >= tol) {
      // dangling mass rides the SAME action as the rank update (1-row
      // agg cross-joined in), so each round is one full job — the
      // checkpoint materialization — plus a cached-block delta scan
      val dangling = ranks.df
        .join(outDeg.withColumnRenamed("src", "id"), Seq("id"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("m"))
      val contribs = edges
        .join(ranks.df.select(col("id").as("src"), col("rank")), Seq("src"))
        .join(outDeg, Seq("src"))
        .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("in_sum"))
      val next = Checkpoints.eager(
        ranks.df.select(col("id"), col("rank").as("prev"))
          .join(contribs, Seq("id"), "left").crossJoin(dangling)
          .withColumn("rank",
            lit((1 - Damping) / n) + lit(Damping) *
              (coalesce(col("in_sum"), lit(0.0)) + col("m") / n))
          .select(col("id"), col("rank"),
            abs(col("rank") - col("prev")).as("delta")))
      delta = next.df.agg(sum(col("delta"))).first().getDouble(0)
      ranks.release()
      ranks = next
      it += 1
    }
    (ranks.df.select(col("id"), col("rank")), it)
  }

  val queries: ListMap[String, Q] = ListMap(
    "g1_pagerank" -> (g1PageRank _),
  )

  val oracle: ListMap[String, String] = ListMap.empty
}
