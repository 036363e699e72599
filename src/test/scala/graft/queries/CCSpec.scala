package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Connected components (alternating large-star/small-star): label
  * correctness against a driver union-find oracle, the O(log n) round
  * bound on the pathological chain that defeats plain min-label
  * propagation, and the O(1)-in-rounds executor-storage bound (each
  * round's checkpoint releases its predecessor's blocks).
  */
class CCSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("64-node chain converges in O(log n) rounds, labels = component min") {
    import spark.implicits._
    // worst case for propagation: one path, diameter 63 — one run yields
    // both the labels and the round count
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("id1", "id2")
    val (cp, rounds) = Dedup.connectedComponentsWithRounds(chain)
    assert(rounds <= 7, s"took $rounds rounds; plain propagation needs ~63")
    val labels = cp.df.collect().map(r => (r.getLong(0), r.getLong(1)))
    cp.release()
    assert(labels.length == 64)
    assert(labels.forall(_._2 == 0L), "every chain node labels to the min (0)")
  }

  test("random-graph labels match driver union-find; storage stays O(1)") {
    import spark.implicits._
    // three densities: sparse forest-ish, medium, dense single component
    for ((seed, nEdges, nNodes) <- Seq((7, 300, 200), (11, 60, 150), (23, 900, 120))) {
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(nEdges)(
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong))
        .filter(e => e._1 != e._2).distinct
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val got = Dedup.connectedComponents(edges.toDF("a", "b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      // driver union-find with min-root unions → root IS the component min
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      assert(got.size == nodes.size, s"seed $seed")
      nodes.foreach(n =>
        assert(got(n) == find(n), s"seed $seed: label mismatch at node $n"))
      // the loop released every superseded round: only the final labels'
      // checkpoint may remain pinned
      val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
      assert(leaked.size <= 2, s"seed $seed: leaked ${leaked.size} persistent RDDs")
    }
  }

  test("empty, single-edge, and self-loop-only graphs") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Dedup.connectedComponents(empty).count() == 0)
    val one = Seq((5L, 9L)).toDF("a", "b")
    val got = Dedup.connectedComponents(one).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((5L, 5L), (9L, 5L)))
    // a node whose only edge is reflexive still gets a label
    val loops = Seq((7L, 7L), (1L, 2L)).toDF("a", "b")
    val got2 = Dedup.connectedComponents(loops).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got2 == Set((7L, 7L), (1L, 1L), (2L, 1L)))
  }

  test("non-convergence within maxRounds fails loudly, not silently") {
    import spark.implicits._
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("id1", "id2")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxRounds = 1)
    }
  }
}
