package graft.streaming

import graft.TestSpark
import graft.queries.Multimodal
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The leveled compact-every-K policy (GateStore.maybeCompactLeveled):
  * the bounded-write-amplification extension the full-rewrite policy's
  * own caveat names. Pins, against an uncompacted control gate:
  *  - verdicts stay IDENTICAL through level-0 merges and cascades (the
  *    probe reads the union of live dirs, whatever their shape);
  *  - a level-0 compaction NEVER rewrites a prior run's dir — the
  *    bounded-cost property itself, asserted on file fingerprints;
  *  - replays of merged-away ids stay no-ops (marker vouches);
  *  - the `_levels` ledger tracks the LSM shape, and losing it (the
  *    crash window between a merge and its ledger update) degrades to
  *    extra rewrite, never to wrong verdicts.
  */
class GateStoreLeveledSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  /** Twelve disjoint media micro-batches (media_id mod 12). */
  private def batches(n: Int): Seq[DataFrame] = {
    val media = Multimodal.mediaTable(spark, dir)
      .select(col("media_id"), col("payload"), col("meta.format").as("format"))
    (0 until n).map(m => media.filter(col("media_id") % n === m))
  }

  private def canon(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def dirs(store: String): Seq[Long] =
    GateStore.listBatchDirs(new java.io.File(s"$store/bands")).map(_._1)

  private def fp(p: String): Set[(String, Long, Long)] = {
    import scala.jdk.CollectionConverters._
    org.apache.commons.io.FileUtils
      .listFiles(new java.io.File(p), null, true).asScala
      .map(f => (f.getAbsolutePath, f.length(), f.lastModified())).toSet
  }

  test("leveled policy: verdicts equal the uncompacted gate; level-0 merges never rewrite prior runs; merged-id replays no-op") {
    val root = java.nio.file.Files.createTempDirectory("leveled-").toString
    try {
      val bs = batches(12)
      val (cs, co) = (s"$root/cstore", s"$root/cout") // control
      val (ls, lo) = (s"$root/lstore", s"$root/lout") // leveled
      // every=3, fanout=2 exercises level-0 AND two cascade levels
      // within 12 batches:
      //   batch 2  → L0 run {0,1}→2
      //   batch 5  → L0 run {3,4}→5, cascade L1 {2}→5
      //   batch 8  → L0 run {6,7}→8           (runs 5 and 8 coexist)
      //   batch 11 → L0 {9,10}→11, cascade L1 {8}→11, cascade L2 {5}→11
      var run5Fp: Set[(String, Long, Long)] = null
      for (i <- bs.indices) {
        StreamMediaDedup.processBatch(spark, bs(i), i.toLong, cs, co)
        StreamMediaDedup.processBatch(spark, bs(i), i.toLong, ls, lo)
        StreamMediaDedup.maybeCompactLeveled(spark, ls, every = 3, fanout = 2)
        if (i == 5) run5Fp = fp(s"$ls/bands/batch=5")
        if (i == 8) {
          // the LSM shape: the level-1 run (5) and the fresh level-0
          // run (8) coexist; probes read their union
          assert(dirs(ls) == Seq(5L, 8L), s"dirs after batch 8: ${dirs(ls)}")
          assert(GateStore.readLevels(ls).toSet == Set((1, 5L), (0, 8L)))
          // THE bounded-cost property: folding {6,7} into 8 did not
          // touch run 5's files — per-compaction cost is O(every), not
          // O(store)
          assert(fp(s"$ls/bands/batch=5") == run5Fp,
            "level-0 compaction rewrote a prior run's dir")
        }
      }
      // verdicts byte-equal the uncompacted control at every batch
      for (i <- bs.indices)
        assert(canon(spark.read.parquet(s"$lo/batch=$i")) ==
          canon(spark.read.parquet(s"$co/batch=$i")),
          s"leveled verdicts diverged at batch $i")
      // final cascade collapsed everything into one level-2 run
      assert(dirs(ls) == Seq(11L), s"final dirs: ${dirs(ls)}")
      assert(GateStore.readLevels(ls).toSet == Set((2, 11L)))
      assert(GateStore.compactedUpTo(ls) == 11L)
      // the ops snapshot reads the same state off pure metadata
      val stats = StreamMediaDedup.describe(ls)
      assert(stats.compactedUpTo.contains(11L))
      assert(stats.levels.toSet == Set((2, 11L)))
      assert(stats.tables.map(_.table) == Seq("bands"))
      val bands = stats.tables.head
      assert(bands.liveDirs == 1 && bands.committedDirs == 1 &&
        bands.dataLessDirs == 0)
      assert(bands.bytes > 0 && bands.files > 0)
      assert(stats.geometry.contains(StreamMediaDedup.Geometry))
      assert(stats.owner.isEmpty) // driven via processBatch, no claim
      // merged-away ids replay as no-ops (marker vouches for them)
      StreamMediaDedup.processBatch(spark, bs(3), 3L, ls, lo)
      assert(dirs(ls) == Seq(11L), "compacted-id replay re-seeded the store")
      // and a FRESH batch probed against the leveled store still sees
      // every merged row: same verdicts as against the control store
      StreamMediaDedup.processBatch(spark, bs(0), 12L, ls, lo)
      StreamMediaDedup.processBatch(spark, bs(0), 12L, cs, co)
      assert(canon(spark.read.parquet(s"$lo/batch=12")) ==
        canon(spark.read.parquet(s"$co/batch=12")),
        "post-cascade probe lost merged rows")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  test("a lost _levels ledger degrades to re-merge, never to wrong verdicts") {
    val root = java.nio.file.Files.createTempDirectory("leveled-crash-").toString
    try {
      val bs = batches(8)
      val (cs, co) = (s"$root/cstore", s"$root/cout")
      val (ls, lo) = (s"$root/lstore", s"$root/lout")
      for (i <- 0 until 6) {
        StreamMediaDedup.processBatch(spark, bs(i), i.toLong, cs, co)
        StreamMediaDedup.processBatch(spark, bs(i), i.toLong, ls, lo)
        StreamMediaDedup.maybeCompactLeveled(spark, ls, every = 3, fanout = 4)
      }
      assert(GateStore.readLevels(ls).toSet == Set((0, 2L), (0, 5L)))
      // simulated crash window: the merge committed, the ledger write
      // was lost. Advisory metadata only — delete it outright.
      java.nio.file.Files.delete(java.nio.file.Paths.get(ls, "_levels"))
      assert(GateStore.readLevels(ls).isEmpty)
      for (i <- 6 until 8) {
        StreamMediaDedup.processBatch(spark, bs(i), i.toLong, cs, co)
        StreamMediaDedup.processBatch(spark, bs(i), i.toLong, ls, lo)
        StreamMediaDedup.maybeCompactLeveled(spark, ls, every = 3, fanout = 4)
      }
      // batch 6 found the unrecorded runs {2, 5} looking fresh alongside
      // itself: all three fold into 6 — one extra rewrite, correct
      // verdicts; batch 7 is fresh below threshold and stays live
      assert(dirs(ls) == Seq(6L, 7L), s"dirs after ledger loss: ${dirs(ls)}")
      assert(GateStore.readLevels(ls).toSet == Set((0, 6L)))
      for (i <- 0 until 8)
        assert(canon(spark.read.parquet(s"$lo/batch=$i")) ==
          canon(spark.read.parquet(s"$co/batch=$i")),
          s"verdicts diverged at batch $i after ledger loss")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }
}
