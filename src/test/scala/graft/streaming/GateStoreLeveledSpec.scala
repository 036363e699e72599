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

  /** Drive control + leveled gates batch-by-batch, compacting the
    * leveled one; `fault` installs GateStore.leveledFault for the whole
    * drive (reset by the caller's finally). Returns nothing — state is
    * on disk.
    */
  private def drive(bs: Seq[DataFrame], range: Range, cs: String,
      co: String, ls: String, lo: String, every: Int, fanout: Int): Unit =
    for (i <- range) {
      StreamMediaDedup.processBatch(spark, bs(i), i.toLong, cs, co)
      StreamMediaDedup.processBatch(spark, bs(i), i.toLong, ls, lo)
      try StreamMediaDedup.maybeCompactLeveled(spark, ls, every, fanout)
      catch { case e: RuntimeException
        if e.getMessage != null && e.getMessage.startsWith("injected-tear") => () }
    }

  private def assertVerdictsEqual(bs: Seq[DataFrame], upTo: Int,
      co: String, lo: String, ctx: String): Unit =
    for (i <- 0 until upTo)
      assert(canon(spark.read.parquet(s"$lo/batch=$i")) ==
        canon(spark.read.parquet(s"$co/batch=$i")),
        s"$ctx: verdicts diverged at batch $i")

  test("mid-cascade tear A — crash between the level-0 merge and its _levels write: one extra re-merge, same verdicts, merged-id replays still no-op") {
    val root = java.nio.file.Files.createTempDirectory("leveled-tearA-").toString
    val merges = new java.util.concurrent.atomic.AtomicInteger(0)
    try {
      val bs = batches(6)
      val (cs, co) = (s"$root/cstore", s"$root/cout")
      val (ls, lo) = (s"$root/lstore", s"$root/lout")
      // crash exactly once: the batch-2 fold commits its merge (dirs
      // rewritten, marker advanced) but dies before writeLevels
      var armed = true
      GateStore.leveledFault = {
        case p if p.endsWith("-merged") || p.startsWith("cascade-merged") =>
          if (p == "level0-merged") {
            merges.incrementAndGet()
            if (armed) { armed = false; throw new RuntimeException("injected-tear A") }
          } else merges.incrementAndGet()
        case _ => ()
      }
      drive(bs, 0 until 3, cs, co, ls, lo, every = 3, fanout = 4)
      // the torn state: fold {0,1,2}→2 landed, the ledger did not
      assert(dirs(ls) == Seq(2L), s"post-tear dirs: ${dirs(ls)}")
      assert(GateStore.readLevels(ls).isEmpty, "ledger survived the tear")
      assert(GateStore.compactedUpTo(ls) == 2L)
      // merged-away ids replay as no-ops even in the torn state
      StreamMediaDedup.processBatch(spark, bs(1), 1L, ls, lo)
      assert(dirs(ls) == Seq(2L), "torn-state replay re-seeded the store")
      // restart: the unrecorded run looks fresh again; at batch 4 the
      // fresh set {2,3,4} refolds it — the one extra re-merge
      drive(bs, 3 until 6, cs, co, ls, lo, every = 3, fanout = 4)
      assert(dirs(ls) == Seq(4L, 5L), s"recovered dirs: ${dirs(ls)}")
      assert(GateStore.readLevels(ls).toSet == Set((0, 4L)))
      assertVerdictsEqual(bs, 6, co, lo, "tear A")
      // recovery cost: exactly 2 completed merges (the crashed fold +
      // one recovery fold at batch 4) — the same COUNT a crash-free run
      // does (folds at 2 and 5); the "one extra re-merge" is run 2's
      // rows passing through a fold twice, visible above as its dir
      // becoming an input of the batch-4 fold. No runaway repair loop.
      assert(merges.get() == 2, s"merge count ${merges.get()} != 2")
    } finally {
      GateStore.leveledFault = _ => ()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  test("mid-cascade tear B — crash between a recorded level-0 fold and its due cascade: cascade deferred to the next fold, no extra re-merge, same verdicts") {
    val root = java.nio.file.Files.createTempDirectory("leveled-tearB-").toString
    val merges = new java.util.concurrent.atomic.AtomicInteger(0)
    try {
      val bs = batches(9)
      val (cs, co) = (s"$root/cstore", s"$root/cout")
      val (ls, lo) = (s"$root/lstore", s"$root/lout")
      // every=3, fanout=2: batch 2 folds {0,1,2}→2; batch 5 folds
      // {3,4,5}→5 and OWES a cascade ({2,5} ≥ fanout). Crash after the
      // fold's ledger write, before that cascade runs.
      var armed = false
      GateStore.leveledFault = {
        case p if p.endsWith("-merged") || p.startsWith("cascade-merged") =>
          merges.incrementAndGet()
        case "level0-recorded" =>
          if (armed) { armed = false; throw new RuntimeException("injected-tear B") }
        case _ => ()
      }
      drive(bs, 0 until 5, cs, co, ls, lo, every = 3, fanout = 2)
      armed = true // arm for the batch-5 fold only
      drive(bs, 5 until 6, cs, co, ls, lo, every = 3, fanout = 2)
      // torn state: both level-0 runs recorded, the due cascade missing
      assert(dirs(ls) == Seq(2L, 5L), s"post-tear dirs: ${dirs(ls)}")
      assert(GateStore.readLevels(ls).toSet == Set((0, 2L), (0, 5L)))
      // restart: batches 6,7 are below threshold (the missed cascade is
      // NOT retried eagerly — it waits for the next fold), batch 8
      // folds {6,7,8}→8 and the cascade fires CHUNKED at fanout:
      // the OLDEST two level-0 runs {2,5} fold to a level-1 run (the
      // bounded-merge rule — never all runs at a level in one rewrite),
      // leaving the fresh run 8 at level 0 for a future cascade
      drive(bs, 6 until 9, cs, co, ls, lo, every = 3, fanout = 2)
      assert(dirs(ls) == Seq(5L, 8L), s"recovered dirs: ${dirs(ls)}")
      assert(GateStore.readLevels(ls).toSet == Set((1, 5L), (0, 8L)))
      assertVerdictsEqual(bs, 9, co, lo, "tear B")
      // no extra rewrite: 4 merges total (folds 2/5/8 + one cascade) —
      // the same count the crash-free run does over 9 batches
      assert(merges.get() == 4, s"merge count ${merges.get()} != crash-free 4")
    } finally {
      GateStore.leveledFault = _ => ()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  test("a corrupt _levels line is dropped, not fatal: describe and compaction keep working, worst case one extra re-merge") {
    val root = java.nio.file.Files.createTempDirectory("leveled-corrupt-").toString
    try {
      val bs = batches(6)
      val (cs, co) = (s"$root/cstore", s"$root/cout")
      val (ls, lo) = (s"$root/lstore", s"$root/lout")
      drive(bs, 0 until 3, cs, co, ls, lo, every = 3, fanout = 4)
      assert(GateStore.readLevels(ls).toSet == Set((0, 2L)))
      // corrupt the recorded run's line (torn write / bit rot)
      java.nio.file.Files.write(java.nio.file.Paths.get(ls, "_levels"),
        "0 not-a-number\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // reads degrade to "line absent" — no MatchError/NumberFormat
      assert(GateStore.readLevels(ls).isEmpty)
      assert(StreamMediaDedup.describe(ls).levels.isEmpty)
      // and the run whose entry rotted looks fresh again: the next fold
      // re-merges it (the documented worst case) with correct verdicts
      drive(bs, 3 until 6, cs, co, ls, lo, every = 3, fanout = 4)
      assert(dirs(ls) == Seq(4L, 5L), s"dirs after corrupt line: ${dirs(ls)}")
      assert(GateStore.readLevels(ls).toSet == Set((0, 4L)))
      assertVerdictsEqual(bs, 6, co, lo, "corrupt ledger line")
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
