package graft.streaming

import graft.TestSpark
import graft.queries.Multimodal
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GateStore.maintain — the out-of-band maintenance entry point that
  * consumes the `describe` snapshot (round-15 verdict #3): a gate left
  * running WITHOUT inline compaction can still have its live-dir and
  * byte growth bounded by a scheduler calling maintain between the
  * writer's batches. Pins:
  *  - thresholds are respected: below them maintain is a pure metadata
  *    read (no compaction, `after eq before`); at/above, it runs the
  *    leveled policy;
  *  - the maxLiveDirs ceiling force-folds even when fewer than
  *    compactEvery fresh dirs exist;
  *  - verdicts are unchanged by maintenance (vs an unmaintained
  *    control store);
  *  - an owned store refuses maintenance that doesn't present the
  *    owner's name (the two-writers hazard), and accepts it when it
  *    does.
  */
class GateStoreMaintainSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def batches(n: Int): Seq[DataFrame] = {
    val media = Multimodal.mediaTable(spark, dir)
      .select(col("media_id"), col("payload"), col("meta.format").as("format"))
    (0 until n).map(m => media.filter(col("media_id") % n === m))
  }

  private def canon(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def dirs(store: String): Seq[Long] =
    GateStore.listBatchDirs(new java.io.File(s"$store/bands")).map(_._1)

  test("maintain compacts at the threshold, no-ops below it, and leaves verdicts untouched") {
    val root = java.nio.file.Files.createTempDirectory("maintain-").toString
    try {
      val bs = batches(8)
      val (cs, co) = (s"$root/cstore", s"$root/cout") // unmaintained control
      val (ms, mo) = (s"$root/mstore", s"$root/mout") // maintained
      val policy = GateStore.MaintenancePolicy(compactEvery = 4, fanout = 4)
      for (i <- bs.indices) {
        StreamMediaDedup.processBatch(spark, bs(i), i.toLong, cs, co)
        StreamMediaDedup.processBatch(spark, bs(i), i.toLong, ms, mo)
        val rep = StreamMediaDedup.maintain(spark, ms, policy)
        // 4 fresh dirs accumulate at batches 3 and 7 — the only two
        // passes allowed to compact
        if (i == 3 || i == 7)
          assert(rep.compactions.nonEmpty,
            s"maintain did not compact at threshold, batch $i")
        else {
          assert(rep.compactions.isEmpty,
            s"maintain compacted below threshold at batch $i")
          // no-op passes return the SAME snapshot — no second walk, and
          // proof nothing was touched
          assert(rep.after eq rep.before)
        }
      }
      // folds at batches 3 ({0..3}→3) and 7 ({4..7}→7)
      assert(dirs(ms) == Seq(3L, 7L), s"maintained dirs: ${dirs(ms)}")
      assert(GateStore.readLevels(ms).toSet == Set((0, 3L), (0, 7L)))
      // the report's snapshots bracket the work
      val rep = StreamMediaDedup.maintain(spark, ms,
        policy.copy(compactEvery = 16))
      assert(rep.compactions.isEmpty && rep.before.tables.head.liveDirs == 2)
      // verdicts byte-equal the unmaintained control at every batch
      for (i <- bs.indices)
        assert(canon(spark.read.parquet(s"$mo/batch=$i")) ==
          canon(spark.read.parquet(s"$co/batch=$i")),
          s"maintenance changed verdicts at batch $i")
      // and a fresh probe against the maintained store sees every
      // merged row: same verdict as against the control
      StreamMediaDedup.processBatch(spark, bs(0), 8L, ms, mo)
      StreamMediaDedup.processBatch(spark, bs(0), 8L, cs, co)
      assert(canon(spark.read.parquet(s"$mo/batch=8")) ==
        canon(spark.read.parquet(s"$co/batch=8")))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  test("maxLiveDirs ceiling force-folds fewer-than-compactEvery fresh dirs") {
    val root = java.nio.file.Files.createTempDirectory("maintain-ceil-").toString
    try {
      val bs = batches(3)
      val (ms, mo) = (s"$root/mstore", s"$root/mout")
      for (i <- bs.indices)
        StreamMediaDedup.processBatch(spark, bs(i), i.toLong, ms, mo)
      // 3 fresh dirs, compactEvery=16 — but the dir ceiling is breached
      val rep = StreamMediaDedup.maintain(spark, ms,
        GateStore.MaintenancePolicy(compactEvery = 16, maxLiveDirs = 3))
      assert(rep.compactions == Seq(2L), s"ceiling fold ran ${rep.compactions}")
      assert(dirs(ms) == Seq(2L))
      assert(rep.after.tables.head.liveDirs == 1)
      // a single fresh dir under the ceiling stays as-is (nothing to fold)
      val rep2 = StreamMediaDedup.maintain(spark, ms,
        GateStore.MaintenancePolicy(compactEvery = 16, maxLiveDirs = 1))
      assert(rep2.compactions.isEmpty)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  test("store lock serializes maintain against a live writer: a batch arriving mid-fold waits then throws; maintenance arriving mid-batch skips") {
    val root = java.nio.file.Files.createTempDirectory("maintain-lock-").toString
    val (waitWas, pollWas) = (GateStore.LockWaitMs, GateStore.LockPollMs)
    try {
      GateStore.LockWaitMs = 300; GateStore.LockPollMs = 50
      val bs = batches(8)
      val (cs, co) = (s"$root/cstore", s"$root/cout") // control
      val (ms, mo) = (s"$root/mstore", s"$root/mout")
      for (i <- 0 until 4) {
        StreamMediaDedup.processBatch(spark, bs(i), i.toLong, cs, co)
        StreamMediaDedup.processBatch(spark, bs(i), i.toLong, ms, mo)
      }
      // interleave INSIDE the fold: at the level0-merged tear point
      // (merge committed, ledger pending — the worst mid-compaction
      // state) a batch tries to run and must be excluded, loudly
      var batchRefusal: Option[IllegalStateException] = None
      GateStore.leveledFault = {
        case "level0-merged" =>
          batchRefusal = Some(intercept[IllegalStateException] {
            StreamMediaDedup.processBatch(spark, bs(4), 4L, ms, mo)
          })
        case _ => ()
      }
      val rep = StreamMediaDedup.maintain(spark, ms,
        GateStore.MaintenancePolicy(compactEvery = 4))
      GateStore.leveledFault = _ => ()
      assert(rep.compactions == Seq(3L))
      assert(batchRefusal.exists(_.getMessage.contains("locked by")),
        s"mid-fold batch was not refused: $batchRefusal")
      // the refused batch left nothing behind; run it for real now and
      // its verdicts equal the control's (the fold changed no rows)
      StreamMediaDedup.processBatch(spark, bs(4), 4L, ms, mo)
      StreamMediaDedup.processBatch(spark, bs(4), 4L, cs, co)
      assert(canon(spark.read.parquet(s"$mo/batch=4")) ==
        canon(spark.read.parquet(s"$co/batch=4")))
      // the reverse overlap: maintenance arriving while a writer holds
      // the lock SKIPS (deferrable), and runs once the writer releases
      for (i <- 5 until 8) {
        StreamMediaDedup.processBatch(spark, bs(i), i.toLong, ms, mo)
      }
      val skipped = GateStore.withStoreLock(ms, "writer-mid-batch",
        blocking = true) {
        StreamMediaDedup.maintain(spark, ms,
          GateStore.MaintenancePolicy(compactEvery = 4))
      }.get
      assert(skipped.compactions.isEmpty,
        "maintain compacted under a held writer lock")
      val after = StreamMediaDedup.maintain(spark, ms,
        GateStore.MaintenancePolicy(compactEvery = 4))
      assert(after.compactions == Seq(7L), s"post-release: ${after.compactions}")
    } finally {
      GateStore.leveledFault = _ => ()
      GateStore.LockWaitMs = waitWas; GateStore.LockPollMs = pollWas
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  test("a live long-running holder is never stale-broken: the heartbeat refreshes the lock") {
    val root = java.nio.file.Files.createTempDirectory("maintain-hb-").toString
    val staleWas = GateStore.LockStaleMs
    try {
      // generous staleness (vs the scenario's needs) so a CI scheduling
      // stall of the ~666 ms heartbeat can't fake a dead holder
      GateStore.LockStaleMs = 2000
      val bs = batches(4)
      val (ms, mo) = (s"$root/mstore", s"$root/mout")
      for (i <- bs.indices)
        StreamMediaDedup.processBatch(spark, bs(i), i.toLong, ms, mo)
      // hold the lock 3× past staleness: WITHOUT the heartbeat this
      // holder would look dead and a concurrent maintain would break
      // the lock and fold under it; WITH it the maintain must defer
      val duringHold = GateStore.withStoreLock(ms, "long-batch",
        blocking = true) {
        Thread.sleep(3 * GateStore.LockStaleMs)
        StreamMediaDedup.maintain(spark, ms,
          GateStore.MaintenancePolicy(compactEvery = 4)).compactions
      }.get
      assert(duringHold.isEmpty,
        "maintain stale-broke a live, heartbeat-refreshed lock")
      // once released, the same maintain runs
      val after = StreamMediaDedup.maintain(spark, ms,
        GateStore.MaintenancePolicy(compactEvery = 4))
      assert(after.compactions == Seq(3L))
    } finally {
      GateStore.LockStaleMs = staleWas
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  test("a stale lock (crashed holder) is broken, not wedging: the next acquirer proceeds") {
    val root = java.nio.file.Files.createTempDirectory("maintain-stale-").toString
    try {
      val bs = batches(4)
      val (ms, mo) = (s"$root/mstore", s"$root/mout")
      for (i <- bs.indices)
        StreamMediaDedup.processBatch(spark, bs(i), i.toLong, ms, mo)
      // a kill -9'd holder: lock present, timestamp ancient
      java.nio.file.Files.write(
        java.nio.file.Paths.get(ms, "_compaction_lock"),
        "batch=99@dead-process\n0\n".getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
      val rep = StreamMediaDedup.maintain(spark, ms,
        GateStore.MaintenancePolicy(compactEvery = 4))
      assert(rep.compactions == Seq(3L),
        s"stale lock wedged maintenance: ${rep.compactions}")
      assert(!new java.io.File(ms, "_compaction_lock").exists(),
        "lock not released after the pass")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  test("probes never mutate a store: check-only geometry, no planted pins, no materialized dirs, URIs refused") {
    val root = java.nio.file.Files.createTempDirectory("maintain-checkgeom-").toString
    try {
      // a legacy PRE-PIN store: probing it with any spec must not plant
      // that spec (the first mis-specced probe would poison every later
      // correct one) — and must not throw (the read decides)
      val legacy = s"$root/legacy"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(legacy))
      GateStore.checkGeometry(legacy, "sig:64/16")
      assert(!new java.io.File(legacy, "_geometry").exists(),
        "a read-side check planted a pin")
      // a mistyped path stays nonexistent instead of materializing a
      // marker-only junk directory
      val typo = s"$root/no-such-store"
      GateStore.checkGeometry(typo, "sig:64/16")
      assert(!new java.io.File(typo).exists(),
        "a read-side check materialized the store root")
      // a pinned store still refuses a mismatched read loudly
      GateStore.ensureGeometry(s"$root/pinned", "sig:64/16")
      val e = intercept[IllegalStateException] {
        GateStore.checkGeometry(s"$root/pinned", "sig:256/16")
      }
      assert(e.getMessage.contains("geometry"), e.getMessage)
      // the directory protocol is java.io.File-based: URI-schemed store
      // paths would run against a junk CWD-relative dir — refused loudly
      // at the marker layer (write AND read side)
      for (call <- Seq(
          () => GateStore.ensureGeometry("hdfs://nn/store", "sig:64/16"),
          () => GateStore.checkGeometry("s3a://bucket/store", "sig:64/16"),
          () => GateStore.claimOwner("file:///x/store", "out:/x/out"),
          // describe covers maintain: a URI path would snapshot a junk
          // CWD-relative dir as a clean empty store
          () => { StreamMediaDedup.describe("hdfs://nn/store"); () },
          () => { GateStore.withStoreLock("s3a://b/store", "t",
            blocking = false)(()); () }))
        assert(intercept[IllegalArgumentException](call())
          .getMessage.contains("locally-mounted"))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  test("contended stale break: racing acquirers get exactly one winner and never overlap") {
    val root = java.nio.file.Files.createTempDirectory("maintain-race-").toString
    try {
      val ms = s"$root/mstore"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(ms))
      // a kill -9'd holder: lock present, heartbeat ancient — every
      // racer below decides "stale" simultaneously; the tombstone
      // rename must hand the break to exactly one of them
      java.nio.file.Files.write(
        java.nio.file.Paths.get(ms, "_compaction_lock"),
        "batch=99@dead-process\n0\n".getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
      val n = 8
      val active = new java.util.concurrent.atomic.AtomicInteger
      val overlapped = new java.util.concurrent.atomic.AtomicBoolean
      val wins = new java.util.concurrent.atomic.AtomicInteger
      val returned = new java.util.concurrent.atomic.AtomicInteger
      val barrier = new java.util.concurrent.CyclicBarrier(n)
      val threads = (0 until n).map { i =>
        val t = new Thread(() => {
          barrier.await()
          GateStore.withStoreLock(ms, s"racer-$i", blocking = false) {
            if (active.incrementAndGet() > 1) overlapped.set(true)
            // hold until every OTHER racer's attempt has returned, so
            // a scheduling-delayed loser can't legitimately acquire
            // after our release and fake a second winner
            val deadline = System.nanoTime() + 10_000_000_000L
            while (returned.get() < n - 1 && System.nanoTime() < deadline)
              Thread.sleep(2)
            active.decrementAndGet()
            wins.incrementAndGet()
          }
          returned.incrementAndGet()
        }, s"race-$i")
        t.start(); t
      }
      threads.foreach(_.join(30000))
      assert(!overlapped.get(), "two racers held the store lock at once")
      assert(wins.get() == 1, s"expected exactly one winner, got ${wins.get()}")
      assert(!new java.io.File(ms, "_compaction_lock").exists(),
        "the winner's release left the lock behind")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  test("describe surfaces the lock: holder, heartbeat age, staleness verdict") {
    val root = java.nio.file.Files.createTempDirectory("maintain-lockinfo-").toString
    try {
      val ms = s"$root/mstore"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(ms))
      assert(StreamMediaDedup.describe(ms).lock.isEmpty)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(ms, "_compaction_lock"),
        "batch=99@dead-process\n0\n".getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
      val li = StreamMediaDedup.describe(ms).lock.get
      assert(li.holder == "batch=99@dead-process")
      assert(li.heartbeatAgeMs.exists(_ > GateStore.LockStaleMs) &&
        li.presumedStale)
      // a live hold is visible and fresh
      GateStore.withStoreLock(ms, "live-hold", blocking = true) {
        val held = StreamMediaDedup.describe(ms).lock.get
        assert(held.holder.startsWith("live-hold@") && !held.presumedStale,
          s"live holder misread: $held")
      }
      assert(StreamMediaDedup.describe(ms).lock.isEmpty,
        "lock still visible after release")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  test("bounded catch-up: a neglected store's fresh backlog drains in <=compactEvery-sized merges, verdicts unchanged") {
    val root = java.nio.file.Files.createTempDirectory("maintain-backlog-").toString
    try {
      import spark.implicits._
      val ms = s"$root/mstore"
      // 60 committed one-item batch dirs written directly in the bands
      // layout (synthesizing the neglect is the point — no writer ran
      // maintenance). Every dir plants a REAL media item's band rows
      // under a distinct id, so a probe of that item must see all 60
      // corpus dups before AND after maintenance.
      val media = Multimodal.mediaTable(spark, dir)
        .select(col("media_id"), col("payload"),
          col("meta.format").as("format"))
      val seed = Multimodal.mm9IndexRows(media)
        .orderBy(col("media_id"), col("band")).limit(4).collect()
      val probeId = seed.head.getLong(0)
      for (id <- 0 until 60)
        seed.toSeq.map(r => (id.toLong, r.getString(1), r.getInt(2),
            r.getString(3)))
          .toDF("media_id", "phash", "band", "bs")
          .coalesce(1).write.parquet(s"$ms/bands/batch=$id")
      def verdicts(): Set[(Long, Long, Long)] = {
        val live = GateStore.listBatchDirs(new java.io.File(s"$ms/bands"))
          .map(_._2)
        canon(Multimodal.mm9ProbeDirs(spark,
          media.filter(col("media_id") === probeId), live))
      }
      val before = verdicts()
      assert(before.size == 60, s"probe saw ${before.size} planted dups")
      val rep = StreamMediaDedup.maintain(spark, ms,
        GateStore.MaintenancePolicy(compactEvery = 8, fanout = 4))
      // 7 level-0 chunks of EXACTLY 8 dirs each (ids 0-55), one cascade
      // of the oldest 4 runs after the 4th chunk, 4 stragglers left
      // fresh — never one 60-dir rewrite
      assert(rep.compactions == Seq(7L, 15L, 23L, 31L, 31L, 39L, 47L, 55L),
        s"catch-up merges: ${rep.compactions}")
      assert(GateStore.readLevels(ms).toSet ==
        Set((1, 31L), (0, 39L), (0, 47L), (0, 55L)))
      assert(dirs(ms) == Seq(31L, 39L, 47L, 55L, 56L, 57L, 58L, 59L),
        s"post-catch-up dirs: ${dirs(ms)}")
      assert(verdicts() == before, "catch-up maintenance changed verdicts")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  test("an owned store refuses maintenance without the owner's name") {
    val root = java.nio.file.Files.createTempDirectory("maintain-own-").toString
    try {
      val bs = batches(4)
      val (ms, mo) = (s"$root/mstore", s"$root/mout")
      GateStore.claimOwner(ms, "curation-query-A")
      for (i <- bs.indices)
        StreamMediaDedup.processBatch(spark, bs(i), i.toLong, ms, mo)
      val policy = GateStore.MaintenancePolicy(compactEvery = 4)
      // no credential → refused before any Spark job
      val e1 = intercept[IllegalStateException] {
        StreamMediaDedup.maintain(spark, ms, policy)
      }
      assert(e1.getMessage.contains("owned"), e1.getMessage)
      // wrong credential → refused
      val e2 = intercept[IllegalStateException] {
        StreamMediaDedup.maintain(spark, ms,
          policy.copy(onBehalfOf = Some("curation-query-B")))
      }
      assert(e2.getMessage.contains("owned"), e2.getMessage)
      assert(dirs(ms) == Seq(0L, 1L, 2L, 3L), "a refused maintain touched the store")
      // the owner's name → maintenance runs
      val rep = StreamMediaDedup.maintain(spark, ms,
        policy.copy(onBehalfOf = Some("curation-query-A")))
      assert(rep.compactions == Seq(3L))
      assert(dirs(ms) == Seq(3L))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }
}
