package graft.sources

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Write-path round-trips: append, unique-key append, ordered CSV. */
class SinksSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  test("append accumulates rows across writes (S5/S6)") {
    val path = tmp("append")
    val docs = Tables.documents(spark, dir).select("doc_id", "source")
    Sinks.append(docs.filter(col("doc_id") < 100), path)
    Sinks.append(docs.filter(col("doc_id") >= 100 && col("doc_id") < 150), path)
    assert(spark.read.parquet(path).count() == 150)
  }

  test("appendUnique skips keys already in the sink (S7)") {
    val path = tmp("unique")
    val docs = Tables.documents(spark, dir).select("doc_id", "source")
    val n1 = Sinks.appendUnique(spark, docs.filter(col("doc_id") < 100), path, "doc_id")
    assert(n1 == 100)
    // overlapping second batch: only the 50 new keys land
    val n2 = Sinks.appendUnique(spark,
      docs.filter(col("doc_id") >= 50 && col("doc_id") < 150), path, "doc_id")
    assert(n2 == 50)
    val stored = spark.read.parquet(path)
    assert(stored.count() == 150)
    assert(stored.select("doc_id").distinct().count() == 150)
  }

  test("appendUnique single-writer contract: a re-fed batch is exactly-once") {
    // The contract (scaladoc on appendUnique): SEQUENTIAL writers get
    // exactly-once keys — the reference gets the same guarantee from its
    // store-side unique index (pipelines.py:64), here it comes from the
    // read-then-anti-join, which is why OVERLAPPING writers (both reading
    // before either's append lands) are out of contract.
    val path = tmp("refeed")
    val docs = Tables.documents(spark, dir).select("doc_id", "source")
      .filter(col("doc_id") < 80)
    val n1 = Sinks.appendUnique(spark, docs, path, "doc_id")
    assert(n1 == 80)
    // the DAG's next 30-minute tick re-fetches the same sitemap: no-op
    val n2 = Sinks.appendUnique(spark, docs, path, "doc_id")
    assert(n2 == 0)
    assert(spark.read.parquet(path).count() == 80)
  }

  test("appendUnique dedups within the incoming batch too (O-D1)") {
    val path = tmp("unique2")
    val docs = Tables.documents(spark, dir).select("doc_id", "source")
    val doubled = docs.filter(col("doc_id") < 20)
      .union(docs.filter(col("doc_id") < 20))
    val n = Sinks.appendUnique(spark, doubled, path, "doc_id")
    assert(n == 20)
  }

  test("appendUniqueConcurrent: a lost race is retried and drops the winner's keys") {
    // deterministic interleaving of the optimistic protocol via its
    // package-private steps: both writers snapshot the SAME (empty)
    // log, both stage data with overlapping keys, exactly one CAS wins
    // the commit slot, and the loser's retry anti-joins the winner's
    // now-visible keys away
    val path = tmp("uconc")
    val docs = Tables.documents(spark, dir).select("doc_id", "source")
    val batchA = docs.filter(col("doc_id") < 100)
    val batchB = docs.filter(col("doc_id") >= 50 && col("doc_id") < 150)
    val snap = Sinks.logEntries(path)
    assert(snap.isEmpty)
    val (dirA, nA) = Sinks.writeFresh(spark, batchA, path, "doc_id", snap)
    val (dirB, nB) = Sinks.writeFresh(spark, batchB, path, "doc_id", snap)
    assert(nA == 100 && nB == 100) // both computed fresh vs the same snapshot
    assert(Sinks.tryCommit(path, 0, dirA), "first committer must win slot 0")
    assert(!Sinks.tryCommit(path, 0, dirB), "second committer must lose slot 0")
    // the loser retries through the public API: only its 50 novel keys land
    val written = Sinks.appendUniqueConcurrent(spark, batchB, path, "doc_id")
    assert(written == 50, s"retry wrote $written")
    val stored = Sinks.readUnique(spark, path)
    assert(stored.count() == 150)
    assert(stored.select("doc_id").distinct().count() == 150)
    // the orphaned losing attempt is unreferenced; gc sweeps it
    Sinks.gcUnique(path, graceMs = 0L)
    assert(Sinks.readUnique(spark, path).count() == 150)
    val live = new java.io.File(path, "data").listFiles().map(_.getName).toSet
    assert(!live.contains(dirB.stripPrefix("data/")), "orphan dir survived gc")
  }

  test("gcUnique fences stalled writers: a swept dir can never be committed dangling") {
    // the race: a writer stalls longer than the grace between writeFresh
    // and tryCommit; gc sweeps its staged dir; the writer wakes up and
    // wins its commit slot anyway → a log entry referencing a deleted
    // dir, and readUnique fails permanently for every reader. The fix:
    // gc claims the next commit slot with a tombstone BEFORE deleting,
    // so the stalled writer's CAS deterministically loses and its retry
    // stages a fresh dir.
    val path = tmp("ugc")
    val docs = Tables.documents(spark, dir).select("doc_id", "source")
    val batchA = docs.filter(col("doc_id") < 50)
    val batchB = docs.filter(col("doc_id") >= 50 && col("doc_id") < 120)
    assert(Sinks.appendUniqueConcurrent(spark, batchA, path, "doc_id") == 50)
    // the stalled writer: staged against the current snapshot, no commit
    val snap = Sinks.logEntries(path)
    val (dirB, nB) = Sinks.writeFresh(spark, batchB, path, "doc_id", snap)
    assert(nB == 70)
    // gc with zero grace: sweeps the staged dir AND fences its slot
    Sinks.gcUnique(path, graceMs = 0L)
    assert(!new java.io.File(s"$path/$dirB").exists(), "staged dir not swept")
    // the writer wakes up: its CAS must LOSE (slot fenced), never publish
    assert(!Sinks.tryCommit(path, snap.size, dirB),
      "stalled writer won a fenced slot — dangling log entry published")
    // readers are never broken, before or after the writer's clean retry
    assert(Sinks.readUnique(spark, path).count() == 50)
    assert(Sinks.appendUniqueConcurrent(spark, batchB, path, "doc_id") == 70)
    val stored = Sinks.readUnique(spark, path)
    assert(stored.count() == 120)
    assert(stored.select("doc_id").distinct().count() == 120)
  }

  test("appendUniqueConcurrent refuses scheme-qualified paths (local-FS commit log)") {
    // on a non-local path the java.nio commit log would run against
    // each driver's own disk and every racer would win slot 0 — refuse
    // loudly instead of silently losing the uniqueness guarantee
    val docs = Tables.documents(spark, dir).select("doc_id", "source").limit(1)
    intercept[IllegalArgumentException] {
      Sinks.appendUniqueConcurrent(spark, docs, "hdfs://nn/sink", "doc_id")
    }
  }

  test("appendUniqueConcurrent: genuinely racing writers never duplicate a key") {
    // the real thing: two threads race the full loop on one session
    // (any interleaving must serialize through the commit log)
    val path = tmp("uconc2")
    val docs = Tables.documents(spark, dir).select("doc_id", "source")
    val batchA = docs.filter(col("doc_id") < 120)
    val batchB = docs.filter(col("doc_id") >= 60 && col("doc_id") < 180)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val (na, nb) = Await.result(
      Future(Sinks.appendUniqueConcurrent(spark, batchA, path, "doc_id"))
        .zip(Future(Sinks.appendUniqueConcurrent(spark, batchB, path, "doc_id"))),
      5.minutes)
    assert(na + nb == 180, s"wrote $na + $nb") // union of keys, each once
    val stored = Sinks.readUnique(spark, path)
    assert(stored.count() == 180)
    assert(stored.select("doc_id").distinct().count() == 180)
  }

  test("writeCsv round-trips with explicit field order and header (S8)") {
    val path = tmp("csv")
    val docs = Tables.documents(spark, dir)
      .filter(col("doc_id") < 50)
      // text can contain newlines/quotes — csv quoting handles it, but
      // keep the round-trip strict on simple columns
      .select("doc_id", "lang", "source", "n_chars")
    Sinks.writeCsv(docs, path, Seq("source", "doc_id", "lang", "n_chars"))
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    assert(back.columns.toSeq == Seq("source", "doc_id", "lang", "n_chars"))
    assert(back.count() == 50)
    val got = back.select("doc_id", "lang").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    val exp = docs.select("doc_id", "lang").collect()
      .map(r => (r.getLong(0).toInt, r.getString(1))).toSet
    assert(got == exp)
  }

  test("writeRangeSharded produces disjoint, internally sorted key ranges") {
    val path = tmp("shard")
    val docs = Tables.documents(spark, dir).select("doc_id", "lang")
    Sinks.writeRangeSharded(docs, path, "doc_id", shards = 4)
    // the plan must be range partitioning + non-global sort, no funnel
    val planned = docs.repartitionByRange(4, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
    planned.collect()
    val plan = planned.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), "no range exchange")
    assert("Sort \\[doc_id[^\\]]*\\], false".r.findFirstIn(plan).isDefined,
      "sort became global (funnel) or vanished")
    // every file covers a disjoint range and is internally sorted
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted
    assert(files.length >= 2, "expected multiple shards")
    val ranges = files.map { f =>
      val ids = spark.read.parquet(f).select("doc_id").collect().map(_.getLong(0))
      assert(ids.sameElements(ids.sorted), s"$f not sorted")
      (ids.min, ids.max)
    }
    ranges.sortBy(_._1).sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi < lo, "overlapping shard ranges")
      case _ =>
    }
    assert(spark.read.parquet(path).count() == docs.count())
  }

  test("writeJsonlShards partitions by domain, caps file sizes, round-trips") {
    val path = tmp("jsonl")
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "lang", "text")
    Sinks.writeJsonlShards(docs, path, "lang", maxRecordsPerFile = 50)
    // one directory per language, every shard under the record cap
    val langDirs = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("lang="))
    assert(langDirs.length >= 2, "expected one directory per domain")
    langDirs.foreach { d =>
      d.listFiles().filter(_.getName.endsWith(".json.gz")).foreach { f =>
        val n = spark.read.json(f.toString).count()
        assert(n <= 50, s"$f holds $n rows > cap")
      }
    }
    // lossless round-trip (lang comes back from the directory name)
    val back = spark.read.json(path)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val exp = docs.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(back == exp)
  }

  test("readJsonl splits good rows from quarantined corrupt lines losslessly") {
    import org.apache.spark.sql.types._
    val base = java.nio.file.Files.createTempDirectory("jsonl_read")
    val lines = Seq(
      """{"doc_id": 1, "text": "alpha", "lang": "en"}""",
      """{"doc_id": 2, "text": "beta", "lang": "fr"}""",
      """{"doc_id": 3, "text": "gamma""",             // truncated JSON
      """not json at all""",
      """{"doc_id": 4, "text": "delta", "lang": "de"}""")
    java.nio.file.Files.write(base.resolve("part-0.jsonl"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    val (good, corrupt) = Sinks.readJsonl(spark, base.toString, schema)
    assert(good.schema.fieldNames.toSeq == Seq("doc_id", "text", "lang"),
      "good frame must carry exactly the caller's schema")
    val g = good.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(g == Set((1L, "alpha"), (2L, "beta"), (4L, "delta")))
    val bad = corrupt.collect().map(_.getString(0)).toSet
    assert(bad == Set("""{"doc_id": 3, "text": "gamma""", "not json at all"),
      s"quarantine must carry the raw lines verbatim, got $bad")
    // round-trip against the writer's own output: nothing quarantined
    val docs = Tables.documents(spark, dir).select("doc_id", "lang", "text")
    val wPath = tmp("jsonl_rt")
    Sinks.writeJsonlShards(docs, wPath, "lang", maxRecordsPerFile = 500)
    val rtSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val (rtGood, rtBad) = Sinks.readJsonl(spark, wPath, rtSchema)
    assert(rtBad.count() == 0, "writer output must parse clean")
    assert(rtGood.count() == docs.count())
  }
}
