package graft

import graft.functions.TextFunctions._
import graft.queries.{Dedup, Multimodal, Relational, Text}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The full training-data curation flow, composed from the individual
  * operators the library ships — the end-to-end path a 100 TB corpus
  * takes from raw documents to packed training chunks:
  *
  *   ingest → quality gate → stratified rebalancing → exact dedup →
  *   near-dup cluster drop → benchmark decontamination →
  *   paragraph-level dedup → chunking → range-sharded write
  *
  * Every stage is one of the oracle-checked queries' operators applied
  * in sequence, so correctness is inherited; this object adds the
  * composition and the per-stage row accounting a curation run reports.
  *
  * Scale shape of the composition: the first three stages are map-only
  * filters that FUSE into the scan (one pass, no shuffle); exact dedup
  * shuffles 32-byte digests; the near-dup and decontamination stages
  * semi/anti-join against id sets that are tiny relative to the corpus
  * (duplicate-cluster members, contaminated ids) and broadcast; the
  * paragraph dedup decides on digest-only shuffles and moves surviving
  * paragraph text once (t19's shape); chunking is map-only explode; the
  * final write is one range exchange. Document text otherwise never
  * rides a shuffle except the digest-keyed exact dedup.
  */
object TrainingPipeline {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Test-only fault injection for the concurrent payload appends
    * ([[graft.streaming.GateStore.leveledFault]]'s doctrine): called
    * with the leg index at the start of each payload-append thread, so
    * a spec can hold a leg open (an interruptible sleep) and cancel
    * the batch mid-append deterministically — pinning the cancellation
    * envelope (jobs cancelled, no sentinel, replay repairs) instead of
    * trusting it. No-op in production.
    */
  private[graft] var payloadFault: Int => Unit = _ => ()

  /** Runs curation over `dir`'s documents; returns the final chunk
    * DataFrame and the per-stage row counts, and optionally writes the
    * chunks range-sharded by doc_id.
    */
  def curate(s: SparkSession, dir: String,
      outPath: Option[String] = None,
      minQuality: Double = 0.25,
      gopherGate: Boolean = false,
      semanticDedup: Boolean = false,
      shards: Int = 8): (DataFrame, Seq[(String, Long)]) = {
    val counts = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    // each stage boundary CHECKPOINTS (localCheckpoint: materialize +
    // truncate lineage). Truncation, not just caching, is load-bearing
    // twice over: a later stage never recomputes an earlier one's joins,
    // and the logical plan stays flat — seven nested stage lineages
    // otherwise grow the per-action plan walk (Catalyst analysis, plan
    // descriptions) super-linearly. A cluster run would use
    // reliable checkpoints on DFS; local[] uses executor storage.
    // Every stage consumes only its predecessor, so once the new
    // checkpoint has materialized the previous stage's blocks are
    // unpersisted — executor storage stays one-stage-deep across the
    // run instead of growing to seven pinned copies of the corpus
    // (TrainingPipelineSpec asserts the bound; only the returned chunk
    // frame stays persisted for the caller).
    var prevStage: Checkpoints.Checkpointed = null
    def stage(name: String, df: DataFrame): DataFrame = {
      val cp = Checkpoints.eager(df)
      counts += name -> cp.df.count()
      if (prevStage != null) prevStage.release()
      prevStage = cp
      cp.df
    }

    val docs = stage("ingest", Tables.documents(s, dir))

    // map-only gates — Catalyst fuses all three into the scan pass.
    // With gopherGate on, the t22 rule battery (native gopher_flags
    // bitmask) ANDs into the same fused filter — still zero shuffle.
    val qualityPred = {
      val base = qualityScore(col("text")) >= minQuality
      if (gopherGate) base && expr("gopher_flags(text)") === 127 else base
    }
    val gated = stage("quality_gate", docs.filter(qualityPred))
    val sampled = stage("stratified_sample",
      gated.filter(Relational.stratifiedKeep(col("doc_id"), col("lang"))))

    // exact dedup: min doc_id survives per content digest
    val keepers = sampled
      .groupBy(fingerprint(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val exact = stage("exact_dedup",
      sampled.join(keepers, Seq("doc_id"), "left_semi"))

    val chunks = backHalf(s, dir, exact, stage, semanticDedup)

    outPath.foreach(p =>
      graft.sources.Sinks.writeRangeSharded(chunks, p, "doc_id", shards))
    (chunks, counts.toSeq)
  }

  /** The corpus-global BACK HALF of curation — near-dup cluster drop →
    * (optional) semantic dedup → benchmark decontamination → paragraph
    * dedup → chunking — over an
    * already quality-gated, exactly-deduped survivor frame. Shared
    * verbatim by the all-batch [[curate]] and the streaming-front
    * hybrid (StreamCuration's sink feeds straight into this;
    * StreamCurationSpec pins hybrid == batch end-to-end), so the
    * "streaming hygiene, batch global dedup" split runs the same code
    * path rather than a re-implementation. `stage` is the caller's
    * checkpoint/accounting hook; the default materializes each stage
    * boundary (a pass-through would leave the near-dup/decontamination
    * anti-joins self-referencing one lineage — conflicting attribute
    * ids) but never releases — a long-lived caller should pass its own
    * hook, as [[curate]] does, or sweep persistent RDDs afterwards.
    */
  def backHalf(s: SparkSession, dir: String, exact: DataFrame,
      stage: (String, DataFrame) => DataFrame =
        (_, df) => Checkpoints.eager(df).df,
      semanticDedup: Boolean = false): DataFrame = {
    // near-dup clusters: keep exactly one member per cluster. The
    // canonical member is chosen AMONG THIS RUN'S SURVIVORS — the
    // corpus-wide min doc_id may already have fallen to the quality
    // gate or the stratified sample, and dropping the precomputed
    // non-canonical set would then silently erase the whole cluster
    // (no representative at all). Cluster members are a tiny fraction
    // of the corpus → broadcast both the label join and the drop list.
    val (clusterLabels, ccHandle) = Dedup.d7DupClustersHandle(s, dir)
    val members = exact.select(col("doc_id"))
      .join(broadcast(clusterLabels), Seq("doc_id"))
    val dupDrop = members
      .withColumn("keep_id",
        min(col("doc_id")).over(Window.partitionBy(col("cluster"))))
      .filter(col("doc_id") =!= col("keep_id"))
      .select(col("doc_id"))
    val deduped = stage("near_dup_drop",
      exact.join(broadcast(dupDrop), Seq("doc_id"), "left_anti"))
    // the dedup stage is materialized by `stage` — release the d7 label
    // frame's pinned blocks right away
    ccHandle.release()

    // OPTIONAL semantic dedup (SemDeDup, the modern stack's extra pass):
    // an embedding-space clone shares no shingle with its source, so the
    // text-side near-dup stage above can't see it. The two-level d9
    // quantizer runs over the CURRENT SURVIVORS' vectors only (vec_id
    // aligns with doc_id in this corpus, TESTDATA.md), and the drop set
    // — non-survivors of this stage's own input — broadcasts like every
    // other drop list here. A document without an embedding row is
    // never dropped (the drop set is built from the embedding side).
    val semDeduped =
      if (!semanticDedup) deduped
      else {
        import graft.functions.SimFunctions.{toDoubleVec, l2Norm}
        val emb = Tables.embeddings(s, dir)
          .select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
          .withColumn("nrm", l2Norm(col("v")))
          .join(deduped.select(col("doc_id").as("vec_id")), Seq("vec_id"))
        val keep = Dedup.semDedup(emb, Dedup.SemDedupThr)
          .select(col("vec_id").as("doc_id"))
        val dropSet = emb.select(col("vec_id").as("doc_id"))
          .join(keep, Seq("doc_id"), "left_anti")
        stage("semantic_dedup",
          deduped.join(broadcast(dropSet), Seq("doc_id"), "left_anti"))
      }

    // benchmark decontamination: drop flagged ids (same broadcast shape)
    val contaminated = Dedup.d6Decontaminate(s, dir)
    val clean = stage("decontaminate",
      semDeduped.join(broadcast(contaminated), Seq("doc_id"), "left_anti"))

    // corpus-wide paragraph dedup (t19's core): strip spans already seen
    // at a lower (doc_id, idx); a document reduced to nothing drops out
    // of the inner join entirely
    val paraDeduped = stage("paragraph_dedup",
      clean.drop("text").join(
        Text.paragraphDedupFrame(clean.select(col("doc_id"), col("text")))
          .select(col("doc_id"), col("body").as("text")),
        Seq("doc_id")))

    // chunk the survivors 128/96 (same grid as t16)
    stage("chunk", chunkFrame(paraDeduped))
  }

  /** t16's 128/96 chunk grid over a (doc_id, source, text, ...) frame —
    * shared by [[backHalf]] and [[curateIncremental]]. Map-only explode.
    */
  private def chunkFrame(docs: DataFrame): DataFrame = {
    val chunkTokens = slice(col("t"), col("chunk_id") * 96 + 1, lit(128))
    docs.select(col("doc_id"), col("source"), tokenize(col("text")).as("t"))
      .filter(size(col("t")) > 0)
      .select(col("doc_id"), col("source"), col("t"),
        explode(sequence(lit(0),
          floor((size(col("t")) - 1) / 96.0).cast("int"))).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"), col("source"),
        array_join(chunkTokens, " ").as("chunk"),
        size(chunkTokens).as("n_tok"))
  }

  /** Incremental curation — the DAILY-SHARD path: one ingest batch is
    * gated against a PERSISTENT corpus store (the d19WriteStore layout)
    * instead of re-running [[curate]] over the whole corpus per ingest:
    *
    *   quality gate (map-only) → exact dedup within the batch →
    *   near-dup gate vs the persisted MinHash index (d19ProbeStored:
    *   corpus text never rescanned) → benchmark decontamination
    *   (broadcast gram probe) → ACCEPTED docs' bands + shingles appended
    *   to the store → chunking.
    *
    * The gate's contract is corpus-novelty: a batch doc near-dupping any
    * already-accepted corpus doc is dropped (the corpus copy survives).
    * Intra-batch NEAR-dups (distinct fingerprints) both pass — each is
    * novel vs the corpus — and fall to the next corpus-global d7/d15
    * pass, exactly like production ingest gates; intra-batch EXACT dups
    * are dropped here. Per batch the corpus-proportional work is one
    * bands-index scan (32 small rows per corpus doc, measured flat in
    * SCALING.md's d19 receipt); everything else is batch-sized.
    *
    * `benchDir` supplies the benchmark set (the same `% 97` eval slice
    * d6 gates on). Returns the batch's chunk frame + per-stage counts.
    *
    * MULTIMODAL GATES (optional, the d20/mm9 stores): when the batch
    * carries an embedding table (`batchEmbeddings`, vec_id == doc_id —
    * TESTDATA.md's alignment, the same one backHalf's semantic dedup
    * uses) and an `embedStoreDir` (the d20WriteStore layout), docs
    * whose VECTORS near-dup an already-accepted corpus vector are
    * dropped at an `embed_dup_gate` stage — an embedding-space clone
    * shares no shingle with its source, so the text gate cannot see it
    * (the SemDeDup rationale, incremental form). Likewise `batchMedia`
    * ((media_id, payload, format), media_id == doc_id) +
    * `mediaStoreDir` (mm9WriteStore layout) adds a `media_dup_gate` on
    * perceptual-hash near-dups. A doc WITHOUT an embedding/media row is
    * never dropped by these gates (the probes see survivors' rows
    * only). Accepted docs' sig/band rows are appended to each store
    * after decontamination, payloads-before-index, so the next batch's
    * gates see them. Every store handed to this API must be SEEDED
    * from a NON-EMPTY corpus (d19WriteStore / d20WriteStore /
    * mm9WriteStore): the probes read the store tables unconditionally,
    * and a bucket-partitioned write of ZERO rows produces no data files
    * for the read to infer a schema from. Bootstrapping a truly empty
    * corpus means running the first batch through [[curate]] (or a
    * direct store build from it) and gating from the second batch on.
    *
    * SINGLE-DELIVERY contract: this API has no replay sentinel — a
    * re-presented batch would append its bands twice and then near-dup
    * against its own first delivery. Drive at-least-once sources
    * through [[graft.streaming.StreamNearDedup]], whose batch-directory
    * sentinel makes replays no-ops, and call this from exactly-once
    * orchestration only.
    */
  def curateIncremental(s: SparkSession, batch: DataFrame, storeDir: String,
      benchDir: String, outPath: Option[String] = None,
      minQuality: Double = 0.25, shards: Int = 8,
      batchEmbeddings: Option[DataFrame] = None,
      embedStoreDir: Option[String] = None,
      batchMedia: Option[DataFrame] = None,
      mediaStoreDir: Option[String] = None)
      : (DataFrame, Seq[(String, Long)]) = {
    // a one-sided modality pair would SILENTLY skip both the gate and
    // the store append — the misconfiguration must be loud, not a
    // permanently ungated corpus discovered months later
    require(batchEmbeddings.isDefined == embedStoreDir.isDefined,
      "batchEmbeddings and embedStoreDir must be supplied together")
    require(batchMedia.isDefined == mediaStoreDir.isDefined,
      "batchMedia and mediaStoreDir must be supplied together")
    val counts = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    var prevStage: Checkpoints.Checkpointed = null
    def stage(name: String, df: DataFrame): DataFrame = {
      val cp = Checkpoints.eager(df)
      counts += name -> cp.df.count()
      if (prevStage != null) prevStage.release()
      prevStage = cp
      cp.df
    }

    val ingested = stage("ingest", batch)
    val gated = stage("quality_gate",
      ingested.filter(qualityScore(col("text")) >= minQuality))
    val keepers = gated
      .groupBy(fingerprint(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val exact = stage("exact_dedup",
      gated.join(keepers, Seq("doc_id"), "left_semi"))

    // near-dup gate against the persistent index — drop ids are batch-
    // sized (a subset of the batch), so the anti-join broadcasts. The
    // eagerBuild THUNK brackets the probe's construction, capturing the
    // internal caches its bucket-list collect pins (Checkpoints doc);
    // released as soon as the stage materializes.
    val gate = Checkpoints.eagerBuild(s)(
      Dedup.d19ProbeStored(s, exact, storeDir)
        .select(col("new_id").as("doc_id")).distinct())
    val novel =
      try stage("near_dup_gate",
        exact.join(broadcast(gate.df), Seq("doc_id"), "left_anti"))
      finally gate.release() // stage() is eager, so releasing here is safe

    // embedding near-dup gate (the d20 store): probe the SURVIVORS'
    // vectors only — already-dropped docs cost no probe work, and a doc
    // without an embedding row is simply not probed
    val embedGated = (batchEmbeddings, embedStoreDir) match {
      case (Some(embs), Some(eStore)) =>
        val survivorVecs = embs.select(col("vec_id"), col("embedding"))
          .join(novel.select(col("doc_id").as("vec_id")), Seq("vec_id"))
        val eGate = Checkpoints.eagerBuild(s)(
          Dedup.d20ProbeStored(s, survivorVecs, eStore)
            .select(col("new_id").as("doc_id")).distinct())
        try stage("embed_dup_gate",
          novel.join(broadcast(eGate.df), Seq("doc_id"), "left_anti"))
        finally eGate.release()
      case _ => novel
    }

    // media near-dup gate (the mm9 store): same survivor-only shape;
    // payloads are decoded and hashed map-side and never shuffle
    val mediaGated = (batchMedia, mediaStoreDir) match {
      case (Some(media), Some(mStore)) =>
        val survivorMedia = media
          .select(col("media_id"), col("payload"), col("format"))
          .join(embedGated.select(col("doc_id").as("media_id")),
            Seq("media_id"))
        val mGate = Checkpoints.eagerBuild(s)(
          Multimodal.mm9ProbeStored(s, survivorMedia, mStore)
            .select(col("new_id").as("doc_id")).distinct())
        try stage("media_dup_gate",
          embedGated.join(broadcast(mGate.df), Seq("doc_id"), "left_anti"))
        finally mGate.release()
      case _ => embedGated
    }

    // decontaminate the batch against the benchmark gram set (d6's
    // slice and gram width; the bench dim broadcasts, the batch is the
    // only scanned side)
    def grams(d: DataFrame): DataFrame = d.select(col("doc_id"),
      explode(shingles(tokenize(col("text")), 4)).as("g"))
    val bench = grams(Tables.documents(s, benchDir)
        .filter(col("doc_id") % 97 === 0))
      .select(col("g")).distinct()
    val contaminated = grams(mediaGated)
      .join(broadcast(bench), Seq("g"), "left_semi")
      .select(col("doc_id")).distinct()
    val clean = stage("decontaminate",
      mediaGated.join(broadcast(contaminated), Seq("doc_id"), "left_anti"))

    // append the ACCEPTED docs to the store so the NEXT batch's gate
    // sees them — shingles (verify payloads) FIRST, bands (probe index)
    // LAST: GateStore's append-order contract (see its scaladoc for the
    // full argument), doubly load-bearing here because under the
    // single-delivery contract a crash-orphaned index row has NO retry
    // path at all.
    Checkpoints.sweep(s) {
      val sh = Dedup.shingleSetsOf(clean).cache()
      sh.withColumn("bucket",
          pmod(xxhash64(col("doc_id")), lit(Dedup.D19Buckets.toLong)))
        .repartition(col("bucket")) // small-files guard (sigStoreRows' note)
        .write.mode("append").partitionBy("bucket")
        .parquet(s"$storeDir/shingles")
      Dedup.minhashBands(sh).write.mode("append").parquet(s"$storeDir/bands")
    }

    // accepted docs' vector/media index rows join their stores too —
    // same payloads-first discipline per store
    (batchEmbeddings, embedStoreDir) match {
      case (Some(embs), Some(eStore)) => Checkpoints.sweep(s) {
        Dedup.sigStoreRows(embs
            .join(clean.select(col("doc_id").as("vec_id")), Seq("vec_id")))
          .write.mode("append").partitionBy("bucket").parquet(s"$eStore/sigs")
      }
      case _ => ()
    }
    (batchMedia, mediaStoreDir) match {
      case (Some(media), Some(mStore)) => Checkpoints.sweep(s) {
        Multimodal.mm9IndexRows(media
            .select(col("media_id"), col("payload"), col("format"))
            .join(clean.select(col("doc_id").as("media_id")), Seq("media_id")))
          .write.mode("append").parquet(s"$mStore/bands")
      }
      case _ => ()
    }

    val chunks = stage("chunk", chunkFrame(clean))
    outPath.foreach(p =>
      graft.sources.Sinks.writeRangeSharded(chunks, p, "doc_id", shards))
    (chunks, counts.toSeq)
  }

  /** The unified verdict-frame schema [[curateIncrementalBatch]]
    * publishes per batch: one row per (gate, probe pair), `score` is
    * the gate's native measure (jaccard / cosine / hamming) widened to
    * double.
    */
  val VerdictsDdl: String =
    "modality STRING, new_id BIGINT, dup_of BIGINT, score DOUBLE"

  /** Schema of the published chunk frame ([[chunkFrame]]'s shape). */
  val ChunksDdl: String =
    "doc_id BIGINT, chunk_id INT, source STRING, chunk STRING, n_tok INT"

  /** Published verdicts of one curated batch, read back in the exact
    * [[VerdictsDdl]] shape from WHICHEVER layout the batch was written
    * in — the flat per-table layout (`outDir/verdicts/batch=<id>`) or
    * the folded single-write layout `foldWrites = true` produces
    * (`outDir/curated/batch=<id>/kind=verdicts`). A batch with no
    * verdict rows (bootstrap) reads as an empty frame of the right
    * schema either way — the folded write emits no partition dir for
    * an empty side, and reading a data-less dir would otherwise throw.
    */
  def readVerdicts(s: SparkSession, outDir: String, batchId: Long): DataFrame =
    readPublished(s, outDir, batchId, "verdicts", VerdictsDdl)

  /** Published chunks of one curated batch — layout-agnostic twin of
    * [[readVerdicts]] in the [[ChunksDdl]] shape.
    */
  def readChunks(s: SparkSession, outDir: String, batchId: Long): DataFrame =
    readPublished(s, outDir, batchId, "chunks", ChunksDdl)

  private def readPublished(s: SparkSession, outDir: String, batchId: Long,
      kind: String, ddl: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(ddl)
    val foldedRoot = new java.io.File(s"$outDir/curated/batch=$batchId")
    val folded = new java.io.File(foldedRoot, s"kind=$kind")
    val flat = new java.io.File(s"$outDir/$kind/batch=$batchId")
    // the folded layout is only trusted when its write COMMITTED
    // (_SUCCESS at the batch root): a torn folded write followed by a
    // flat-layout retry must not shadow the repaired data with its
    // partial remnants — the same commit-marker doctrine as
    // GateStore.alreadyMerged. But a COMMITTED fold is AUTHORITATIVE,
    // empty sides included: a fold whose requested kind legitimately
    // wrote zero rows (no kind= dir — zero-row partitioned writes emit
    // none) reads as the empty frame and never falls through to a
    // stale flat dir from an earlier layout of the same batch.
    val foldedCommitted = new java.io.File(foldedRoot, "_SUCCESS").exists()
    val readable =
      if (foldedCommitted)
        Some(folded).filter(graft.streaming.GateStore.hasDataFiles)
      else Some(flat).filter(graft.streaming.GateStore.hasDataFiles)
    readable match {
      case Some(d) =>
        s.read.parquet(d.toString).select(schema.fields.toSeq.map(f => col(f.name)): _*)
      case None =>
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
  }

  /** [[curateIncremental]] made REPLAY-SAFE — the at-least-once edition
    * that can sit directly in a streaming foreachBatch
    * ([[graft.streaming.StreamCuration.triGateSink]] curries it): same
    * stages, same gate semantics, but every store is the
    * [[graft.streaming.GateStore]] batch-directory layout instead of a
    * flat append, and the whole batch commits under ONE replay
    * sentinel — the TEXT store's `bands/batch=<id>` commit marker,
    * written LAST across all three stores (GateStore's append-order
    * contract). A re-presented batch id finds the sentinel (or the
    * compaction marker vouching for it) and is a byte-identical no-op;
    * a crash at ANY earlier point leaves only overwrite-mode partial
    * output the re-delivery fully repairs, because every write this
    * method performs is deterministic in (batch content, prior stores)
    * and prior stores are read strictly below `batchId`.
    *
    * Differences from the single-delivery API, beyond the sentinel:
    *  - BOOTSTRAP: stores need no seeding. Batch 0 (no prior
    *    data-bearing dirs) probes nothing, passes every gate, and
    *    seeds all three stores — the empty-corpus bootstrap
    *    curateIncremental's flat layout cannot express.
    *  - VERDICTS are published, not just counted: one frame
    *    ([[VerdictsDdl]]) unioning the three gates' probe pairs lands
    *    at `outDir/verdicts/batch=<id>`; chunks at
    *    `outDir/chunks/batch=<id>`; per-stage row counts at
    *    `outDir/stage_counts/batch=<id>`.
    *  - Store maintenance is the gates' own: compact via
    *    StreamNearDedup/StreamEmbedDedup/StreamMediaDedup.compact on
    *    the respective store roots.
    *
    * `sigSpec` picks the embedding-signature geometry (SigWide for
    * production-scale stores) and `mhSpec` the text gate's MinHash
    * banding ([[Dedup.MinHashSharp]] for near-clone production gates);
    * one store, one geometry, for life. `probeDepth` turns on the embed
    * gate's multi-probe recall dial ([[Dedup.d20ProbeDirs]]) and
    * `mediaProbeDepth` the media gate's ([[Multimodal.mm9Probe]];
    * depth 1 certifies the full hamming-6 radius). `stageCounts = false` drops the
    * per-stage accounting — each stage's eager count() is a full Spark
    * job, and at production batch sizes the 8 count jobs plus the
    * stage_counts write are pure fixed floor (TriGateScaleProbe's ~8 s
    * breakdown); with counts off the `stage_counts` table is simply
    * not written and verdicts/chunks are byte-identical (spec-pinned).
    * `foldWrites = true` shrinks the floor further: verdicts + chunks
    * land as ONE kind-partitioned write under `outDir/curated/batch=
    * <id>` instead of two jobs (read them back via [[readVerdicts]] /
    * [[readChunks]] — row-identical to the flat layout, spec-pinned),
    * and the three stores' PAYLOAD appends (shingles / sigs / media
    * bands) are submitted concurrently — the append-order contract
    * only sequences payloads BEFORE the text-bands sentinel, not among
    * themselves, so the sink still joins all payload jobs before the
    * sentinel write. Same job count on the appends, one fewer publish
    * job, and the payload jobs overlap instead of queueing.
    */
  def curateIncrementalBatch(s: SparkSession, batch: DataFrame,
      batchId: Long, storeDir: String, benchDir: String, outDir: String,
      minQuality: Double = 0.25,
      batchEmbeddings: Option[DataFrame] = None,
      embedStoreDir: Option[String] = None,
      batchMedia: Option[DataFrame] = None,
      mediaStoreDir: Option[String] = None,
      sigSpec: Dedup.SigSpec = Dedup.SigNarrow,
      probeDepth: Int = 0,
      stageCounts: Boolean = true,
      foldWrites: Boolean = false,
      mediaProbeDepth: Int = 0,
      mhSpec: Dedup.MinHashSpec = Dedup.MinHashDefault): Unit = {
    import graft.streaming.GateStore
    require(batchEmbeddings.isDefined == embedStoreDir.isDefined,
      "batchEmbeddings and embedStoreDir must be supplied together")
    require(batchMedia.isDefined == mediaStoreDir.isDefined,
      "batchMedia and mediaStoreDir must be supplied together")
    // fail-fast probeDepth validation, even when no embed/media store
    // is wired this run — a bad dial must not lie dormant until the
    // first batch that happens to carry that modality
    Dedup.d20ProbeMasks(sigSpec.bandBits, probeDepth)
    Dedup.d20ProbeMasks(Multimodal.PhashBandChars, mediaProbeDepth)
    // loud geometry pins BEFORE the replay early-return: a mis-specced
    // caller should fail on its first touch of ANY store, not only on
    // the first unprocessed batch (GateStore.ensureGeometry's contract).
    // All three stores have shape parameters — text shingle/banding,
    // embed SigSpec, media pHash banding — and all three pin them.
    GateStore.ensureGeometry(storeDir, mhSpec.geometryId)
    embedStoreDir.foreach(GateStore.ensureGeometry(_, sigSpec.geometryId, sigSpec.legacyGeometryIds))
    mediaStoreDir.foreach(
      GateStore.ensureGeometry(_, graft.streaming.StreamMediaDedup.Geometry))
    if (GateStore.alreadyMerged(storeDir, "bands", batchId)) return

    // the whole batch holds every wired store's lock (text, then embed,
    // then media — one fixed order, and the only other takers either
    // skip or bounded-wait, so no deadlock): an out-of-band maintain
    // pass can never fold a store's dirs out from under this batch's
    // probes, and maintenance arriving mid-batch defers (GateStore.
    // withStoreLock's contract).
    def withLocks(dirs: Seq[String])(body: => Unit): Unit = dirs match {
      case Seq() => body
      case d +: rest =>
        GateStore.withStoreLock(d, s"batch=$batchId", blocking = true)(
          withLocks(rest)(body))
        ()
    }
    // the payload-append cancellation path defers its interrupt-flag
    // restore to THIS outermost frame: restoring before the throw would
    // let the sweep/lock finallys' own blocking calls (unpersist's
    // askSync, marker I/O) see the flag, throw a fresh
    // InterruptedException that REPLACES the batch's real failure, and
    // consume the flag on the way
    var deferredInterrupt = false
    try withLocks(Seq(storeDir) ++ embedStoreDir ++ mediaStoreDir) {
    // exception safety: the per-stage and per-probe releases below run
    // on the SUCCESS path only; a mid-batch failure (and its
    // at-least-once retry) would otherwise leak every localCheckpoint
    // pinned so far, once per attempt. sweep() brackets the whole batch
    // as the backstop — the inner early releases still matter (they cap
    // PEAK storage inside the batch), the sweep guarantees zero leaks
    // on ANY exit. Double-release is a no-op (unpersist is idempotent).
    Checkpoints.sweep(s) {
      // prior store partitions: strictly below this batch, data-bearing
      // (zero-row committed dirs are sentinels, not readable inputs)
      def prior(root: String, table: String): Seq[String] =
        GateStore.listBatchDirs(new java.io.File(s"$root/$table"))
          .filter { case (id, p) =>
            id < batchId && GateStore.hasDataFiles(new java.io.File(p)) }
          .map(_._2)

      val counts = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      var prevStage: Checkpoints.Checkpointed = null
      def stage(name: String, df: DataFrame): DataFrame = {
        val cp = Checkpoints.eager(df)
        // the checkpoint itself stays either way (it caps recompute and
        // lets the predecessor release); only the count() JOB is on the
        // stageCounts dial — one full job per stage, pure floor when
        // nobody reads the accounting
        if (stageCounts) counts += name -> cp.df.count()
        if (prevStage != null) prevStage.release()
        prevStage = cp
        cp.df
      }

      val ingested = stage("ingest", batch)
      val gated = stage("quality_gate",
        ingested.filter(qualityScore(col("text")) >= minQuality))
      val keepers = gated
        .groupBy(fingerprint(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"))
      val exact = stage("exact_dedup",
        gated.join(keepers, Seq("doc_id"), "left_semi"))

      // the three gates, each probing only its predecessor's SURVIVORS
      // (curateIncremental's shape). The probe checkpoints are held until
      // the verdict union is WRITTEN — a released localCheckpoint cannot
      // be re-read, so releasing at stage time would lose the pair rows
      // the verdict frame publishes.
      val textPrior = prior(storeDir, "bands")
      val textV =
        if (textPrior.isEmpty) None
        else Some(Checkpoints.eagerBuild(s)(Dedup.d19ProbeDirs(
          s, exact, textPrior, prior(storeDir, "shingles"), mhSpec)))
      val novel = textV match {
        case None => stage("near_dup_gate", exact)
        case Some(cp) => stage("near_dup_gate",
          exact.join(broadcast(cp.df.select(col("new_id").as("doc_id")).distinct()),
            Seq("doc_id"), "left_anti"))
      }

      val embedV = (batchEmbeddings, embedStoreDir) match {
        case (Some(embs), Some(eStore)) if prior(eStore, "sigs").nonEmpty =>
          val survivorVecs = embs.select(col("vec_id"), col("embedding"))
            .join(novel.select(col("doc_id").as("vec_id")), Seq("vec_id"))
          Some(Checkpoints.eagerBuild(s)(Dedup.d20ProbeDirs(
            s, survivorVecs, prior(eStore, "sigs"), sigSpec, probeDepth)))
        case _ => None
      }
      val embedGated =
        if (embedStoreDir.isEmpty) novel
        else embedV match {
          case None => stage("embed_dup_gate", novel)
          case Some(cp) => stage("embed_dup_gate",
            novel.join(broadcast(cp.df.select(col("new_id").as("doc_id")).distinct()),
              Seq("doc_id"), "left_anti"))
        }

      val mediaV = (batchMedia, mediaStoreDir) match {
        case (Some(media), Some(mStore)) if prior(mStore, "bands").nonEmpty =>
          val survivorMedia = media
            .select(col("media_id"), col("payload"), col("format"))
            .join(embedGated.select(col("doc_id").as("media_id")),
              Seq("media_id"))
          Some(Checkpoints.eagerBuild(s)(Multimodal.mm9ProbeDirs(
            s, survivorMedia, prior(mStore, "bands"), mediaProbeDepth)))
        case _ => None
      }
      val mediaGated =
        if (mediaStoreDir.isEmpty) embedGated
        else mediaV match {
          case None => stage("media_dup_gate", embedGated)
          case Some(cp) => stage("media_dup_gate",
            embedGated.join(broadcast(cp.df.select(col("new_id").as("doc_id")).distinct()),
              Seq("doc_id"), "left_anti"))
        }

      // decontaminate (d6's slice and gram width, curateIncremental's shape)
      def grams(d: DataFrame): DataFrame = d.select(col("doc_id"),
        explode(shingles(tokenize(col("text")), 4)).as("g"))
      val bench = grams(Tables.documents(s, benchDir)
          .filter(col("doc_id") % 97 === 0))
        .select(col("g")).distinct()
      val contaminated = grams(mediaGated)
        .join(broadcast(bench), Seq("g"), "left_semi")
        .select(col("doc_id")).distinct()
      val clean = stage("decontaminate",
        mediaGated.join(broadcast(contaminated), Seq("doc_id"), "left_anti"))

      // ---- publish, then append, sentinel LAST (GateStore contract) ----
      // 1. the unified verdict frame
      val verdictParts =
        textV.map(_.df.select(lit("text").as("modality"), col("new_id"),
          col("dup_of"), col("jaccard").cast("double").as("score"))) ++
        embedV.map(_.df.select(lit("embed").as("modality"), col("new_id"),
          col("dup_of"), col("cos").cast("double").as("score"))) ++
        mediaV.map(_.df.select(lit("media").as("modality"), col("new_id"),
          col("dup_of"), col("hamming").cast("double").as("score")))
      val verdicts = verdictParts.reduceOption(_.unionByName(_)).getOrElse(
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(VerdictsDdl)))
      if (foldWrites) {
        // one frame, one write: verdicts and chunks union under a
        // `kind` discriminator (null-padded to the superset schema) and
        // land in a single kind-partitioned job. readVerdicts/readChunks
        // project the exact per-table shapes back out; an empty side
        // simply has no kind= partition dir (zero-row partitioned
        // writes emit none — the readers' data-less fallback).
        def nul(t: String, n: String) = lit(null).cast(t).as(n)
        val vSide = verdicts.select(lit("verdicts").as("kind"),
          col("modality"), col("new_id"), col("dup_of"), col("score"),
          nul("bigint", "doc_id"), nul("int", "chunk_id"),
          nul("string", "source"), nul("string", "chunk"), nul("int", "n_tok"))
        val cSide = chunkFrame(clean).select(lit("chunks").as("kind"),
          nul("string", "modality"), nul("bigint", "new_id"),
          nul("bigint", "dup_of"), nul("double", "score"),
          col("doc_id"), col("chunk_id"), col("source"),
          col("chunk"), col("n_tok"))
        vSide.unionByName(cSide).write.mode("overwrite")
          .partitionBy("kind").parquet(s"$outDir/curated/batch=$batchId")
        Seq(textV, embedV, mediaV).flatten.foreach(_.release())
      } else {
        verdicts.write.mode("overwrite").parquet(s"$outDir/verdicts/batch=$batchId")
        Seq(textV, embedV, mediaV).flatten.foreach(_.release())

        // 2. chunks (written straight to disk — no checkpoint needed,
        //    the stage count reads the committed file back)
        chunkFrame(clean).write.mode("overwrite")
          .parquet(s"$outDir/chunks/batch=$batchId")
      }

      // 3. per-stage accounting (stageCounts dial: the chunk re-read +
      //    count and the coalesced write are two more floor jobs)
      if (stageCounts) {
        counts += "chunk" -> readChunks(s, outDir, batchId).count()
        import s.implicits._
        counts.toSeq.toDF("stage", "rows").coalesce(1)
          .write.mode("overwrite").parquet(s"$outDir/stage_counts/batch=$batchId")
      }

      // 4. store appends — shingles/sigs/media bands first, TEXT bands
      //    (the batch's one replay sentinel) dead last. The contract
      //    orders payloads BEFORE the sentinel, not among themselves:
      //    under foldWrites the three payload jobs run concurrently and
      //    are ALL joined before the sentinel write starts.
      Checkpoints.sweep(s) {
        val sh = Dedup.shingleSetsOf(clean).cache()
        val payloadAppends: Seq[() => Unit] = Seq(
          Some(() => sh.withColumn("bucket",
              pmod(xxhash64(col("doc_id")), lit(Dedup.D19Buckets.toLong)))
            .repartition(col("bucket")) // small-files guard (sigStoreRows' note)
            .write.mode("overwrite").partitionBy("bucket")
            .parquet(s"$storeDir/shingles/batch=$batchId")),
          (batchEmbeddings, embedStoreDir) match {
            case (Some(embs), Some(eStore)) => Some(() =>
              Dedup.sigStoreRows(embs.select(col("vec_id"), col("embedding"))
                  .join(clean.select(col("doc_id").as("vec_id")), Seq("vec_id")),
                  sigSpec)
                .write.mode("overwrite").partitionBy("bucket")
                .parquet(s"$eStore/sigs/batch=$batchId"))
            case _ => None
          },
          (batchMedia, mediaStoreDir) match {
            case (Some(media), Some(mStore)) => Some(() =>
              Multimodal.mm9IndexRows(media
                  .select(col("media_id"), col("payload"), col("format"))
                  .join(clean.select(col("doc_id").as("media_id")), Seq("media_id")))
                .write.mode("overwrite")
                .parquet(s"$mStore/bands/batch=$batchId"))
            case _ => None
          }).flatten
        if (foldWrites && payloadAppends.size > 1) {
          // concurrent job submission is thread-safe in Spark; a failure
          // in ANY payload leg must still fail the batch BEFORE the
          // sentinel lands (rethrown after the join), so the replay
          // envelope is untouched. Losing failures attach as suppressed
          // on the first; an interrupt during join() is deferred —
          // recorded, converted into a job-group cancellation of every
          // leg's Spark jobs, and re-delivered with the flag restored
          // after the legs wind down (no leg's WRITE may outlive this
          // call, racing the sentinel or the replay).
          val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]
          val jobGroup =
            s"graft-payload-append-$batchId-${java.util.UUID.randomUUID()}"
          val threads = payloadAppends.zipWithIndex.map { case (a, i) =>
            val t = new Thread(() => {
              // job group (thread-local): cancellation must stop the
              // leg's SPARK JOBS, not just its thread — an interrupted
              // thread dies while its submitted write keeps running
              // detached, racing the replayed batch's overwrite of the
              // very same batch=$batchId directory
              s.sparkContext.setJobGroup(jobGroup,
                s"payload append batch=$batchId leg=$i",
                interruptOnCancel = true)
              try { payloadFault(i); a() } catch { case x: Throwable =>
                if (!failure.compareAndSet(null, x))
                  failure.get().addSuppressed(x)
              } finally s.sparkContext.clearJobGroup()
            }, s"graft-payload-append-$batchId-$i")
            // daemon: a leg wedged on non-Spark I/O must not keep the
            // JVM alive past the driver
            t.setDaemon(true)
            t
          }
          threads.foreach(_.start())
          // join with a DEFERRED, JOB-CANCELLING interrupt: the first
          // interrupt cancels the legs' job group (the Spark writes
          // themselves stop — nothing keeps writing detached) and
          // interrupts the threads; all legs then share ONE grace
          // deadline (repeated interrupts do NOT re-arm it) before the
          // join is abandoned — with the jobs already cancelled, an
          // abandoned leg can no longer race the replay's overwrite.
          var interrupted: InterruptedException = null
          var graceDeadlineNanos = 0L
          def graceLeftMs: Long =
            (graceDeadlineNanos - System.nanoTime()) / 1000000L
          def cancelLegs(): Unit = {
            // ...AndFutureJobs: a leg still in query planning when the
            // cancel lands would otherwise submit its write AFTER the
            // sweep and run it detached; future-job cancellation kills
            // it at submission (the group is per-batch, never reused).
            // Swallow a stopping-context error: then there are no live
            // jobs to cancel anyway.
            try s.sparkContext.cancelJobGroupAndFutureJobs(jobGroup)
            catch { case _: Throwable => () }
            threads.foreach(_.interrupt())
          }
          threads.foreach { t =>
            var done = false
            while (!done) {
              // monotonic deadline (nanoTime): a wall-clock step must
              // not stretch or collapse the grace window
              val wait =
                if (interrupted == null) 0L else math.max(1L, graceLeftMs)
              try {
                t.join(wait)
                done = interrupted == null || !t.isAlive || graceLeftMs <= 0
              } catch { case ie: InterruptedException =>
                if (interrupted == null) {
                  interrupted = ie
                  graceDeadlineNanos = System.nanoTime() + 30000L * 1000000L
                }
                cancelLegs()
              }
            }
            if (t.isAlive)
              log.warn(s"payload append ${t.getName} still running after " +
                "the 30 s cancellation grace — abandoning the join " +
                "(daemon thread, its future jobs cancelled with the " +
                "group); the batch fails before its sentinel, so replay " +
                "repairs it")
          }
          // belt-and-braces final sweep: every leg that exited can no
          // longer submit, and any abandoned leg's future submissions
          // die at the cancelled group
          if (interrupted != null) {
            cancelLegs()
            deferredInterrupt = true
          }
          if (failure.get() != null) {
            if (interrupted != null) failure.get().addSuppressed(interrupted)
            throw failure.get()
          }
          if (interrupted != null) throw interrupted
        } else payloadAppends.foreach(_())
        Dedup.minhashBandsSpec(sh, mhSpec).write.mode("overwrite")
          .parquet(s"$storeDir/bands/batch=$batchId")
      }
      if (prevStage != null) prevStage.release()
    }
    } finally if (deferredInterrupt) Thread.currentThread().interrupt()
  }

  /** One [[graft.streaming.GateStore.maintain]] pass over all three of
    * a tri-gate deployment's stores — the out-of-band cron companion to
    * [[graft.streaming.StreamCuration.triGateSink]] when the sink runs
    * WITHOUT inline compaction. `owner` is the same name the sink was
    * constructed with (all three stores carry it, so maintenance
    * presents it to each); thresholds come from one shared policy.
    * Returns per-store reports keyed `text` / `embed` / `media`; the
    * single-writer refusal of any store propagates — a partially
    * maintained trio is fine (each store's pass is independent), a
    * silently skipped refusal is not.
    */
  def maintainTriGate(s: SparkSession, textStoreDir: String,
      embedStoreDir: String, mediaStoreDir: String, owner: String,
      policy: graft.streaming.GateStore.MaintenancePolicy =
        graft.streaming.GateStore.MaintenancePolicy())
      : Map[String, graft.streaming.GateStore.MaintenanceReport] = {
    val p = policy.copy(onBehalfOf = Some(owner))
    Map(
      "text" -> graft.streaming.StreamNearDedup.maintain(s, textStoreDir, p),
      "embed" -> graft.streaming.StreamEmbedDedup.maintain(s, embedStoreDir, p),
      "media" -> graft.streaming.StreamMediaDedup.maintain(s, mediaStoreDir, p))
  }
}
