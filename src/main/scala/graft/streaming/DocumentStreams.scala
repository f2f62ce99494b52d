package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** STREAMING document ingestion with near-duplicate suppression against a
  * GROWING persisted MinHash band index — the streaming twin of
  * [[graft.operators.Dedup.incrementalNearDups]]:
  *
  * per micro-batch —
  *  1. signature + band rows for the batch (one narrow hash pass);
  *  2. near-dups of HISTORY: band-collision join against the persisted
  *     index (history is only ever JOINED, never re-hashed), verified on
  *     the signature-estimate threshold;
  *  3. near-dups WITHIN the batch: the usual banded pair path over the
  *     batch's own (tiny) index, greedy smallest-id survivor;
  *  4. survivors append to the document lake (tagged `__batch_id`, the
  *     same idempotence marker [[EventStreams.toPartitionedParquet]]
  *     uses), and THEIR band rows append to the index — so batch N+1
  *     dedups against the original history AND batches 1..N.
  *
  * The index stays O(corpus) on disk and the per-batch cost is
  * O(batch × collision rate): exactly the daily-ingest contract, but at
  * micro-batch granularity. In production the index table is bucketed by
  * (band, bh) ([[graft.operators.Bucketing]]) so the probe join is
  * shuffle-free.
  */
object DocumentStreams {

  /** STREAMING Misra–Gries heavy hitters: per group (language, host,
    * source…), the current frequent-token summary over EVERYTHING the
    * stream has carried so far, maintained in `k` bounded counters of
    * `mapGroupsWithState` state — the "trending tokens" view that never
    * re-reads history and whose state cannot grow with the vocabulary.
    * Each micro-batch folds its exact token counts into the state with
    * the mergeable-summaries reduction, so the classic bounds hold over
    * the WHOLE stream: any token with total frequency > n/(k+1) is in
    * the summary, counts never overestimate and undershoot by ≤ n/(k+1)
    * (exact whenever a group's distinct tokens never exceed k — the
    * [[graft.functions.MisraGriesAgg]] contract, per group, per stream).
    * Emits one (group, summary) row per group per batch (Update mode);
    * summary entries order (count desc, token asc).
    */
  def heavyTokensStream(docs: DataFrame, groupCol: String, textCol: String,
                        k: Int): org.apache.spark.sql.Dataset[(String, Seq[(String, Long)])] = {
    require(k > 0, "k must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(groupCol).cast("string").as("g"),
        explode(graft.functions.TextFunctions.tokens(col(textCol))).as("t"))
      .as[(String, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[Map[String, Long], (String, Seq[(String, Long)])](
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        (g, rows, state) =>
          val acc = scala.collection.mutable.HashMap[String, Long]()
          state.getOption.foreach(_.foreach { case (t, c) => acc.update(t, c) })
          // exact batch counts first (one pass), then one MG reduction —
          // identical algebra to MisraGriesAgg.merge
          rows.foreach { case (_, t) => acc.update(t, acc.getOrElse(t, 0L) + 1L) }
          if (acc.size > k) {
            val cut = acc.values.toArray.sorted(Ordering[Long].reverse).apply(k)
            val dead = acc.collect { case (t, c) if c - cut <= 0 => t }.toSeq
            acc.mapValuesInPlace((_, c) => c - cut)
            dead.foreach(acc.remove)
          }
          state.update(acc.toMap)
          g -> acc.toSeq.sortBy { case (t, c) => (-c, t) }
      }
  }

  /** Write pre-existing history rows into a loop-owned index path in the
    * layout the ingest loops maintain: hive-partitioned by `__batch_id`,
    * with the seed as batch −1. The loops' retry idempotence relies on
    * EVERY file under a loop-owned path belonging to a `__batch_id=N`
    * partition (a flat `write.parquet(path)` seed would make partition
    * discovery fail once the loop adds its first partitioned batch) —
    * seed through this helper.
    */
  def seedIndex(rows: DataFrame, path: String): Unit =
    rows.withColumn("__batch_id", lit(-1L))
      .hint("rebalance")
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("__batch_id").parquet(path)

  /** Re-runnable per-batch sink write: the batch's rows land in their own
    * `__batch_id=N` partition via DYNAMIC partition overwrite, so a
    * foreachBatch RETRY (at-least-once delivery) rewrites exactly its own
    * partition instead of appending duplicates. Committed batches'
    * partitions are never touched. An empty batch writes nothing — and
    * correctly so: batch content is deterministic given the (excluded)
    * history, so a retry that computes empty survivors had an empty first
    * attempt too.
    */
  private[streaming] def writeBatchPartition(rows: DataFrame, batchId: Long,
                                  path: String): Unit =
    // REBALANCE before the write (round-20, guide §6 small files): the
    // sink frames inherit their upstream partitioning (32 scan/shuffle
    // partitions at local defaults, more on a cluster), so every batch
    // landed up to one TINY file per task per partition dir — and every
    // LATER batch's history scan paid one task per file (measured on the
    // curated loop: 32 files/batch/path; the per-batch localCheckpoint
    // execution grew 22→25→38 jobs across three batches from scan-task
    // inflation alone). The AQE rebalance sizes output files by
    // advisoryPartitionSizeInBytes — one file per batch at toy SF,
    // ~64 MB files at 100 TB — which is the §6 prescription, not a
    // local-mode constant. Cost: one batch-sized exchange per sink write.
    rows.withColumn("__batch_id", lit(batchId))
      .hint("rebalance")
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("__batch_id").parquet(path)

  /** Write several per-batch sink partitions CONCURRENTLY (round-20,
    * guide §2.6 — overlap independent jobs): a micro-batch's sinks are
    * independent writes over already-materialized frames, and running
    * them sequentially leaves the cluster idle through each write's
    * driver-side commit while the next write waits. 2-3 jobs in flight
    * back-fill each other's task tails and overlap their commits.
    *
    * Caller contract (what keeps this safe): every sink frame must be
    * lineage-cut ([[materializeCut]]) or derive only from frames whose
    * lineage reads NONE of the sibling sink paths — a committed write
    * refreshes its path (Spark refreshByPath), and with ordering gone a
    * sibling's mid-flight input must have nothing that refresh can
    * invalidate. Each write stays per-batch-partition idempotent; the
    * crash window widens from "a prefix of the sinks committed" to "any
    * subset committed", which the loops' at-least-once retry already
    * absorbs (the retry rewrites every sink's own partition).
    */
  private[streaming] def writeBatchPartitionsPar(
      sinks: Seq[(DataFrame, String)], batchId: Long): Unit =
    if (sinks.sizeIs <= 1)
      sinks.foreach { case (df, p) => writeBatchPartition(df, batchId, p) }
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(sinks.size)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      try {
        val fs = sinks.map { case (df, p) =>
          scala.concurrent.Future(writeBatchPartition(df, batchId, p))
        }
        // await ALL before rethrowing: a failed batch must not leave a
        // sibling write racing a foreachBatch retry's rewrite
        val results = fs.map(f => scala.util.Try(scala.concurrent.Await
          .result(f, scala.concurrent.duration.Duration.Inf)))
        results.foreach(_.get)
      } finally pool.shutdown()
    }

  /** COMPACT a loop-owned INDEX path: consolidate every committed batch
    * partition with `__batch_id ≤ uptoBatch` (plus the seed) into the
    * seed partition (`__batch_id = -1`), rewritten as `targetFiles`
    * files — a long-lived ingest loop otherwise accumulates one tiny
    * partition per micro-batch, and the per-batch history scan becomes
    * file-listing-bound long before it is data-bound. History CONTENT is
    * unchanged: any in-flight batch `> uptoBatch` reads the same rows
    * through [[readHistory]] before and after.
    *
    * Safety contract: call BETWEEN batches (or from a maintenance job
    * while the loop is quiescent) with `uptoBatch` strictly below any
    * batch id that may still RETRY — a retrying batch must find its own
    * partition intact to rewrite it. Crash-safety is write-then-delete:
    * the consolidated copy lands in the seed partition BEFORE the
    * originals are deleted, so an interruption leaves duplicate history
    * rows, never a gap — and the index consumers are duplicate-tolerant
    * by construction (match sets are distinct-ed; a duplicate index row
    * changes no drop decision). INDEX paths only: lake/data partitions
    * are NOT duplicate-tolerant, so do not point this at `outPath`.
    */
  def compactIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                   uptoBatch: Long, targetFiles: Int = 8): Unit = {
    require(uptoBatch >= 0, "uptoBatch must be >= 0")
    require(targetFiles > 0, "targetFiles must be positive")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    val h = spark.read.parquet(path)
    require(h.columns.contains("__batch_id"),
      s"$path is not a loop-owned __batch_id-partitioned layout")
    val old = h.filter(col("__batch_id") <= uptoBatch).drop("__batch_id")
    if (old.isEmpty) return
    // stage through a sibling tmp dir: Spark cannot overwrite a partition
    // it is lazily reading from
    val tmp = new org.apache.hadoop.fs.Path(path + "__compact_tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    old.repartition(targetFiles).write.parquet(tmp.toString)
    spark.read.parquet(tmp.toString).withColumn("__batch_id", lit(-1L))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("__batch_id").parquet(path)
    fs.listStatus(root).filter(_.isDirectory).map(_.getPath).foreach { d =>
      val name = d.getName
      if (name.startsWith("__batch_id=")) {
        scala.util.Try(name.substring("__batch_id=".length).toLong)
          .toOption.foreach { id =>
            if (id >= 0 && id <= uptoBatch) fs.delete(d, true)
          }
      }
    }
    fs.delete(tmp, true)
  }

  /** Materialize a batch-sized frame ONCE and cut its lineage (round-19,
    * shared by every ingest loop): the loops' sink frames were merely
    * persisted, which loses twice at write time — (a) a parquet write
    * does not load a cached child's column buffers (measured in the
    * round-17 embed-loop work: after both sinks the cache reported
    * isCachedColumnBuffersLoaded=false), so each sink consuming the
    * frame re-ran the whole batch DAG; and (b) a committed write to a
    * path CLEARS every cached plan whose lineage reads it (Spark's
    * refreshByPath), so writing the index invalidated frames derived
    * from the index probe mid-batch (measured on the curated loop: the
    * third sink cost 3.8–5.4 s re-running a ~0.5 s DAG, and per-batch
    * wall grew 3→7→11 s). localCheckpoint computes the rows once and
    * replaces the plan with an RDD scan — no lineage, nothing to
    * invalidate, every sink reads the blocks. The trade (checkpoint
    * blocks don't survive executor loss) sits inside the loops'
    * at-least-once contract: a lost block fails the batch; the retry
    * rewrites exactly its own partitions.
    */
  private[streaming] def materializeCut(df: DataFrame): DataFrame =
    df.localCheckpoint()

  /** Release a [[materializeCut]] frame's blocks deterministically — a
    * long-lived loop must not wait on the periodic ContextCleaner GC to
    * reclaim one batch-sized block set per micro-batch.
    */
  private[streaming] def releaseCut(df: DataFrame): Unit = {
    df.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.unpersist(false)
    }
    ()
  }

  /** Read a loop-owned path as HISTORY for batch `batchId`: every
    * committed partition EXCEPT the in-flight batch's own. The exclusion
    * is what makes retries safe — a failed attempt may have already
    * written this batch's partition to the index, and probing those rows
    * would flag every retried document as a "duplicate of history" and
    * drop it (an empty lake partition: data loss, not just duplicates).
    * Partition pruning makes the filter free. A pre-partitioning seed
    * without the column (legacy flat layout) is read as-is.
    */
  /** Per-path schema memo for [[readHistory]] (round-20, guide §6
    * listing/planning cost): a loop-owned path's schema is FIXED for the
    * loop's life (every batch writes the same columns), but a bare
    * `spark.read.parquet` re-infers it from file footers on EVERY
    * micro-batch — per-batch driver work that grows with the file count.
    * The first read of a path infers once and caches; later batches hand
    * the cached schema to `read.schema(...)`, skipping inference
    * entirely. Keyed by path; paths are loop-owned temp dirs, so a stale
    * entry cannot alias a different layout.
    */
  private val historySchemaMemo =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  private[streaming] def readHistory(spark: org.apache.spark.sql.SparkSession,
                          path: String, batchId: Long): DataFrame = {
    val cached = historySchemaMemo.get(path)
    val h =
      if (cached != null) spark.read.schema(cached).parquet(path)
      else {
        val inferred = spark.read.parquet(path)
        historySchemaMemo.put(path, inferred.schema)
        inferred
      }
    if (h.columns.contains("__batch_id")) h.filter(col("__batch_id") =!= batchId)
    else h
  }

  /** Wire a streaming document source into the ingest-dedup loop.
    * `indexPath` must hold the historical [[Dedup.minhashBandIndex]] rows
    * (id, sig, band, bh), seeded via [[seedIndex]]; `outPath` receives
    * surviving documents. Both paths are loop-owned: hive-partitioned by
    * `__batch_id`, batch retries idempotent per partition.
    */
  def ingestDedup(newDocs: DataFrame, idCol: String, textCol: String,
                  indexPath: String, outPath: String,
                  shingleSize: Int = 3, numHashes: Int = 128,
                  bands: Int = 32, threshold: Double = 0.7): DataStreamWriter[Row] =
    newDocs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      processBatch(batch, batchId, idCol, textCol, indexPath, outPath,
        shingleSize, numHashes, bands, threshold)
    }

  /** One micro-batch of the ingest-dedup loop (factored out so batch
    * semantics are testable without a streaming harness).
    */
  private[graft] def processBatch(batch: DataFrame, batchId: Long,
                                      idCol: String, textCol: String,
                                      indexPath: String, outPath: String,
                                      shingleSize: Int, numHashes: Int,
                                      bands: Int, threshold: Double): Unit = {
    val spark = batch.sparkSession
    val history = readHistory(spark, indexPath, batchId)
    // slimSigs: the signature rides the band-0 row only — the persisted
    // index a batch probes is then `bands`x smaller to scan (legacy
    // full-sig indexes remain readable: sig reads filter isNotNull)
    // eager lineage cut, not a lazy persist (round-20): concurrent AQE
    // stage builds race an unmaterialized cache and re-run its upstream
    // DAG once per branch — see [[processCuratedBatch]]'s `fresh` note
    val newIdx = materializeCut(Dedup.minhashBandIndex(batch, idCol, textCol,
        shingleSize, numHashes, bands, slimSigs = true))
    val asIndex = graft.operators.Dedup.MinhashIndex(
      newIdx.filter(col("sig").isNotNull).select("id", "sig"),
      newIdx.select("id", "band", "bh"))
    // near-dups of history: drop the NEW doc. excludeSelf = false — the
    // batch side is unpublished (readHistory excludes the in-flight
    // partition), so a same-id index match is a RE-SENT published doc
    // and must be dropped, not republished under a new batch partition
    val dupOfHistory = materializeCut(Dedup.incrementalNearDupsIndexed(
        asIndex, graft.operators.Dedup.MinhashIndex(
          history.filter(col("sig").isNotNull).select("id", "sig"), // slim-or-legacy; operator prunes to candidates, then dedups (no O(history) shuffle)
          history.select("id", "band", "bh")),
        numHashes, threshold, excludeSelf = false)
      .select(col("new_id").as("__drop")))
    // near-dups WITHIN the batch, over docs that survived the history
    // probe (a history-dropped doc must not transitively drop batchmates
    // that are far from everything published): smallest id survives
    val eligible = graft.operators.Dedup.MinhashIndex(
      asIndex.sigs.join(dupOfHistory, asIndex.sigs("id") === col("__drop"), "left_anti"),
      asIndex.bands.join(dupOfHistory, asIndex.bands("id") === col("__drop"), "left_anti"))
    val dupInBatch = Dedup.minhashPairsFromIndex(eligible, numHashes, threshold)
      .select(col("id2").as("__drop"))
    // anti-join consumers are duplicate-tolerant — no distinct spent
    val dropIds = dupOfHistory.union(dupInBatch)
    // materializeCut, not persist: both sinks consume survivors, and a
    // parquet write does not load a cached child's buffers — persisted,
    // the batch DAG ran once per sink (see [[materializeCut]])
    val survivors = materializeCut(batch
      .join(dropIds, batch(idCol) === col("__drop"), "left_anti"))
    // CONCURRENT sinks (round-20, §2.6): survivors is lineage-cut and the
    // index keep-frame derives from newIdx (lineage = the batch source
    // only) ⋈ the cut survivors — neither input reads a sibling sink path,
    // so the two writes overlap safely. The index grows by the SURVIVORS'
    // band rows only — dropped docs must not suppress future docs they
    // themselves never entered the lake for.
    writeBatchPartitionsPar(Seq(
      survivors -> outPath,
      newIdx.join(survivors.select(col(idCol).as("__keep")),
        newIdx("id") === col("__keep"), "left_semi") -> indexPath),
      batchId)
    releaseCut(survivors)
    releaseCut(dupOfHistory)
    releaseCut(newIdx)
  }

  /** STREAMING INGEST-TIME CURATION — the streaming twin of
    * [[graft.operators.Curation.curatedCorpus]]: each micro-batch runs
    * admission (fused language+quality predicate) → PII scrub → exact
    * dedup (within batch AND against a growing text-hash index) →
    * near-dedup (within batch AND against the growing band index), and
    * survivors append to the curated lake. The batch pipeline's
    * transitive-cluster policy (smallest id per cluster survives) becomes
    * FIRST-ARRIVAL-WINS here — the only policy an online system can
    * implement without revoking already-published documents; when
    * duplicates arrive after their originals the two policies coincide
    * (spec-pinned against the batch [[graft.operators.Curation]] prefix).
    *
    * State is two grow-only parquet indices, both O(corpus) and both
    * probe-joined per batch (history is never re-hashed or re-scanned in
    * full): `exactIndexPath` holds one 8-byte xxhash64 of each published
    * document's SCRUBBED text; `bandIndexPath` holds the published band
    * rows ([[Dedup.minhashBandIndex]] layout). Bootstraps from empty —
    * absent indices mean no history yet; pre-existing history seeds via
    * [[seedIndex]]. All three paths are loop-owned, hive-partitioned by
    * `__batch_id`, and written with dynamic partition OVERWRITE, so a
    * foreachBatch retry (at-least-once delivery) rewrites its own
    * partitions instead of double-publishing — and history probes exclude
    * the in-flight batch's partition, so a retry cannot be suppressed by
    * its own half-written rows.
    */
  /** Optional `decontamGrams` arms INGEST-TIME DECONTAMINATION: the
    * eval-suite guard at the door, so a benchmark-contaminated document
    * never reaches the lake in the first place (the batch pipeline's
    * `decontaminateAgainst` stage, run per micro-batch). Pass the
    * PREBUILT distinct hashed-gram table of the suite
    * ([[graft.operators.Curation.benchGramsFor]] — built once per suite
    * release, served from its persisted layout), NOT the raw suite:
    * the loop must never re-shingle a constant suite per batch. The
    * stage runs on dedup SURVIVORS (cheapest-stage-first ordering of
    * the batch pipeline); contaminated docs are neither published nor
    * indexed — they never entered the lake and must not suppress
    * future documents (the loops' uniform dropped-item policy; an
    * identical future doc is contaminated too and drops the same way).
    */
  /** Optional `metricsPath` arms the PER-BATCH ATTRITION METRICS sink —
    * the streaming twin of [[graft.operators.Curation.attritionReport]]:
    * one row per micro-batch `(n_in, n_filtered, n_exact_dup,
    * n_exact_history, n_dup_history, n_dup_batch, n_contaminated,
    * n_published)` — drop counts per stage plus the published tally,
    * summing to `n_in` — hive-partitioned by `__batch_id` with the loops'
    * usual retry idempotence (a replayed batch rewrites its own metrics
    * partition). Counting forces extra per-batch jobs on the (persisted,
    * batch-sized) stage frames — that is the price of the funnel and why
    * the sink is opt-in.
    */
  def ingestCurated(newDocs: DataFrame, idCol: String, textCol: String,
                    cfg: graft.operators.Curation.Config,
                    exactIndexPath: String, bandIndexPath: String,
                    outPath: String,
                    shingleSize: Int = 3, numHashes: Int = 128,
                    bands: Int = 32,
                    decontamGrams: Option[DataFrame] = None,
                    metricsPath: Option[String] = None): DataStreamWriter[Row] =
    newDocs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      processCuratedBatch(batch, batchId, idCol, textCol, cfg,
        exactIndexPath, bandIndexPath, outPath, shingleSize, numHashes, bands,
        decontamGrams, metricsPath)
    }

  private[streaming] def pathExists(spark: org.apache.spark.sql.SparkSession,
                         path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** One micro-batch of the curated-ingest loop (factored out for direct
    * batch-semantics testing and the battery protocol, like
    * [[processBatch]]).
    */
  private[graft] def processCuratedBatch(batch: DataFrame, batchId: Long,
                                             idCol: String, textCol: String,
                                             cfg: graft.operators.Curation.Config,
                                             exactIndexPath: String,
                                             bandIndexPath: String,
                                             outPath: String,
                                             shingleSize: Int, numHashes: Int,
                                             bands: Int,
                                             decontamGrams: Option[DataFrame] = None,
                                             metricsPath: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    import graft.functions.TextFunctions
    val admitted = batch.filter(
      TextFunctions.langQualityKeep(col(textCol), cfg.keepLangs, cfg.minQuality))
    val scrubbed = admitted.withColumn(textCol,
      TextFunctions.scrubPii(col(textCol)))
    // exact dedup: smallest id in batch survives; anything matching a
    // published text hash is a replay/duplicate of history
    val exactDeduped = Dedup.exact(scrubbed, col(textCol), col(idCol))
      .withColumn("__th", xxhash64(col(textCol)))
    val fresh0 =
      if (pathExists(spark, exactIndexPath))
        exactDeduped.join(readHistory(spark, exactIndexPath, batchId),
          exactDeduped("__th") === col("th"), "left_anti")
      else exactDeduped
    // EAGER lineage cuts, not lazy persists, for every shared stage frame
    // (round-20): AQE materializes a query's stages CONCURRENTLY, and a
    // lazily-persisted frame referenced by several branches of one
    // downstream execution is RACED — each in-flight stage build finds
    // the cache unmaterialized and re-runs the frame's whole upstream DAG
    // (measured on this loop: the survivors execution ran the 32-task
    // admission-chain source scan many times per batch; batch 2's
    // checkpoint was 38 jobs / 1 620 tasks where ~500 would do). An eager
    // localCheckpoint computes each frame EXACTLY once, in dependency
    // order, and every consumer — including the concurrent AQE stages —
    // reads the finished blocks; downstream plans shrink to RDD scans,
    // which also kills every refreshByPath hazard. Same at-least-once
    // trade as [[materializeCut]] on survivors.
    val fresh = materializeCut(fresh0)
    // near-dedup: batch band rows probe the growing index, then pair
    // within the batch (first-arrival-wins == smallest id in batch)
    // slimSigs + isNotNull sig reads: see [[processBatch]]
    val newIdx = materializeCut(Dedup.minhashBandIndex(fresh, idCol, textCol,
        shingleSize, numHashes, bands, slimSigs = true))
    val asIndex = graft.operators.Dedup.MinhashIndex(
      newIdx.filter(col("sig").isNotNull).select("id", "sig"),
      newIdx.select("id", "band", "bh"))
    // history probe first (excludeSelf = false — a same-id index match is
    // a re-sent published doc, see [[processBatch]]); the within-batch
    // pairing then runs over history-probe SURVIVORS only, so a doc
    // dropped as dup-of-history cannot transitively drop batchmates
    val dupOfHistory = materializeCut(
      if (pathExists(spark, bandIndexPath)) {
        val history = readHistory(spark, bandIndexPath, batchId)
        Dedup.incrementalNearDupsIndexed(
            asIndex, graft.operators.Dedup.MinhashIndex(
              history.filter(col("sig").isNotNull).select("id", "sig"), // slim-or-legacy; operator prunes to candidates, then dedups (no O(history) shuffle)
              history.select("id", "band", "bh")),
            numHashes, cfg.nearDupThreshold, excludeSelf = false)
          .select(col("new_id").as("__drop"))
      } else asIndex.sigs.select(col("id").as("__drop")).limit(0))
    val eligible = graft.operators.Dedup.MinhashIndex(
      asIndex.sigs.join(dupOfHistory, asIndex.sigs("id") === col("__drop"), "left_anti"),
      asIndex.bands.join(dupOfHistory, asIndex.bands("id") === col("__drop"), "left_anti"))
    val dupInBatch = Dedup.minhashPairsFromIndex(eligible, numHashes,
        cfg.nearDupThreshold)
      .select(col("id2").as("__drop"))
    // anti-join consumers are duplicate-tolerant — no distinct spent
    val dropIds = dupOfHistory.union(dupInBatch)
    // with the metrics sink armed, deduped is consumed twice (the
    // decontamination/survivor chain and its own count) — eagerly cut so
    // the dedup DAG runs once, not per consumer (and never raced by
    // concurrent AQE stage builds; see the `fresh` note)
    val deduped0 = fresh
      .join(dropIds, fresh(idCol) === col("__drop"), "left_anti")
    val deduped =
      if (metricsPath.isDefined) materializeCut(deduped0) else deduped0
    // ingest-time decontamination on dedup survivors (see [[ingestCurated]]):
    // the suite gram table is prebuilt and constant, the batch side is
    // batch-sized — the join cost tracks the BATCH, never the suite scan
    // survivors is LOCAL-CHECKPOINTED, not persisted (round-19): its
    // lineage reads BOTH index paths (exact-history anti join, band-index
    // probe), and this loop writes three sinks — after each committed
    // write Spark's refreshByPath CLEARS every cached plan that reads the
    // written path, so a merely-persisted survivors was invalidated by
    // the band-index write and the exact-index write then re-ran the
    // whole admission→dedup→decontam DAG per batch (measured: the
    // third write cost 3.8-5.4 s against a ~0.5 s loaded-cache write;
    // the per-batch wall grew 3→7→11 s across 3 tiny batches).
    // localCheckpoint materializes the rows once and cuts the lineage to
    // an RDD scan, so no sink write can invalidate it. The trade —
    // checkpoint blocks don't survive executor loss — is inside the
    // loops' at-least-once contract: a lost block fails the batch and
    // the retry rewrites its own partitions.
    val survivors = materializeCut(decontamGrams match {
      case Some(grams) =>
        val bad = graft.operators.Curation.contaminationHitsFromGrams(
            deduped, idCol, textCol, grams, cfg.decontamNgram)
          .filter(col("n_hits") >= cfg.decontamMinHits)
          .select(col("id").as("__cdrop"))
        deduped.join(bad, deduped(idCol) === col("__cdrop"), "left_anti")
      case None => deduped
    })
    // METRICS RUN BEFORE THE SINKS when armed, and in ONE action (the
    // [[EmbeddingStreams.processEmbeddingBatch]] discipline): a tagged
    // union over the stage frames aggregates all seven counts in a single
    // execution. Two reasons: (a) each count() as its own execution paid
    // 7 × batches of fixed AQE/driver overhead per micro-batch; (b) the
    // counting exec is what loads the persisted frames' column buffers,
    // so the sink writes below consume loaded caches instead of
    // re-deriving them (a parquet write alone does not populate a cached
    // child's buffers).
    metricsPath.foreach { mPath =>
      import spark.implicits._
      // The first three funnel counts (n_in, n_admitted, n_exactDeduped)
      // fold into ONE aggregate over ONE batch scan (round-20): as union
      // branches they re-derived the admission chain from the source —
      // three extra batch scans plus the exact-dedup exchange per
      // micro-batch. count(admission predicate) ≡ the admitted filter's
      // cardinality, and count(DISTINCT struct(scrubbed text)) over
      // admitted rows ≡ |Dedup.exact(scrubbed)| — exact dedup emits one
      // row per distinct key, and the struct wrapper keeps a NULL-text
      // group countable (count_distinct alone would skip it). The funnel
      // identity and the q_curated_metrics_stream oracle pin equality.
      val keep = TextFunctions.langQualityKeep(col(textCol),
        cfg.keepLangs, cfg.minQuality)
      val head = batch.agg(
          count(lit(1)).as("in"),
          count(when(keep, lit(1))).as("adm"),
          countDistinct(when(keep,
            struct(TextFunctions.scrubPii(col(textCol))))).as("ed"))
        .head()
      val nIn = head.getLong(0)
      val nAdmitted = head.getLong(1)
      val nExactDeduped = head.getLong(2)
      // the remaining stage frames are lineage-cut RDDs — one cheap
      // tagged-union aggregation covers all four
      val m = Seq(
          fresh.select(lit("fr").as("__k")),
          // DOCS dropped by history, not probe PAIRS: the probe emits one
          // row per (new, old) match, so a doc near two published docs
          // carries two rows — counting rows overcounted the stage and
          // drove n_dup_batch (a difference) negative (round-17 fix,
          // spec-pinned)
          dupOfHistory.select("__drop").distinct()
            .select(lit("dh").as("__k")),
          deduped.select(lit("dd").as("__k")),
          survivors.select(lit("pub").as("__k")))
        .reduce(_ unionByName _)
        .groupBy("__k").agg(count(lit(1)).as("__c"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val nFresh = m.getOrElse("fr", 0L)
      val nDupHistory = m.getOrElse("dh", 0L)
      val nDeduped = m.getOrElse("dd", 0L)
      val nPublished = m.getOrElse("pub", 0L)
      // drop sets along the chain are disjoint by construction (the
      // within-batch pairing runs over history-probe survivors; the
      // decontamination stage over dedup survivors), so stage counts are
      // plain differences of consecutive survivor counts
      writeBatchPartition(Seq((
          nIn, nIn - nAdmitted, nAdmitted - nExactDeduped,
          nExactDeduped - nFresh, nDupHistory,
          nFresh - nDeduped - nDupHistory, nDeduped - nPublished,
          nPublished))
        .toDF("n_in", "n_filtered", "n_exact_dup", "n_exact_history",
          "n_dup_history", "n_dup_batch", "n_contaminated", "n_published"),
        batchId, mPath)
    }
    // the band-index keep frame is lineage-cut BEFORE the concurrent
    // writes below (round-20): its plan otherwise reaches newIdx → fresh →
    // the exact-history anti join, whose lineage READS exactIndexPath —
    // and with the three sinks now unordered, the exact-index commit's
    // refreshByPath could invalidate the band write's input mid-flight
    // (a correctness-neutral but costly recompute). Cut, it is an RDD
    // scan no refresh can touch.
    val keepIdx = materializeCut(
      newIdx.join(survivors.select(col(idCol).as("__keep")),
        newIdx("id") === col("__keep"), "left_semi"))
    // all three sinks are per-batch-partition idempotent: a retry after a
    // failure between/among these writes rewrites the same partitions
    // rather than appending a second copy of the batch (at-least-once
    // delivery). They run CONCURRENTLY (§2.6): every input is lineage-cut,
    // so no sink's commit can invalidate a sibling's input.
    writeBatchPartitionsPar(Seq(
      survivors.drop("__th") -> outPath,
      keepIdx -> bandIndexPath,
      survivors.select(col("__th").as("th")) -> exactIndexPath),
      batchId)
    releaseCut(keepIdx)
    releaseCut(survivors)
    if (metricsPath.isDefined) releaseCut(deduped)
    releaseCut(dupOfHistory)
    releaseCut(newIdx)
    releaseCut(fresh)
  }
}
