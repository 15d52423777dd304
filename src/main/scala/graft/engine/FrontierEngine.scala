package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{Extract, Robots, UrlNorm}

/** The distributed crawl-frontier engine (SURVEY.md §7 module 6; north rule).
  *
  * One scheduling round is a typed Dataset pipeline:
  *   frontier → dedupe(min seq per url) → anti-join(seen) → per-host
  *   rank/budget window → global FIFO order index → repartition(host,salt)
  *   → mapPartitions(robots gate + synthetic fetch + extract kernel)
  *   → pages/fetch_log deltas + next frontier + seen delta
  *
  * Scale design (10^10-URL frontier):
  *  - membership is on the 64-bit xxh64 of the canonical URL; the exact
  *    anti-join shuffles only (hash, url) pairs. A per-partition Bloom
  *    prefilter ([[SeenFilter]]) can drop the bulk of dups before the
  *    shuffle; positives are always confirmed exactly, so no false drops.
  *  - the politeness budget is enforced BEFORE the salted repartition by a
  *    window over the host key (rank ≤ B), so a mega-host never serializes
  *    a partition: its per-round work is bounded by B and spread over
  *    `saltBuckets` partitions.
  *  - the global BFS order index is computed without a single-partition
  *    window: range-partition by the FIFO key, count rows per partition,
  *    broadcast the prefix offsets, add the local rank (two narrow passes).
  *  - every round commits deltas + per-partition lineage to a
  *    [[SnapshotStore]]; `resume` restarts from the latest manifest.
  */
object FrontierEngine {

  final case class FrontierRow(
      url: String, url_hash: Long, host: String, depth: Int,
      parent_order: Long, link_pos: Int,
      // the scheduler's general rank keys (north rule: "rank by (priority,
      // next-fetch-time) with a window over host"). BFS is the degenerate
      // case priority = depth, next_fetch_time = 0 — the rank order then
      // coincides with the FIFO (parent_order, link_pos) order, which is
      // what the reference-exactness oracle pins.
      priority: Double = 0.0, next_fetch_time: Long = 0L)

  final case class FetchedRow(
      url: String, url_hash: Long, host: String, depth: Int, round: Int,
      order_idx: Long, partition_id: Int, status: String,
      title: String, text: String, links: Seq[String], etag: String)

  final case class Config(
      maxDepth: Int = 2,
      maxPages: Int = 50,
      hostBudget: Int = Int.MaxValue,
      sameHostOnly: Boolean = true,
      respectRobots: Boolean = true,
      saltBuckets: Int = 4,
      web: SyntheticWeb.Config = SyntheticWeb.Config(),
      /** stop after this many rounds (simulates a crash mid-crawl; resume
        * restarts from the last committed snapshot — a round boundary). */
      maxRounds: Int = Int.MaxValue,
      /** politeness deferral (reference: fetch.ts:92-107 retry-seconds):
        * when > 0, budget-deferred rows are stamped next_fetch_time =
        * round + deferSeconds (logical clock = round number), so a host
        * that exhausted its budget re-ranks BEHIND fresher same-priority
        * work next round. 0 (BFS mode) keeps next_fetch_time untouched —
        * the reference-exactness oracles pin that ordering. */
      deferSeconds: Long = 0L,
      /** route the seen-membership test through the distributed Bloom
        * prefilter ([[SeenFilter]], sized from the live seen count) before
        * the exact anti-join. Semantics are identical by construction (no
        * false negatives; every possibly-seen row is exactly confirmed) —
        * at 10^10 URLs the prefilter drops the bulk of duplicate
        * candidates before they reach the anti-join shuffle. */
      bloomPrefilter: Boolean = false,
      /** keep the seen set RESIDENT in a bucket-co-partitioned exact index
        * ([[SeenIndex]]): per round only the DELTA shuffles (new hashes
        * merged as one sorted run per bucket) and membership is a
        * co-partitioned zip probe — O(delta) per round instead of the
        * anti-join's O(seen) full-table shuffle, the dominant recurring
        * cost of a long crawl. Results are byte-identical (identity is the
        * 64-bit hash either way; CrawlSpec pins order/seen-set/text
        * equality vs the scalar oracle with the index on). Takes
        * precedence over bloomPrefilter (the index IS exact — nothing to
        * prefilter). */
      exactSeenIndex: Boolean = false,
      /** AUTO mode selection for seen membership: when ≥ 0 and
        * `exactSeenIndex` is off, the crawl starts on the plain anti-join
        * and switches to the resident index once the seen set crosses
        * this many URLs — the measured crossover where the per-round
        * O(seen) anti-join shuffle overtakes the index's one-time build
        * (BASELINE.md seen_membership: index probe wins decisively by
        * 32M seen; the default sits a factor below that so the one-time
        * build amortizes over the remaining rounds). Results are
        * byte-identical across the switch (identity is the 64-bit hash
        * in both modes; CrawlSpec pins it). -1 disables; ON by default —
        * no sandbox-scale crawl reaches it, and a 10^10-URL crawl should
        * not need a hand flag to stop re-shuffling its seen set. */
      autoSeenIndexAt: Long = 16000000L)

  final case class RoundResult(
      fetched: DataFrame, // FetchedRow sans links
      newFrontier: Dataset[FrontierRow],
      seenDelta: DataFrame, // (url_hash, url)
      taken: Long,
      /** release the round's transient caches — call AFTER newFrontier and
        * seenDelta have been materialized (checkpoint/commit); the fetched
        * cache is NOT released here (later rounds union it). */
      cleanup: () => Unit = () => ())

  def seedFrontier(spark: SparkSession, seeds: Seq[String]): Dataset[FrontierRow] = {
    import spark.implicits._
    seeds.flatMap(UrlNorm.canonicalize).zipWithIndex.map { case (u, i) =>
      FrontierRow(u, UrlNorm.urlHash(u), UrlNorm.host(u).getOrElse(""), 0, -1L, i, 0.0, 0L)
    }.toDS()
  }

  /** One scheduling round. `seen` is (url_hash LONG, url STRING);
    * `fetchedSoFar` drives the global maxPages cap. When
    * `cfg.exactSeenIndex` is set, `seenIdx` supplies the resident index
    * and `seen` is not read at all this round. */
  def round(spark: SparkSession, frontier: Dataset[FrontierRow],
      seen: DataFrame, roundNo: Int, fetchedSoFar: Long,
      cfg: Config, seenIdx: Option[SeenIndex] = None,
      frontierEst: Long = -1L): RoundResult = {
    import spark.implicits._

    // 1. within-frontier dedupe: first discovery (min FIFO seq) wins.
    //    Grouped on url_hash ALONE (url/host ride the min-struct): identity
    //    is the 64-bit hash everywhere in this engine (the seen set, the
    //    Bloom filter), and single-key grouping leaves the frame
    //    hash-partitioned on exactly the anti-join key, so step 2 reuses
    //    this exchange instead of reshuffling the whole frontier.
    val deduped = frontier
      .filter(col("depth") <= cfg.maxDepth)
      .groupBy(col("url_hash"))
      .agg(
        min(struct(col("parent_order"), col("link_pos"), col("depth"),
          col("priority"), col("next_fetch_time"), col("url"), col("host")))
          .as("seq"))
      .select(col("url_hash"), col("seq.url").as("url"), col("seq.host").as("host"),
        col("seq.depth").as("depth"),
        col("seq.parent_order").as("parent_order"),
        col("seq.link_pos").as("link_pos"),
        col("seq.priority").as("priority"),
        col("seq.next_fetch_time").as("next_fetch_time"))

    // 2. seen-membership: exact anti-join on the 64-bit hash; with
    //    bloomPrefilter the bucket-co-partitioned Bloom drops definite-fresh
    //    rows first and only possibly-seen rows pay the anti-join shuffle
    //    (positives are always exactly confirmed — no false drops)
    val fresh = seenIdx match {
      case Some(idx) =>
        // resident exact index: only the candidate side moves. Presence-
        // driven: [[crawl]] decides the mode (config flag or auto-switch
        // at the measured crossover) by passing the index or not.
        SeenIndex.split(spark, deduped, idx)._1
      case _ =>
        if (cfg.bloomPrefilter && fetchedSoFar > 0) {
          val p = SeenFilter.Params.forCount(math.max(fetchedSoFar, 1L))
          val filters = SeenFilter.build(spark, seen, p)
          val (definiteFresh, maybeSeen) = SeenFilter.split(spark, deduped, filters, p)
          definiteFresh.union(
            maybeSeen.join(seen.select("url_hash"), Seq("url_hash"), "left_anti"))
        } else {
          // the seen side's row count IS fetchedSoFar (one row per fetched
          // page). While it fits a broadcast (~16 MB of hashes at 2M), hint
          // it explicitly: the storeless seen is a checkpointed leaf with
          // no stats, so the static planner (and the small-round mode with
          // AQE off) would otherwise pick a sort-merge anti join for a
          // few-hundred-row table (guide §3.1: pick the strategy
          // deliberately). Past the threshold the planner decides; the
          // auto seen-index takes over at 16M anyway.
          val seenKeys = seen.select("url_hash")
          val rhs = if (fetchedSoFar <= 2000000L) broadcast(seenKeys) else seenKeys
          deduped.join(rhs, Seq("url_hash"), "left_anti")
        }
    }

    // 3. per-host politeness budget: rank by (priority, next_fetch_time)
    //    with FIFO tiebreak, over the host key, PRE-salt (north rule). In
    //    BFS mode priority=depth and nft=0, and because every depth-d page
    //    is fetched before any depth-(d+1) page, the priority-first order
    //    equals the pure FIFO order — reference exactness is preserved.
    val wHost = Window.partitionBy(col("host"))
      .orderBy(col("priority"), col("next_fetch_time"),
        col("parent_order"), col("link_pos"))
    // persist the ranked frontier for the round: THREE consumers re-read it
    // (the range-partitioner's sample pass, the FIFO-index shuffle, and the
    // deferred branch of the next frontier) — uncached, the whole
    // dedupe→anti-join→window pipeline re-executed once per consumer.
    // Dataset.persist defaults to MEMORY_AND_DISK (spills, never OOMs);
    // size is O(one round's frontier) and it is released by
    // RoundResult.cleanup as soon as the round's outputs are materialized.
    val ranked = fresh.withColumn("host_rank", row_number().over(wHost)).persist()
    val budgeted = ranked.filter(col("host_rank") <= cfg.hostBudget)
    val deferredBase = ranked.filter(col("host_rank") > cfg.hostBudget)
    val deferredByBudget = (if (cfg.deferSeconds > 0)
      deferredBase.withColumn("next_fetch_time", lit(roundNo.toLong + cfg.deferSeconds))
    else deferredBase)
      .select(frontierCols: _*).as[FrontierRow]

    // 4. global FIFO order index (distributed two-phase ranking) + cap
    val room = cfg.maxPages - fetchedSoFar
    val (indexed, indexedTotal) =
      withGlobalFifoIndexCounted(spark, budgeted, fetchedSoFar, frontierEst)
    val taken = indexed.filter(col("order_idx") < fetchedSoFar + room)
    val overflow = indexed.filter(col("order_idx") >= fetchedSoFar + room)
      .select(frontierCols: _*).as[FrontierRow]

    // 5. fetch + extract inside mapPartitions over salted host partitions
    val webCfg = cfg.web
    val respectRobots = cfg.respectRobots
    val sameHostOnly = cfg.sameHostOnly
    val maxDepth = cfg.maxDepth
    val rNo = roundNo
    val fetched: Dataset[FetchedRow] = taken
      .repartition(col("host"), pmod(col("url_hash"), lit(cfg.saltBuckets)))
      .select(col("url"), col("url_hash"), col("host"), col("depth"),
        col("parent_order"), col("link_pos"), col("order_idx"))
      .as[(String, Long, String, Int, Long, Int, Long)]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val robotsCache = scala.collection.mutable.Map[String, Robots.RobotsRules]()
        it.map { case (url, urlHash, host, depth, _, _, orderIdx) =>
          val rules = robotsCache.getOrElseUpdate(host,
            Robots.parse(SyntheticWeb.parseUrl(url)
              .map(hp => SyntheticWeb.robotsTxt(hp._1)).getOrElse("")))
          val fr = SyntheticWeb.fetch(webCfg, url)
          val status =
            if (respectRobots && !Robots.isAllowed(rules, url, webCfg.userAgent))
              "ROBOTS_DENIED"
            else if (fr.status == 404) "HTTP_404"
            else if (fr.status == 500) "HTTP_500"
            else if (!fr.contentType.contains("text/html")) "UNSUPPORTED_CONTENT_TYPE"
            else if (fr.sizeBytes > 5L * 1024 * 1024) "CONTENT_TOO_LARGE"
            else "OK"
          val (title, text, links) =
            if (status == "OK") {
              val ex = Extract.extract(fr.html, url, 0L, Extract.Options(format = "text"))
              val ls = if (depth < maxDepth)
                SyntheticWeb.pageLinks(fr.html, url, sameHostOnly)
              else Seq.empty
              (ex.title, ex.content, ls)
            } else ("", "", Seq.empty[String])
          FetchedRow(url, urlHash, host, depth, rNo, orderIdx, pid,
            status, title, text, links, fr.etag)
        }
      }

    val fetchedCached = fetched.cache()
    // taken row count is already known from the FIFO-index partition counts
    // (min(total, room)) — a count() action here would be one more full
    // Spark job per round; materialization of the cached fetch happens on
    // the first real consumer (children / seen-delta checkpoint / commit)
    val takenCount = math.min(indexedTotal, math.max(0L, room))

    // 6. children → next frontier (anti-join vs seen happens next round;
    //    we pre-filter against this round's seen delta for compactness)
    val children = fetchedCached
      // depth rides the exploded row directly — the former self-join of
      // fetchedCached with itself on parent_order re-derived a value that
      // is already on the same row, paying a per-round join (guide §2.4:
      // remove shuffles outright)
      .select(col("order_idx").as("parent_order"),
        (col("depth") + 1).as("depth"), posexplode(col("links")))
      .select(
        col("col").as("url"),
        col("parent_order"),
        col("pos").as("link_pos"),
        col("depth"))
      // native Catalyst expressions (codegen'd) — same kernel bit-for-bit
      .withColumn("url_hash", graft.functions.UrlExpressions.url_hash64(col("url")))
      .withColumn("host", coalesce(
        graft.functions.UrlExpressions.url_host(col("url")), lit("")))
      .withColumn("priority", col("depth").cast("double")) // BFS: priority=depth
      .withColumn("next_fetch_time", lit(0L))
      .select(frontierCols: _*).as[FrontierRow]

    val seenDelta = fetchedCached.select(col("url_hash"), col("url"))

    RoundResult(
      fetched = fetchedCached.drop("links"),
      newFrontier = deferredByBudget.union(overflow).union(children),
      seenDelta = seenDelta,
      taken = takenCount,
      cleanup = () => { ranked.unpersist(false); () })
  }

  /** Union-plan collapse interval for iterative crawls (see [[crawl]]). */
  private val planCollapseEvery = 8

  /** Per-round seen-membership mode decisions of the most recent [[crawl]]
    * ((round, "anti"|"bloom"|"index"|"switch_to_index@N")) — diagnostic,
    * CrawlSpec asserts the auto-switch fires at its threshold. */
  @volatile var lastSeenModeLog: List[(Int, String)] = Nil

  private val frontierCols = Seq(
    col("url"), col("url_hash"), col("host"), col("depth"),
    col("parent_order"), col("link_pos"),
    col("priority"), col("next_fetch_time"))

  /** A frontier row carrying its global FIFO order index. */
  final case class IndexedRow(
      url: String, url_hash: Long, host: String, depth: Int,
      parent_order: Long, link_pos: Int,
      priority: Double, next_fetch_time: Long, order_idx: Long)

  /** Distributed global FIFO index: range-partition by the FIFO key, then
    * local rank + broadcast prefix offsets — no single-partition window. */
  def withGlobalFifoIndex(spark: SparkSession, df: DataFrame,
      startAt: Long): DataFrame =
    withGlobalFifoIndexCounted(spark, df, startAt, -1L)._1

  /** Same, also returning the total row count (already known from the
    * per-partition counts — callers must not pay another count() job).
    *
    * This is the scheduling hot path (every frontier row, every round), so
    * both passes stay TYPED: per-partition counts come from a one-row-per-
    * partition mapPartitions (no groupBy shuffle — the range partitioning
    * already did the only shuffle this operator needs), and the index
    * append is a case-class map (Tungsten codegen encoders) instead of a
    * per-row `Row.fromSeq(row.toSeq :+ v)` — the generic path allocated a
    * Seq copy + object Row per row, the round-1 lesson's 32-thread scaling
    * killer (BASELINE.md). */
  def withGlobalFifoIndexCounted(spark: SparkSession, df: DataFrame,
      startAt: Long, estRows: Long = -1L): (DataFrame, Long) = {
    import spark.implicits._
    // scale-adaptive partition count (guide §2.2): with a caller-supplied
    // row estimate, size range partitions at ~1M FrontierRows (~150 MB)
    // instead of a constant fan. The big win is small frontiers: at
    // parts == 1 the RangePartitioner computes NO bounds, so the sampling
    // pass — a whole extra Spark job executing the dedupe→anti-join→window
    // pipeline per round — disappears. order_idx is a prefix sum over the
    // sorted ranges, so the result is identical at any partition count.
    val dp = spark.sparkContext.defaultParallelism
    val parts =
      if (estRows >= 0)
        math.max(1L, math.min(estRows / (1L << 20) + 1, dp.toLong * 4)).toInt
      else math.max(1, dp / 2)
    val sorted = df.select(frontierCols: _*).as[FrontierRow]
      .repartitionByRange(parts, col("parent_order"), col("link_pos"), col("url_hash"))
      .sortWithinPartitions(col("parent_order"), col("link_pos"), col("url_hash"))
    val sortedCached = sorted.cache()
    val counts = sortedCached
      .mapPartitions { it =>
        var n = 0L
        while (it.hasNext) { it.next(); n += 1 }
        Iterator.single((org.apache.spark.TaskContext.getPartitionId(), n))
      }
      .collect().sortBy(_._1)
    var acc = startAt
    val starts = counts.map { case (pid, n) =>
      val s = pid -> acc; acc += n; s
    }.toMap
    val bStarts = spark.sparkContext.broadcast(starts)
    val out = sortedCached.mapPartitions { it =>
      var idx = Long.MinValue
      it.map { r =>
        if (idx == Long.MinValue)
          idx = bStarts.value.getOrElse(org.apache.spark.TaskContext.getPartitionId(), 0L)
        val v = idx
        idx += 1
        IndexedRow(r.url, r.url_hash, r.host, r.depth, r.parent_order,
          r.link_pos, r.priority, r.next_fetch_time, v)
      }
    }
    (out.toDF(), counts.map(_._2).sum)
  }

  /** Drive a full crawl from seeds; returns (all fetched rows, final seen).
    * When `store` is given, every round commits deltas + lineage and the
    * crawl can resume from the latest snapshot. */
  def crawl(spark: SparkSession, seeds: Seq[String], cfg: Config,
      store: Option[SnapshotStore] = None): (DataFrame, DataFrame) = {
    import spark.implicits._
    val emptySeen = Seq.empty[(Long, String)].toDF("url_hash", "url")
    // frontier row-count estimate for scale-adaptive range partitioning
    // (only order-of-magnitude accuracy is needed; see
    // withGlobalFifoIndexCounted). Seeded exactly, then advanced per round
    // with a deliberate over-estimate of the child fan-out.
    var frontierEst: Long = -1L
    var state = store.flatMap(_.loadLatest(spark)) match {
      case Some(s) =>
        // one cheap metadata-driven parquet count per RESUME (not per round)
        frontierEst = s.frontier.count()
        s
      case None =>
        frontierEst = seeds.size.toLong
        CrawlState(seedFrontier(spark, seeds).toDF(), emptySeen, emptyFetched(spark), 0, 0L)
    }
    // resident exact seen index. With a store, the durable sidecar
    // ([[SeenIndexStore]]) is preferred: load is a zero-shuffle per-bucket
    // file read + an O(missed deltas) top-up, NOT the O(seen) shuffle+sort
    // of fromSeen — which remains the storeless / no-sidecar fallback (and
    // then seeds the sidecar so the NEXT resume loads).
    def buildIndex(st8: CrawlState): SeenIndex = {
      val bucketsIfNew =
        SeenIndex.bucketsFor(spark, math.max(st8.fetchedCount, cfg.maxPages))
      // full rebuild from the committed seen table, wiping the sidecar
      // first: once we're here the dir's files are either absent or
      // untrustworthy (foreign/rolled-back timeline), and writeRun's
      // exists-skip must not keep any of them over the rebuild's writes
      def rebuild(st: SnapshotStore): SeenIndex = {
        SeenIndexStore.wipe(st.indexDir)
        val idx = SeenIndex.fromSeen(spark, st8.seen, bucketsIfNew,
          Some(SeenIndexStore.Sink(st.indexDir, st8.round)))
        SeenIndexStore.writeManifest(st.indexDir, idx.buckets, st8.round)
        idx
      }
      store match {
        case Some(st) =>
          SeenIndexStore.load(spark, st.indexDir, st8.round) match {
            case Some((idx0, idxRound)) =>
              // run files AHEAD of the committed store round belong to an
              // abandoned timeline: delete them now, or the exists-skip
              // would keep their stale content when this crawl re-reaches
              // those rounds (files in (idxRound, round] are same-timeline
              // derivations of committed deltas and stay)
              SeenIndexStore.invalidateAhead(st.indexDir, st8.round)
              var idx = idx0
              ((idxRound + 1) to st8.round).foreach { k =>
                st.seenDeltaPath(k).foreach { p =>
                  // idempotent add: after snapshot expiry the compacted
                  // keepRound delta holds the union of expired rounds —
                  // already-resident hashes are dropped bucket-locally
                  idx = SeenIndex.add(idx, spark.read.parquet(p),
                    Some(SeenIndexStore.Sink(st.indexDir, k)))
                }
              }
              if (st8.round > idxRound) {
                SeenIndexStore.writeManifest(st.indexDir, idx.buckets, st8.round)
                SeenIndexStore.gc(st.indexDir, st8.round)
              }
              // integrity cross-check (idx.count is maintained exactly;
              // the seen side is one count job — valid because seen is
              // unique BY HASH by construction: membership is tested on
              // url_hash, so a colliding url is classified seen and never
              // appended, and plain count == distinct-hash count at any
              // scale): a missing or truncated
              // run file SHRINKS membership silently instead of failing —
              // on mismatch, fall back to the fromSeen rebuild. A false
              // positive only costs the rebuild; a false negative would
              // re-fetch/re-emit pages, so the check is deliberately
              // conservative
              val seenCount = st8.seen.count()
              if (idx.count != seenCount) {
                idx.release()
                rebuild(st)
              } else idx
            case None => rebuild(st)
          }
        case None => SeenIndex.fromSeen(spark, st8.seen, bucketsIfNew)
      }
    }
    val modeLog = scala.collection.mutable.ArrayBuffer[(Int, String)]()
    // --- small-round fast path (guide §1.2/§2.2) -----------------------
    // While a round's working set (frontier estimate and seen set) is
    // small, every stage holds a few thousand rows per task at cluster
    // fan-out: AQE's per-query-stage jobs + driver re-optimization and
    // 32-way shuffles cost more wall time than they save (measured at
    // sf0.1: q30 3.4s → 2.1s, q94 3.1s → 2.2s). Below the threshold the
    // loop scopes AQE off and sizes shuffle partitions from the estimate
    // (~64k rows/partition, floor 8); at or above it the normal path keeps
    // AQE's coalescing and skew handling. The switch derives from DATA
    // SIZE, not the local core count, and both confs are restored on exit.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevShuf = spark.conf.get("spark.sql.shuffle.partitions")
    val smallRoundMax = 2000000L
    def scaleRoundConfs(): Unit = {
      val est = math.max(frontierEst, state.fetchedCount)
      if (est >= 0 && est < smallRoundMax) {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions",
          math.max(8L, est / (64L << 10)).toString)
      } else {
        spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
        spark.conf.set("spark.sql.shuffle.partitions", prevShuf)
      }
    }
    var seenIdx: Option[SeenIndex] =
      if (cfg.exactSeenIndex) Some(buildIndex(state)) else None
    var continue = state.fetchedCount < cfg.maxPages
    // try/finally: a throw anywhere in the loop (e.g. CommitConflictException
    // from a losing OCC writer) must still release the resident index blocks
    // and the current round's transient caches — exception exits used to
    // leak one persisted frontier + the index per failed crawl invocation
    try while (continue) {
      scaleRoundConfs()
      // auto mode selection: once the seen set crosses the configured
      // crossover, stop paying the O(seen) anti-join shuffle per round
      // and go resident (decision logged per crawl in lastSeenModeLog)
      if (seenIdx.isEmpty && cfg.autoSeenIndexAt >= 0 &&
          state.fetchedCount >= cfg.autoSeenIndexAt) {
        seenIdx = Some(buildIndex(state))
        modeLog += ((state.round, s"switch_to_index@${state.fetchedCount}"))
      }
      modeLog += ((state.round,
        if (seenIdx.isDefined) "index"
        else if (cfg.bloomPrefilter) "bloom" else "anti"))
      // no isEmpty pre-check: an empty frontier yields taken == 0 in the
      // round itself — the pre-check was one extra Spark job per round
      val fr = state.frontier.as[FrontierRow]
      val r = round(spark, fr, state.seen, state.round, state.fetchedCount, cfg,
        seenIdx, frontierEst)
      try if (r.taken == 0) continue = false
      else {
        // The round's outputs are materialized exactly ONCE, and the
        // lineage cut rides on that materialization — without a cut each
        // round's DAG embeds all previous rounds and the driver OOMs on
        // plan strings alone. With a store, the snapshot COMMIT is the
        // materialization: frontier + seen delta are written to committed
        // parquet and read back as the next state's leaves (r1-r8
        // additionally localCheckpoint-ed the same rows first, writing
        // every frontier byte twice per round — half the commit overhead
        // the r8 interleaved A/B measured). Without a store,
        // localCheckpoint is the cut. Either way the seen set is NEVER
        // rewritten per round: only the O(delta) round delta is
        // materialized and unioned in — at 10^10 URLs a per-round full
        // rewrite of the seen table would dominate every round's cost.
        // `fetched` deltas are already cached with flat lineage.
        val (frontierNext, seenDeltaCk) = store match {
          case Some(st) =>
            val pending = CrawlState(
              frontier = r.newFrontier.toDF(),
              seen = state.seen, // commit reads only frontier/round/count
              fetched = state.fetched,
              round = state.round + 1,
              fetchedCount = state.fetchedCount + r.taken)
            st.commit(spark, pending, r)
            (spark.read.parquet(st.frontierPath(pending.round)),
              spark.read.parquet(st.seenDeltaPath(pending.round).get))
          case None =>
            (r.newFrontier.toDF().localCheckpoint(true),
              r.seenDelta.localCheckpoint(true))
        }
        var newState = CrawlState(
          frontier = frontierNext,
          seen = state.seen.union(seenDeltaCk),
          fetched = state.fetched.union(r.fetched),
          round = state.round + 1,
          fetchedCount = state.fetchedCount + r.taken)
        // O(delta) index maintenance (invalidates the previous index).
        // With a store, the round's run events persist into the sidecar
        // DURING the add's materialization, and the index manifest
        // advances only after the snapshot commit above succeeded — so
        // the sidecar can never claim rounds the table doesn't have.
        seenIdx = seenIdx.map { idx =>
          val sink = store.map(st => SeenIndexStore.Sink(st.indexDir, newState.round))
          val next = SeenIndex.add(idx, seenDeltaCk, sink)
          store.foreach { st =>
            SeenIndexStore.writeManifest(st.indexDir, next.buckets, newState.round)
            SeenIndexStore.gc(st.indexDir, newState.round)
          }
          next
        }
        // the per-round delta checkpoints keep LINEAGE flat, but the union
        // TREE itself still deepens one node per round — a 10^4-round crawl
        // would accrete a 10^4-way union plan on the driver. Collapse it
        // every K rounds: with a store, reload the state from the committed
        // snapshot (a flat multi-path parquet scan); without one, cut the
        // union into a single materialized leaf. O(seen) cost amortized
        // over K rounds; plan size now O(K), independent of crawl length.
        if (newState.round % planCollapseEvery == 0) {
          newState = store.flatMap(_.loadLatest(spark)) match {
            case Some(s) => s
            case None => newState.copy(
              seen = newState.seen.localCheckpoint(true),
              fetched = newState.fetched.localCheckpoint(true))
          }
        }
        state = newState
        // next frontier ≤ carried-over rows + children; bound the child
        // fan-out generously (each link slot can emit a couple of forms) —
        // the estimate only picks a partition-count order of magnitude
        frontierEst =
          if (frontierEst < 0) -1L
          else math.max(0L, frontierEst - r.taken) +
            r.taken * math.max(8L, 4L * cfg.web.linksPerPage)
        if (state.fetchedCount >= cfg.maxPages) continue = false
        if (state.round >= cfg.maxRounds) continue = false
      }
      // release the round's transient ranked-frontier cache on EVERY exit:
      // taken==0 termination and exception paths included (the outputs are
      // either materialized by now or abandoned — unpersist is safe both ways)
      finally r.cleanup()
    }
    finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.shuffle.partitions", prevShuf)
      seenIdx.foreach(_.release())
      lastSeenModeLog = modeLog.toList
    }
    (state.fetched, state.seen)
  }

  def emptyFetched(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, Long, String, Int, Int, Long, Int, String, String, String, String)]
      .toDF("url", "url_hash", "host", "depth", "round", "order_idx",
        "partition_id", "status", "title", "text", "etag")
  }

  final case class CrawlState(
      frontier: DataFrame, seen: DataFrame, fetched: DataFrame,
      round: Int, fetchedCount: Long)
}
