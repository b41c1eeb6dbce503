package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.frontier.{FrontierStore, SnapshotStore}
import graft.sched.{Crawler, Superstep}

/**
 * Continuous-mode wrapper (SURVEY §2.10): the reference is a long-running
 * 0.1s-tick loop; the Spark-native continuous variant is a Structured
 * Streaming query where each micro-batch = one superstep. New seed tasks
 * arrive on an unbounded stream (file source, Kafka, or MemoryStream in
 * tests); every trigger merges the batch's seeds into the persisted
 * frontier and advances the crawl by one superstep, committing a snapshot.
 *
 * The frontier itself stays in the FrontierStore (not in streaming state):
 * it is the same resumable state the batch driver uses, so batch and
 * streaming modes interoperate — you can stop the stream and continue with
 * `Crawler.run`, or vice versa. At-least-once semantics match the
 * reference's restart contract (SURVEY §3.2): an uncommitted superstep is
 * simply re-selected.
 */
object StreamingCrawl {

  /**
   * @param seedStream streaming DataFrame with columns (project, url)
   * @param tickSeconds deterministic virtual-clock advance per micro-batch
   */
  def start(spark: SparkSession, pages: DataFrame, projects: DataFrame,
      store: SnapshotStore, seedStream: DataFrame,
      cfg: Superstep.Config = Superstep.Config(),
      now0: Double = 1700000000.0, tickSeconds: Double = 1.0,
      trigger: Trigger = Trigger.ProcessingTime(0L),
      queryCheckpointDir: Option[String] = None): StreamingQuery = {

    val (pagesIdx, robots) = Superstep.preparePages(spark, pages)
    pagesIdx.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    robots.persist()

    val writer = seedStream.writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val snap = store.read(spark)
        val step = snap.map(_.step).getOrElse(0)
        val now = now0 + (step + 1) * tickSeconds
        var frontier = snap.map(_.frontier)
          .getOrElse(Crawler.seedFrontier(spark, Seq.empty, now0))
        val budgets = snap.map(_.budgets).getOrElse(Crawler.emptyBudgets(spark))

        // merge newly arrived seeds with full on_request semantics (J1/F5/F6:
        // unknown -> insert; known + force_update/itag/age -> restart). The
        // seeds stay a DataFrame end-to-end (no driver collect), and every
        // frontier-side operation is a scan probed by the BROADCAST seed
        // keys — a micro-batch never shuffles or full-outer-joins the
        // frontier: the on_request merge itself runs over only the frontier
        // rows whose keys appear in the batch.
        val keys = Seq("project", "url_hash")
        var seedUpserts = frontier.limit(0)
        var seedFreshKeys = frontier.select(keys.map(functions.col): _*).limit(0)
        var extraSeen: Option[DataFrame] = None
        val batchEmpty = batch.isEmpty
        if (!batchEmpty) {
          val seedRows = Crawler.seedFrontierDf(spark,
            batch.selectExpr("project", "url as raw_url"), now).localCheckpoint()
          val incKeys = seedRows.select(keys.map(functions.col): _*)
          val existing = frontier.join(broadcast(incKeys), keys, "left_semi")
          val mergedSeed = Superstep.mergeIncoming(existing, seedRows, now)
            .localCheckpoint()
          seedUpserts = mergedSeed
          seedFreshKeys = incKeys.join(
            broadcast(existing.select(keys.map(functions.col): _*)), keys, "left_anti")
          frontier = frontier.join(broadcast(incKeys), keys, "left_anti")
            .unionByName(mergedSeed)
          // this batch's seed keys postdate the snapshot seen-index — the
          // superstep treats them as seen via a broadcast overlay
          extraSeen = Some(incKeys)
        }

        // J1 probes the snapshot's bucketed bloom side-file index (+ the
        // in-batch seed overlay) — never an exact join against the full
        // frontier key set per micro-batch
        // LAZY counters: the aggregate collects on the store commit's
        // concurrent future (FrontierStore.writeIncremental) instead of its
        // own serial action per micro-batch. Small-step broadcast gate from
        // the snapshot's lineage row count (every hinted build side is
        // bounded by frontier+budget state, not by the seed batch size).
        val smallThreshold = spark.conf.getOption("spark.graft.smallStepBroadcastRows")
          .map(_.toLong).getOrElse(100000L)
        // unknown row count (-1) disables the small plan (see Crawler)
        val stateRows = (snap match {
          case Some(s) if s.frontierRows >= 0 => s.frontierRows
          case Some(_) => Long.MaxValue / 2
          case None => 0L
        }) + snap.map(_.counterTotals.values.map(_.getOrElse("scheduled", 0L)).sum)
          .getOrElse(0L)
        val r = Superstep.run(spark, frontier, budgets, pagesIdx, robots,
          projects, now, cfg.copy(collectCounters = false,
            smallStep = stateRows < smallThreshold),
          store.seenFilter(spark), extraSeen)
        // first-writer-wins delta from each task's crawled_ok history —
        // O(batch), no anti-join against the snapshot's cumulative results
        val newResultsDelta = r.firstResults
        // superstep upserts win over seed upserts when the same task was
        // both merged and selected this tick. Empty batches (pure superstep
        // ticks) skip the seed-union joins outright — an anti-join against a
        // limit(0) side still plans and executes two exchanges per commit.
        val upserts =
          if (batchEmpty) r.upserts
          else r.upserts.unionByName(
            seedUpserts.join(r.upserts.select(keys.map(functions.col): _*), keys, "left_anti"))
        val freshKeys =
          if (batchEmpty) r.freshKeys else r.freshKeys.unionByName(seedFreshKeys)
        store.writeIncremental(spark, step + 1, now, upserts, freshKeys,
          r.budgets, newResultsDelta, r.counters)
        r.unpersistAll()
      }

    queryCheckpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer.start()
  }
}
