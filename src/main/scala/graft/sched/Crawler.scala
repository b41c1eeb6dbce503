package graft.sched

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter
import graft.frontier.FrontierStore
import graft.model.TaskStatus

/**
 * Superstep crawl driver: seeds -> frontier generations -> checkpointed
 * snapshots, resumable (SURVEY §3.2 resume contract: state = frontier table
 * + politeness tokens, both persisted; a resumed run continues the exact
 * deterministic schedule because `now` advances as now0 + step*tick, never
 * wall clock).
 */
object Crawler {

  final case class CrawlConfig(
      step: Superstep.Config = Superstep.Config(),
      /** deterministic virtual clock: now = now0 + step*tick */
      now0: Double = 1700000000.0,
      tick: Double = 1.0,
      maxSteps: Int = 10,
      /** bloom pre-filter for the URL-seen anti-join; <=0 disables */
      bloomExpectedItems: Long = 0L,
      bloomFpp: Double = 0.01,
      /** robots gate join is broadcast only while the robots table stays
        * under this host count; beyond it (web scale: one row per host) it
        * falls back to a shuffle join keyed by host */
      broadcastRobotsMaxHosts: Long = 100000L,
      /** storage level for the prepared pages index (html bytes); DISK_ONLY
        * keeps a large pages table out of executor heap */
      pagesStorage: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  final case class CrawlRun(
      steps: Int,
      totalScheduled: Long,
      totalFresh: Long,
      frontier: DataFrame,
      results: DataFrame,
      countersPerStep: Seq[DataFrame])

  val resultSchema: StructType = StructType(Seq(
    StructField("project", StringType), StructField("url_hash", LongType),
    StructField("url", StringType), StructField("type", StringType),
    StructField("data", MapType(StringType, StringType)),
    StructField("seed_url", StringType), StructField("updatetime", DoubleType)))

  /** Build the seed frontier from (project, url) pairs. */
  def seedFrontier(spark: SparkSession, seeds: Seq[(String, String)], now: Double): DataFrame = {
    import spark.implicits._
    seeds.toDF("project", "raw_url")
      .withColumn("url", expr("canonicalize_url(raw_url)"))
      .withColumn("url_hash", xxhash64($"url"))
      .withColumn("host", expr("url_host(url)"))
      .select($"project", $"url_hash", $"url", $"host",
        lit(TaskStatus.Active).as("status"), lit(0).as("priority"),
        lit(0.0).as("exetime"), lit(3).as("retries"), lit(0).as("retried"),
        lit(-1.0).as("age"), lit(null).cast("string").as("itag"),
        lit(true).as("force_update"), lit(false).as("auto_recrawl"),
        lit(false).as("cancel"), $"url".as("seed_url"), lit("link").as("method"),
        lit("").as("data"), lit(0.0).as("lastcrawltime"), lit(now).as("updatetime"))
      // in-config dedup of seed lists
      .withColumn("rn", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy($"project", $"url_hash").orderBy($"url".asc)))
      .where($"rn" === 1).drop("rn")
  }

  def emptyBudgets(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("project", StringType), StructField("host", StringType),
        StructField("tokens", DoubleType), StructField("last_update", DoubleType))))

  def emptyResults(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], resultSchema)

  /**
   * Run (or resume) a crawl.
   *
   * @param store   optional snapshot store; None = in-memory with
   *                localCheckpoint lineage truncation (benchmarks)
   */
  def run(spark: SparkSession, pages: DataFrame, projects: DataFrame,
      seeds: Seq[(String, String)], cfg: CrawlConfig,
      store: Option[FrontierStore] = None): CrawlRun = {

    val (pagesIdx, robots) = Superstep.preparePages(spark, pages)
    pagesIdx.persist(cfg.pagesStorage)
    robots.persist()
    // size-gate the robots broadcast ONCE per crawl (robots is persisted, the
    // count is one cheap scan): at web scale (one row per host) an
    // unconditional broadcast would OOM the driver/executors
    val robotsHosts = robots.count()
    val stepCfg = cfg.step.copy(broadcastRobots =
      cfg.step.broadcastRobots && robotsHosts <= cfg.broadcastRobotsMaxHosts)

    // resume or init
    val resumed = store.flatMap(_.read(spark))
    var stepNo = resumed.map(_.step).getOrElse(0)
    var frontier = resumed.map(_.frontier)
      .getOrElse(seedFrontier(spark, seeds, cfg.now0).localCheckpoint())
    var budgets = resumed.map(_.budgets).getOrElse(emptyBudgets(spark))
    var results = resumed.map(_.results).getOrElse(emptyResults(spark))

    // optional driver-held bloom over already-seen url hashes (rebuilt on
    // resume from the frontier — one scan; merged incrementally per step).
    // False positives only route follows into the exact anti-join: the bloom
    // is never the source of truth (SURVEY §2.4 note).
    val bloom: Option[BloomFilter] =
      if (cfg.bloomExpectedItems > 0) {
        val b = frontier.stat.bloomFilter("url_hash", cfg.bloomExpectedItems, cfg.bloomFpp)
        Some(b)
      } else None

    var totalScheduled = 0L
    var totalFresh = 0L
    val counters = Seq.newBuilder[DataFrame]
    var done = false
    // exact remaining-ACTIVE count: one scan at start/resume, then pure
    // arithmetic from the per-step status deltas (fresh inserts are ACTIVE;
    // terminal transitions are SUCCESS/FAILED). "Nothing dispatched this
    // tick" is NOT emptiness — retry backoff (exetime in the future) and
    // sub-1-token politeness refills legitimately schedule 0 while ACTIVE
    // tasks remain, and the crawl must keep ticking.
    var activeRemaining = frontier
      .where(col("status") === TaskStatus.Active).count()

    while (!done && stepNo < cfg.maxSteps) {
      val now = cfg.now0 + (stepNo + 1) * cfg.tick
      val mc = bloom.map { b =>
        val bc = spark.sparkContext.broadcast(b)
        val f = udf((h: Long) => bc.value.mightContainLong(h))
        (c: org.apache.spark.sql.Column) => f(c)
      }
      val r = Superstep.run(spark, frontier, budgets, pagesIdx, robots, projects,
        now, stepCfg, mc)

      val newResultsAll = results.unionByName(
        // first-writer-wins upsert by url_hash (REPLACE INTO + one-crawl-per-url)
        r.newResults.join(results.select("project", "url_hash"),
          Seq("project", "url_hash"), "left_anti"))

      stepNo += 1
      store match {
        case Some(s) =>
          s.write(spark, stepNo, now, r.frontier, r.budgets, newResultsAll, r.counters)
          val snap = s.read(spark).get
          frontier = snap.frontier; budgets = snap.budgets; results = snap.results
        case None =>
          frontier = r.frontier.localCheckpoint()
          budgets = r.budgets.localCheckpoint()
          results = newResultsAll.localCheckpoint()
      }
      counters += r.counters.withColumn("step", lit(stepNo))

      // update the bloom with this step's fresh keys
      bloom.foreach { b =>
        if (r.fresh > 0) {
          // must share bit size with the main filter to be mergeable
          val nb = r.frontier.where(col("updatetime") === now && col("lastcrawltime") === 0.0)
            .stat.bloomFilter("url_hash", cfg.bloomExpectedItems, cfg.bloomFpp)
          b.mergeInPlace(nb)
        }
      }

      totalScheduled += r.scheduled
      totalFresh += r.fresh
      r.unpersistAll()
      // terminate only when no ACTIVE task remains anywhere — scheduled==0
      // alone can be a backoff/politeness lull, not emptiness
      activeRemaining += r.fresh - (r.doneSuccess + r.failed)
      done = activeRemaining == 0
    }

    pagesIdx.unpersist(false)
    robots.unpersist(false)
    CrawlRun(stepNo, totalScheduled, totalFresh, frontier, results, counters.result())
  }
}
