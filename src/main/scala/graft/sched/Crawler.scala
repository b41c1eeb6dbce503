package graft.sched

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.frontier.{FrontierStore, SnapshotStore}
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
      countersPerStep: Seq[DataFrame],
      /** projects whose ACTIVE set drained to zero during this run, in the
        * order they finished (scheduler.py:348-374 on_finished; the
        * FAIL_PAUSE_NUM debounce is an async-queue artifact — the superstep
        * sees per-project emptiness exactly) */
      finishedProjects: Seq[String] = Nil,
      /** cumulative per-project counter totals INCLUDING prior runs resumed
        * from a store snapshot (reference counter reload: counter.py:416-434
        * + scheduler.py:135-137) */
      counterTotals: Map[String, Map[String, Long]] = Map.empty,
      /** wall seconds per superstep of THIS run (bench attribution) */
      stepSeconds: Seq[Double] = Nil)

  val resultSchema: StructType = StructType(Seq(
    StructField("project", StringType), StructField("url_hash", LongType),
    StructField("url", StringType), StructField("type", StringType),
    StructField("data", MapType(StringType, StringType)),
    StructField("seed_url", StringType), StructField("updatetime", DoubleType)))

  /** Build the seed frontier from (project, url) pairs. */
  def seedFrontier(spark: SparkSession, seeds: Seq[(String, String)], now: Double): DataFrame = {
    import spark.implicits._
    seedFrontierDf(spark, seeds.toDF("project", "raw_url"), now)
  }

  /** DataFrame-native seed construction: (project, raw_url) rows -> frontier
    * rows. The streaming path feeds micro-batches through this directly —
    * seeds never collect to the driver. */
  def seedFrontierDf(spark: SparkSession, seeds: DataFrame, now: Double): DataFrame = {
    import spark.implicits._
    seeds
      .withColumn("url", expr("canonicalize_url(raw_url)"))
      .withColumn("url_hash", xxhash64($"url"))
      .withColumn("host", expr("url_host(url)"))
      .select($"project", $"url_hash", $"url", $"host",
        lit(TaskStatus.Active).as("status"), lit(0).as("priority"),
        lit(0.0).as("exetime"), lit(3).as("retries"), lit(0).as("retried"),
        lit(-1.0).as("age"), lit(null).cast("string").as("itag"),
        lit(true).as("force_update"), lit(false).as("auto_recrawl"),
        lit(false).as("cancel"), $"url".as("seed_url"), lit("link").as("method"),
        lit("").as("data"), lit(0.0).as("lastcrawltime"),
        RuntimeConst.stepConst(now).as("updatetime"),
        lit(null).cast("string").as("etag"), lit(null).cast("string").as("last_modified"),
        lit(false).as("crawled_ok"))
      // in-config dedup of seed lists
      .withColumn("rn", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy($"project", $"url_hash").orderBy($"url".asc)))
      .where($"rn" === 1).drop("rn")
  }

  /** Materialize a step's three carry frames (frontier, budgets, results)
    * in ONE localCheckpoint job: tag-union into a superset schema, split
    * back with narrow filters over the checkpointed rows. The three
    * separate eager checkpoints each paid their own plan + job-submission
    * round per superstep — pure fixed cost that dominates fixture-sized and
    * politeness-bound steps (guide §1.2: the per-step constant IS the
    * bottleneck at small step sizes). Values are unchanged: tags are
    * disjoint, the split filters recover exactly the input rows, so
    * determinism (x13) and every oracle hold. */
  private[graft] def checkpointCarry(frontier: DataFrame, budgets: DataFrame,
      results: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val (f2, b2, r2, _, _) = checkpointCarryFused(frontier, budgets, results, None, None)
    (f2, b2, r2)
  }

  /** [[checkpointCarry]] with optional extra legs fused into the SAME
    * one-job materialization (guide §1.2: at small step sizes every extra
    * action is a full round of driver planning + AQE stage waves — measured
    * ~20 stage-jobs for the counters action alone):
    *  - `counters` (tag 3): the step's LAZY counters aggregate
    *    (Superstep.Config.collectCounters=false) rides the checkpoint as
    *    (project, CSV-of-numeric-fields in the r_type slot); the returned
    *    Rows are recovered with a narrow filter-collect over the already-
    *    cached checkpoint RDD — values identical to the eager collect (same
    *    aggregate plan, same input), only the action count changes.
    *  - `packed` (tag 4): a (step,url,status,retried,exetime) projection
    *    (p7's per-step trajectory rows); `step` travels in the priority
    *    slot. Returned conformed back to its input schema. */
  /** The tagged-union plan the fused carry materializes (exposed for the
    * PlanDump dev harness — plan-shape inspection without running it). */
  private[graft] def carryUnionForDump(frontier: DataFrame, budgets: DataFrame,
      results: DataFrame, counters: Option[DataFrame], packed: Option[DataFrame]): DataFrame =
    carryUnion(frontier, budgets, results, counters, packed)

  private def carryUnion(frontier: DataFrame, budgets: DataFrame,
      results: DataFrame, counters: Option[DataFrame], packed: Option[DataFrame]): DataFrame = {
    val fc = Superstep.frontierCols
    val fSchema = graft.frontier.FrontierStore.frontierSchema
    def fnull(n: String) = lit(null).cast(fSchema(n).dataType).as(n)
    def nul(t: String, n: String) = lit(null).cast(t).as(n)
    val fPart = frontier.select((lit(0).as("tag") +: fc.map(col)) ++ Seq(
      nul("double", "b_tokens"), nul("double", "b_last_update"),
      nul("string", "r_type"), nul("map<string,string>", "r_data")): _*)
    val bPart = budgets.select((lit(1).as("tag") +: fc.map {
      case c @ ("project" | "host") => col(c)
      case other => fnull(other)
    }) ++ Seq(col("tokens").as("b_tokens"), col("last_update").as("b_last_update"),
      nul("string", "r_type"), nul("map<string,string>", "r_data")): _*)
    val rPart = results.select((lit(2).as("tag") +: fc.map {
      case c @ ("project" | "url_hash" | "url" | "seed_url" | "updatetime") => col(c)
      case other => fnull(other)
    }) ++ Seq(nul("double", "b_tokens"), nul("double", "b_last_update"),
      col("type").as("r_type"), col("data").as("r_data")): _*)
    val cPart = counters.map { cdf =>
      val names = cdf.schema.fieldNames.filter(_ != "project").toSeq
      val csv = concat_ws(",", names.map(n => col(n).cast("string")): _*)
      cdf.select((lit(3).as("tag") +: fc.map {
        case "project" => col("project")
        case other => fnull(other)
      }) ++ Seq(nul("double", "b_tokens"), nul("double", "b_last_update"),
        csv.as("r_type"), nul("map<string,string>", "r_data")): _*)
    }
    val pPart = packed.map { pdf =>
      pdf.select((lit(4).as("tag") +: fc.map {
        case c @ ("url" | "status" | "retried" | "exetime") => col(c)
        case "priority" => col("step").as("priority")
        case other => fnull(other)
      }) ++ Seq(nul("double", "b_tokens"), nul("double", "b_last_update"),
        nul("string", "r_type"), nul("map<string,string>", "r_data")): _*)
    }
    (Seq(fPart, bPart, rPart) ++ cPart ++ pPart).reduce(_ unionByName _)
  }

  private[graft] def checkpointCarryFused(frontier: DataFrame, budgets: DataFrame,
      results: DataFrame, counters: Option[DataFrame], packed: Option[DataFrame])
      : (DataFrame, DataFrame, DataFrame,
        Seq[org.apache.spark.sql.Row], Option[DataFrame]) = {
    import frontier.sparkSession.implicits._
    val fc = Superstep.frontierCols
    // Bound the checkpoint's partition count with a NARROW coalesce. Under
    // the small-step broadcast plan the loop has no exchange to reset
    // partitioning, so each carry leg inherits the previous checkpoint's
    // partitions and the union MULTIPLIES them (~3x per step — exponential:
    // an 8-step crawl reached a 40k-task stage). coalesce merges without a
    // shuffle; values and split-back semantics are unchanged.
    val maxParts = math.max(1, frontier.sparkSession.sessionState.conf.numShufflePartitions)
    val ck = carryUnion(frontier, budgets, results, counters, packed)
      .coalesce(maxParts).localCheckpoint()
    // conform each split frame back to its INPUT schema: the tag-union makes
    // every column nullable (other legs supply nulls), but downstream
    // contracts — query output schemas the driver hash-checks, x13's
    // frontier byte-compare — expect the original nullability. AssertNotNull
    // is metadata-only here (the split rows ARE the input rows, never null
    // where the input wasn't).
    def conform(df: org.apache.spark.sql.DataFrame,
        to: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
      df.select(to.map { f =>
        if (f.nullable) col(f.name)
        else org.apache.spark.sql.GraftColumnShim.column(
          org.apache.spark.sql.catalyst.expressions.objects.AssertNotNull(
            org.apache.spark.sql.GraftColumnShim.expression(col(f.name)))).as(f.name)
      }: _*)
    val f2 = conform(ck.where($"tag" === 0).select(fc.map(col): _*), frontier.schema)
    val b2 = conform(ck.where($"tag" === 1).select($"project", $"host",
      $"b_tokens".as("tokens"), $"b_last_update".as("last_update")), budgets.schema)
    val r2 = conform(ck.where($"tag" === 2).select($"project", $"url_hash", $"url",
      $"r_type".as("type"), $"r_data".as("data"), $"seed_url", $"updatetime"), results.schema)
    // counter-row recovery: narrow filter + collect over the cached
    // checkpoint RDD — rows were computed by the checkpoint job above, this
    // is driver-side unpacking, not a second pass over the step
    val counterRows: Seq[org.apache.spark.sql.Row] = counters match {
      case None => Nil
      case Some(cdf) =>
        val schema = cdf.schema
        val names = schema.fieldNames.filter(_ != "project").toSeq
        ck.where($"tag" === 3).select($"project", $"r_type").collect().toIndexedSeq.map { r =>
          val vals = r.getString(1).split(",", -1).map(_.toLong)
          new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
            schema.fieldNames.map {
              case "project" => r.getString(0): Any
              case n => vals(names.indexOf(n)): Any
            }, schema)
        }
    }
    val p2 = packed.map(pdf => conform(
      ck.where($"tag" === 4).select($"priority".as("step"), $"url", $"status",
        $"retried", $"exetime"), pdf.schema))
    (f2, b2, r2, counterRows, p2)
  }

  def emptyBudgets(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("project", StringType), StructField("host", StringType),
        StructField("tokens", DoubleType), StructField("last_update", DoubleType))))

  def emptyResults(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], resultSchema)

  def emptyCounters(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("project", StringType))))

  /**
   * Run (or resume) a crawl.
   *
   * @param store   optional snapshot store; None = in-memory with
   *                localCheckpoint lineage truncation (benchmarks)
   */
  def run(spark: SparkSession, pages: DataFrame, projects: DataFrame,
      seeds: Seq[(String, String)], cfg: CrawlConfig,
      store: Option[SnapshotStore] = None): CrawlRun = {

    val (pagesIdx, robots) = Superstep.preparePages(spark, pages)
    pagesIdx.persist(cfg.pagesStorage)
    robots.persist()
    // size-gate the robots broadcast ONCE per crawl (robots is persisted, the
    // count is one cheap scan): at web scale (one row per host) an
    // unconditional broadcast would OOM the driver/executors
    val robotsHosts = robots.count()
    val stepCfg = cfg.step.copy(broadcastRobots =
      cfg.step.broadcastRobots && robotsHosts <= cfg.broadcastRobotsMaxHosts)

    // resume or init. With a store, the seed frontier is committed as
    // snapshot 1 (bootstrap) so the seen-index covers seeds and a killed
    // run resumes from exactly the committed state.
    store.foreach { s =>
      if (s.currentId.isEmpty) {
        val sf = seedFrontier(spark, seeds, cfg.now0)
        s.writeIncremental(spark, 0, cfg.now0, sf,
          sf.select("project", "url_hash"), emptyBudgets(spark),
          emptyResults(spark), emptyCounters(spark))
      }
    }
    val resumed = store.flatMap(_.read(spark))
    var stepNo = resumed.map(_.step).getOrElse(0)
    var frontier = resumed.map(_.frontier)
      .getOrElse(seedFrontier(spark, seeds, cfg.now0).localCheckpoint())
    var budgets = resumed.map(_.budgets).getOrElse(emptyBudgets(spark))
    var results = resumed.map(_.results).getOrElse(emptyResults(spark))

    var totalScheduled = 0L
    var totalFresh = 0L
    val counters = Seq.newBuilder[DataFrame]
    var done = false // set from activeRemaining after the init scan below
    // exact remaining-ACTIVE count: one scan at start/resume, then pure
    // arithmetic from the per-step status deltas (fresh inserts are ACTIVE;
    // terminal transitions are SUCCESS/FAILED). "Nothing dispatched this
    // tick" is NOT emptiness — retry backoff (exetime in the future) and
    // sub-1-token politeness refills legitimately schedule 0 while ACTIVE
    // tasks remain, and the crawl must keep ticking.
    // per-project ACTIVE counts: one scan at start/resume, then arithmetic
    // from the per-project counter rows; a project draining to zero is
    // FINISHED (on_finished)
    val activeByProject = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    frontier.where(col("status") === TaskStatus.Active)
      .groupBy("project").count().collect()
      .foreach(r => activeByProject(r.getString(0)) = r.getLong(1))
    // termination counts ACTIVE tasks only over RUNNING (schedulable)
    // projects — a STOP/FINISHED project's parked tasks must not keep the
    // loop burning empty supersteps (the lifecycle gate never selects them)
    val runningSet: Set[String] =
      (if (projects.columns.contains("status"))
        projects.where(coalesce(col("status"), lit("RUNNING")) === "RUNNING")
      else projects).select("name").collect().map(_.getString(0)).toSet
    var activeRemaining =
      activeByProject.collect { case (p, n) if runningSet(p) => n }.sum
    // nothing schedulable at all (every project STOP/FINISHED/drained):
    // don't burn a single empty superstep
    done = activeRemaining == 0
    val finished = Seq.newBuilder[String]
    // cumulative counter totals: resume from the snapshot's persisted totals
    // (counter reload semantics), then fold each step's counter rows
    val totals = scala.collection.mutable.Map.empty[String, Map[String, Long]]
    resumed.foreach(_.counterTotals.foreach { case (p, m) => totals(p) = m })

    val stepSecs = Seq.newBuilder[Double]
    // small-step broadcast gate (Superstep.Config.smallStep): an UPPER BOUND
    // on the rows of state a superstep's broadcast-hinted build sides can
    // contain — frontier rows (seeds + cumulative fresh) plus budget-state
    // rows (bounded by cumulative scheduled: only consuming hosts get state
    // rows). Tracked arithmetically, never a job; scale-adaptive: a crawl
    // that outgrows the threshold switches itself back to shuffle plans.
    val smallThreshold = spark.conf.getOption("spark.graft.smallStepBroadcastRows")
      .map(_.toLong).getOrElse(100000L)
    // a resumed snapshot with UNKNOWN row count (-1, e.g. a SnapshotStore
    // implementation without lineage counts) must disable the small plan,
    // not enable it
    var stateRows: Long = (resumed match {
      case Some(s) if s.frontierRows >= 0 => s.frontierRows
      case Some(_) => Long.MaxValue / 2
      case None => seeds.size.toLong
    }) + totals.values.map(_.getOrElse("scheduled", 0L)).sum
    // both branches run the superstep with LAZY counters
    // (Config.collectCounters=false): the counters aggregate is fused into
    // the step's one materialization action (the carry checkpoint / the
    // store commit) instead of costing its own full round of driver
    // planning + ~20 AQE stage-jobs per step (guide §1.2)
    val lazyCfg = stepCfg.copy(collectCounters = false)
    while (!done && stepNo < cfg.maxSteps) {
      val tStep = System.nanoTime()
      val now = cfg.now0 + (stepNo + 1) * cfg.tick
      // with a store, the URL-seen probe is the bucketed bloom side-file
      // index (partition-local, no driver round-trip); without, the exact
      // anti-join runs against the in-memory frontier keys
      val seenF = store.flatMap(_.seenFilter(spark))
      val r = Superstep.run(spark, frontier, budgets, pagesIdx, robots, projects,
        now, lazyCfg.copy(smallStep = stateRows < smallThreshold), seenF)

      // first-writer-wins upsert by url_hash (REPLACE INTO + one-crawl-per-url,
      // resultdb.py:52-66): the superstep derives the delta from each task's
      // own crawled_ok history — O(step) per step, never a scan/anti-join of
      // the cumulative results table (verdict r04 item 1)
      val newResultsDelta = r.firstResults

      stepNo += 1
      // this step's per-project counter rows, recovered from whichever
      // action materialized the step (carry checkpoint / store manifest)
      var counterRows: Seq[org.apache.spark.sql.Row] = Nil
      store match {
        case Some(s) =>
          s.writeIncremental(spark, stepNo, now, r.upserts, r.freshKeys,
            r.budgets, newResultsDelta, r.counters)
          val snap = s.read(spark).get
          frontier = snap.frontier; budgets = snap.budgets; results = snap.results
          // per-step deltas = committed totals minus the running totals —
          // the store's commit already folded this step's counters into the
          // manifest (collected concurrently with the write jobs), so no
          // separate counters action runs
          val cSchema = r.counters.schema
          counterRows = snap.counterTotals.toSeq.sortBy(_._1).flatMap { case (p, after) =>
            val before = totals.getOrElse(p, Map.empty[String, Long])
            val delta = cSchema.fieldNames.map {
              case "project" => p: Any
              case n => (after.getOrElse(n, 0L) - before.getOrElse(n, 0L)): Any
            }
            if (delta.exists { case l: Long => l != 0L; case _ => false })
              Some(new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
                delta, cSchema))
            else None
          }
        case None =>
          // ONE fused materialization job for the three carry frames AND the
          // counters aggregate (see checkpointCarryFused) — the old shape
          // paid a separate counters-collect action (a full plan + ~20 AQE
          // stage waves) on top of the carry job every step
          val (f2, b2, r2, rows, _) = checkpointCarryFused(r.frontier, r.budgets,
            results.unionByName(newResultsDelta), Some(r.counters), None)
          frontier = f2; budgets = b2; results = r2
          counterRows = rows
      }
      val countersLocal = spark.createDataFrame(
        java.util.Arrays.asList(counterRows: _*), r.counters.schema)
      counters += countersLocal.withColumn("step", lit(stepNo))

      // per-project lifecycle: apply this step's status deltas; a project
      // whose ACTIVE set just drained is FINISHED
      var stepScheduled = 0L; var stepFresh = 0L; var stepDone = 0L; var stepFailed = 0L
      counterRows.foreach { row =>
        val p = row.getAs[String]("project")
        val before = activeByProject(p)
        val after = before + row.getAs[Long]("new_tasks") -
          (row.getAs[Long]("done_success") + row.getAs[Long]("failed_now"))
        activeByProject(p) = after
        if (before > 0 && after == 0) finished += p
        totals(p) = FrontierStore.foldCounterRowOne(totals.getOrElse(p, Map.empty), row)
        stepScheduled += row.getAs[Long]("scheduled")
        stepFresh += row.getAs[Long]("new_tasks")
        stepDone += row.getAs[Long]("done_success")
        stepFailed += row.getAs[Long]("failed_now")
      }
      totalScheduled += stepScheduled
      totalFresh += stepFresh
      stateRows += stepFresh + stepScheduled
      r.unpersistAll()
      // terminate only when no ACTIVE task remains anywhere — scheduled==0
      // alone can be a backoff/politeness lull, not emptiness
      activeRemaining += stepFresh - (stepDone + stepFailed)
      done = activeRemaining == 0
      stepSecs += (System.nanoTime() - tStep) / 1e9
    }

    pagesIdx.unpersist(false)
    robots.unpersist(false)
    CrawlRun(stepNo, totalScheduled, totalFresh, frontier, results, counters.result(),
      finished.result(), totals.toMap, stepSecs.result())
  }
}
