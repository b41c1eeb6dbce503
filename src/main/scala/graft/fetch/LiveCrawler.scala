package graft.fetch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sched.{Crawler, Superstep}

/**
 * Live-backend crawl loop (S9 as a deployment mode, not just a seam test):
 * each superstep live-captures the READY slice of the frontier through
 * [[LiveFetch]] into a transient pages table and advances the standard
 * superstep against it — identical crawl semantics to the archived-capture
 * path because both feed the same `Superstep.preparePages` interface.
 *
 * robots.txt captures are cached per host for `robotsTtlSeconds` of VIRTUAL
 * crawl time, matching the reference's fetcher-side per-domain cache with
 * `robot_txt_age = 60*60` (tornado_fetcher.py:82,291-314): a steady-state
 * superstep fetches only content urls. The cache is driver state
 * deliberately — hosts-with-a-ready-task per step is politeness-bounded
 * (W1/A7), orders of magnitude smaller than the frontier, the same class of
 * bounded driver state as Crawler's per-project counters. A failed robots
 * capture (404 / transport) is cached as allow-all for the TTL, exactly like
 * the reference's error branch (tornado_fetcher.py:303-306).
 */
object LiveCrawler {

  final case class LiveRun(steps: Int, frontier: DataFrame, results: DataFrame,
      totalScheduled: Long, totalFresh: Long,
      /** robots.txt GETs actually issued (cache misses), for observability */
      robotsFetches: Long)

  def run(spark: SparkSession, projects: DataFrame, seeds: Seq[(String, String)],
      maxSteps: Int, cfg: Superstep.Config = Superstep.Config(),
      now0: Double = 1700000000.0, tick: Double = 1.0,
      robotsTtlSeconds: Double = 3600.0,
      /** url-list -> pages-schema capture; swap for a fixture in tests */
      fetch: (SparkSession, DataFrame) => DataFrame =
        (s, urls) => LiveFetch.fetchPages(s, urls),
      /** optional COW snapshot store — the live deployment mode: same
        * bootstrap/commit/resume protocol as [[Crawler.run]], so a killed
        * live crawl resumes from the last committed snapshot and the J1
        * seen-probe runs against the bucketed bloom index */
      store: Option[graft.frontier.FrontierStore] = None): LiveRun = {
    import spark.implicits._

    store.foreach { s =>
      if (s.currentId.isEmpty) {
        val sf = Crawler.seedFrontier(spark, seeds, now0)
        s.writeIncremental(spark, 0, now0, sf, sf.select("project", "url_hash"),
          Crawler.emptyBudgets(spark), Crawler.emptyResults(spark),
          Crawler.emptyCounters(spark))
      }
    }
    val resumed = store.flatMap(_.read(spark))
    var step = resumed.map(_.step).getOrElse(0)
    var frontier = resumed.map(_.frontier)
      .getOrElse(Crawler.seedFrontier(spark, seeds, now0).localCheckpoint())
    var budgets = resumed.map(_.budgets).getOrElse(Crawler.emptyBudgets(spark))
    var results = resumed.map(_.results).getOrElse(Crawler.emptyResults(spark))
    // host -> (capturedAtVirtualTime, robots bytes | null = allow-all)
    val robotsCache = scala.collection.mutable.Map.empty[String, (Double, Array[Byte])]
    var robotsFetches = 0L
    var totalScheduled = 0L
    var totalFresh = 0L
    var done = false

    while (step < maxSteps && !done) {
      step += 1
      val now = now0 + step * tick
      val ready = frontier
        .where($"status" === graft.model.TaskStatus.Active && $"exetime" <= now)
        .localCheckpoint()

      // ---- robots refresh for hosts whose cache entry is absent or older
      // than the TTL (virtual clock, like every other time in the crawl)
      val hosts = ready.select($"host").distinct().as[String].collect().toSeq.sorted
      if (cfg.respectRobots) {
        val stale = hosts.filter(h =>
          robotsCache.get(h).forall(now - _._1 > robotsTtlSeconds))
        if (stale.nonEmpty) {
          robotsFetches += stale.size
          val captured = fetch(spark, stale.map(h => s"http://$h/robots.txt").toDF("url"))
            .select("url", "html").collect()
            .map(r => graft.url.UrlCanon.hostOf(r.getAs[String]("url")) ->
              r.getAs[Array[Byte]]("html")).toMap
          stale.foreach(h => robotsCache(h) = (now, captured.getOrElse(h, null)))
        }
      }

      // ---- transient pages table: live content capture + cached robots
      // rows (the robots side of preparePages reads /robots.txt rows)
      val content = fetch(spark, ready.select("url", "etag", "last_modified"))
      val ts0 = new java.sql.Timestamp(0L)
      val robotsRows = hosts
        .flatMap(h => robotsCache.get(h).flatMap(v => Option(v._2))
          .map(bytes => (s"http://$h/robots.txt", ts0, bytes, "", "en",
            200, null: String, null: String, null: String)))
        .toDF("url", "warc_ts", "html", "text", "lang", "http_status",
          "location", "etag", "last_modified")
      val (pagesIdx, robots) =
        Superstep.preparePages(spark, content.unionByName(robotsRows))

      val r = Superstep.run(spark, frontier, budgets, pagesIdx, robots,
        projects, now, cfg, store.flatMap(_.seenFilter(spark)))
      val delta = r.newResults.join(
        results.select($"project", $"url_hash"), Seq("project", "url_hash"), "left_anti")
      store match {
        case Some(s) =>
          s.writeIncremental(spark, step, now, r.upserts, r.freshKeys,
            r.budgets, delta, r.counters)
          val snap = s.read(spark).get
          frontier = snap.frontier; budgets = snap.budgets; results = snap.results
        case None =>
          frontier = r.frontier.localCheckpoint()
          budgets = r.budgets.localCheckpoint()
          results = results.unionByName(delta).localCheckpoint()
      }
      totalScheduled += r.scheduled
      totalFresh += r.fresh
      r.unpersistAll()

      // live mode has no global pages table to drain: stop when no ACTIVE
      // task remains (backoff'd retries keep the crawl ticking, same
      // contract as Crawler)
      done = frontier.where($"status" === graft.model.TaskStatus.Active).count() == 0
    }
    LiveRun(step, frontier, results, totalScheduled, totalFresh, robotsFetches)
  }
}
