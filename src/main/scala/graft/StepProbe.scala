package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import graft.gen.PageGen
import graft.sched.Crawler

/**
 * Dev harness: decompose the crawl superstep's fixed cost — per-step wall
 * time vs executor job time vs driver-side gap (Catalyst analysis/planning +
 * job-submission overhead). Run:
 *   sbt "runMain graft.StepProbe [hosts] [pagesPerHost] [steps]"
 */
object StepProbe {

  final class JobClock extends SparkListener {
    @volatile var jobs = 0
    @volatile var jobNanos = 0L
    private val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    override def onJobStart(j: SparkListenerJobStart): Unit =
      starts.put(j.jobId, System.nanoTime())
    override def onJobEnd(j: SparkListenerJobEnd): Unit = {
      val t0 = starts.remove(j.jobId)
      if (t0 != 0L) { jobs += 1; jobNanos += System.nanoTime() - t0 }
    }
    def snap(): (Int, Double) = (jobs, jobNanos / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val hosts = if (args.length > 0) args(0).toInt else 2000
    val pph = if (args.length > 1) args(1).toInt else 60
    val steps = if (args.length > 2) args(2).toInt else 4
    val spark = Udfs.newSession("local[32]", 32, "step-probe")
    import spark.implicits._

    val clock = new JobClock
    spark.sparkContext.addSparkListener(clock)

    val cfg = PageGen.Config(nHosts = hosts, pagesPerHost = pph, hotHosts = 20,
      hotFactor = 5, fanout = 8)
    val pages = PageGen.pages(spark, cfg).toDF()
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    pages.count()
    val projects = Seq(("bench", 1e9, 1e9)).toDF("name", "rate", "burst")
    val seeds = (0 until 1000).map(h => "bench" -> s"http://host$h.example.com/page/1")

    // Run the same crawl shape as Bench.crawlBench but step-by-step so each
    // superstep's wall/jobs/gap is visible.
    val (pagesIdx, robots) = graft.sched.Superstep.preparePages(spark, pages)
    pagesIdx.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    robots.persist()
    robots.count()
    val stepCfg = graft.sched.Superstep.Config()

    var frontier = Crawler.seedFrontier(spark, seeds, 1700000000.0).localCheckpoint()
    var budgets = Crawler.emptyBudgets(spark)
    var results = Crawler.emptyResults(spark)

    (1 to steps).foreach { i =>
      val now = 1700000000.0 + i
      val (j0, t0) = clock.snap()
      val w0 = System.nanoTime()
      val r = graft.sched.Superstep.run(spark, frontier, budgets, pagesIdx, robots,
        projects, now, stepCfg, None)
      val wMid = System.nanoTime() // Superstep.run returns after counters collect
      val (jMid, tMid) = clock.snap()
      val newResultsDelta = r.firstResults
      frontier = r.frontier.localCheckpoint()
      budgets = r.budgets.localCheckpoint()
      results = results.unionByName(newResultsDelta).localCheckpoint()
      r.unpersistAll()
      val w1 = System.nanoTime()
      val (j1, t1) = clock.snap()
      val wallA = (wMid - w0) / 1e9; val wallB = (w1 - wMid) / 1e9
      println(f"STEP $i: run=${wallA}%6.2fs (jobs=${jMid - j0}, exec=${tMid - t0}%6.2fs, gap=${wallA - (tMid - t0)}%6.2fs)  " +
        f"ckpt=${wallB}%6.2fs (jobs=${j1 - jMid}, exec=${t1 - tMid}%6.2fs, gap=${wallB - (t1 - tMid)}%6.2fs)  " +
        f"sched=${r.scheduled} fresh=${r.fresh}")
    }
    spark.stop()
  }
}
