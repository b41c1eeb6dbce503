package graft

import org.apache.spark.sql.functions._
import graft.frontier.FrontierStore
import graft.gen.PageGen
import graft.sched.Crawler

/**
 * spark-submit / CLI entry (SURVEY §7.2): crawl a pages table.
 *
 *   runMain graft.Main crawl --pages <parquet dir|gen:H,P> --seeds <csv urls>
 *     [--project p1] [--steps 5] [--checkpoint dir] [--cpus 8]
 *     [--rate 1000] [--burst 1000] [--bloom 0]
 *   runMain graft.Main demo        # fixture-graph demo crawl, prints results
 */
object Main {
  private def argMap(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect { case Array(k, v) if k.startsWith("--") => k.drop(2) -> v }.toMap

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("demo")
    val a = argMap(args.drop(1))
    val cpus = a.getOrElse("cpus", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")).toInt
    val spark = Udfs.newSession(s"local[$cpus]", cpus, "graft-crawl")
    import spark.implicits._

    mode match {
      case "demo" =>
        val results = SparkEntry.entry(spark)
        results.show(20, truncate = false)
        println(s"demo crawl: ${results.count()} results")

      case "crawl" =>
        val pagesSpec = a.getOrElse("pages", "gen:20,30")
        val pages =
          if (pagesSpec.startsWith("gen:")) {
            val Array(h, p) = pagesSpec.drop(4).split(",").map(_.toInt)
            PageGen.pages(spark, PageGen.Config(nHosts = h, pagesPerHost = p)).toDF()
          } else spark.read.parquet(pagesSpec)
        val project = a.getOrElse("project", "p1")
        val seeds = a.get("seeds") match {
          case Some(csv) => csv.split(",").toSeq.map(u => project -> u)
          case None => Seq(project -> "http://host0.example.com/page/1")
        }
        val projects = Seq((project, a.getOrElse("rate", "1000").toDouble,
          a.getOrElse("burst", "1000").toDouble)).toDF("name", "rate", "burst")
        val store = a.get("checkpoint").map(new FrontierStore(_, cpus,
          seenBuckets = a.getOrElse("seen-buckets", "64").toInt))
        val run = Crawler.run(spark, pages, projects, seeds,
          Crawler.CrawlConfig(maxSteps = a.getOrElse("steps", "5").toInt),
          store)
        val byStatus = run.frontier.groupBy("status").count().orderBy("status")
          .collect().map(r => s"status=${r.getInt(0)}:${r.getLong(1)}").mkString(" ")
        println(s"crawl done: steps=${run.steps} scheduled=${run.totalScheduled} " +
          s"new=${run.totalFresh} results=${run.results.count()} frontier[$byStatus]" +
          store.map(s => s" snapshot=${s.currentId.get}").getOrElse(""))

      case other =>
        System.err.println(s"unknown mode: $other (use demo|crawl)")
        sys.exit(2)
    }
    spark.stop()
  }
}
