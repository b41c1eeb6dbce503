package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.frontier.FrontierStore
import graft.gen.PageGen
import graft.streaming.StreamingCrawl

class StreamingCrawlSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("continuous mode: seed stream drives supersteps; state interoperates with batch resume") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val store = new FrontierStore(dir, 8)
    val cfg = PageGen.Config(nHosts = 3, pagesPerHost = 8, hotHosts = 0, fanout = 2)
    val pages = PageGen.pages(spark, cfg).toDF()
    val projects = Seq(("p1", 1000.0, 1000.0)).toDF("name", "rate", "burst")

    implicit val sqlCtx = spark.sqlContext
    val seeds = MemoryStream[(String, String)]
    val q = StreamingCrawl.start(spark, pages, projects, store,
      seeds.toDF().toDF("project", "url"))
    try {
      // batch 1: one seed -> superstep 1
      seeds.addData(("p1", "http://host0.example.com/page/1"))
      q.processAllAvailable()
      val s1 = store.read(spark).get
      assert(s1.step == 1)
      val seen1 = s1.frontier.count()
      assert(seen1 >= 1)

      // batch 2: a NEW seed on another host + a duplicate of the first
      seeds.addData(("p1", "http://host1.example.com/page/1"),
        ("p1", "HTTP://HOST0.example.com:80/page/1#dup"))
      q.processAllAvailable()
      val s2 = store.read(spark).get
      assert(s2.step == 2)
      val hosts = s2.frontier.select("host").distinct().as[String].collect().toSet
      assert(hosts.contains("host1.example.com"))
      // the duplicate seed did not create a second row for page/1@host0
      assert(s2.frontier
        .where($"url" === "http://host0.example.com/page/1").count() == 1)

      // empty batch still advances the crawl (continuous ticking)
      seeds.addData()
      q.processAllAvailable()
    } finally q.stop()

    // batch-mode driver continues from the streaming store seamlessly
    val run = graft.sched.Crawler.run(spark, pages, projects, Seq.empty,
      graft.sched.Crawler.CrawlConfig(maxSteps = store.read(spark).get.step + 2),
      Some(store))
    assert(run.steps > 2)
    assert(run.frontier.groupBy("project", "url_hash").count()
      .where($"count" > 1).count() == 0)
  }

  test("W3 processing-timeout analogue: a batch killed after selection, before commit, is re-selected on resume") {
    // the reference re-queues tasks whose status pack never arrives within
    // processing_timeout (task_queue.py:117,160-170). In the snapshot model
    // selection+ack commit atomically: a superstep that dies mid-flight
    // leaves no trace, and resume re-selects exactly the in-flight batch —
    // the timeout is the snapshot boundary itself.
    val dir = java.nio.file.Files.createTempDirectory("graft-w3").toString
    val store = new FrontierStore(dir, 8)
    val cfg = PageGen.Config(nHosts = 2, pagesPerHost = 6, hotHosts = 0, fanout = 2)
    val pages = PageGen.pages(spark, cfg).toDF()
    val projects = Seq(("p1", 1000.0, 1000.0)).toDF("name", "rate", "burst")
    val now0 = 1700000000.0

    // one committed step
    graft.sched.Crawler.run(spark, pages, projects,
      Seq("p1" -> "http://host0.example.com/page/1"),
      graft.sched.Crawler.CrawlConfig(maxSteps = 1, now0 = now0), Some(store))
    val committed = store.read(spark).get
    val committedKeys = committed.frontier.select("url_hash").as[Long].collect().sorted.toSeq

    // simulate a crash: run the NEXT superstep but never commit it
    val (pagesIdx, robots) = graft.sched.Superstep.preparePages(spark, pages)
    val dead = graft.sched.Superstep.run(spark, committed.frontier, committed.budgets,
      pagesIdx, robots, projects, now0 + 2, graft.sched.Superstep.Config())
    val selectedByDead = dead.upserts.where($"lastcrawltime" === now0 + 2)
      .select("url_hash").as[Long].collect().sorted.toSeq
    assert(selectedByDead.nonEmpty)
    dead.unpersistAll()

    // store is untouched (snapshot atomicity)...
    assert(store.read(spark).get.id == committed.id)
    assert(store.read(spark).get.frontier.select("url_hash").as[Long]
      .collect().sorted.toSeq == committedKeys)

    // ...and the resumed run re-selects exactly the same in-flight batch
    val resumed = graft.sched.Superstep.run(spark, store.read(spark).get.frontier,
      store.read(spark).get.budgets, pagesIdx, robots, projects, now0 + 2,
      graft.sched.Superstep.Config())
    val reSelected = resumed.upserts.where($"lastcrawltime" === now0 + 2)
      .select("url_hash").as[Long].collect().sorted.toSeq
    assert(reSelected == selectedByDead)
    resumed.unpersistAll()
  }
}
