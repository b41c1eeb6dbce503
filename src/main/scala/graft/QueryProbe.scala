package graft

/**
 * Dev harness: time individual SparkEntry queries in a bench-like session
 * (jobs + wall per run). Usage:
 *   sbt "runMain graft.QueryProbe <query>[,<query>...] [reps]"
 * Compare plan/job shapes across engine variants without paying a full
 * bench pass per data point.
 */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val reps = if (args.length > 1) args(1).toInt else 1
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val detail = sys.env.getOrElse("SPARK_GRAFT_PROBE_DETAIL", "0") == "1"
    val spark = Udfs.newSession(s"local[$cpus]", cpus, "query-probe")
    val clock = new StepProbe.JobClock
    spark.sparkContext.addSparkListener(clock)
    if (detail) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        private val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val site = Option(j.properties.getProperty("callSite.short"))
            .orElse(Option(j.properties.getProperty("spark.job.description")))
            .getOrElse("exec=" + Option(j.properties.getProperty("spark.sql.execution.id")).getOrElse("?")) +
            " stages=" + j.stageInfos.size + " [" +
            j.stageInfos.map(si => si.name.split(" at ").lastOption.getOrElse(si.name)).mkString(";").take(120) + "]"
          starts.put(j.jobId, (System.nanoTime(), site))
        }
        override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val s = starts.remove(j.jobId)
          if (s != null) println(f"JOB ${j.jobId}%5d ${(System.nanoTime() - s._1) / 1e6}%8.1fms ${s._2}")
        }
      })
    // same untimed warmup as Bench
    locally {
      import spark.implicits._
      val w = spark.range(2000000).selectExpr("id",
        "concat('http://w', cast(id % 97 as string), '.example.com/p/', cast(id as string)) as u")
      w.selectExpr("xxhash64(u) as h", "id % 97 as g")
        .groupBy("g").agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)),
          org.apache.spark.sql.functions.sum("h")).count()
      val wCfg = gen.PageGen.Config(nHosts = 2, pagesPerHost = 6, hotHosts = 0, fanout = 2)
      sched.Crawler.run(spark, gen.PageGen.pages(spark, wCfg).toDF(),
        Seq(("warm", 1e9, 1e9)).toDF("name", "rate", "burst"),
        Seq("warm" -> "http://host0.example.com/page/1"),
        sched.Crawler.CrawlConfig(maxSteps = 2))
    }
    (1 to reps).foreach { rep =>
      names.foreach { name =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        val fn = SparkEntry.queries(name)
        val (j0, t0) = clock.snap()
        val w0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val wall = (System.nanoTime() - w0) / 1e9
        val (j1, t1) = clock.snap()
        println(f"QPROBE rep=$rep $name%-24s wall=${wall}%7.2fs jobs=${j1 - j0} exec=${t1 - t0}%7.2fs gap=${wall - (t1 - t0)}%7.2fs rows=$n")
      }
    }
    spark.stop()
  }
}
