package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every SparkEntry query must run at sf0.001 and the physical plans of the
  * scale-critical ones must have the right shape (pushdown, broadcast,
  * partial aggregation) — the ".explain until it's the plan you want" gate. */
class QueriesSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  test("all queries execute at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, dir)
      val n = df.count()
      assert(n >= 0, name)
      assert(df.columns.nonEmpty, name)
    }
  }

  test("every oracle key has a query and entry() yields rows") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.entry(spark).count() > 0)
  }

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("s1_scan_prune: filters are pushed to the parquet scan and columns pruned") {
    val p = plan("s1_scan_prune")
    assert(p.contains("PushedFilters: ["), p.take(500))
    assert(p.contains("LessThan(l_shipdate") || p.contains("GreaterThan(l_quantity"), p.take(800))
    // pruned read schema: only the 4 referenced columns, not all 11
    assert(!p.contains("l_extendedprice"))
  }

  test("j3_broadcast_join: dimension side is broadcast, not shuffled") {
    val p = plan("j3_broadcast_join")
    assert(p.contains("BroadcastHashJoin"), p.take(500))
  }

  test("j1_dedup_anti: anti join present, no cartesian") {
    val p = plan("j1_dedup_anti")
    assert(p.contains("LeftAnti"), p.take(500))
    assert(!p.contains("CartesianProduct"))
  }

  test("a1_agg_lineitem: partial (map-side) aggregation before the shuffle") {
    val p = plan("a1_agg_lineitem")
    assert(p.contains("partial_count") || p.contains("HashAggregate"), p.take(500))
    assert(p.contains("Exchange hashpartitioning"), p.take(800))
  }

  test("w1_ready_rank: single window sort, AQE-planned exchange") {
    val p = plan("w1_ready_rank")
    assert(p.contains("Window") || p.contains("RunningWindowFunction"), p.take(500))
  }

  test("v1_ann_brute: query side broadcast — no shuffle of the big side") {
    val p = plan("v1_ann_brute")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p.take(600))
  }

  test("d3_minhash_lsh: no exchange ships document text alongside band keys") {
    // the LSH band shuffle must carry (doc_id, band) only — text joins back
    // by id AFTER candidate generation (the 100 TB discipline; a band
    // exchange carrying text fans every document out x16)
    val df = SparkEntry.queries("d3_minhash_lsh")(spark, dir)
    df.collect()
    def exchangesOf(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.exchange.Exchange] = {
      val self = p match {
        case e: org.apache.spark.sql.execution.exchange.Exchange => Seq(e)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => exchangesOf(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => exchangesOf(q.plan)
        case _ => Nil
      }
      self ++ p.children.flatMap(exchangesOf)
    }
    val exchanges = exchangesOf(df.queryExecution.executedPlan)
    assert(exchanges.nonEmpty, "expected at least one exchange in the LSH plan")
    val bandExchanges = exchanges.filter(_.output.exists(_.name == "band"))
    assert(bandExchanges.nonEmpty, "expected an exchange on the band key")
    bandExchanges.foreach { e =>
      assert(!e.output.exists(a => a.name == "text" || a.name == "ta" || a.name == "tb"),
        s"band exchange must not carry text: ${e.output.map(_.name)}")
    }
  }

  test("robots gate: shuffle-join fallback (size gate off) is semantically identical to broadcast") {
    import spark.implicits._
    val pages = graft.gen.PageGen.pages(spark, graft.gen.PageGen.Config(nHosts = 4, pagesPerHost = 8)).toDF()
    val projects = Seq(("p1", 1000.0, 1000.0)).toDF("name", "rate", "burst")
    val (pagesIdx, robots) = graft.sched.Superstep.preparePages(spark, pages)
    val frontier = graft.sched.Crawler.seedFrontier(spark,
      Seq("p1" -> "http://host0.example.com/page/1",
        "p1" -> "http://host0.example.com/private/page/13"), 1700000000.0)
    def outcome(bcast: Boolean): Seq[(Long, Int)] = {
      val r = graft.sched.Superstep.run(spark, frontier, graft.sched.Crawler.emptyBudgets(spark),
        pagesIdx, robots, projects, 1700000001.0,
        graft.sched.Superstep.Config(broadcastRobots = bcast))
      val out = r.frontier.select("url_hash", "status").orderBy("url_hash")
        .collect().map(row => (row.getLong(0), row.getInt(1))).toSeq
      r.unpersistAll(); out
    }
    assert(outcome(bcast = true) == outcome(bcast = false))
  }

  test("fetch join: the persisted pages-index layout is reused — no shuffle ships html per step") {
    import spark.implicits._
    val pages = graft.gen.PageGen.pages(spark,
      graft.gen.PageGen.Config(nHosts = 4, pagesPerHost = 12)).toDF()
    val (pagesIdx, robots) = graft.sched.Superstep.preparePages(spark, pages)
    pagesIdx.persist(); pagesIdx.count()
    val frontier = graft.sched.Crawler.seedFrontier(spark,
      (1 to 8).map(i => "p1" -> s"http://host0.example.com/page/$i"), 1700000000.0)
    val joined = frontier.join(pagesIdx, $"url_hash" === $"page_hash", "left_outer")
    joined.collect()
    def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike] = {
      val self = p match {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => Seq(e)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => shuffles(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => shuffles(q.plan)
        case _ => Nil
      }
      self ++ p.children.flatMap(shuffles)
    }
    // the pages side (the only side carrying html bytes) must never re-shuffle:
    // its persisted HashPartitioning(page_hash) satisfies the join distribution
    shuffles(joined.queryExecution.executedPlan).foreach { e =>
      assert(!e.output.exists(_.name == "html"),
        s"pages side re-shuffled through ${e.output.map(_.name)}")
    }
    pagesIdx.unpersist()
  }

  test("FollowsGenerator (native UDTF via GenerateExec) equals the UDF+explode path") {
    val pages = graft.gen.PageGen.pages(spark,
      graft.gen.PageGen.Config(nHosts = 2, pagesPerHost = 8)).toDF()
    val g = pages.selectExpr("url as page_url", "extract_text(html) as t")
    val gen = g.selectExpr("page_url", "extract_follows_rows(t, page_url)")
      .selectExpr("page_url", "url", "method", "data", "text")
    val udf = g.selectExpr("page_url", "explode(extract_follows(t, page_url)) as f")
      .selectExpr("page_url", "f.url as url", "f.method as method", "f.data as data", "f.text as text")
    val a = gen.collect().map(_.toString).sorted.toSeq
    val b = udf.collect().map(_.toString).sorted.toSeq
    assert(a.nonEmpty)
    assert(a == b)
    assert(gen.queryExecution.executedPlan.toString.contains("Generate extract_follows_rows"))
  }

  test("whole-stage codegen covers the canonicalizer expression") {
    val df = SparkEntry.queries("x1_url_canon")(spark, dir)
    df.collect() // finalize the AQE plan — codegen nodes appear post-execution
    val p = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen spans in the plan string; the
    // canonicalize_url Project must carry one (native expression, no UDF box)
    assert(p.contains("*(1) Project [canonicalize_url"), p.take(2000))
    assert(!p.contains("BatchEvalPython") && !p.toLowerCase.contains("scalaudf"))
  }
}
