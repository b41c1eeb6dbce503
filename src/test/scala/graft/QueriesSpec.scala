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

  test("url_keys equals composing the built-ins through the engine (codegen path)") {
    // the fused expression hashes canonical bytes with XXH64 directly; this
    // pins that to Spark's OWN xxhash64 over the same logical composition,
    // through whole-stage codegen, including fallback (non-ASCII) shapes
    val df = spark.sql(
      """SELECT u, url_keys(u) AS k,
         xxhash64(canonicalize_url(u)) AS eu,
         xxhash64(url_host(canonicalize_url(u))) AS eh
         FROM (SELECT concat('HTTP://Host', cast(id % 37 as string),
                 '.Example.COM:80/p/', cast(id as string),
                 if(id % 5 = 0, '/展示', ''), '?b=', cast(id % 7 as string), '&a=1#f') AS u
               FROM range(2000))""")
    val bad = df.where("k.url_hash <> eu OR k.host_hash <> eh").count()
    assert(bad == 0)
  }

  test("bench dedup variants (join vs union-agg) select identical url sets") {
    def sel(v: String): Set[Long] =
      Bench.scheduleDedupPlan(spark, 200000L, 100000L, v)
        .collect().map(_.getLong(0)).toSet
    val j = sel("join")
    val u = sel("unionagg")
    assert(j.nonEmpty && j == u)
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

  test("d6_neardup_ann: bucketed candidate joins only — no all-pairs broadcast nested loop") {
    val df = SparkEntry.queries("d6_neardup_ann")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // d5's shape (the thing d6 exists to avoid): a non-equi full-corpus
    // BroadcastNestedLoopJoin. d6's candidate joins are equi-joins on the
    // LSH key / IVF cell, so candidates co-locate per bucket at any scale.
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("d6 ANN candidates recall planted near-duplicates (cos >= 0.99) at >= 90%") {
    import spark.implicits._
    import graft.text.TextStats.mix64
    // 200 seeded base vectors + a jittered copy of each (cosine ~0.999):
    // the candidate union (LSH hamming<=1 ∪ IVF same-cell) must surface
    // almost every planted pair — THIS is the efficacy gate; the sf tables
    // hold no true near-dups (max pair sim ~0.5, below LSH's design point)
    val n = 200; val dim = 64
    def unit(i: Int): Array[Float] = {
      val v = Array.tabulate(dim)(d => (mix64(i.toLong * 131 + d).toDouble / Long.MaxValue).toFloat)
      val nrm = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / nrm)
    }
    val rows = (0 until n).flatMap { i =>
      val base = unit(i)
      val jit = base.zipWithIndex.map { case (x, d) =>
        x + 0.02f * (mix64((i + 7919).toLong * 131 + d).toDouble / Long.MaxValue).toFloat }
      Seq((i.toLong, base.toSeq), ((i + n).toLong, jit.toSeq))
    }
    val e = rows.toDF("vec_id", "embedding")
    val keyed = e.selectExpr("vec_id", "embedding", "lsh_key(embedding, 8, 42) as k")
    val lshPairs = keyed
      .selectExpr("vec_id as a_id", "explode(lsh_probes(k, 8)) as k")
      .join(keyed.selectExpr("vec_id as b_id", "k"), Seq("k")).where("b_id > a_id")
    val cells = e.selectExpr("vec_id", "embedding", "ivf_cell(embedding, 16, 7) as cell")
    val ivfPairs = cells.selectExpr("vec_id as a_id", "cell")
      .join(cells.selectExpr("vec_id as b_id", "cell"), Seq("cell")).where("b_id > a_id")
    val cand = lshPairs.select("a_id", "b_id").unionByName(ivfPairs.select("a_id", "b_id"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recalled = (0 until n).count(i => cand.contains((i.toLong, (i + n).toLong)))
    assert(recalled >= (0.9 * n).toInt, s"planted-pair recall $recalled/$n")
  }

  test("t6_corpus_pipeline: no exchange ships document text; filters precede the dedup agg") {
    val df = SparkEntry.queries("t6_corpus_pipeline")(spark, dir)
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
    assert(exchanges.nonEmpty)
    exchanges.foreach { e =>
      assert(!e.output.exists(_.name == "text"),
        s"pipeline exchange must not carry document text: ${e.output.map(_.name)}")
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
