package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sched.TopKSelect

class TopKSelectSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("buffer keeps the k best by (priority desc, id asc); merge-able") {
    val b = new TopKSelect.Buffer(-1); b.setK(3)
    Seq((1, 10L), (5, 20L), (3, 30L), (5, 5L), (0, 1L), (3, 2L)).foreach { case (p, i) => b.add(p, 0.0, i) }
    // best 3: (5,5), (5,20), (3,2)
    assert(b.sortedIds.toSeq == Seq(5L, 20L, 2L))
    val o = new TopKSelect.Buffer(-1); o.setK(3)
    Seq((9, 99L), (3, 1L)).foreach { case (p, i) => o.add(p, 0.0, i) }
    (0 until o.size).foreach(i => b.add(o.prios(i), o.exes(i), o.ids(i)))
    assert(b.sortedIds.toSeq == Seq(99L, 5L, 20L)) // (9,99),(5,5),(5,20)
    // exetime breaks priority ties before id
    val e = new TopKSelect.Buffer(-1); e.setK(2)
    Seq((1, 9.0, 5L), (1, 2.0, 9L), (1, 2.0, 7L)).foreach { case (p, ex, i) => e.add(p, ex, i) }
    assert(e.sortedIds.toSeq == Seq(7L, 9L))
    val empty = new TopKSelect.Buffer(-1); empty.setK(0)
    empty.add(5, 0.0, 5L)
    assert(empty.sortedIds.isEmpty)
  }

  test("topk_select agg equals the row_number window selection (W1 equivalence)") {
    val df = spark.range(0, 10000).selectExpr(
      "cast(id % 37 as string) as host",
      "cast(id % 5 as int) as priority",
      "xxhash64(cast(id as string)) as url_hash",
      "cast(3 + id % 37 % 4 as int) as allowed") // per-host constant k in [3,6]
    df.createOrReplaceTempView("ready")

    val viaAgg = spark.sql(
      """SELECT host, explode(topk_select(allowed, priority, 0.0, url_hash)) AS url_hash
        |FROM ready GROUP BY host""".stripMargin)
      .selectExpr("host", "url_hash")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

    val viaWindow = spark.sql(
      """SELECT host, url_hash FROM (
        |  SELECT host, url_hash, allowed,
        |         ROW_NUMBER() OVER (PARTITION BY host ORDER BY priority DESC, url_hash ASC) AS rnk
        |  FROM ready) WHERE rnk <= allowed""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

    assert(viaAgg == viaWindow)
    assert(viaAgg.nonEmpty)
  }

  test("partial aggregation: plan shows two-phase agg, no window sort") {
    val df = spark.range(0, 1000).selectExpr(
      "cast(id % 7 as string) as host", "cast(id % 3 as int) as priority",
      "id as url_hash", "cast(5 as int) as allowed")
    df.createOrReplaceTempView("ready2")
    val q = spark.sql("SELECT host, topk_select(allowed, priority, 0.0, url_hash) FROM ready2 GROUP BY host")
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"), p.take(600))
    assert(!p.contains("Window"), p.take(600))
  }
}
