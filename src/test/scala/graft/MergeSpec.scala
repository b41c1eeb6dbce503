package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.model.TaskStatus
import graft.sched.Superstep

/**
 * on_request merge semantics ported from the reference scheduler tests
 * (tests/test_scheduler.py:167-690 scenarios: new task, ignore, force_update
 * restart, itag restart, age restart/ignore, cancel) — SURVEY §5 item 3.
 */
class MergeSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private val now = 1700000100.0

  // (hash, status, itag, force_update, age, cancel, lastcrawltime)
  private def row(h: Long, status: Int, itag: String = null, fu: Boolean = false,
      age: Double = -1.0, cancel: Boolean = false, lct: Double = 0.0) =
    ("p1", h, s"http://h.test/$h", "h.test", status, 0, 0.0, 3, 0, age, itag,
      fu, false, cancel, s"http://h.test/$h", "link", "", lct, 1700000000.0,
      null: String, null: String, status == TaskStatus.Success)

  private def df(rows: Seq[(String, Long, String, String, Int, Int, Double, Int, Int,
      Double, String, Boolean, Boolean, Boolean, String, String, String, Double, Double,
      String, String, Boolean)]): DataFrame =
    rows.toDF(Superstep.frontierCols: _*)

  private def statusOf(f: DataFrame, h: Long): Int =
    f.where($"url_hash" === h).select("status").collect().head.getInt(0)

  test("unknown task is inserted ACTIVE (on_new_request)") {
    val frontier = df(Seq(row(1L, TaskStatus.Success)))
    val out = Superstep.mergeIncoming(frontier, df(Seq(row(2L, TaskStatus.Active))), now)
    assert(out.count() == 2)
    assert(statusOf(out, 2L) == TaskStatus.Active)
    assert(statusOf(out, 1L) == TaskStatus.Success) // untouched
  }

  test("known task with default schedule is ignored (scheduler.py:283-285)") {
    val frontier = df(Seq(row(1L, TaskStatus.Success, lct = now - 10)))
    val out = Superstep.mergeIncoming(frontier, df(Seq(row(1L, TaskStatus.Active))), now)
    assert(out.count() == 1)
    assert(statusOf(out, 1L) == TaskStatus.Success)
  }

  test("force_update restarts a finished task (test_scheduler force_update case)") {
    val frontier = df(Seq(row(1L, TaskStatus.Success, lct = now - 10)))
    val out = Superstep.mergeIncoming(frontier,
      df(Seq(row(1L, TaskStatus.Active, fu = true))), now)
    assert(statusOf(out, 1L) == TaskStatus.Active)
  }

  test("itag change restarts; same itag does not (age_ignore/itag cases)") {
    val frontier = df(Seq(row(1L, TaskStatus.Success, itag = "v1", lct = now - 10),
      row(2L, TaskStatus.Success, itag = "v1", lct = now - 10)))
    val incoming = df(Seq(row(1L, TaskStatus.Active, itag = "v2"),
      row(2L, TaskStatus.Active, itag = "v1")))
    val out = Superstep.mergeIncoming(frontier, incoming, now)
    assert(statusOf(out, 1L) == TaskStatus.Active) // itag changed
    assert(statusOf(out, 2L) == TaskStatus.Success) // same itag -> ignore
  }

  test("age expiry restarts; unexpired age is ignored (age/age_restart cases)") {
    val frontier = df(Seq(row(1L, TaskStatus.Success, lct = now - 100),
      row(2L, TaskStatus.Success, lct = now - 100)))
    val incoming = df(Seq(row(1L, TaskStatus.Active, age = 50.0), // 100 > 50 -> expired
      row(2L, TaskStatus.Active, age = 1000.0))) // not yet
    val out = Superstep.mergeIncoming(frontier, incoming, now)
    assert(statusOf(out, 1L) == TaskStatus.Active)
    assert(statusOf(out, 2L) == TaskStatus.Success)
  }

  test("cancel + force_update marks BAD (F6, scheduler.py:287-292)") {
    val frontier = df(Seq(row(1L, TaskStatus.Active)))
    val out = Superstep.mergeIncoming(frontier,
      df(Seq(row(1L, TaskStatus.Active, fu = true, cancel = true))), now)
    assert(statusOf(out, 1L) == TaskStatus.Bad)
  }

  test("cancel + itag-change restart marks BAD too (on_old_request checks cancel on ANY restart)") {
    val frontier = df(Seq(row(1L, TaskStatus.Success, itag = "v1", lct = now - 10),
      row(2L, TaskStatus.Success, itag = "v1", lct = now - 10)))
    val incoming = df(Seq(
      row(1L, TaskStatus.Active, itag = "v2", cancel = true), // restart via itag + cancel
      row(2L, TaskStatus.Active, itag = "v1", cancel = true))) // no restart -> ignored
    val out = Superstep.mergeIncoming(frontier, incoming, now)
    assert(statusOf(out, 1L) == TaskStatus.Bad)
    assert(statusOf(out, 2L) == TaskStatus.Success)
  }

  test("in-batch dedup: last write wins deterministically (F3)") {
    val frontier = df(Seq.empty)
    val a = row(1L, TaskStatus.Active)
    val out = Superstep.mergeIncoming(frontier, df(Seq(a, a)), now)
    assert(out.count() == 1)
  }

  test("restart replaces the schedule payload (priority/exetime travel with the restart)") {
    val frontier = df(Seq(row(1L, TaskStatus.Failed, lct = now - 10)))
    val inc = df(Seq(row(1L, TaskStatus.Active, fu = true)))
      .withColumn("priority", org.apache.spark.sql.functions.lit(7))
    val out = Superstep.mergeIncoming(frontier, inc, now)
    val r = out.collect().head
    assert(r.getAs[Int]("priority") == 7)
    assert(r.getAs[Int]("status") == TaskStatus.Active)
  }
}
