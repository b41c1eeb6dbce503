package graft.model

import java.sql.Timestamp

/**
 * Typed data model (SURVEY.md §1.1). The reference's nested JSON-blob task
 * dict (`/root/reference/sspider/database/base/taskdb.py:6-53`) becomes a
 * FLAT columnar-friendly case class — Catalyst prunes/pushes down into plain
 * columns, and the frontier's hot columns (status, exetime, priority, host)
 * stay primitive for whole-stage codegen.
 *
 * Times are epoch seconds as Double, mirroring the reference storage type
 * (double(16,4), mysql/taskdb.py:44-45); a superstep uses ONE deterministic
 * `now` literal (SURVEY §7.0 fidelity note 4).
 */

/** One Common-Crawl-style page (BASELINE.json input_hint shape). */
final case class Page(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String
)

object TaskStatus {
  // sspider/database/base/taskdb.py:57-60
  val Active = 1
  val Success = 2
  val Failed = 3
  val Bad = 4
}

/** One frontier row. Identity = (project, url_hash) where
  * url_hash = xxhash64(canonical url) (SURVEY §1.4). */
final case class Task(
    project: String,
    url_hash: Long,
    url: String, // canonical
    host: String,
    status: Int,
    priority: Int,
    exetime: Double, // epoch sec; 0 = ready now (task_queue.py InQueueTask)
    retries: Int,
    retried: Int,
    age: Double, // -1 = never re-crawl by age (scheduler.py default_schedule)
    itag: String,
    force_update: Boolean,
    auto_recrawl: Boolean,
    cancel: Boolean,
    seed_url: String,
    method: String, // get | post | link
    data: String, // serialized form/ajax payload
    lastcrawltime: Double,
    updatetime: Double,
    /** conditional-fetch track headers from the last successful fetch
      * (tornado_fetcher.py:257-276 If-None-Match / If-Modified-Since) */
    etag: String = null,
    last_modified: String = null,
    /** sticky success history: true once the task has ever fetched OK — the
      * first-writer-wins result-dedup predicate (REPLACE INTO semantics,
      * resultdb.py:52-66, without an O(history) anti-join per superstep) */
    crawled_ok: Boolean = false
)

object Task {
  /** Defaults per scheduler.py:94-101 default_schedule. */
  def seed(project: String, urlHash: Long, canonUrl: String, host: String, now: Double): Task =
    Task(project, urlHash, canonUrl, host, TaskStatus.Active,
      priority = 0, exetime = 0.0, retries = 3, retried = 0, age = -1.0, itag = null,
      force_update = true, auto_recrawl = false, cancel = false,
      seed_url = canonUrl, method = "get", data = "", lastcrawltime = 0.0, updatetime = now)
}

/** Project config (base/projectdb.py:9-21); politeness defaults rate=1 burst=3
  * (scheduler.py:785-787). */
final case class Project(
    name: String,
    group: String,
    status: String,
    rate: Double,
    burst: Double,
    updatetime: Double
)

/** Result row (sqlite/resultdb.py:32-40 + result_worker.py:42-56). */
final case class CrawlResult(
    project: String,
    url_hash: Long,
    url: String,
    `type`: String, // get | post | link
    data: Map[String, String],
    seed_url: String,
    updatetime: Double
)

/** Politeness bucket state carried across supersteps (token_bucket.py:15-57;
  * the reference loses this on restart — we persist it, SURVEY §7.0). */
final case class HostBudget(
    project: String,
    host: String,
    tokens: Double,
    last_update: Double
)

/** Per-superstep, per-project counters (SURVEY §2.4 A3). */
final case class StepCounters(
    project: String,
    scheduled: Long,
    fetched: Long,
    succeeded: Long,
    failed_now: Long,
    retried: Long,
    new_tasks: Long,
    deduped: Long
)
