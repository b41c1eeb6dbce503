package graft.gen

import java.nio.charset.Charset
import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model.Page
import graft.text.TextStats.mix64

/**
 * Deterministic synthetic Common-Crawl-style pages table (FIXTURES.md §1):
 * a seeded web graph of `nHosts` hosts; host h has `pagesPerHost` pages,
 * except the first `hotHosts` hosts which have `hotFactor`x more (hot-domain
 * skew to exercise salting/AQE). Page k of host h links to a pseudo-random
 * same-host subset plus cross-host links (which the same-domain filter F7
 * must drop), occasional forms, commented links, messy-URL duplicates (which
 * canonicalization must collapse), robots-disallowed /private/ pages, and a
 * gb2312-encoded Chinese page every 17th page (encoding matrix X6).
 *
 * Everything is a pure function of (seed, h, k) — no driver-side loops, no
 * java.util.Random state: generation is `spark.range` + map, so it scales to
 * any row count and is identical at any parallelism (the scaling-bench
 * requirement).
 */
object PageGen {

  final case class Config(
      nHosts: Int = 10,
      pagesPerHost: Int = 20,
      hotHosts: Int = 1,
      hotFactor: Int = 5,
      fanout: Int = 4,
      seed: Long = 42L)

  private val GB18030: Charset = Charset.forName("GB18030")

  def hostName(h: Int): String = s"host$h.example.com"

  def pagesOf(cfg: Config, h: Int): Int =
    if (h < cfg.hotHosts) cfg.pagesPerHost * cfg.hotFactor else cfg.pagesPerHost

  def totalPages(cfg: Config): Long =
    cfg.hotHosts.toLong * cfg.pagesPerHost * cfg.hotFactor +
      (cfg.nHosts - cfg.hotHosts).toLong * cfg.pagesPerHost

  /** Global page index -> (host, pageIdx) by block arithmetic. */
  def locate(cfg: Config, i: Long): (Int, Int) = {
    val hotBlock = cfg.pagesPerHost.toLong * cfg.hotFactor
    val hotTotal = cfg.hotHosts * hotBlock
    if (i < hotTotal) ((i / hotBlock).toInt, (i % hotBlock).toInt)
    else {
      val j = i - hotTotal
      (cfg.hotHosts + (j / cfg.pagesPerHost).toInt, (j % cfg.pagesPerHost).toInt)
    }
  }

  /** Page path; every 13th page lives under the robots-disallowed /private/. */
  def pagePath(k: Int): String =
    if (k % 13 == 0 && k > 0) s"/private/page/$k" else s"/page/$k"

  def pageUrl(cfg: Config, h: Int, k: Int): String = s"http://${hostName(h)}${pagePath(k)}"

  /** The "as served" URL, messy on purpose for a third of the pages: uppercase
    * host, explicit :80, unsorted query, fragment — all collapsed by
    * canonicalization to `pageUrl`. */
  def servedUrl(cfg: Config, h: Int, k: Int): String = {
    val r = mix64(cfg.seed ^ (h.toLong << 32) ^ k.toLong)
    (math.floorMod(r, 6L): @unchecked) match {
      case 0L => s"http://HOST$h.Example.COM:80${pagePath(k)}"
      case 1L => s"http://${hostName(h)}${pagePath(k)}#frag"
      case _ => pageUrl(cfg, h, k)
    }
  }

  /** Deterministic link targets (same host). */
  def linkTargets(cfg: Config, h: Int, k: Int): Seq[Int] = {
    val np = pagesOf(cfg, h)
    (0 until cfg.fanout).map { i =>
      math.floorMod(mix64(cfg.seed ^ (h.toLong << 40) ^ (k.toLong << 8) ^ i.toLong), np.toLong).toInt
    }.distinct
  }

  def htmlFor(cfg: Config, h: Int, k: Int): (Array[Byte], String, String) = {
    val host = hostName(h)
    if (k % 17 == 0 && k > 0) {
      // gb2312-declared Chinese page (decodes via gb18030 per X6)
      val body = s"""<html><head><meta charset=gb2312><title>页面$k</title></head>
<body>这是主机 $host 的中文页面 $k，包含一些汉字内容。
<a href="/page/${(k + 1) % pagesOf(cfg, h)}">下一页</a>
</body></html>"""
      (body.getBytes(GB18030), s"这是主机 $host 的中文页面 $k，包含一些汉字内容。", "zh")
    } else {
      val sb = new StringBuilder(512)
      sb.append(s"<html><head><title>page $k of $host</title></head><body>\n")
      sb.append(s"<h1>Page $k on $host</h1>\n")
      sb.append(s"<p>The quick brown fox on page $k of $host jumps over the lazy dog and it is a fine day.</p>\n")
      linkTargets(cfg, h, k).foreach { t =>
        sb.append(s"""<a href="/page/$t">page $t</a>\n""")
      }
      // a messy duplicate of the first target: canonicalizes to the same url
      linkTargets(cfg, h, k).headOption.foreach { t =>
        sb.append(s"""<a href="http://${host.toUpperCase}:80/page/$t?#x">dup of $t</a>\n""")
      }
      // robots-trap link
      if (k % 5 == 0) sb.append(s"""<a href="/private/page/${k + 13 - (k % 13)}">private</a>\n""")
      // cross-host link: same-domain filter must drop it
      sb.append(s"""<a href="http://${hostName((h + 1) % cfg.nHosts)}/page/0">other host</a>\n""")
      // occasional form
      if (k % 7 == 0) sb.append(
        s"""<form method="post" action="/submit"><input type="text" name="q" value="p$k"><input type="submit" name="go" value="Go"></form>\n""")
      // occasional commented link
      if (k % 11 == 0) sb.append(s"<!-- legacy: /old/page$k.php?ref=c -->\n")
      // dead asset links (extension filter F8 exercises at the result sink)
      sb.append(s"""<a href="/assets/img$k.png">img</a>\n""")
      sb.append("</body></html>")
      val text = s"Page $k on $host The quick brown fox on page $k of $host jumps over the lazy dog and it is a fine day."
      (sb.toString.getBytes("UTF-8"), text, "en")
    }
  }

  def robotsBody: String = "User-agent: *\nDisallow: /private/\n"

  /** Build the pages Dataset: one row per page + one robots.txt row per host. */
  def pages(spark: SparkSession, cfg: Config): Dataset[Page] = {
    import spark.implicits._
    val t0 = 1700000000L // fixed epoch base for warc_ts
    val n = totalPages(cfg)
    val pageRows = spark.range(0, n, 1, spark.sparkContext.defaultParallelism)
      .map { i =>
        val (h, k) = locate(cfg, i)
        val (html, text, lang) = htmlFor(cfg, h, k)
        Page(servedUrl(cfg, h, k), new Timestamp((t0 + i) * 1000L), html, text, lang)
      }
    val robotsRows = spark.range(0, cfg.nHosts.toLong, 1,
        math.min(cfg.nHosts, spark.sparkContext.defaultParallelism))
      .map { h =>
        Page(s"http://${hostName(h.toInt)}/robots.txt", new Timestamp(t0 * 1000L),
          robotsBody.getBytes("UTF-8"), robotsBody, "en")
      }
    pageRows.unionByName(robotsRows)
  }

  /**
   * Pages table WITH redirect captures (F11): adds `http_status`/`location`
   * columns (200/null on ordinary pages) plus, per host,
   *   /hop1/k -> 301 -> /page/k
   *   /hop2/k -> 302 -> /hop1/k
   *   /hop3/k -> 307 -> /hop2/k        (3-hop chain, within max_redirects)
   * and a 2-cycle /loopa <-> /loopb that can never resolve (redirects-
   * exceeded failure path).
   */
  def pagesWithRedirects(spark: SparkSession, cfg: Config): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val plain = pages(spark, cfg).toDF()
      .withColumn("http_status", lit(200))
      .withColumn("location", lit(null).cast("string"))
    val t0 = 1700000000L
    val redirects = spark.range(0, cfg.nHosts.toLong, 1,
        math.min(cfg.nHosts, spark.sparkContext.defaultParallelism))
      .flatMap { hl =>
        val h = hl.toInt; val host = hostName(h)
        val chain = (1 to 3).flatMap { k =>
          Seq(
            (s"http://$host/hop1/$k", new Timestamp(t0 * 1000L), Array.empty[Byte], "", "en", 301, s"/page/$k"),
            (s"http://$host/hop2/$k", new Timestamp(t0 * 1000L), Array.empty[Byte], "", "en", 302, s"/hop1/$k"),
            (s"http://$host/hop3/$k", new Timestamp(t0 * 1000L), Array.empty[Byte], "", "en", 307, s"/hop2/$k"))
        }
        val loop = Seq(
          (s"http://$host/loopa", new Timestamp(t0 * 1000L), Array.empty[Byte], "", "en", 301, s"/loopb"),
          (s"http://$host/loopb", new Timestamp(t0 * 1000L), Array.empty[Byte], "", "en", 301, s"/loopa"))
        chain ++ loop
      }
      .toDF("url", "warc_ts", "html", "text", "lang", "http_status", "location")
    plain.unionByName(redirects)
  }
}
