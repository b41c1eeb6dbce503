package graft

/** Dev harness: single-thread throughput of the crawl's per-page hot path
  * (X6 decode, P1/P2 scan, X4 canonicalize) outside Spark — separates the
  * scanner's real cost from stage/shuffle overhead.
  * Run: sbt "runMain graft.ExtractProf" */
object ExtractProf {
  def main(args: Array[String]): Unit = {
    val cfg = gen.PageGen.Config(nHosts = 50, pagesPerHost = 60, hotHosts = 5, hotFactor = 5, fanout = 8)
    val n = gen.PageGen.totalPages(cfg).toInt
    val pages = (0 until n).map { i =>
      val (h, k) = gen.PageGen.locate(cfg, i)
      val (html, _, _) = gen.PageGen.htmlFor(cfg, h, k)
      (html, gen.PageGen.pageUrl(cfg, h, k))
    }
    (1 to 3).foreach { _ => pages.foreach { case (b, u) =>
      text.HtmlScanner.extract(text.Encoding.extractText(b, null), u) } }
    var t0 = System.nanoTime()
    var links = 0
    (1 to 10).foreach { _ => pages.foreach { case (b, u) =>
      links += text.HtmlScanner.extract(text.Encoding.extractText(b, null), u).links.length } }
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"decode+extract: ${10L * n} pages in ${dt}%.2f s = ${10L * n / dt}%.0f pages/s/thread ($links links)")
    t0 = System.nanoTime()
    var tl = 0L
    (1 to 10).foreach { _ => pages.foreach { case (b, _) =>
      tl += text.Encoding.extractText(b, null).length } }
    println(f"decode only:    ${10L * n} pages in ${(System.nanoTime() - t0) / 1e9}%.2f s (chars=$tl)")
    t0 = System.nanoTime()
    var cl = 0L
    val urls = pages.flatMap { case (_, u) => Seq(u, u + "?b=2&a=1#f") }
    (1 to 10).foreach { _ => urls.foreach(u => cl += url.UrlCanon.canonicalize(u).length) }
    println(f"canonicalize:   ${10L * urls.length} urls in ${(System.nanoTime() - t0) / 1e9}%.2f s (chars=$cl)")
  }
}
