package graft.url

/**
 * X10: parse a curl command line into fetch arguments — the reference's
 * `curl_to_arguments` (/root/reference/sspider/libs/url.py:70-120), used by
 * its processor to accept `crawl("curl ...")` calls pasted from browser
 * devtools (tests: tests/test_fetcher_processor.py:362-386).
 *
 * Faithful semantics:
 *  - tokens split like Python `shlex.split` (POSIX): whitespace-separated;
 *    single quotes are literal; double quotes honor backslash escapes of
 *    `"` and `\`; a backslash outside quotes escapes the next character
 *  - first token is the command, non-flag tokens are URLs (≥1 required)
 *  - `--compressed` → use_gzip; `-H/--header 'K: V'` accumulate headers
 *    (split on the FIRST ':', both sides trimmed); `-d/--data` → data;
 *    `--data-binary` → data with a leading `$` stripped; `-X/--request` →
 *    method; any other option or a trailing dangling option is an error
 *  - method defaults to POST when data is present, else GET (the
 *    reference's crawl() downstream default)
 */
object CurlArgs {

  final case class CurlRequest(
      urls: Seq[String],
      method: String,
      data: Option[String],
      headers: Map[String, String],
      useGzip: Boolean)

  /** Python shlex.split(posix=True, comments=False) compatible splitter. */
  def shlexSplit(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inTok = false
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      c match {
        case ' ' | '\t' | '\r' | '\n' | '\f' =>
          if (inTok) { out += cur.result(); cur.clear(); inTok = false }
          i += 1
        case '\'' =>
          inTok = true
          i += 1
          val end = s.indexOf('\'', i)
          if (end < 0) throw new IllegalArgumentException("No closing quotation")
          cur ++= s.substring(i, end)
          i = end + 1
        case '"' =>
          inTok = true
          i += 1
          var closed = false
          while (i < n && !closed) {
            val d = s.charAt(i)
            if (d == '"') { closed = true; i += 1 }
            else if (d == '\\' && i + 1 < n && (s.charAt(i + 1) == '"' || s.charAt(i + 1) == '\\')) {
              cur.append(s.charAt(i + 1)); i += 2
            } else { cur.append(d); i += 1 }
          }
          if (!closed) throw new IllegalArgumentException("No closing quotation")
        case '\\' =>
          inTok = true
          if (i + 1 < n) { cur.append(s.charAt(i + 1)); i += 2 }
          else throw new IllegalArgumentException("No escaped character")
        case _ =>
          inTok = true
          cur.append(c)
          i += 1
      }
    }
    if (inTok) out += cur.result()
    out.result()
  }

  def parse(curl: String): CurlRequest = {
    var command: Option[String] = None
    var currentOpt: Option[String] = None
    val urls = Seq.newBuilder[String]
    val headers = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var data: Option[String] = None
    var method: Option[String] = None
    var useGzip = false

    shlexSplit(curl).foreach { part =>
      if (command.isEmpty) command = Some(part)
      else if (!part.startsWith("-") && currentOpt.isEmpty) urls += part
      else if (currentOpt.isEmpty && part.startsWith("-")) {
        if (part == "--compressed") useGzip = true
        else currentOpt = Some(part)
      } else currentOpt match {
        case None => throw new IllegalArgumentException(s"Unknow curl argument: $part")
        case Some(opt) =>
          opt match {
            case "-H" | "--header" =>
              // split on the FIRST ':' only; a part without ':' re-assigns
              // the previous key (reference keeps last key/value variables)
              val idx = part.indexOf(':')
              if (idx >= 0) headers(part.substring(0, idx).trim) = part.substring(idx + 1).trim
              else if (headers.nonEmpty) () // reference would reuse stale key/value — drop
            case "-d" | "--data" => data = Some(part)
            case "--data-binary" => data = Some(if (part.startsWith("$")) part.substring(1) else part)
            case "-X" | "--request" => method = Some(part)
            case other => throw new IllegalArgumentException(s"Unknow curl option: $other")
          }
          currentOpt = None
      }
    }
    if (urls.result().isEmpty) throw new IllegalArgumentException("curl: no URL specified!")
    currentOpt.foreach(o => throw new IllegalArgumentException(s"Unknow curl option: $o"))
    CurlRequest(urls.result(), method.getOrElse(if (data.isDefined) "POST" else "GET"),
      data, headers.toMap, useGzip)
  }
}
