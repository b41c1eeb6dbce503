package graft.text

import scala.collection.mutable
import graft.url.UrlCanon

/** A discovered link: absolute URL + anchor text (whitespace collapsed). */
final case class Link(url: String, text: String)

/** A discovered form submission candidate. */
final case class FormReq(method: String, url: String, data: String, dataType: Map[String, String])

/** Static extraction result for one page. */
final case class Extracted(links: Seq[Link], forms: Seq[FormReq])

/**
 * Tolerant, dependency-free HTML scanner reproducing the *static* subset of
 * the reference's phantomjs extraction
 * (`/root/reference/sspider/fetcher/phantomjs/extractors.js`):
 *
 *  - links (P1): `<a>`/`<area>` href, absolutized browser-style, kept iff
 *    `^(https?|ftp)://` (extractors.js:289-297); `javascript:` hrefs dropped
 *    (they are dynamic-event candidates, out of static scope — SURVEY §2.9 P5);
 *    text = textContent with whitespace runs collapsed + trimmed
 *    (extractors.js:295).
 *  - forms (P2/X8): element serialization, submit x multi-value cartesian
 *    product, `arrayUnique` = JS lexicographic sort + dedup of `k=v` tuples
 *    joined with `&` (extractors.js:300-410; golden docs/response.txt:
 *    `B1=%E6%8F%90%E4%BA%A4&id=1&msg=abc`); GET moves url query params into
 *    the data set (extractors.js:363-369).
 *  - commented links (P4): absolute URLs in comments, plus relative ones with
 *    html-ish extensions, tagged text="__comments" (extractors.js:412-428).
 *
 * JS executed at render time (document.write, onclick, ajax) is invisible to
 * this scanner by design — the pages table `text`/rendered variant carries
 * that boundary (SURVEY §2.9 P3/P5).
 */
object HtmlScanner {

  private val AbsUrlRe = "(?i)^(?:https?|ftp)://".r
  private val JsRe = "(?i)^javascript:".r
  private val CommentAbsRe = "(?i)(?:https?|ftp)://[^\\s]+".r
  private val CommentRelRe = "(?i)[^\\s]+\\.(?:php[s\\d]?|s?html?|aspx?|jsp|cfm)[^\\s]*".r

  // ---------------------------------------------------------------- tokens
  private sealed trait Tok
  private final case class TagTok(name: String, attrs: Map[String, String], closing: Boolean) extends Tok
  private final case class TextTok(s: String) extends Tok
  private final case class CommentTok(s: String) extends Tok

  /** Minimal entity decoding (what textContent / attribute reads give the JS). */
  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i)
        if (semi > i && semi - i <= 10) {
          val ent = s.substring(i + 1, semi)
          val rep: Option[String] = ent match {
            case "amp" => Some("&")
            case "lt" => Some("<")
            case "gt" => Some(">")
            case "quot" => Some("\"")
            case "apos" => Some("'")
            case "nbsp" => Some(" ")
            case e if e.startsWith("#x") || e.startsWith("#X") =>
              try Some(new String(Character.toChars(Integer.parseInt(e.substring(2), 16))))
              catch { case _: Exception => None }
            case e if e.startsWith("#") =>
              try Some(new String(Character.toChars(e.substring(1).toInt)))
              catch { case _: Exception => None }
            case _ => None
          }
          rep match {
            case Some(r) => sb.append(r); i = semi + 1
            case None => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def tokenize(html: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = html.length
    lazy val lower = html.toLowerCase // computed once, for raw-text element skipping
    val text = new StringBuilder
    def flushText(): Unit = if (text.nonEmpty) { out += TextTok(text.toString); text.clear() }
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<' && i + 1 < n) {
        val c1 = html.charAt(i + 1)
        if (c1 == '!' && html.startsWith("<!--", i)) {
          flushText()
          val end = html.indexOf("-->", i + 4)
          val stop = if (end < 0) n else end
          out += CommentTok(html.substring(i + 4, stop))
          i = if (end < 0) n else end + 3
        } else if (c1 == '!' || c1 == '?') { // doctype / processing instruction
          flushText()
          val end = html.indexOf('>', i)
          i = if (end < 0) n else end + 1
        } else if (c1 == '/' || c1.isLetter) {
          val closing = c1 == '/'
          val nameStart = if (closing) i + 2 else i + 1
          var j = nameStart
          while (j < n && (html.charAt(j).isLetterOrDigit || html.charAt(j) == '-')) j += 1
          if (j == nameStart) { text.append(c); i += 1 } // stray '<'
          else {
            flushText()
            val name = html.substring(nameStart, j).toLowerCase
            // scan attributes until '>'
            val attrs = mutable.LinkedHashMap.empty[String, String]
            var k = j
            var done = false
            while (k < n && !done) {
              val ch = html.charAt(k)
              if (ch == '>') { done = true; k += 1 }
              else if (ch.isWhitespace || ch == '/') k += 1
              else {
                // attribute name
                val as = k
                while (k < n && !html.charAt(k).isWhitespace && html.charAt(k) != '=' &&
                  html.charAt(k) != '>' && html.charAt(k) != '/') k += 1
                val aname = html.substring(as, k).toLowerCase
                var aval = ""
                var k2 = k
                while (k2 < n && html.charAt(k2).isWhitespace) k2 += 1
                if (k2 < n && html.charAt(k2) == '=') {
                  k2 += 1
                  while (k2 < n && html.charAt(k2).isWhitespace) k2 += 1
                  if (k2 < n && (html.charAt(k2) == '"' || html.charAt(k2) == '\'')) {
                    val q = html.charAt(k2)
                    val ve = html.indexOf(q, k2 + 1)
                    if (ve < 0) { aval = html.substring(k2 + 1); k2 = n }
                    else { aval = html.substring(k2 + 1, ve); k2 = ve + 1 }
                  } else {
                    val vs = k2
                    while (k2 < n && !html.charAt(k2).isWhitespace && html.charAt(k2) != '>') k2 += 1
                    aval = html.substring(vs, k2)
                  }
                  k = k2
                }
                if (aname.nonEmpty && !attrs.contains(aname)) attrs(aname) = decodeEntities(aval)
              }
            }
            out += TagTok(name, attrs.toMap, closing)
            i = k
            // skip raw content of script/style entirely
            if (!closing && (name == "script" || name == "style")) {
              val closeTag = "</" + name
              val idx = lower.indexOf(closeTag, i)
              if (idx < 0) i = n
              else {
                val gt = html.indexOf('>', idx)
                i = if (gt < 0) n else gt + 1
              }
            }
          }
        } else { text.append(c); i += 1 }
      } else { text.append(c); i += 1 }
    }
    flushText()
    out.result()
  }

  // ------------------------------------------------------------ form model
  private final case class FormEl(nodeName: String, typ: String, name: String, value: String,
      options: Seq[String])

  /** Run the full static extraction for one page. `base` = the page URL. */
  def extract(html: String, base: String): Extracted = {
    val toks = tokenize(html)
    val links = Vector.newBuilder[Link]
    val areaLinks = Vector.newBuilder[Link]
    val commentLinks = Vector.newBuilder[Link]
    val forms = Vector.newBuilder[FormReq]

    // <a> capture state
    var aHref: Option[String] = None
    var aText = new StringBuilder
    def emitA(): Unit = {
      aHref.foreach { href => pushLink(links, base, href, aText.toString) }
      aHref = None; aText = new StringBuilder
    }

    // form capture state
    var formAttrs: Option[Map[String, String]] = None
    var formEls = Vector.newBuilder[FormEl]
    // select capture
    var selAttrs: Option[Map[String, String]] = None
    var selOptions = Vector.newBuilder[String]
    var optValue: Option[String] = None // pending option without value attr: take text
    var optText = new StringBuilder
    var inOption = false
    var optHasValueAttr = false

    def closeOption(): Unit = if (inOption) {
      val v = if (optHasValueAttr) optValue.getOrElse("") else optText.toString.trim
      selOptions += v
      inOption = false; optText = new StringBuilder; optValue = None; optHasValueAttr = false
    }
    def closeSelect(): Unit = {
      closeOption()
      selAttrs.foreach { sa =>
        formEls += FormEl("select", "select", sa.getOrElse("name", ""), "", selOptions.result())
      }
      selAttrs = None; selOptions = Vector.newBuilder[String]
    }
    def emitForm(): Unit = {
      formAttrs.foreach { fa =>
        closeSelect()
        buildForms(fa, formEls.result(), base).foreach(forms += _)
      }
      formAttrs = None; formEls = Vector.newBuilder[FormEl]
    }

    toks.foreach {
      case CommentTok(s) =>
        // absolute URLs in comments (extractors.js:414-416)
        CommentAbsRe.findAllIn(s).foreach { u => commentLinks += Link(u, "__comments") }
        // relative URLs with html-ish extensions (extractors.js:419-427)
        CommentRelRe.findAllIn(s).foreach { u =>
          if (AbsUrlRe.findFirstIn(u).isEmpty)
            UrlCanon.absolutize(base, u).foreach(abs => commentLinks += Link(abs, "__comments"))
        }
      case TextTok(s) =>
        if (aHref.isDefined) aText.append(s)
        if (inOption) optText.append(s)
      case TagTok(name, attrs, closing) =>
        name match {
          case "a" =>
            if (closing) emitA()
            else { emitA(); if (attrs.contains("href")) { aHref = Some(attrs("href")); aText = new StringBuilder } }
          case "area" if !closing =>
            attrs.get("href").foreach(h => pushLink(areaLinks, base, h, ""))
          case "form" =>
            if (closing) emitForm()
            else { emitForm(); formAttrs = Some(attrs) }
          case "input" | "button" | "textarea" | "keygen" if !closing && formAttrs.isDefined =>
            closeSelect()
            val defType = name match {
              case "input" => "text"
              case "button" => "submit"
              case other => other
            }
            val typ = attrs.get("type").map(_.toLowerCase).filter(_.nonEmpty).getOrElse(defType)
            formEls += FormEl(name, typ, attrs.getOrElse("name", ""), attrs.getOrElse("value", ""), Nil)
          case "select" if formAttrs.isDefined =>
            if (closing) closeSelect()
            else { closeSelect(); selAttrs = Some(attrs) }
          case "option" if selAttrs.isDefined =>
            if (closing) closeOption()
            else {
              closeOption()
              inOption = true
              optHasValueAttr = attrs.contains("value")
              optValue = attrs.get("value")
            }
          case _ => // other tags: anchor text flows through (textContent semantics)
        }
    }
    emitA(); emitForm()

    Extracted(links.result() ++ areaLinks.result() ++ commentLinks.result(), forms.result())
  }

  private def pushLink(sink: mutable.Builder[Link, Vector[Link]], base: String, href0: String,
      rawText: String): Unit = {
    val href = decodeEntities(href0).trim
    if (JsRe.findFirstIn(href).isDefined) return // dynamic candidate, out of static scope
    UrlCanon.absolutize(base, href) match {
      case Some(abs) if AbsUrlRe.findFirstIn(abs).isDefined =>
        sink += Link(abs, collapseWs(decodeEntities(rawText)))
      case _ =>
    }
  }

  /** textContent normalization: `\s+` -> " ", trimmed (extractors.js:295). */
  def collapseWs(s: String): String = s.replaceAll("\\s+", " ").trim

  /** JS `arrayUnique`: lexicographic (UTF-16 code unit) sort + adjacent dedup
    * (extractors.js:274-279). Also drops empty strings (JS falsy loop guard). */
  def arrayUnique(arr: Seq[String]): Seq[String] = {
    val sorted = arr.sorted(Ordering.String)
    val out = Vector.newBuilder[String]
    var last: String = null
    sorted.foreach { k => if (k.nonEmpty && k != last) { out += k; last = k } }
    out.result()
  }

  /** getForm (extractors.js:300-410) over statically collected elements. */
  private def buildForms(fa: Map[String, String], els: Seq[FormEl], base: String): Seq[FormReq] = {
    val method = fa.get("method").map(_.toLowerCase).filter(_.nonEmpty).getOrElse("get")
    val action = fa.getOrElse("action", "")
    if (JsRe.findFirstIn(action).isDefined) return Nil // javascript-uri submission
    var url = UrlCanon.absolutize(base, action).getOrElse("")

    // group names to detect radio/checkbox style repeats (f[name].length)
    val nameCounts = els.iterator.filter(_.name.nonEmpty).toSeq.groupBy(_.name).map { case (k, v) => (k, v.size) }

    val values = Vector.newBuilder[String]
    val submits = Vector.newBuilder[Vector[String]]
    val multiDefaults = mutable.LinkedHashMap.empty[String, Seq[String]]
    val dataType = mutable.LinkedHashMap.empty[String, String]

    els.foreach { el =>
      val name = UrlCanon.encodeUriComponent(el.name)
      val value = UrlCanon.encodeUriComponent(el.value)
      if (el.name.nonEmpty) {
        val nodeName = el.nodeName
        val typ = el.typ
        if ((nodeName == "input" || nodeName == "button") && (typ == "submit" || typ == "image")) {
          submits += Vector(s"$name=$value")
        } else if ((nodeName == "input" && typ != "reset" && typ != "button") ||
          nodeName == "textarea" || nodeName == "keygen") {
          if (nameCounts.getOrElse(el.name, 1) == 1) values += s"$name=$value"
          else if (!dataType.contains(name)) {
            val all = els.filter(_.name == el.name)
              .map(e => s"$name=${UrlCanon.encodeUriComponent(e.value)}")
            multiDefaults(name) = all
          }
        } else if (nodeName == "select") {
          if (el.options.nonEmpty)
            multiDefaults(name) = el.options.map(o => s"$name=${UrlCanon.encodeUriComponent(o)}")
          else values += s"$name="
        }
        dataType(name) = typ
      }
    }

    // unknown/empty action -> current page url (extractors.js:349-350)
    if (url.isEmpty || AbsUrlRe.findFirstIn(url).isEmpty)
      url = UrlCanon.absolutize(base, "").getOrElse(base)

    // url params become hidden-typed; for GET they move into values (:352-369)
    var valuesFinal: Vector[String] = values.result()
    UrlCanon.parse(url).foreach { p =>
      if (p.query.nonEmpty) {
        val urlparams = p.query.split("&", -1).toVector
        urlparams.foreach { param =>
          val k = param.split("=", 2)(0)
          if (k.nonEmpty && !dataType.contains(k)) dataType(k) = "hidden"
          else if (k.nonEmpty) dataType(k) = "hidden"
        }
        if (method == "get") {
          valuesFinal = urlparams ++ valuesFinal
          url = UrlCanon.Parsed(p.scheme, p.userinfo, p.host, p.port, p.path, "", p.fragment) match {
            case q => // rebuild without query
              val hp = if (q.port >= 0) s"${q.host}:${q.port}" else q.host
              val ui = if (q.userinfo.nonEmpty) s"${q.userinfo}@" else ""
              s"${q.scheme}://$ui$hp${if (q.path.isEmpty) "/" else q.path}"
          }
        }
      }
    }

    val submitsFinal: Vector[Vector[String]] = {
      val s = submits.result()
      if (s.isEmpty) Vector(Vector.empty) else s
    }

    // cartesian expansion over multiDefaults, seeded with submits (:375-392)
    val combinators: Seq[Vector[String]] =
      multiDefaults.foldLeft(submitsFinal: Seq[Vector[String]]) { case (prev, (_, cur)) =>
        prev.flatMap(pv => cur.map(cv => pv :+ cv))
      }

    combinators.map { comb =>
      FormReq(method, url, arrayUnique(valuesFinal ++ comb).mkString("&"), dataType.toMap)
    }
  }
}
