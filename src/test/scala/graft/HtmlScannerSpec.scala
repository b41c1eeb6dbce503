package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.{HtmlScanner, Link}

/**
 * Golden extraction tests ported from the reference fixture corpus
 * (/root/reference/tests/data_webpage.py, docs/response.txt) — FIXTURES.md §2.
 */
class HtmlScannerSpec extends AnyFunSuite {

  private val base = "http://127.0.0.1:14887/page"

  test("html_link fixture: plain <a href> links incl. non-ASCII query (data_webpage.py:17-26)") {
    val html =
      """
    <div class=demo>
<a href="html_link1.php?id=2">html_link1</a>
<a href="html_link2.php?id=4">html_link2</a>
<a href="html_link21.php?id=展示">html_link3</a>
</div>
"""
    val got = HtmlScanner.extract(html, "http://127.0.0.1:14887/html_link")
    assert(got.links == Seq(
      Link("http://127.0.0.1:14887/html_link1.php?id=2", "html_link1"),
      Link("http://127.0.0.1:14887/html_link2.php?id=4", "html_link2"),
      Link("http://127.0.0.1:14887/html_link21.php?id=%E5%B1%95%E7%A4%BA", "html_link3")))
    assert(got.forms.isEmpty)
  }

  test("js fixture: statically invisible JS-assigned hrefs (data_webpage.py:29-40)") {
    val html =
      """
<div class=demo id=jsCode>
<a id="l1"  >js_link1</a>
<a id="l2"  >js_link2</a>
<script>
l1.href = "js_link1.php"+"?id=1&msg=abc";
l2.href = "js_link2.php"+"?id=2&msg=哇";
</script>
</div>
"""
    val got = HtmlScanner.extract(html, "http://127.0.0.1:14887/js")
    // static scanner: <a> without href yields nothing; script body skipped
    assert(got.links.isEmpty)
    assert(got.forms.isEmpty)
  }

  test("form fixture: static subset — submit only, document.write content invisible (data_webpage.py:43-55)") {
    val html =
      """
    <div class=demo id=formCode>
<form method="post" name="form1" enctype="multipart/form-data"  action="post_link.php">
<script>
document.write('<input type="text" name="i'+'d" size="30" value=1><br>');
document.write('<input type="text" name="m'+'sg" size="30" value="abc">');
</script>
<input type="submit" value="提交" name="B1">
</form>
</div>
"""
    val got = HtmlScanner.extract(html, "http://127.0.0.1:14887/form")
    assert(got.forms.size == 1)
    val f = got.forms.head
    assert(f.method == "post")
    assert(f.url == "http://127.0.0.1:14887/post_link.php")
    assert(f.data == "B1=%E6%8F%90%E4%BA%A4")
    assert(f.dataType == Map("B1" -> "submit"))
  }

  test("rendered form golden: serialization order is arrayUnique sort (docs/response.txt)") {
    // the same form AS RENDERED (document.write materialized) must give the
    // response.txt golden: B1=%E6%8F%90%E4%BA%A4&id=1&msg=abc
    val rendered =
      """
<form method="post" name="form1" enctype="multipart/form-data" action="post_link.php">
<input type="text" name="id" size="30" value="1"><br>
<input type="text" name="msg" size="30" value="abc">
<input type="submit" value="提交" name="B1">
</form>
"""
    val got = HtmlScanner.extract(rendered, "http://127.0.0.1:14887/form")
    assert(got.forms.size == 1)
    val f = got.forms.head
    assert(f.data == "B1=%E6%8F%90%E4%BA%A4&id=1&msg=abc")
    assert(f.dataType == Map("B1" -> "submit", "id" -> "text", "msg" -> "text"))
    assert(f.method == "post")
    assert(f.url == "http://127.0.0.1:14887/post_link.php")
  }

  test("test_page fixture: relative+absolute mix (data_webpage.py:85-105)") {
    val html =
      """
    <div id=abc>-</div>
<a href="/pyspider/test.html">404</a>
<a href="/links/10/0">0</a>
<a href="/gzip">gzip</a>
<a href="/robots.txt">robots</a>
"""
    val got = HtmlScanner.extract(html, "http://127.0.0.1:14887/pyspider/test.html")
    assert(got.links.map(_.url) == Seq(
      "http://127.0.0.1:14887/pyspider/test.html",
      "http://127.0.0.1:14887/links/10/0",
      "http://127.0.0.1:14887/gzip",
      "http://127.0.0.1:14887/robots.txt"))
    assert(got.links.map(_.text) == Seq("404", "0", "gzip", "robots"))
  }

  test("javascript: hrefs are dropped (extractors.js:291-292, ajax_click fixture)") {
    val html = """<a href="javascript:void(0)" onclick="load()">load</a>"""
    assert(HtmlScanner.extract(html, base).links.isEmpty)
  }

  test("commented links: absolute + relative-with-extension (extractors.js:412-428)") {
    val html =
      """
<a href="/x">x</a>
<!-- see http://other.com/hidden?a=1 and also old.php?id=3 plus readme.txt -->
"""
    val got = HtmlScanner.extract(html, "http://h.com/dir/page.html")
    assert(got.links.contains(Link("http://h.com/x", "x")))
    assert(got.links.contains(Link("http://other.com/hidden?a=1", "__comments")))
    assert(got.links.contains(Link("http://h.com/dir/old.php?id=3", "__comments")))
    // .txt is not an html-ish extension
    assert(!got.links.exists(_.url.contains("readme.txt")))
  }

  test("anchor text: whitespace collapse + entities + nested tags (extractors.js:295)") {
    val html = "<a href=\"/x\">  hello\n  <b>world</b> &amp; friends  </a>"
    val got = HtmlScanner.extract(html, "http://h.com/")
    assert(got.links == Seq(Link("http://h.com/x", "hello world & friends")))
  }

  test("area links are extracted after a links") {
    val html = """<area href="/m1"><a href="/a1">a</a>"""
    val got = HtmlScanner.extract(html, "http://h.com/")
    assert(got.links.map(_.url) == Seq("http://h.com/a1", "http://h.com/m1"))
  }

  test("GET form moves url params into data; select/radio cartesian (extractors.js:352-398)") {
    val html =
      """
<form method="GET" action="/search?src=nav">
<input type="text" name="q" value="spark">
<input type="radio" name="sex" value="M">
<input type="radio" name="sex" value="F">
<select name="rel">
  <option value="a">A</option>
  <option>b text</option>
</select>
<input type="submit" name="go" value="Go!">
</form>
"""
    val got = HtmlScanner.extract(html, "http://h.com/page")
    // radio (2) x select (2) = 4 combinations
    assert(got.forms.size == 4)
    assert(got.forms.forall(_.method == "get"))
    assert(got.forms.forall(_.url == "http://h.com/search"))
    val datas = got.forms.map(_.data)
    // values = [src=nav (url param), q=spark]; combinator = [go=Go!, sex=?, rel=?]
    // arrayUnique sorts lexicographically
    assert(datas.contains(HtmlScanner.arrayUnique(Seq("src=nav", "q=spark", "go=Go!", "sex=M", "rel=a")).mkString("&")))
    assert(datas.contains(HtmlScanner.arrayUnique(Seq("src=nav", "q=spark", "go=Go!", "sex=F", "rel=b%20text")).mkString("&")))
    val dt = got.forms.head.dataType
    assert(dt("src") == "hidden")
    assert(dt("q") == "text")
    assert(dt("sex") == "radio")
    assert(dt("rel") == "select")
    assert(dt("go") == "submit")
  }

  test("form with javascript action is skipped; empty action falls back to page url") {
    val js = """<form action="javascript:doIt()"><input type=submit name=s value=v></form>"""
    assert(HtmlScanner.extract(js, base).forms.isEmpty)
    val noAction = """<form><input type="submit" name="s" value="v"></form>"""
    val got = HtmlScanner.extract(noAction, base)
    assert(got.forms.size == 1)
    assert(got.forms.head.url == base)
    assert(got.forms.head.data == "s=v")
  }

  test("form without submit still yields one candidate (submits=[[]], extractors.js:372-373)") {
    val html = """<form action="/f"><input type="text" name="a" value="1"></form>"""
    val got = HtmlScanner.extract(html, "http://h.com/")
    assert(got.forms.size == 1)
    assert(got.forms.head.data == "a=1")
  }

  test("arrayUnique: JS sort + dedup semantics") {
    assert(HtmlScanner.arrayUnique(Seq("id=1", "msg=abc", "B1=x", "id=1")) == Seq("B1=x", "id=1", "msg=abc"))
  }
}
