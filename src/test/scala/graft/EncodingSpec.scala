package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.{Charset, StandardCharsets}
import graft.text.Encoding

/** Charset matrix per response.py:59-124,209-232 (FIXTURES.md §2 encodings). */
class EncodingSpec extends AnyFunSuite {

  test("header charset wins (response.py:213-218)") {
    val body = "<meta charset=gbk><p>hi".getBytes(StandardCharsets.UTF_8)
    assert(Encoding.detect("text/html; charset=utf-8", body) == "utf-8")
    assert(Encoding.detect("text/html; charset=\"big5\"", body) == "big5")
    assert(Encoding.detect("text/html; charset='big5'", body) == "big5")
  }

  test("meta charset sniff (charset_re)") {
    assert(Encoding.detect(null, "<html><META CHARSET=\"GBK\"><body>".getBytes("UTF-8")) == "GBK")
    assert(Encoding.detect(null, "<meta charset=utf-8>".getBytes("UTF-8")) == "utf-8")
  }

  test("meta http-equiv pragma sniff (pragma_re)") {
    val b = "<meta http-equiv=\"Content-Type\" content=\"text/html; charset=iso-8859-1\">"
    // charset_re also matches this (it allows anything between meta and charset=)
    assert(Encoding.detect(null, b.getBytes("UTF-8")) == "iso-8859-1")
    val pragmaOnly = "<meta http-equiv=x content=\";charset=koi8-r\">"
    assert(Encoding.detect(null, pragmaOnly.getBytes("UTF-8")) == "koi8-r")
  }

  test("xml declaration sniff (xml_re, anchored at start)") {
    assert(Encoding.detect(null, "<?xml version=\"1.0\" encoding=\"Shift_JIS\"?><r/>".getBytes("UTF-8")) == "Shift_JIS")
    // not at the start -> no match -> fallback utf-8
    assert(Encoding.detect(null, " <?xml encoding=\"Shift_JIS\"?>".getBytes("UTF-8")) == "utf-8")
  }

  test("gb2312 promoted to gb18030 (response.py:80-81)") {
    assert(Encoding.detect(null, "<meta charset=gb2312>".getBytes("UTF-8")) == "gb18030")
    assert(Encoding.detect("text/html; charset=GB2312", Array[Byte]()) == "gb18030")
  }

  test("decode with replace; unknown charset falls back to utf-8 (response.py:109-119)") {
    val gbk = "中文内容".getBytes(Charset.forName("GBK"))
    val html = ("<meta charset=gbk>".getBytes("UTF-8") ++ gbk)
    assert(Encoding.extractText(html, null) == "<meta charset=gbk>中文内容")
    // invalid utf-8 bytes -> U+FFFD replacement
    val bad = Array[Byte]('a', 0xff.toByte, 'b')
    assert(Encoding.extractText(bad, "text/html; charset=utf-8") == "a�b")
    // bogus charset name -> utf-8 + replace
    assert(Encoding.extractText("ok".getBytes("UTF-8"), "text/html; charset=bogus-enc-123") == "ok")
  }

  test("empty content -> empty text (response.py:103-104)") {
    assert(Encoding.extractText(Array.empty[Byte], null) == "")
    assert(Encoding.extractText(null, null) == "")
  }

  test("chardet-lite: undeclared charsets resolve by byte heuristic (response.py:77-78 subset)") {
    // undeclared valid UTF-8 (incl. multibyte) stays utf-8
    assert(Encoding.detectBytes("undeclared völlig valid".getBytes("UTF-8")) == "utf-8")
    // undeclared GBK bytes: every high byte pairs -> gb18030, round-trips
    val gb = "完全无标注的中文正文".getBytes(Charset.forName("GB18030"))
    assert(Encoding.detectBytes(gb) == "gb18030")
    assert(Encoding.extractText(gb, null) == "完全无标注的中文正文")
    // undeclared latin-1 with an accent before a space (à ) -> cannot all
    // pair -> latin-1, round-trips (even though ï/é mid-word WOULD pair)
    val l1 = "naïve déjà vu à la carte".getBytes("ISO-8859-1")
    assert(Encoding.detectBytes(l1) == "iso-8859-1")
    assert(Encoding.extractText(l1, null) == "naïve déjà vu à la carte")
    // boundary cases from the documented contract:
    // 0x80 is not a valid GBK lead -> latin-1
    assert(Encoding.detectBytes(Array[Byte]('a', 0x80.toByte, 'b')) == "iso-8859-1")
    // trailing lone high byte -> latin-1
    assert(Encoding.detectBytes(Array[Byte]('a', 0xE9.toByte)) == "iso-8859-1")
    // a declaration (header or meta) always beats the heuristic
    assert(Encoding.detect("text/html; charset=utf-8", l1) == "utf-8")
  }

  test("gb2312-declared page decodes via gb18030") {
    val payload = "汉字".getBytes(Charset.forName("GB18030"))
    val html = "<meta charset=gb2312>".getBytes("UTF-8") ++ payload
    assert(Encoding.extractText(html, null).endsWith("汉字"))
  }

  test("charset priority: meta charset before pragma before xml") {
    val b = "<?xml encoding=\"a\"?><meta content=\";charset=b\"><meta charset=c>"
    // charset_re scans the whole window first; its first match is on the
    // *first* <meta...charset= occurrence: that's `content=";charset=b"` —
    // matching python findall order where charset_re results come first.
    val got = Encoding.detect(null, b.getBytes("UTF-8"))
    assert(got == "b")
  }
}
