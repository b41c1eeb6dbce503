package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.url.CurlArgs

/**
 * X10 golden tests — the reference's own curl commands from
 * tests/test_fetcher_processor.py:362-386 (devtools "Copy as cURL" output),
 * parsed to the same fields its `curl_to_arguments` returns.
 */
class CurlArgsSpec extends AnyFunSuite {

  test("curl GET with headers and --compressed (test_zzz_curl_get)") {
    val cmd = "curl 'http://h.test/get' -H 'DNT: 1' -H 'Accept-Encoding: gzip, deflate, sdch' " +
      "-H 'Accept-Language: en,zh-CN;q=0.8,zh;q=0.6' " +
      "-H 'User-Agent: Mozilla/5.0 (Macintosh; Intel Mac OS X 10_10_2) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/41.0.2272.17 Safari/537.36' " +
      "-H 'Binux-Header: Binux-Value' -H 'Accept: */*' " +
      "-H 'Cookie: _gauges_unique_year=1; _gauges_unique=1; _ga=GA1.2.415471573.1419316591' " +
      "-H 'Connection: keep-alive' --compressed"
    val r = CurlArgs.parse(cmd)
    assert(r.urls == Seq("http://h.test/get"))
    assert(r.method == "GET")
    assert(r.data.isEmpty)
    assert(r.useGzip)
    assert(r.headers.size == 8)
    assert(r.headers("Binux-Header") == "Binux-Value")
    assert(r.headers("Cookie") == "_gauges_unique_year=1; _gauges_unique=1; _ga=GA1.2.415471573.1419316591")
    // header values containing ':' split on the FIRST colon only
    assert(r.headers("User-Agent").contains("Mozilla/5.0"))
  }

  test("curl POST via --data defaults method to POST (test_zzz_curl_post)") {
    val r = CurlArgs.parse(
      "curl 'http://h.test/post' -H 'Content-Type: application/x-www-form-urlencoded' " +
        "--data 'Binux-Key=%E4%B8%AD%E6%96%87+value' --compressed")
    assert(r.method == "POST")
    assert(r.data.contains("Binux-Key=%E4%B8%AD%E6%96%87+value"))
    assert(r.headers("Content-Type") == "application/x-www-form-urlencoded")
  }

  test("curl PUT with --data-binary $'...' strips the leading $ (test_zzz_curl_put)") {
    val body = "------WebKitFormBoundaryYlkgyaA7SRGOQYUG\r\nContent-Disposition: form-data; " +
      "name=\"Binux-Key\"\r\n\r\n%E4%B8%AD%E6%96%87+value\r\n------WebKitFormBoundaryYlkgyaA7SRGOQYUG--\r\n"
    val r = CurlArgs.parse(s"curl 'http://h.test/put' -X PUT --data-binary $$'$body' --compressed")
    assert(r.method == "PUT")
    assert(r.data.contains(body))
  }

  test("no URL is an error (test_zzz_curl_no_url)") {
    val e = intercept[IllegalArgumentException] {
      CurlArgs.parse("curl -X PUT -H 'Origin: chrome-extension://hgmloofddffdnphfgcellkdfbfbjeloo' --compressed")
    }
    assert(e.getMessage.contains("no URL"))
  }

  test("unknown option and dangling option are errors") {
    intercept[IllegalArgumentException](CurlArgs.parse("curl http://h.test --bogus x"))
    intercept[IllegalArgumentException](CurlArgs.parse("curl http://h.test -H"))
  }

  test("shlex splitting: double quotes with escapes, backslash outside quotes") {
    assert(CurlArgs.shlexSplit("""a "b \"c\" d" e\ f""") == Seq("a", "b \"c\" d", "e f"))
    assert(CurlArgs.shlexSplit("x 'it''s'") == Seq("x", "its")) // adjacent quoted parts concatenate
  }

  test("explicit -X wins over the data-implies-POST default") {
    val r = CurlArgs.parse("curl http://h.test -X DELETE --data 'a=1'")
    assert(r.method == "DELETE")
  }
}
