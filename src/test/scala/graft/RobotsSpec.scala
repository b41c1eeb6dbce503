package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.Robots

/** Robots fixtures per FIXTURES.md §3 / tornado_fetcher.py:287-322. */
class RobotsSpec extends AnyFunSuite {

  test("allow-all when missing or empty") {
    assert(Robots.parse("").canFetch("sspider/1.0", "/any"))
    assert(Robots.parse(null).canFetch("bot", "/x"))
  }

  test("deny-all group") {
    val r = Robots.parse("User-agent: *\nDisallow: /")
    assert(!r.canFetch("anybot", "/"))
    assert(!r.canFetch("anybot", "/deep/path"))
  }

  test("path-prefix disallow with allow override order (first match wins)") {
    val r = Robots.parse(
      """User-agent: *
        |Allow: /private/ok
        |Disallow: /private/
        |""".stripMargin)
    assert(r.canFetch("bot", "/public"))
    assert(r.canFetch("bot", "/private/ok/page"))
    assert(!r.canFetch("bot", "/private/no"))
  }

  test("UA-specific group beats generic when listed first; substring UA match") {
    val r = Robots.parse(
      """User-agent: sspider
        |Disallow: /only-sspider/
        |
        |User-agent: *
        |Disallow: /everyone/
        |""".stripMargin)
    // UA "sspider/1.0" -> token "sspider" matches first group only
    assert(!r.canFetch("sspider/1.0", "/only-sspider/x"))
    assert(r.canFetch("sspider/1.0", "/everyone/x")) // its group has no such rule
    assert(!r.canFetch("otherbot", "/everyone/x"))
    assert(r.canFetch("otherbot", "/only-sspider/x"))
  }

  test("'*' group first in file does NOT shadow a later UA-specific group (robotparser default-entry order)") {
    val r = Robots.parse(
      """User-agent: *
        |Disallow: /
        |
        |User-agent: graftbot
        |Disallow:
        |""".stripMargin)
    // robotparser checks UA-specific entries before the '*' default entry
    // regardless of file position
    assert(r.canFetch("graftbot/1.0", "/anything"))
    assert(!r.canFetch("otherbot", "/anything"))
  }

  test("empty Disallow means allow-all (robotparser RuleLine)") {
    val r = Robots.parse("User-agent: *\nDisallow:")
    assert(r.canFetch("bot", "/anything"))
  }

  test("multiple user-agent lines share one rule group; comments stripped") {
    val r = Robots.parse(
      """# header comment
        |User-agent: abot
        |User-agent: bbot
        |Disallow: /x # trailing comment
        |""".stripMargin)
    assert(!r.canFetch("abot", "/x/1"))
    assert(!r.canFetch("bbot", "/x/1"))
    assert(r.canFetch("cbot", "/x/1"))
  }

  test("canFetch one-shot helper") {
    assert(!Robots.canFetch("User-agent: *\nDisallow: /a", "bot", "/a/b"))
    assert(Robots.canFetch("User-agent: *\nDisallow: /a", "bot", "/b"))
  }
}
