package graft.text

/**
 * robots.txt parsing + `can_fetch`, matching Python 2 `robotparser`
 * semantics as used by the reference fetcher
 * (`/root/reference/sspider/fetcher/tornado_fetcher.py:287-322`):
 *
 *  - entries = groups of User-agent lines followed by Allow/Disallow rules;
 *  - agent matching: the checking UA is lowercased and truncated at "/";
 *    an entry applies if any of its user-agents is "*" or is a substring of
 *    the checking UA;
 *  - first applicable entry wins; within it, rules are checked in file order
 *    and the first path-prefix match decides; empty Disallow = allow-all;
 *  - no rule matches, no entry matches, or robots.txt missing/unfetchable
 *    => allow (tornado_fetcher.py:305-312 returns True on error).
 *
 * Parsed rules are plain case classes so a rules table can be broadcast and
 * probed from a scalar function (SURVEY §2.2 F9 / §2.3 J4).
 */
object Robots {

  final case class Rule(path: String, allow: Boolean)
  final case class Group(agents: Seq[String], rules: Seq[Rule])
  final case class RobotsRules(groups: Seq[Group]) {
    def canFetch(userAgent: String, path: String): Boolean = {
      val ua = userAgent.split("/", 2)(0).toLowerCase
      // robotparser semantics: a group containing "*" is the DEFAULT entry,
      // consulted only after every UA-specific group failed to match — file
      // order does not promote it ("User-agent: *" first must not shadow a
      // later "User-agent: graftbot" group).
      val applicable = groups
        .find(g => !g.agents.contains("*") && g.agents.exists(a => ua.contains(a)))
        .orElse(groups.find(_.agents.contains("*")))
      applicable match {
        case None => true
        case Some(g) =>
          g.rules.find(r => r.path == "*" || path.startsWith(r.path)) match {
            case Some(r) => r.allow
            case None => true
          }
      }
    }
  }

  val AllowAll: RobotsRules = RobotsRules(Nil)

  /** Parse robots.txt content; tolerant of junk lines. */
  def parse(content: String): RobotsRules = {
    if (content == null) return AllowAll
    val groups = Vector.newBuilder[Group]
    var agents = Vector.empty[String]
    var rules = Vector.empty[Rule]
    var sawRule = false
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents, rules)
      agents = Vector.empty; rules = Vector.empty; sawRule = false
    }
    content.linesIterator.foreach { raw =>
      val line = { val h = raw.indexOf('#'); if (h >= 0) raw.substring(0, h) else raw }.trim
      if (line.nonEmpty) {
        val parts = line.split(":", 2)
        if (parts.length == 2) {
          val key = parts(0).trim.toLowerCase
          val value = parts(1).trim
          key match {
            case "user-agent" =>
              if (sawRule) flush()
              agents :+= value.toLowerCase
            case "disallow" =>
              sawRule = true
              // empty Disallow means allow-everything (robotparser RuleLine)
              if (value.isEmpty) rules :+= Rule("", allow = true)
              else rules :+= Rule(value, allow = false)
            case "allow" =>
              sawRule = true
              rules :+= Rule(value, allow = true)
            case _ => // crawl-delay / sitemap etc: ignored (reference ignores too)
          }
        }
      }
    }
    flush()
    RobotsRules(groups.result())
  }

  /** One-shot check, usable as a UDF over (robots body, ua, path). */
  def canFetch(robotsTxt: String, userAgent: String, path: String): Boolean =
    parse(robotsTxt).canFetch(userAgent, path)
}
