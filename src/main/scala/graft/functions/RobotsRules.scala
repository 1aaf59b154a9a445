package graft.functions

/** robots.txt parsing + access decisions per RFC 9309 (Robots
  * Exclusion Protocol) — the crawl front door's first fetch decision,
  * sitting beside the WARC reader and HTML extractor in the pipeline.
  *
  * Implemented semantics (all from the RFC):
  *   - groups: one or more `User-agent:` lines followed by rules; a
  *     crawler uses the group(s) whose product token case-insensitively
  *     equals its own, falling back to the `*` group; multiple groups
  *     matching the same agent MERGE their rules (§2.2.1);
  *   - rule match: a pattern matches a path prefix, with `*` matching
  *     any character run and a trailing `$` anchoring the end (§2.2.3);
  *   - precedence: the MOST SPECIFIC match wins — longest pattern (in
  *     octets), and on a length tie `allow` beats `disallow` (§2.2.2);
  *   - an empty `disallow:` value matches nothing (allows all);
  *   - `#` starts a comment; field names are case-insensitive;
  *     unknown fields are ignored; `crawl-delay` (the de-facto
  *     extension every large crawler honors) is carried per group.
  *
  * Everything is total: `parse` never throws on arbitrary text and
  * `decide` on arbitrary paths — malformed lines are skipped, which is
  * the RFC's own error posture.
  */
object RobotsRules {

  final case class Group(agents: Seq[String], rules: Seq[Rule], crawlDelay: Option[Int])
  /** allow=false ⇒ Disallow. Pattern kept verbatim (octets = chars here). */
  final case class Rule(allow: Boolean, pattern: String)
  final case class Decision(allowed: Boolean, matchLen: Int, groupUsed: String, crawlDelay: Int)

  /** Parse robots.txt text into groups. A rule line before any
    * User-agent line is ignored (no open group, per the ABNF).
    */
  def parse(text: String): Seq[Group] = {
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var agents = List.empty[String]
    var rules = List.empty[Rule]
    var delay: Option[Int] = None
    var collectingAgents = false // consecutive User-agent lines share one group
    var open = false
    def close(): Unit = {
      if (open) groups += Group(agents.reverse, rules.reverse, delay)
      agents = Nil; rules = Nil; delay = None; open = false
    }
    for (raw <- text.split("\n", -1)) {
      val line = raw.takeWhile(_ != '#').trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val field = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        field match {
          case "user-agent" =>
            if (!collectingAgents) close()
            agents ::= value.toLowerCase
            collectingAgents = true
            open = true
          case "allow" if open =>
            collectingAgents = false
            rules ::= Rule(allow = true, value)
          case "disallow" if open =>
            collectingAgents = false
            rules ::= Rule(allow = false, value)
          case "crawl-delay" if open =>
            collectingAgents = false
            delay = value.toIntOption.orElse(delay)
          case _ =>
            collectingAgents = false // unknown field: ignored, ends UA run
        }
      }
    }
    close()
    groups.toSeq
  }

  /** RFC 9309 §2.2.3 pattern match: `*` matches any run, trailing `$`
    * anchors the end, otherwise prefix semantics. Returns true iff the
    * pattern matches the path. Empty pattern matches nothing (the
    * "Disallow:" allow-all idiom).
    */
  def matches(pattern: String, path: String): Boolean = {
    if (pattern.isEmpty) return false
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.dropRight(1) else pattern
    val parts = pat.split("\\*", -1) // n fixed segments around n-1 stars
    if (!path.startsWith(parts.head)) return false
    if (parts.length == 1) return !anchored || path == pat
    // anchored: the LAST fixed segment must sit flush at the path end;
    // the middle segments then place greedily inside what remains.
    val body =
      if (anchored) {
        if (!path.endsWith(parts.last)) return false
        path.substring(0, path.length - parts.last.length)
      } else path
    var pos = parts.head.length
    val middle = if (anchored) parts.view.slice(1, parts.length - 1) else parts.view.drop(1)
    for (seg <- middle) {
      val at = body.indexOf(seg, pos)
      if (at < 0) return false
      pos = at + seg.length
    }
    !anchored || pos <= body.length
  }

  /** Decide access for (agent, path): pick the agent's group(s) (exact
    * case-insensitive token, else `*`; matching groups merge), apply
    * longest-pattern-wins with allow on ties. No matching rule ⇒
    * allowed with matchLen 0. No matching group ⇒ allowed, group "".
    */
  def decide(groups: Seq[Group], agent: String, path: String): Decision = {
    val a = agent.toLowerCase
    val exact = groups.filter(_.agents.contains(a))
    val chosen = if (exact.nonEmpty) exact else groups.filter(_.agents.contains("*"))
    if (chosen.isEmpty) return Decision(allowed = true, 0, "", 0)
    val groupUsed = if (exact.nonEmpty) a else "*"
    val delay = chosen.flatMap(_.crawlDelay).headOption.getOrElse(0)
    val hits = chosen.flatMap(_.rules).filter(r => matches(r.pattern, path))
    if (hits.isEmpty) return Decision(allowed = true, 0, groupUsed, delay)
    val best = hits.maxBy(r => (r.pattern.length, r.allow)) // tie → allow wins
    Decision(best.allow, best.pattern.length, groupUsed, delay)
  }
}
