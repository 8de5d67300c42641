package graft.core

/** robots.txt admission with longest-prefix-match semantics
  * (SURVEY.md §2.8 U1). Pure function; shared between engine and
  * simulator (admission *content* rule, not scheduling).
  *
  * Semantics (Google robots RFC 9309 style): among all rules whose
  * prefix matches the path, the longest prefix wins; ties prefer allow;
  * no matching rule ⇒ allowed.
  */
object RobotsMatcher {

  def allows(rules: Seq[RobotsRule], path: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    rules.foreach { r =>
      if (path.startsWith(r.prefix)) {
        val len = r.prefix.length
        if (len > bestLen || (len == bestLen && r.allow && !bestAllow)) {
          bestLen = len
          bestAllow = r.allow
        }
      }
    }
    bestAllow
  }

  /** Parse a minimal robots.txt (single `User-agent: *` group with
    * Allow/Disallow lines) into rules. Empty Disallow value = allow all
    * (per the original REP). */
  def parse(text: String): Seq[RobotsRule] = {
    text.linesIterator.flatMap { line0 =>
      val line = line0.takeWhile(_ != '#').trim
      val i = line.indexOf(':')
      if (i < 0) None
      else {
        val key = line.substring(0, i).trim.toLowerCase
        val value = line.substring(i + 1).trim
        key match {
          case "allow" if value.nonEmpty    => Some(RobotsRule(allow = true, value))
          case "disallow" if value.nonEmpty => Some(RobotsRule(allow = false, value))
          case _                            => None
        }
      }
    }.toSeq
  }
}
