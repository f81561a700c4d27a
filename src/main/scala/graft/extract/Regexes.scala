package graft.extract

import java.util.regex.Pattern

/** The readability heuristic regexes, semantics-equal to
  * /root/reference/readability/regexes.py:7-25 (case-insensitive, search
  * i.e. find-anywhere). Precompiled once per JVM (SURVEY.md §4).
  */
object Regexes {
  private def ci(p: String) = Pattern.compile(p, Pattern.CASE_INSENSITIVE)

  val unlikelyCandidates: Pattern = ci(
    "combx|comment|community|disqus|extra|foot|header|menu|remark|rss|shoutbox|sidebar|sponsor|ad-break|agegate|pagination|pager|popup|tweet|twitter")
  val okMaybeItsACandidate: Pattern = ci("and|article|body|column|main|shadow")
  val positive: Pattern = ci(
    "article|body|content|entry|hentry|main|page|pagination|post|text|blog|story")
  val negative: Pattern = ci(
    "combx|comment|com-|contact|foot|footer|footnote|masthead|media|meta|outbrain|promo|related|scroll|shoutbox|sidebar|sponsor|shopping|tags|tool|widget")
  val extraneous: Pattern = ci(
    "print|archive|comment|discuss|e[\\-]?mail|share|reply|all|login|sign|single")
  val divToPElements: Pattern = ci("<(a|blockquote|dl|div|img|ol|p|pre|table|ul)")
  val nextLink: Pattern = ci("(next|weiter|continue|>[^\\|]$)")
  val prevLink: Pattern = ci("(prev|earl|old|new|<)")
  val page: Pattern = ci("pag(e|ing|inat)")
  val firstLast: Pattern = ci("(first|last)")

  @inline def search(p: Pattern, s: String): Boolean = p.matcher(s).find()
}
