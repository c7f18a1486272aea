package graft.engine

import scala.util.matching.Regex

/**
 * Dialect shims that are syntax (not function-name) level, applied by
 * `SqlEngine` pre-parse.
 *
 * `SIMILAR TO` (SURVEY §2.2 predicate row): SQL-standard pattern
 * matching DataFusion accepts but Spark has no syntax for. Rewritten to
 * an anchored RLIKE: `%`→`.*`, `_`→`.` (outside character classes;
 * `\%`/`\_` escapes preserved as literals), regex metacharacters that
 * SQL patterns treat literally (`.`) escaped. The regex-subset operators
 * SIMILAR TO shares with POSIX (`|`, `*`, `+`, `?`, `()`, `[]`, `{}`)
 * pass through unchanged.
 */
object Dialect {

  private val SimilarTo: Regex =
    """(?i)\s+(NOT\s+)?SIMILAR\s+TO\s+'((?:[^']|'')*)'""".r

  def rewriteSimilarTo(sql: String): String =
    SimilarTo.replaceAllIn(sql, m => {
      val not = if (m.group(1) != null) "NOT " else ""
      val pat = translatePattern(m.group(2))
      Regex.quoteReplacement(s" ${not}RLIKE '^$pat$$'")
    })

  private[engine] def translatePattern(p: String): String = {
    val sb = new StringBuilder
    var i = 0
    var inClass = false
    while (i < p.length) {
      val c = p.charAt(i)
      c match {
        case '\\' if i + 1 < p.length =>
          sb += '\\' += p.charAt(i + 1); i += 1
        case '[' if !inClass => inClass = true; sb += c
        case ']' if inClass => inClass = false; sb += c
        case '%' if !inClass => sb ++= ".*"
        case '_' if !inClass => sb += '.'
        case '.' if !inClass => sb ++= "\\\\."
        case other => sb += other
      }
      i += 1
    }
    sb.toString
  }
}
