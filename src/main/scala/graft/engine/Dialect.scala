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

  /** Apply `f` only to the segments of `sql` OUTSIDE single-quoted string
    * literals (respecting `''` and backslash escapes) — textual rewrites
    * like function aliases must never rewrite data inside literals. */
  def outsideLiterals(sql: String)(f: String => String): String = {
    val sb = new StringBuilder
    val seg = new StringBuilder
    var i = 0
    var inStr = false
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (!inStr) {
        if (c == '\'') { sb ++= f(seg.toString); seg.clear(); inStr = true; sb += c; i += 1 }
        else { seg += c; i += 1 }
      } else {
        if (c == '\\' && i + 1 < sql.length) { sb += c += sql.charAt(i + 1); i += 2 }
        else if (c == '\'' && i + 1 < sql.length && sql.charAt(i + 1) == '\'') { sb ++= "''"; i += 2 }
        else { if (c == '\'') inStr = false; sb += c; i += 1 }
      }
    }
    sb ++= f(seg.toString)
    sb.toString
  }

  /** The statement with string-literal contents blanked — for keyword
    * detection that must not trigger on data. */
  def maskLiterals(sql: String): String = {
    val sb = new StringBuilder
    var i = 0
    var inStr = false
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (!inStr) { if (c == '\'') { inStr = true; sb += c }; if (c != '\'') sb += c; i += 1 }
      else {
        if (c == '\\' && i + 1 < sql.length) i += 2
        else if (c == '\'' && i + 1 < sql.length && sql.charAt(i + 1) == '\'') i += 2
        else { if (c == '\'') { inStr = false; sb += c }; i += 1 }
      }
    }
    sb.toString
  }

  private[engine] def translatePattern(p: String): String = {
    val sb = new StringBuilder
    var i = 0
    var inClass = false
    while (i < p.length) {
      val c = p.charAt(i)
      c match {
        case '\\' if i + 1 < p.length =>
          // user-escaped metachar: keep it literal through BOTH the SQL
          // string unescape and the regex engine (one backslash would be
          // eaten by Spark's literal parser, inverting the escape)
          sb ++= "\\\\" += p.charAt(i + 1); i += 1
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
