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

  /** Length-preserving literal mask: every character INSIDE a
    * single-quoted literal (including `''`/backslash escape pairs)
    * becomes \u0001, the delimiting quotes stay — so regex match offsets
    * on the masked text are valid offsets into the raw text. */
  private def maskSameLength(sql: String): String = {
    val arr = sql.toCharArray
    var i = 0
    var inStr = false
    while (i < arr.length) {
      val c = arr(i)
      if (!inStr) { if (c == '\'') inStr = true }
      else {
        if (c == '\\' && i + 1 < arr.length) { arr(i) = '\u0001'; arr(i + 1) = '\u0001'; i += 1 }
        else if (c == '\'' && i + 1 < arr.length && arr(i + 1) == '\'') {
          arr(i) = '\u0001'; arr(i + 1) = '\u0001'; i += 1
        }
        else if (c == '\'') inStr = false
        else arr(i) = '\u0001'
      }
      i += 1
    }
    new String(arr)
  }

  /** `x SIMILAR TO 'pat'` → `x RLIKE '^pat$'`. Match positions are found
    * on a same-length literal mask so the keyword is only recognized
    * OUTSIDE string literals — a document containing " SIMILAR TO 'x' "
    * as DATA passes through untouched (this engine targets text corpora
    * where SQL fragments inside documents are plausible). The pattern
    * body itself is then read from the raw text at the match offsets. */
  def rewriteSimilarTo(sql: String): String = {
    val ms = SimilarTo.findAllMatchIn(maskSameLength(sql)).toList
    if (ms.isEmpty) sql
    else {
      val sb = new StringBuilder
      var last = 0
      ms.foreach { m =>
        sb ++= sql.substring(last, m.start)
        val not = if (m.group(1) != null) "NOT " else ""
        val pat = translatePattern(sql.substring(m.start(2), m.end(2)))
        sb ++= s" ${not}RLIKE '^$pat$$'"
        last = m.end
      }
      sb ++= sql.substring(last)
      sb.toString
    }
  }

  private val GenSeries: Regex = """(?i)\bgenerate_series\s*\(""".r

  /** DataFusion's FROM-clause TVF `generate_series(start, stop[, step])`
    * (reference: `Cargo.lock:845`, `datafusion-functions-table`) has no
    * Spark spelling — rewritten to a sequence-explode subquery producing
    * the same single `value` column:
    * `FROM generate_series(a, b[, s])` →
    * `FROM (SELECT explode(sequence(a, b[, s])) AS value)`.
    * The keyword is located on the literal mask and the argument parens
    * are balanced on the mask too, so data inside string arguments can
    * never derail the scan. */
  def rewriteGenerateSeries(sql: String): String = {
    val masked = maskSameLength(sql)
    val ms = GenSeries.findAllMatchIn(masked).toList
    if (ms.isEmpty) sql
    else {
      val sb = new StringBuilder
      var last = 0
      ms.foreach { m =>
        if (m.start >= last) {
          var depth = 1
          var i = m.end // first char after '('
          while (i < masked.length && depth > 0) {
            masked.charAt(i) match {
              case '(' => depth += 1
              case ')' => depth -= 1
              case _ =>
            }
            i += 1
          }
          if (depth == 0) {
            val args = sql.substring(m.end, i - 1)
            sb ++= sql.substring(last, m.start)
            sb ++= s"(SELECT explode(sequence($args)) AS value)"
            last = i
          }
        }
      }
      sb ++= sql.substring(last)
      sb.toString
    }
  }

  private val AggFirstLast: Regex =
    """(?i)\b(FIRST_VALUE|LAST_VALUE)\s*\(([^()]+?)\s+ORDER\s+BY\s+([^()]+?)(\s+ASC|\s+DESC)?\s*\)""".r

  private val AggNthValue: Regex =
    """(?i)\bNTH_VALUE\s*\(([^()]+?),\s*(\d+)\s+ORDER\s+BY\s+([^()]+?)(\s+ASC|\s+DESC)?\s*\)""".r

  /** DataFusion accepts `first_value(x ORDER BY y)` / `last_value(...)` /
    * `nth_value(x, n ORDER BY y)` as AGGREGATES (`Cargo.lock:809`); Spark
    * only has the window forms. With a deterministic (total) ORDER BY key
    * first/last are exactly `min_by`/`max_by`, and nth is an index into
    * the key-sorted collected list (negative index from the end for
    * DESC; `try_element_at` yields NULL past the group size, matching
    * the aggregate's semantics under ANSI mode). Window forms
    * (`... OVER (...)`) have no ORDER BY inside the call parens and are
    * left untouched. Keywords located on the literal mask. */
  def rewriteAggFirstLast(sql: String): String = {
    val pass1 = {
      val masked = maskSameLength(sql)
      val ms = AggFirstLast.findAllMatchIn(masked).toList
      if (ms.isEmpty) sql
      else {
        val sb = new StringBuilder
        var last = 0
        ms.foreach { m =>
          val fn = m.group(1).toUpperCase(java.util.Locale.ROOT)
          val expr = sql.substring(m.start(2), m.end(2))
          val key = sql.substring(m.start(3), m.end(3))
          val desc = m.group(4) != null && m.group(4).trim.equalsIgnoreCase("DESC")
          val target = (fn, desc) match {
            case ("FIRST_VALUE", false) | ("LAST_VALUE", true) => "min_by"
            case _ => "max_by"
          }
          sb ++= sql.substring(last, m.start)
          sb ++= s"$target($expr, $key)"
          last = m.end
        }
        sb ++= sql.substring(last)
        sb.toString
      }
    }
    val masked = maskSameLength(pass1)
    val ms = AggNthValue.findAllMatchIn(masked).toList
    if (ms.isEmpty) pass1
    else {
      val sb = new StringBuilder
      var last = 0
      ms.foreach { m =>
        val expr = pass1.substring(m.start(1), m.end(1))
        val n = pass1.substring(m.start(2), m.end(2))
        val key = pass1.substring(m.start(3), m.end(3))
        val desc = m.group(4) != null && m.group(4).trim.equalsIgnoreCase("DESC")
        val idx = if (desc) s"-$n" else n
        sb ++= pass1.substring(last, m.start)
        sb ++= s"try_element_at(array_sort(collect_list(named_struct('k', $key, 'v', $expr))), $idx).v"
        last = m.end
      }
      sb ++= pass1.substring(last)
      sb.toString
    }
  }

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
        // SIMILAR TO treats ^ and $ as literal characters; unescaped they
        // would anchor (or break) the emitted Java regex
        case '^' if !inClass => sb ++= "\\\\^"
        case '$' if !inClass => sb ++= "\\\\$"
        case other => sb += other
      }
      i += 1
    }
    sb.toString
  }
}
