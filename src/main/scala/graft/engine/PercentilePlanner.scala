package graft.engine

import scala.util.Try

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.ops.Percentiles

/**
 * Scale-safe planning for SQL `MEDIAN` / `PERCENTILE_CONT`.
 *
 * Spark's `Median`/`Percentile` aggregates buffer every distinct value
 * per group — the one remaining per-group-unbounded plan reachable from
 * the SQL surface (VERDICT r03 #1 fixed it on the DataFrame path via
 * `graft.ops.Percentiles`; this extends the fix to SQL). When a
 * statement matches the supported shape
 *
 *   SELECT <bare group cols | MEDIAN(col) AS a |
 *           PERCENTILE_CONT(p) WITHIN GROUP (ORDER BY col [ASC|DESC]) AS b>…
 *   FROM <table> [WHERE …] GROUP BY <bare cols>
 *   [ORDER BY <output cols> [LIMIT n]]
 *
 * it is planned through the sort-based rank selection instead. Results
 * are BIT-IDENTICAL to both Spark's buffered PERCENTILE_CONT and
 * DuckDB's (`Percentiles` interpolates `lower·(1−frac) + upper·frac`,
 * the association all three evaluate — q66's oracle row pins it on
 * unrounded doubles), so the fast path is on by default. ANY deviation
 * (other aggregates, HAVING, DISTINCT, windows, subqueries, expressions
 * in the group list, FILTER clauses, unparseable tails) falls back to
 * Spark's buffered aggregates — never an error. DESC ordering ranks
 * natively in descending order (`Spec.desc`) so every p stays bitwise
 * (the 1−p complement drifts by ulps for non-dyadic p).
 */
object PercentilePlanner {

  private val MedianRe =
    """(?is)^MEDIAN\s*\(\s*([A-Za-z_]\w*)\s*\)\s+AS\s+([A-Za-z_]\w*)$""".r
  private val PctContRe =
    ("""(?is)^PERCENTILE_CONT\s*\(\s*([0-9]*\.?[0-9]+)\s*\)\s+WITHIN\s+GROUP\s*""" +
      """\(\s*ORDER\s+BY\s+([A-Za-z_]\w*)(\s+ASC|\s+DESC)?\s*\)\s+AS\s+([A-Za-z_]\w*)$""").r
  private val BareCol = """(?s)^\s*([A-Za-z_]\w*)\s*$""".r
  private val TableRe = """(?s)^\s*([A-Za-z_][\w.]*)\s*$""".r
  private val TailRe =
    ("""(?is)^\s*(?:ORDER\s+BY\s+([A-Za-z_]\w*(?:\s+(?:ASC|DESC))?""" +
      """(?:\s*,\s*[A-Za-z_]\w*(?:\s+(?:ASC|DESC))?)*))?\s*(?:LIMIT\s+(\d+))?\s*;?\s*$""").r

  private def splitTop(masked: String, from: Int, until: Int): List[(Int, Int)] =
    Dialect.splitTopLevel(masked, from, until)

  private def findTop(masked: String, re: scala.util.matching.Regex,
      from: Int = 0): Option[scala.util.matching.Regex.Match] =
    re.findAllMatchIn(masked).find { m =>
      if (m.start < from) false
      else {
        val prefix = masked.substring(from, m.start)
        prefix.count(_ == '(') == prefix.count(_ == ')')
      }
    }

  /** The scale plan for `stmt`, or None when the shape doesn't match
    * (caller falls back to the normal spark.sql path). */
  def tryPlan(spark: SparkSession, stmt: String): Option[DataFrame] = {
    val masked = Dialect.maskSameLength(stmt)
    val up = masked.toUpperCase(java.util.Locale.ROOT)
    // cheap gate + hard disqualifiers for the narrow supported shape
    if (!up.contains("MEDIAN") && !up.contains("PERCENTILE_CONT")) return None
    val disqualifiers =
      Seq("HAVING", "DISTINCT", "OVER", "WITH", "UNION", "INTERSECT", "EXCEPT",
        "JOIN", "FILTER", "LATERAL")
    if (disqualifiers.exists(k => ("(?i)\\b" + k + "\\b").r.findFirstIn(masked).isDefined))
      return None
    if (!up.trim.startsWith("SELECT")) return None
    val firstSel = up.indexOf("SELECT")
    if (up.indexOf("SELECT", firstSel + 6) >= 0) return None // subqueries bail
    val selStart = firstSel + "SELECT".length

    val fromM = findTop(masked, """(?i)\bFROM\b""".r).getOrElse(return None)
    // no GROUP BY = the GLOBAL percentile — the single whole-table
    // aggregation buffer, the worst instance of the shape this planner
    // removes (r04 review); Percentiles.exact handles groupCols = Nil
    val groupM = findTop(masked, """(?i)\bGROUP\s+BY\b""".r, fromM.end)
    val tailM = findTop(masked, """(?i)\bORDER\s+BY\b|\bLIMIT\b""".r,
      groupM.map(_.end).getOrElse(fromM.end))
    val tailStart = tailM.map(_.start).getOrElse(stmt.length)
    val fromEnd = groupM.map(_.start).getOrElse(tailStart)

    // FROM <single table> [WHERE …]
    val fromSeg = stmt.substring(fromM.end, fromEnd)
    val fromSegMasked = masked.substring(fromM.end, fromEnd)
    val whereM = findTop(fromSegMasked, """(?i)\bWHERE\b""".r)
    val (tableTxt, whereTxt) = whereM match {
      case Some(w) => (fromSeg.substring(0, w.start), Some(fromSeg.substring(w.end)))
      case None => (fromSeg, None)
    }
    val table = tableTxt match { case TableRe(t) => t; case _ => return None }

    // GROUP BY: bare columns
    val groupCols = groupM.toList.flatMap { gm =>
      splitTop(masked, gm.end, tailStart).map { case (s, e) =>
        stmt.substring(s, e) match { case BareCol(c) => c; case _ => return None }
      }
    }

    // select list: bare group columns or supported percentile aggregates
    var specs = List.empty[Percentiles.Spec]
    val outCols = splitTop(masked, selStart, fromM.start).map { case (s, e) =>
      stmt.substring(s, e).trim match {
        case BareCol(c) =>
          if (!groupCols.exists(_.equalsIgnoreCase(c))) return None
          c
        case MedianRe(c, alias) =>
          specs :+= Percentiles.Spec(c, 0.5, alias); alias
        case PctContRe(p, c, dir, alias) =>
          val pv = p.toDouble
          if (pv < 0.0 || pv > 1.0) return None
          // native desc ranks, NOT 1−p: the complement drifts by ulps
          // for non-dyadic p (r04 review)
          val isDesc = dir != null && dir.trim.equalsIgnoreCase("DESC")
          specs :+= Percentiles.Spec(c, pv, alias, desc = isDesc); alias
        case _ => return None
      }
    }
    if (specs.isEmpty) return None

    // tail: ORDER BY of output columns [LIMIT n] — anything else bails
    val tail = stmt.substring(tailStart)
    val (orderTxt, limitTxt) = tail match {
      case TailRe(o, l) => (Option(o), Option(l))
      case _ => return None
    }
    if (!orderTxt.forall(_.split(",").map(_.trim.split("\\s+")(0))
        .forall(c => outCols.exists(_.equalsIgnoreCase(c))))) return None

    Try {
      val base = spark.table(table)
      val filtered = whereTxt.map(base.where).getOrElse(base)
      // numeric value columns only: Percentiles ranks as DOUBLE, which
      // is also what the buffered PERCENTILE_CONT/MEDIAN return for
      // numerics — other input types keep the parity path
      val schema = filtered.schema
      if (!specs.forall(sp => schema.fields.exists(f =>
        f.name.equalsIgnoreCase(sp.valueCol) && f.dataType.isInstanceOf[
          org.apache.spark.sql.types.NumericType]))) return None
      var df = Percentiles.exact(filtered, groupCols, specs)
        .select(outCols.map(col): _*)
      orderTxt.foreach { o =>
        val sorts = o.split(",").map(_.trim.split("\\s+")).map {
          case Array(c) => col(c).asc
          case Array(c, d) if d.equalsIgnoreCase("DESC") => col(c).desc
          case Array(c, _) => col(c).asc
        }
        df = df.orderBy(sorts.toIndexedSeq: _*)
      }
      limitTxt.foreach(n => df = df.limit(n.toInt))
      df
    }.toOption
  }
}
