package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Backward as-of join: for every left row, the LATEST right row of the
 * same key with right.ts <= left.ts (event attribution, price lookup,
 * feature point-in-time joins). Spark has no ASOF join operator and the
 * naive formulation is a non-equi range join (O(n·m) per key) or a
 * per-left-row aggregation — both scale-killers.
 *
 * Scale shape: union-tag both sides, then ONE window over (key, ts)
 * carries the most recent right payload forward (`last(..., ignoreNulls)`
 * over an unbounded-preceding ROWS frame). Cost = one hash exchange of
 * the union + one per-key sort — the same price as a plain shuffle join,
 * independent of how many right rows precede each left row. At equal
 * timestamps the right row sorts FIRST (side 0 < 1), so a same-instant
 * right row is visible to the left row, matching `l.ts >= r.ts`.
 */
object AsOf {

  /** Left-outer backward as-of join. Returns every `left` row with an
    * added nullable struct column `asof` holding the matched right row
    * (null when no right row of that key is at-or-before the left ts).
    * `key` and `ts` name columns present in BOTH frames. If `right` can
    * hold duplicate (key, ts) pairs, pass `rightTiebreak` (a right
    * column name) to make the match deterministic — the LARGEST
    * tiebreak value among the tied rows wins.
    *
    * `tolerance` (the pandas `merge_asof` contract): a match only
    * stands when `left.ts − right.ts <= tolerance` — in MICROSECONDS
    * for timestamp `ts` columns, in the column's own unit for numeric
    * ones. A pure post-filter on the carried row: the as-of match
    * MINIMIZES the lag, so if the nearest right row is out of
    * tolerance no other could be in — semantics stay exact and the
    * plan shape (one exchange, one window) is unchanged. */
  def joinAsOf(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightTiebreak: Option[String] = None,
      tolerance: Option[Long] = None): DataFrame = {
    val leftStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val rightStruct = struct(right.columns.map(col).toIndexedSeq: _*)
    val rightType = org.apache.spark.sql.types.StructType(right.schema.fields)
    val leftType = org.apache.spark.sql.types.StructType(left.schema.fields)
    val tb = rightTiebreak.map(col).getOrElse(lit(null).cast("long"))
    val l2 = left.select(col(key).as("__k"), col(ts).as("__t"),
      lit(1).as("__side"), lit(null).cast("long").as("__tb"),
      lit(null).cast(rightType).as("__r"), leftStruct.as("__l"))
    val r2 = right.select(col(key).as("__k"), col(ts).as("__t"),
      lit(0).as("__side"), tb.cast("long").as("__tb"),
      rightStruct.as("__r"), lit(null).cast(leftType).as("__l"))
    // one exchange on __k; ROWS frame so the carried payload is the
    // nearest preceding right row, ties resolved by (__side, __tb)
    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l2.unionByName(r2)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val asofOut = tolerance match {
      case None => col("__asof")
      case Some(t) =>
        require(t >= 0, s"tolerance must be >= 0, got $t")
        // fractional ts must diff in DOUBLE (ADVICE r07: cast("long")
        // truncates toward zero, so a true lag in (t, t+1) slipped past
        // the inclusive <= t check); integral ts keeps exact long math;
        // DECIMAL ts diffs in native decimal arithmetic (ADVICE r08: a
        // double round-trip loses precision past 2^53 ulps — e.g.
        // decimal(38,18) — and can flip the inclusive <= t comparison
        // exactly at the tolerance boundary)
        import org.apache.spark.sql.types._
        val lag = left.schema(ts).dataType match {
          case TimestampType =>
            unix_micros(col("__t")) - unix_micros(col("__asof").getField(ts))
          case FloatType | DoubleType =>
            col("__t").cast("double") - col("__asof").getField(ts).cast("double")
          case _: DecimalType =>
            col("__t") - col("__asof").getField(ts)
          case _ =>
            col("__t").cast("long") - col("__asof").getField(ts).cast("long")
        }
        when(col("__asof").isNotNull && lag <= t, col("__asof"))
    }
    joined.select(col("__l.*"), asofOut.as("asof"))
  }
}
