package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join: for every left row, the nearest right row of the same key
 * — the LATEST with right.ts <= left.ts (backward), the EARLIEST with
 * right.ts >= left.ts (forward), or whichever of those is closer
 * (nearest). Event attribution, price lookup, feature point-in-time
 * joins. Spark has no ASOF join operator and the naive formulation is a
 * non-equi range join (O(n·m) per key) or a per-left-row aggregation —
 * both scale-killers.
 *
 * Scale shape: union-tag both sides, then ONE window over (key, ts)
 * carries the most recent right payload forward (`last(..., ignoreNulls)`
 * over an unbounded-preceding ROWS frame) and/or the next right payload
 * backward (mirrored `first` over a following frame). Cost = one hash
 * exchange of the union + one per-key sort per direction (`nearest`'s
 * second sort reuses the same exchange) — the same price as a plain
 * shuffle join, independent of how many right rows surround each left
 * row. At equal timestamps the right row sorts on the visible side of
 * the frame, so a same-instant right row matches in every direction.
 */
object AsOf {

  /** Left-outer as-of join. Returns every `left` row with an added
    * nullable struct column `asof` holding the matched right row (null
    * when no right row qualifies). `key` and `ts` name columns present
    * in BOTH frames. If `right` can hold duplicate (key, ts) pairs,
    * pass `rightTiebreak` (a right column name) to make the match
    * deterministic — the LARGEST tiebreak value among the tied rows
    * wins, in every direction.
    *
    * `direction` (the pandas `merge_asof` contract, all three values):
    * `"backward"` (default) takes the latest right at-or-before the
    * left ts; `"forward"` the earliest right at-or-after it;
    * `"nearest"` whichever of those two candidates has the smaller
    * absolute lag, an EXACT tie preferring the backward match (pinned
    * contract — deterministic, and the same choice pandas makes).
    *
    * `tolerance` (pandas contract): a match only stands when its lag
    * (`left.ts − right.ts` backward, mirrored forward) is
    * `<= tolerance` — in MICROSECONDS for timestamp `ts` columns, in
    * the column's own unit for numeric ones. A pure post-filter on the
    * carried candidates: each direction's match MINIMIZES its lag, so
    * if the nearest candidate is out of tolerance no other could be in
    * — semantics stay exact and the plan shape is unchanged. Under
    * `nearest`, tolerance applies to each candidate BEFORE the pick
    * (an out-of-tolerance nearer side falls back to the other side if
    * that one qualifies — pandas semantics). */
  def joinAsOf(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightTiebreak: Option[String] = None,
      tolerance: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got $direction")
    tolerance.foreach(t => require(t >= 0, s"tolerance must be >= 0, got $t"))
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
    // backward: ROWS frame to the current row carries the nearest
    // PRECEDING right (a same-ts right sorts first: side 0 < 1; the
    // largest tiebreak sorts last so last() picks it)
    val wb = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward: the mirrored frame carries the nearest FOLLOWING right
    // (side desc puts a same-ts right AFTER the left row, inside the
    // following frame; tiebreak desc makes first() pick the largest)
    val wf = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__side").desc, col("__tb").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val union = l2.unionByName(r2)
    val carried = direction match {
      case "backward" => union
        .withColumn("__b", last(col("__r"), ignoreNulls = true).over(wb))
      case "forward" => union
        .withColumn("__f", first(col("__r"), ignoreNulls = true).over(wf))
      case _ => union
        .withColumn("__b", last(col("__r"), ignoreNulls = true).over(wb))
        .withColumn("__f", first(col("__r"), ignoreNulls = true).over(wf))
    }
    val joined = carried.filter(col("__side") === 1)
    // fractional ts must diff in DOUBLE (ADVICE r07: cast("long")
    // truncates toward zero, so a true lag in (t, t+1) slipped past
    // the inclusive <= t check); integral ts keeps exact long math;
    // DECIMAL ts diffs in native decimal arithmetic (ADVICE r08: a
    // double round-trip loses precision past 2^53 ulps — e.g.
    // decimal(38,18) — and can flip the inclusive <= t comparison
    // exactly at the tolerance boundary)
    import org.apache.spark.sql.types._
    def lagOf(cand: org.apache.spark.sql.Column, forward: Boolean) = {
      val (a, b) = if (forward) (cand.getField(ts), col("__t"))
        else (col("__t"), cand.getField(ts))
      left.schema(ts).dataType match {
        case TimestampType => unix_micros(a) - unix_micros(b)
        case FloatType | DoubleType => a.cast("double") - b.cast("double")
        case _: DecimalType => a - b
        case _ => a.cast("long") - b.cast("long")
      }
    }
    def tolerated(cand: org.apache.spark.sql.Column, forward: Boolean) =
      tolerance match {
        case None => cand
        case Some(t) => when(cand.isNotNull && lagOf(cand, forward) <= t, cand)
      }
    val asofOut = direction match {
      case "backward" => tolerated(col("__b"), forward = false)
      case "forward" => tolerated(col("__f"), forward = true)
      case _ =>
        val b = tolerated(col("__b"), forward = false)
        val f = tolerated(col("__f"), forward = true)
        // both candidates in tolerance → the smaller lag wins; an
        // exact tie (and a null forward) resolves backward
        when(b.isNull, f)
          .when(f.isNotNull && lagOf(col("__f"), forward = true)
            < lagOf(col("__b"), forward = false), f)
          .otherwise(b)
    }
    joined.select(col("__l.*"), asofOut.as("asof"))
  }
}
