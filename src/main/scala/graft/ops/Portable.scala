package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit}

/** Cross-engine FINAL rounding for ratio-valued columns (r11).
  *
  * `round(x, k)` on a double is NOT cross-engine deterministic when x
  * is an exact ratio: Spark rounds the double's SHORTEST DECIMAL REPR
  * (BigDecimal HALF_UP) while DuckDB rounds the BINARY value, and a
  * quotient like odd/1024 terminates at decimal digit 10 in a 5 — a
  * true tie the two conventions resolve differently (Spark up, DuckDB
  * down/even). The r11 fixture-skew probe MEASURED the class on a real
  * row (x108, 0.253438 vs 0.253437); any integer/integer or
  * exact-decimal-sum/integer quotient can hit it (P rises with rows —
  * the x127 "invisible at the gate, near-certain at 100 TB" argument).
  *
  * `floor(x·10^k + 0.5)/10^k` is pure IEEE arithmetic on the identical
  * quotient double, so both engines agree bit-for-bit, and it resolves
  * genuine halves as HALF-UP consistently. Domain: |x|·10^k must stay
  * under 2^53 (every ratio/score column here is ≪ 1e5). Oracles must
  * spell the SAME floor form.
  *
  * NOT needed for: roundings of values already exact at ≤k decimals
  * (identity on both engines — e.g. a DECIMAL(28,9) sum cast to double
  * then "rounded" @9), and quotients through irrational ops (sqrt,
  * un-pinned ln) whose reprs cannot terminate at digit k+1.
  */
private[ops] object Portable {
  /** floor-form @9 — final form for ratio columns. */
  def r9(c: Column): Column = floor(c * lit(1.0e9) + lit(0.5)) / lit(1.0e9)

  /** floor-form @6 — final form for mean/score columns. */
  def r6(c: Column): Column = floor(c * lit(1.0e6) + lit(0.5)) / lit(1.0e6)
}
