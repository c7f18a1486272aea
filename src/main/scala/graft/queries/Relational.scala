package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.tables.Tables

/**
 * Core relational operator coverage (SURVEY.md §2.2–§2.7): scan → filter →
 * project, all join types, aggregation (incl. GROUPING SETS / CUBE /
 * ROLLUP / FILTER clause / DISTINCT aggregates), window functions, sort /
 * limit / offset, set operations, and subqueries (scalar / IN / EXISTS).
 *
 * Implementation style: DataFrame API where the operator composes cleanly
 * (Catalyst sees the same logical plan either way); `spark.sql` where the
 * surface is SQL-specific (GROUPING SETS, FILTER clause, VALUES, named
 * windows) — this is also exactly the path `graft.engine.SqlEngine` exposes,
 * mirroring the reference's single `execute_sql` entry point
 * (reference: `src/core.rs:74-76`).
 *
 * Scale notes are attached per query; the common ones:
 *  - dimension joins (region/nation/customer at these SFs) broadcast — at
 *    100 TB, Catalyst/AQE picks broadcast vs shuffled-hash from runtime
 *    stats, which is the behavior we want, so no hard-coded hints except
 *    where the small side is bounded by construction;
 *  - aggregations are partial→final (map-side combine) automatically; the
 *    DECIMAL accumulation keeps them order-independent and therefore
 *    correct under any partitioning.
 */
object Relational {

  /** Exact, order-independent SUM of a 2-decimal double column, as DOUBLE. */
  private def dsum(x: String) = s"CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE)"

  // ---------------------------------------------------------------- q01
  // Flagship (TPC-H Q1 shape): scan → filter (pushed to parquet) →
  // hash-aggregate (partial/final) → sort. The filter reaches the scan as
  // PushedFilters and only 7 of 11 columns are read (ReadSchema pruning).
  val q01 = Q.df(
    "q01_agg_pushdown",
    s"""SELECT l_returnflag, l_linestatus,
       |  ${dsum("l_quantity")} AS sum_qty,
       |  ${dsum("l_extendedprice")} AS sum_base_price,
       |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS sum_disc_price,
       |  ${dsum("l_quantity")} / COUNT(l_quantity) AS avg_qty,
       |  ${dsum("l_extendedprice")} / COUNT(l_extendedprice) AS avg_price,
       |  CAST(COUNT(*) AS BIGINT) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (spark, dir) =>
    val li = Tables.load(spark, dir, "lineitem")
    val dec = DecimalType(18, 2)
    li.filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(dec)).cast("double").as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(DecimalType(25, 6)))
          .cast("double").as("sum_disc_price"),
        (sum(col("l_quantity").cast(dec)).cast("double") / count(col("l_quantity"))).as("avg_qty"),
        (sum(col("l_extendedprice").cast(dec)).cast("double") / count(col("l_extendedprice"))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  def defs: Seq[Q] = Seq(q01)
}
