package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.tables.Tables

/**
 * One verifiable query: a Spark implementation plus (when the semantics are
 * ANSI-SQL-expressible) a DuckDB oracle the driver cross-checks at sf0.01.
 *
 * Determinism contract (critical for the hash-compare oracle):
 *  - every query ORDER BYs a deterministic key set;
 *  - double aggregations route through exact DECIMAL accumulation and cast
 *    back to DOUBLE at the end (`CAST(SUM(CAST(x AS DECIMAL(18,2))) AS
 *    DOUBLE)`), so the result is independent of partitioning / accumulation
 *    order in BOTH engines;
 *  - transcendental functions (ln, exp, sin, pow, stddev, corr, cosine) are
 *    ROUNDed to soak up ≤1-ulp libm differences between the JVM and DuckDB;
 *  - column types are explicitly CAST where the engines' inferred types
 *    diverge (e.g. Spark FLOOR→BIGINT vs DuckDB FLOOR→DOUBLE, Spark
 *    LENGTH→INT vs DuckDB LENGTH→BIGINT).
 */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  /** Same ANSI text runs on both Spark and DuckDB. */
  def sql(name: String, text: String): Q =
    Q(name, (s, dir) => { Tables.registerAll(s, dir); s.sql(text) }, Some(text))

  /** Dialects diverge: Spark text vs DuckDB oracle text. */
  def sql2(name: String, sparkText: String, duckText: String): Q =
    Q(name, (s, dir) => { Tables.registerAll(s, dir); s.sql(sparkText) },
      Some(duckText))

  /** DataFrame-API implementation with a DuckDB oracle. */
  def df(name: String, oracle: String)(
      f: (SparkSession, String) => DataFrame): Q =
    Q(name, (s, dir) => { Tables.registerAll(s, dir); f(s, dir) }, Some(oracle))

  /** Not SQL-expressible: driver records a rows-only check. */
  def dfOnly(name: String)(f: (SparkSession, String) => DataFrame): Q =
    Q(name, (s, dir) => { Tables.registerAll(s, dir); f(s, dir) }, None)
}
