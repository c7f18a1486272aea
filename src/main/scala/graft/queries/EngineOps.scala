package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.SqlEngine
import graft.tables.Tables

/**
 * Oracle-verified entries that run THROUGH the `SqlEngine` façade — the
 * catalog/IO surface (SURVEY §2.1) that r01 left unit-test-only: CTAS,
 * INSERT INTO, CSV and NDJSON external tables via translated DDL, and
 * the view lifecycle. Each query routes DDL + DML through
 * `executeStatement` (exactly what `execute_sql` does per statement,
 * reference `src/core.rs:102-128`) and returns a final SELECT whose
 * rows the DuckDB oracle checks against the parquet fixtures.
 *
 * Side-effects are idempotent: tables are dropped up front, file dumps
 * are overwritten, so Verify and the double-run Bench see stable
 * results.
 */
object EngineOps {

  private def engine(spark: SparkSession, dir: String): SqlEngine = {
    Tables.registerAll(spark, dir)
    new SqlEngine(spark)
  }

  /** Round-trip dump of `nation` under a per-format temp dir. */
  private def dump(spark: SparkSession, dir: String, fmt: String): String = {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_engineops_${fmt}_nation"
    val w = Tables.load(spark, dir, "nation")
      .select("n_nationkey", "n_name", "n_regionkey")
      .coalesce(1).write.mode("overwrite")
    fmt match {
      case "csv" => w.option("header", "true").csv(out)
      case "json" => w.json(out)
    }
    out
  }

  // ---------------------------------------------------------------- q54
  // CTAS (MemTable parity) + INSERT INTO append (§2.1 rows 7-8).
  val q54 = Q.df(
    "q54_ctas_insert",
    """SELECT CAST(k AS BIGINT) AS k, n_name, CAST(rk AS BIGINT) AS rk FROM (
      |  SELECT n_nationkey AS k, n_name, n_regionkey AS rk FROM nation WHERE n_regionkey < 3
      |  UNION ALL
      |  SELECT n_nationkey + 100 AS k, n_name, n_regionkey AS rk FROM nation WHERE n_regionkey = 4
      |) ORDER BY k""".stripMargin) { (spark, dir) =>
    val eng = engine(spark, dir)
    eng.executeStatement("DROP TABLE IF EXISTS ctas_nation")
    // a previous JVM may have left the managed-table directory behind
    // (DROP only knows tables in the current catalog); Spark refuses to
    // create a managed table over a non-empty location
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.conf.warehousePath, "ctas_nation")
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    eng.executeStatement(
      "CREATE TABLE ctas_nation AS SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_regionkey < 3")
    eng.executeStatement(
      "INSERT INTO ctas_nation SELECT n_nationkey + 100, n_name, n_regionkey FROM nation WHERE n_regionkey = 4")
    eng.executeStatement(
      """SELECT CAST(n_nationkey AS BIGINT) AS k, n_name, CAST(n_regionkey AS BIGINT) AS rk
        |FROM ctas_nation ORDER BY k""".stripMargin)
  }

  // ---------------------------------------------------------------- q55
  // CSV scan via translated CREATE EXTERNAL TABLE ... STORED AS CSV WITH
  // HEADER ROW (§2.1 row 2): parquet → CSV dump → DDL-registered scan.
  val q55 = Q.df(
    "q55_csv_scan",
    """SELECT CAST(n_nationkey AS INT) AS n_nationkey, n_name,
      |  CAST(n_regionkey AS INT) AS n_regionkey
      |FROM nation ORDER BY n_nationkey""".stripMargin) { (spark, dir) =>
    val eng = engine(spark, dir)
    val path = dump(spark, dir, "csv")
    eng.executeStatement("DROP TABLE IF EXISTS csv_nation")
    eng.executeStatement(
      s"""CREATE EXTERNAL TABLE csv_nation (n_nationkey INT, n_name STRING, n_regionkey INT)
         |STORED AS CSV WITH HEADER ROW LOCATION '$path'""".stripMargin)
    eng.executeStatement(
      "SELECT n_nationkey, n_name, n_regionkey FROM csv_nation ORDER BY n_nationkey")
  }

  // ---------------------------------------------------------------- q56
  // NDJSON scan via translated DDL (§2.1 row 3).
  val q56 = Q.df(
    "q56_ndjson_scan",
    """SELECT CAST(n_nationkey AS INT) AS n_nationkey, n_name,
      |  CAST(n_regionkey AS INT) AS n_regionkey
      |FROM nation ORDER BY n_nationkey""".stripMargin) { (spark, dir) =>
    val eng = engine(spark, dir)
    val path = dump(spark, dir, "json")
    eng.executeStatement("DROP TABLE IF EXISTS json_nation")
    eng.executeStatement(
      s"""CREATE EXTERNAL TABLE json_nation (n_nationkey INT, n_name STRING, n_regionkey INT)
         |STORED AS JSON LOCATION '$path'""".stripMargin)
    eng.executeStatement(
      "SELECT n_nationkey, n_name, n_regionkey FROM json_nation ORDER BY n_nationkey")
  }

  // ---------------------------------------------------------------- q57
  // View lifecycle (§2.1 row 9): create-or-replace, query through it.
  val q57 = Q.df(
    "q57_view",
    """SELECT r_name, CAST(COUNT(*) AS BIGINT) AS nations,
      |  CAST(MIN(n_nationkey) AS BIGINT) AS first_key
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin) { (spark, dir) =>
    val eng = engine(spark, dir)
    eng.executeStatement(
      """CREATE OR REPLACE TEMP VIEW v_nation_region AS
        |SELECT n_nationkey, n_name, r_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey""".stripMargin)
    eng.executeStatement(
      """SELECT r_name, CAST(COUNT(*) AS BIGINT) AS nations,
        |  CAST(MIN(n_nationkey) AS BIGINT) AS first_key
        |FROM v_nation_region GROUP BY r_name ORDER BY r_name""".stripMargin)
  }

  def defs: Seq[Q] = Seq(q54, q55, q56, q57)
}
