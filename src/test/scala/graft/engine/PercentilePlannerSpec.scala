package graft.engine

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions
import graft.tables.Tables

/**
 * SQL MEDIAN/PERCENTILE_CONT must plan the sort-based rank selection
 * (no per-group value buffer) when the statement shape allows, with
 * bit-identical results to Spark's buffered aggregates, and fall back
 * cleanly for every unsupported shape.
 */
class PercentilePlannerSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  private lazy val engine = new SqlEngine(spark)

  private def withLineitem[A](f: => A): A = {
    Tables.load(spark, TestSessions.sf001, "lineitem")
      .createOrReplaceTempView("lineitem")
    try f finally spark.catalog.dropTempView("lineitem")
  }

  private val sql =
    """SELECT l_returnflag,
      |  MEDIAN(l_quantity) AS med_qty,
      |  PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY l_extendedprice) AS q1_price
      |FROM lineitem
      |WHERE l_quantity > 5
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  test("supported shape takes the scale plan and matches the buffered result") {
    withLineitem {
      val fast = PercentilePlanner.tryPlan(spark, sql)
      assert(fast.isDefined, "fast path did not engage")
      val plan = fast.get.queryExecution.executedPlan.toString
      assert(!plan.contains("percentile") && !plan.contains("Median"),
        s"buffered aggregate leaked into the scale plan:\n$plan")
      // bit-identical: Percentiles interpolates lower·(1−frac)+upper·frac,
      // the association Spark's buffered PERCENTILE_CONT (and DuckDB)
      // evaluate
      val buffered = spark.sql(sql).collect()
      val ours = fast.get.collect()
      assert(ours.sameElements(buffered),
        s"fast=${ours.mkString} buffered=${buffered.mkString}")
    }
  }

  test("the engine routes matching SQL through the scale plan end-to-end") {
    withLineitem {
      val df = engine.executeStatement(sql)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("percentile") && !plan.contains("Median"), plan)
      assert(df.count() > 0)
    }
  }

  test("DESC ordering ranks descending natively") {
    withLineitem {
      val desc =
        """SELECT l_returnflag,
          |  PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY l_extendedprice DESC) AS p
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
      val fast = PercentilePlanner.tryPlan(spark, desc)
      assert(fast.isDefined)
      // 1−p mirroring is bitwise too: the straddling values swap roles
      // and the single addition is commutative
      assert(fast.get.collect().sameElements(spark.sql(desc).collect()))
    }
  }

  test("non-dyadic DESC is bitwise (native desc ranks, not the 1-p shortcut)") {
    withLineitem {
      // p=0.1: the 1-p complement evaluates frac at 0.9*(n-1), which
      // rounds differently than the buffered 0.1*(n-1)-from-the-top —
      // native desc ranks share the buffered arithmetic exactly
      val q =
        """SELECT l_returnflag,
          |  PERCENTILE_CONT(0.1) WITHIN GROUP (ORDER BY l_extendedprice DESC) AS p
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
      val fast = PercentilePlanner.tryPlan(spark, q)
      assert(fast.isDefined)
      assert(fast.get.collect().sameElements(spark.sql(q).collect()))
    }
  }

  test("ungrouped global percentiles take the fast path") {
    withLineitem {
      val q = "SELECT MEDIAN(l_quantity) AS m, " +
        "PERCENTILE_CONT(0.9) WITHIN GROUP (ORDER BY l_extendedprice) AS p " +
        "FROM lineitem WHERE l_quantity > 5"
      val fast = PercentilePlanner.tryPlan(spark, q)
      assert(fast.isDefined, "global shape did not engage")
      val plan = fast.get.queryExecution.executedPlan.toString
      assert(!plan.contains("percentile") && !plan.contains("Median"), plan)
      assert(fast.get.collect().sameElements(spark.sql(q).collect()))
    }
  }

  test("unsupported shapes fall back (None), never error") {
    withLineitem {
      val shapes = Seq(
        // HAVING
        sql.replace("GROUP BY l_returnflag", "GROUP BY l_returnflag HAVING COUNT(*) > 0"),
        // a non-percentile aggregate in the list
        """SELECT l_returnflag, MEDIAN(l_quantity) AS m, SUM(l_quantity) AS s
          |FROM lineitem GROUP BY l_returnflag""".stripMargin,
        // expression group key
        "SELECT MEDIAN(l_quantity) AS m FROM lineitem GROUP BY l_linenumber + 1",
        // join
        "SELECT MEDIAN(l_quantity) AS m FROM lineitem JOIN lineitem b GROUP BY 1",
        // subquery
        "SELECT MEDIAN(l_quantity) AS m FROM (SELECT * FROM lineitem) GROUP BY l_returnflag",
        // windowed
        "SELECT MEDIAN(l_quantity) OVER () AS m FROM lineitem GROUP BY l_returnflag")
      shapes.foreach { s =>
        assert(PercentilePlanner.tryPlan(spark, s).isEmpty, s"engaged on: $s")
      }
      // and the buffered path still answers the HAVING variant
      assert(engine.executeStatement(shapes.head).count() > 0)
    }
  }
}
