package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Relational

/** Scale guards: assert the physical plans keep the properties that make
  * these queries viable at 100 TB (pushdown, pruning, top-k, broadcast).
  * A regression here is a performance bug even while results stay right. */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark

  private def plan(q: graft.queries.Q): String =
    q.run(spark, TestSessions.sf001).queryExecution.executedPlan.toString

  test("q01: filter is pushed to the parquet scan and columns are pruned") {
    val p = plan(Relational.q01)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_orderkey")) // untouched column must not be read
  }

  test("q01: aggregation is two-phase (partial then final)") {
    val p = plan(Relational.q01)
    assert(p.contains("HashAggregate"))
    assert(p.contains("partial_sum") || p.contains("Partial"))
  }

  test("q03: dimension joins broadcast at this scale") {
    val p = plan(Relational.q03)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"))
  }

  test("q21: ORDER BY + LIMIT plans as distributed top-k, not a global sort") {
    val p = plan(Relational.q21)
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Exchange rangepartitioning"))
  }

  test("q07: EXISTS-style semi join stays a semi join (no row explosion)") {
    val p = plan(Relational.q07)
    assert(p.contains("LeftSemi"))
  }

  test("q02: projection pruning reaches the scan") {
    val p = plan(Relational.q02)
    // only the 7 referenced columns may appear in ReadSchema
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!read.contains("l_partkey") && !read.contains("l_suppkey"))
  }
}
