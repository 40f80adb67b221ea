package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-SHAPE regression tests: the scale claims in SURVEY §5 are
  * claims about the physical plan (one keyed exchange, broadcast the
  * dim, push the filter to the scan) — so pin them as assertions, not
  * prose. A refactor that silently adds a shuffle or un-broadcasts a
  * dim fails here long before it shows up as a bench regression.
  *
  * Counts use the pre-execution plan string; bounds are chosen to be
  * robust to AQE wrapper nodes while still catching a plan-class
  * change (an extra Exchange, a BroadcastHashJoin degrading to SMJ).
  */
class PlanShapeSpec extends AnyFunSuite {
  import TestSpark._

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  private def count(plan: String, token: String): Int =
    token.r.findAllMatchIn(plan).length

  test("q1: shipdate filter reaches the parquet scan; aggregation is two-level") {
    val p = planOf("q1_pricing_summary")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"),
      "shipdate filter not pushed to the scan")
    // partial (map-side) + final aggregate — the one-shuffle agg shape
    assert(count(p, "HashAggregate") >= 2)
  }

  test("q2: nation joins as broadcast, never a nested loop") {
    val p = planOf("q2_nation_revenue")
    assert(count(p, "BroadcastHashJoin") >= 1, "nation dim not broadcast")
    assert(count(p, "BroadcastNestedLoopJoin") == 0)
  }

  test("events_sessionize: both windows and the rollup share ONE keyed exchange") {
    val p = planOf("events_sessionize")
    // hashpartitioning(user_id) appears in exactly one Exchange; the
    // only other exchange is the output ordering's range partitioner
    assert(count(p, "Exchange hashpartitioning") == 1,
      s"expected one keyed exchange:\n$p")
    assert(count(p, "Exchange") <= 2)
  }

  test("as-of join: keyed exchanges bounded (right pre-agg + ONE carry window)") {
    val p = planOf("asof_join")
    // one keyed exchange for the right side's (user, ts) pre-agg, one
    // for the union-window carry — and never a third, which is what a
    // range-join or per-key theta-join formulation would add
    assert(count(p, "Exchange hashpartitioning") <= 2,
      s"as-of grew extra keyed shuffles:\n$p")
    assert(count(p, "BroadcastNestedLoopJoin") == 0 &&
      count(p, "CartesianProduct") == 0)
  }

  test("profile_columns: all metrics in a single pass over each table scan") {
    val p = planOf("profile_columns")
    // one agg pass = customer scanned once, not once per metric
    assert(count(p, "Scan parquet") <= 1, s"profile re-scans its input:\n$p")
  }

  test("events_attribution: event_type filters pushed; no cartesian anywhere") {
    val p = planOf("events_attribution")
    assert(p.contains("PushedFilters") && p.contains("event_type"))
    assert(count(p, "CartesianProduct") == 0 &&
      count(p, "BroadcastNestedLoopJoin") == 0)
  }

  test("range_join: bin equi-join plan, not a nested loop") {
    val p = planOf("range_join")
    assert(count(p, "BroadcastNestedLoopJoin") == 0 &&
      count(p, "CartesianProduct") == 0,
      "range join degraded to a nested loop")
  }
}
