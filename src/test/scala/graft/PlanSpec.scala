package graft

/** Physical-plan shape regressions (SURVEY §4 / SCALE.md claims): the
  * properties that matter at 100 TB — pushed filters, pruned scans,
  * broadcast dims, no cartesian products, partial top-k before window
  * exchanges — asserted against the optimized plan text so a future edit
  * that silently loses one fails the suite, not the next scale-up.
  */
class PlanSpec extends SparkSpec {

  private def plan(key: String): String =
    SparkEntry.queries(key)(spark, sf).queryExecution.executedPlan.toString

  test("filter_eq pushes its predicate into the parquet scan") {
    val p = plan("filter_eq")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("EqualTo(o_orderstatus,F)"), p)
  }

  test("select_cols prunes the scan to the projected columns") {
    val p = plan("select_cols")
    assert(p.contains("ReadSchema: struct<c_custkey:bigint,c_name:string,c_mktsegment:string>"), p)
  }

  test("json_extract reads only the two needed columns") {
    val p = plan("json_extract")
    assert(p.contains("ReadSchema: struct<event_id:bigint,props:string>"), p)
  }

  test("flagship broadcasts dims and avoids cartesian/shuffled fact joins") {
    val p = plan("flagship_nation_top_supplier")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("window_top1 computes partial top-k before the window exchange") {
    val p = plan("window_top1")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("order_limit runs as TakeOrderedAndProject, not global sort") {
    val p = plan("order_limit")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

}
