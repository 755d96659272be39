package graft

import org.apache.spark.sql.execution.FileSourceScanExec

/** w1b_keyset_pagination's scale contract: the page boundary is a range
  * predicate pushed into the parquet scan, and the page is taken by
  * TakeOrderedAndProject (per-partition top-N), never a global sort or a
  * single-partition window — so page cost is O(page) at any depth. */
class KeysetPaginationSpec extends SparkSpec {

  test("keyset predicate is pushed to the scan and planned as top-N") {
    val q = SparkEntry.queries("w1b_keyset_pagination")(
      spark, "/root/testdata/sf0.001")
    val plan = q.queryExecution.executedPlan
    val scan = plan.collectFirst { case s: FileSourceScanExec => s }.get
    // the keyset boundary reached the parquet reader as a data filter
    assert(scan.dataFilters.nonEmpty, "expected pushed data filters")
    assert(scan.dataFilters.mkString.contains("o_orderkey"),
      s"keyset filter missing from scan: ${scan.dataFilters}")
    assert(scan.metadata.get("PushedFilters")
      .exists(_.contains("GreaterThan(o_orderkey")),
      s"PushedFilters missing GreaterThan: ${scan.metadata.get("PushedFilters")}")
    // orderBy+limit plans as TakeOrderedAndProject — no global Sort node
    val s = plan.toString
    assert(s.contains("TakeOrderedAndProject"), s)
    // values: page follows the boundary in key order
    val rows = q.collect()
    assert(rows.length == 50)
    assert(rows.forall(_.getLong(0) > 400L))
    assert(rows.map(_.getLong(0)).toSeq == rows.map(_.getLong(0)).toSeq.sorted)
  }
}
