package graft

/** Driver-contract invariants: smoke entry, registry/oracle key alignment,
  * bench subset validity. */
class SparkEntrySpec extends SparkSpec {

  test("entry (driver smoke) returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  // Queries DELIBERATELY without oracle SQL (driver records a weaker
  // rows-only check). Each needs a reason and a spec-level bound instead.
  private val rowsOnlyByDesign = Set(
    // HLL++ / KLL / CMS sketches are engine-specific; AdvancedAnalyticsSpec
    // asserts error bounds against the exact aggregates instead
    "a6_approx_distinct", "a7_approx_percentile", "a8_cms_freq")

  test("every query has oracle SQL (full correctness coverage)") {
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet --
      rowsOnlyByDesign
    assert(unoracled.isEmpty,
      s"queries with only rows-only checks: $unoracled")
  }

  test("benchQueries are all registered") {
    assert(SparkEntry.benchQueries.forall(SparkEntry.queries.contains))
    assert(SparkEntry.benchQueries.nonEmpty)
  }

  test("registerViews exposes every fixture table to spark.sql") {
    graft.util.Tables.registerViews(spark, "/root/testdata/sf0.001")
    val n = spark.sql(
      """SELECT COUNT(*) FROM orders o JOIN customer c
         ON o.o_custkey = c.c_custkey""").first().getLong(0)
    assert(n > 0)
    assert(graft.util.Tables.all.forall(t =>
      spark.catalog.tableExists(t)))
  }
}
