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

  // r16 close post-mortem: a GENERATED oracle twin that inlines its
  // intermediates explodes combinatorially — the flat t-quantile SQL hit
  // ~474 KB, DuckDB planned it, but the planning blew the SHARED oracle
  // connection's allocator and every LATER query in the run failed with
  // bad_alloc (invisible to subset verify; only the full gate caught
  // it). This pin makes the failure mode a named red test at build
  // time: every twin must stay text-linear (one CTE per intermediate —
  // the tQuantileSqlCtes pattern). Current maximum is ~32 KB
  // (x_generalized_esd's five staged chains); the bound allows 2×
  // headroom while sitting 7× below the known-bad size.
  test("every oracle SQL text stays under the 64 KB linearity bound") {
    val over = SparkEntry.oracleSql.toSeq
      .map { case (k, v) => (k, v.getBytes("UTF-8").length) }
      .filter(_._2 > 65536)
      .sortBy(-_._2)
    assert(over.isEmpty,
      s"generated oracle SQL blew the text-linearity bound (inline a " +
        s"staged-CTE builder instead): ${over.map { case (k, n) =>
          s"$k=${n}B" }.mkString(", ")}")
  }

  test("benchQueries are all registered") {
    assert(SparkEntry.benchQueries.forall(SparkEntry.queries.contains))
    assert(SparkEntry.benchQueries.nonEmpty)
  }

  test("heavyQueries are all registered, non-empty, disjoint from headline") {
    assert(SparkEntry.heavyQueries.forall(SparkEntry.queries.contains))
    assert(SparkEntry.heavyQueries.size === 12,
      "the heavy tier is PINNED at 12 for round-over-round comparability")
    assert(SparkEntry.heavyQueries.intersect(SparkEntry.benchQueries).isEmpty)
  }

  // r7 post-mortem: x_sessionize crashed at ANALYSIS time after a fixture
  // regeneration changed events.ts's physical type, and no gate saw it —
  // `sbt test` stayed green because nothing executed the registry. This test
  // executes EVERY registered query at sf0.001 (limit(1) keeps it cheap:
  // analysis + optimization + at least one task per query), so any
  // resolution/codegen breakage becomes a named red test, never a silent
  // absence from the driver's correctness file.
  test("registry smoke: every query executes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, "/root/testdata/sf0.001").limit(1).collect(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${e.getMessage}")
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries failed to execute:\n${failures.mkString("\n")}")
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
