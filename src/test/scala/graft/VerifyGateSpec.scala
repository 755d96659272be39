package graft

import java.nio.file.{Files, Paths}

/** The loud-failure contract of the correctness gate (r8, after r7's
  * x_sessionize vanished from CORRECTNESS_r07 as a silent absence): a
  * crashed query must leave THREE visible artifacts — a _FAILED_<name>
  * marker, an errors.json entry, and a sentinel parquet under the
  * query's own path so the driver's compare shows a red row, never a
  * missing one. Driven by pointing one query at a nonexistent sfDir.
  */
class VerifyGateSpec extends SparkSpec {

  test("a crashed query leaves marker + errors.json + sentinel parquet; " +
      "a healthy run leaves an empty errors.json") {
    val out = tmpDir("verify-gate")
    val failures = Verify.run(spark, "/nonexistent-sf-dir", out,
      Some(Set("x_sessionize")))
    assert(failures.keySet === Set("x_sessionize"))
    // (a) marker file with the error text
    val marker = Paths.get(s"$out/_FAILED_x_sessionize")
    assert(Files.exists(marker))
    assert(Files.readString(marker).nonEmpty)
    // (b) errors.json names the query
    val errs = Files.readString(Paths.get(s"$out/errors.json"))
    assert(errs.contains("\"x_sessionize\""))
    // (c) sentinel parquet is readable and self-describing — the driver's
    // DuckDB compare sees a schema mismatch (red row), not an absence
    val sentinel = spark.read.parquet(s"$out/x_sessionize")
    assert(sentinel.columns.toSet ===
      Set("__graft_query_failed", "__graft_error"))
    assert(sentinel.count() === 1)
    // healthy control: the same query against the real fixture leaves no
    // failure artifacts and an empty errors map
    val out2 = tmpDir("verify-gate-ok")
    val ok = Verify.run(spark, "/root/testdata/sf0.001", out2,
      Some(Set("x_sessionize")))
    assert(ok.isEmpty)
    assert(!Files.exists(Paths.get(s"$out2/_FAILED_x_sessionize")))
    assert(Files.readString(Paths.get(s"$out2/errors.json")) === "{}")
    assert(spark.read.parquet(s"$out2/x_sessionize").columns
      .contains("n_sessions"))
  }
}
