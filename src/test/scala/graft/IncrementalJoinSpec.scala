package graft

import org.apache.spark.sql.functions._

import graft.etl.IncrementalJoin

/** IncrementalJoin: the delta-join identity must reproduce the full join
  * exactly under any interleaving of per-side batches, redelivered
  * epochs must be no-ops, and an uncommitted version directory (crash
  * before pointer move) must be invisible to readers and harmless to
  * the next refresh. */
class IncrementalJoinSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("interleaved per-side batches converge to the full join; " +
      "redelivery is a no-op; an uncommitted version is invisible") {
    val o = graft.util.Tables.t(spark, sf, "orders")
      .select(col("o_orderkey").as("k"), col("o_custkey"),
        col("o_totalprice")).localCheckpoint()
    val li = graft.util.Tables.t(spark, sf, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_linenumber"),
        col("l_quantity")).localCheckpoint()
    val base = tmpDir("ivm-join")

    // three batches per side, interleaved R, S, R, S, R, S — each epoch
    // carries one side's delta and an empty delta for the other
    def slice(df: org.apache.spark.sql.DataFrame, m: Int) =
      df.filter(pmod(col("k"), lit(3)) === m)
    val eR = o.limit(0); val eS = li.limit(0)
    val steps = Seq(
      (slice(o, 0), eS), (eR, slice(li, 0)),
      (slice(o, 1), eS), (eR, slice(li, 1)),
      (slice(o, 2), eS), (eR, slice(li, 2)))
    steps.zipWithIndex.foreach { case ((dR, dS), i) =>
      assert(IncrementalJoin.refresh(spark, base, "k", dR, dS, i + 1L))
    }

    val got = IncrementalJoin.readJoin(spark, base)
    val full = o.join(li, "k")
    assert(got.count() === full.count())
    assert(got.exceptAll(full).isEmpty && full.exceptAll(got).isEmpty,
      "incrementally maintained join diverged from the full recompute")

    // redelivered epoch: no-op, state unchanged
    val before = got.count()
    assert(!IncrementalJoin.refresh(spark, base, "k", slice(o, 0), eS, 6L))
    assert(IncrementalJoin.readJoin(spark, base).count() === before)

    // crash simulation: a version directory written but never committed
    // (no pointer move) must be invisible and not block the next epoch
    val orphan = java.nio.file.Paths.get(base, "v99", "J")
    java.nio.file.Files.createDirectories(orphan)
    java.nio.file.Files.writeString(orphan.resolve("garbage"), "x"): Unit
    assert(IncrementalJoin.committedEpoch(base) === Some(6L))
    assert(IncrementalJoin.readJoin(spark, base).count() === before)
    // next refresh with fresh rows applies and GCs the orphan
    assert(IncrementalJoin.refresh(spark, base, "k", eR, eS, 7L))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(base, "v99")))
    assert(IncrementalJoin.readJoin(spark, base).count() === before)

    // GC delete-lag of 1: the previous committed version (v6) survives
    // the v7 commit so in-flight readers finish; v5 and older are gone
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(base, "v6")),
      "previous committed version must survive one refresh (delete-lag 1)")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(base, "v5")))
    // the writer lock is released after a successful commit
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(base, "_refresh.lock")))
  }

  test("readJoin before the first commit fails with a descriptive error; " +
      "a held writer lock makes a concurrent refresh abort loudly") {
    val base = tmpDir("ivm-join-fresh")
    val err = intercept[RuntimeException] {
      IncrementalJoin.readJoin(spark, base)
    }
    assert(err.getMessage.contains("no committed version"),
      s"expected a descriptive error, got: ${err.getMessage}")

    // simulate a concurrent writer holding the lock: refresh must abort
    // with the single-writer message, not corrupt the pointer
    val o = graft.util.Tables.t(spark, sf, "orders")
      .select(org.apache.spark.sql.functions.col("o_orderkey").as("k"),
        org.apache.spark.sql.functions.col("o_totalprice")).limit(5)
    val li = graft.util.Tables.t(spark, sf, "lineitem")
      .select(org.apache.spark.sql.functions.col("l_orderkey").as("k"),
        org.apache.spark.sql.functions.col("l_quantity")).limit(5)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(base))
    val lock = java.nio.file.Paths.get(base, "_refresh.lock")
    java.nio.file.Files.createFile(lock)
    val e2 = intercept[RuntimeException] {
      IncrementalJoin.refresh(spark, base, "k", o, li, 1L)
    }
    assert(e2.getMessage.contains("concurrent refresh"))
    assert(IncrementalJoin.committedEpoch(base).isEmpty,
      "a lock-blocked refresh must not commit")
    java.nio.file.Files.delete(lock)
    // with the lock released the same refresh applies cleanly
    assert(IncrementalJoin.refresh(spark, base, "k", o, li, 1L))
    assert(IncrementalJoin.committedEpoch(base) === Some(1L))
  }
}
