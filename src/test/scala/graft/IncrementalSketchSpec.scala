package graft

import org.apache.spark.sql.functions._

import graft.etl.SketchMaintenance

/** SketchMaintenance: a sketch maintained incrementally over random batch
  * splits must equal the full-history sketch EXACTLY (CMS merge is
  * element-wise addition), probed across the whole key range. */
class IncrementalSketchSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("incrementally merged sketch equals the full-history sketch on every probe") {
    val li = graft.util.Tables.t(spark, sf, "lineitem")
      .select(col("l_partkey")).localCheckpoint()
    val probes = li.distinct()

    val rnd = new scala.util.Random(11)
    val cut1 = rnd.nextInt(80) + 10
    val cut2 = cut1 + rnd.nextInt(80) + 10
    val batches = Seq(
      li.filter(pmod(col("l_partkey"), lit(200)) < cut1),
      li.filter(pmod(col("l_partkey"), lit(200)).between(cut1, cut2 - 1)),
      li.filter(pmod(col("l_partkey"), lit(200)) >= cut2))
    assert(batches.map(_.count()).sum === li.count())

    val path = tmpDir("sketch") + "/cms.parquet"
    batches.foreach(b => SketchMaintenance.refresh(spark, path, b, "l_partkey"))

    val inc = SketchMaintenance.probe(spark, path, probes, "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

    val fullPath = tmpDir("sketch-full") + "/cms.parquet"
    SketchMaintenance.refresh(spark, fullPath, li, "l_partkey")
    val full = SketchMaintenance.probe(spark, fullPath, probes, "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

    assert(inc === full)

    // and the estimates actually bound the true counts from above
    val exact = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    inc.foreach { case (k, e) => assert(e >= exact(k)) }
  }

  test("joinSizeEstimate over two maintained sketches bounds the exact " +
      "join size from above, within the eps slack") {
    val o = graft.util.Tables.t(spark, sf, "orders")
      .select(col("o_custkey").as("k")).localCheckpoint()
    val e = graft.util.Tables.t(spark, sf, "events")
      .select(col("user_id").as("k")).localCheckpoint()
    val p1 = tmpDir("jsz-orders") + "/cms.parquet"
    val p2 = tmpDir("jsz-events") + "/cms.parquet"
    // maintain each side in two incremental batches — the estimate must
    // come out of the MAINTAINED state, not a one-shot sketch
    SketchMaintenance.refresh(spark, p1, o.filter(pmod(col("k"), lit(2)) === 0), "k")
    SketchMaintenance.refresh(spark, p1, o.filter(pmod(col("k"), lit(2)) === 1), "k")
    SketchMaintenance.refresh(spark, p2, e.filter(pmod(col("k"), lit(2)) === 0), "k")
    SketchMaintenance.refresh(spark, p2, e.filter(pmod(col("k"), lit(2)) === 1), "k")
    val est = SketchMaintenance.joinSizeEstimate(spark, p1, p2)
    val exact = o.groupBy("k").agg(count(lit(1)).as("c1"))
      .join(e.groupBy("k").agg(count(lit(1)).as("c2")), Seq("k"))
      .agg(coalesce(sum(col("c1") * col("c2")), lit(0L)).cast("long"))
      .collect()(0).getLong(0)
    assert(est >= exact, s"join-size estimate undercounted: $est < $exact")
    val n1 = o.count(); val n2 = e.count()
    assert(est <= exact + (3 * SketchMaintenance.Eps * n1 * n2).toLong + 1,
      s"join-size estimate overshot the eps bound: $est vs exact $exact")
  }
}
