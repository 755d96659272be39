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
}
