package graft

import org.apache.spark.sql.functions._

/** AQE skew-join vs explicit chunking (round 4, PERFORMANCE.md):
  * plan-asserts that AQE's OptimizeSkewedJoin actually fires on a
  * hot-key join when partition bytes cross the threshold — and that
  * results are identical with and without it. The complementary case
  * (quadratic self-join pair generation, where input-byte accounting
  * cannot see the output explosion) is measured in SkewStress and
  * handled by ScaleJoins.chunkedSelfPairs (SkewedSelfJoinSpec). */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  private def withConf(kv: (String, String)*)(body: => Unit): Unit = {
    val saved = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE splits the skewed join partition (skew=true in the final " +
      "plan) and preserves the join result") {
    // one hot key carrying ~3 MB of padded rows vs tiny cold keys: far
    // beyond the tuned 64 KB threshold, far beyond 2x the median
    val left = ((1 to 20000).map(i => ("HOT", i.toLong)) ++
        (1 to 500).map(i => (s"cold-${i % 97}", 100000L + i)))
      .toDF("k", "v")
      .withColumn("pad", lpad($"v".cast("string"), 128, "x"))
    val right = (Seq("HOT") ++ (0 until 97).map(i => s"cold-$i"))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "w")

    def joined = left.join(right, "k").select($"v", $"w")
    def checksum(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        coalesce(sum(xxhash64($"v", $"w")), lit(0L))).first()
      (r.getLong(0), r.getLong(1))
    }

    var plainSum: (Long, Long) = null
    withConf("spark.sql.adaptive.enabled" -> "false",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      plainSum = checksum(joined)
    }

    withConf("spark.sql.adaptive.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
          "65536",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // execute the join itself so the adaptive plan finalizes, then
      // assert on ITS executed plan (a derived agg would re-plan; and
      // .foreach/.rdd drive the separate rddQueryExecution, which would
      // leave THIS plan un-finalized)
      val df = joined
      df.collect(): Unit
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE skew split in the final plan, got:\n$plan")
      assert(checksum(joined) === plainSum, "AQE changed the join result")
    }
  }
}
