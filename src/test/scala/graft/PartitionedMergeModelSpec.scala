package graft

import scala.util.Random

import graft.etl.PartitionedMerge

/** Model-based check of the bucket-partitioned storage layer: a random
  * sequence of upsert batches applied through PartitionedMerge must equal
  * the trivial in-memory last-writer-wins map after every step. This is
  * the trust anchor for the round-2 change of the ETL target layout. */
class PartitionedMergeModelSpec extends SparkSpec {
  import spark.implicits._

  test("random merge sequences match the last-writer-wins model") {
    val rnd = new Random(1234)
    val path = tmpDir("pm-model") + "/t"
    val model = scala.collection.mutable.Map[Int, (String, Double)]()

    for (step <- 1 to 12) {
      // batches vary in size, key range (forced overlap), and may carry
      // duplicate keys WITHIN the batch — the merge collapses those
      // deterministically by max non-key ordering, so the model applies
      // the same collapse
      val n = 1 + rnd.nextInt(40)
      val rows = (0 until n).map { _ =>
        val k = rnd.nextInt(60)
        (k, s"v${step}_${rnd.nextInt(5)}", rnd.nextInt(1000) / 10.0)
      }
      val collapsed = rows.groupBy(_._1).map { case (k, vs) =>
        val best = vs.map(v => (v._2, v._3)).max // Upsert.merge tie rule
        k -> best
      }
      collapsed.foreach { case (k, v) => model(k) = v }

      PartitionedMerge.mergeInto(spark, path,
        rows.toDF("id", "name", "v"), Seq("id"), numBuckets = 8)

      val got = PartitionedMerge.read(spark, path)
        .as[(Int, String, Double)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(got === model.toMap, s"divergence at step $step")
    }
  }
}
