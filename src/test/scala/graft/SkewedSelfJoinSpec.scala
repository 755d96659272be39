package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.util.ScaleJoins

/** Chunk-salted self-join pair generation (round 3): the LSH band join's
  * worst case is one boilerplate bucket holding half the corpus — all
  * O(|B|²) candidate pairs land in the single reducer that owns the hot
  * band value. chunkedSelfPairs must (a) return exactly the naive
  * self-join's pairs and (b) spread the hot bucket's pair generation
  * across many shuffle cells. */
class SkewedSelfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def withShuffleJoins[A](body: => A): A = {
    // pin the plan to shuffle joins: broadcast would compute pairs in the
    // input partitions (hiding the skew), and AQE's skew split would
    // re-balance mid-demo — chunking is the explicit tool being asserted
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body
    finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
    }
  }

  private def naivePairs(df: DataFrame): DataFrame =
    df.alias("x").join(df.alias("y"),
        col("x.band") === col("y.band") && col("x.id") < col("y.id"))
      .select(col("x.band").as("band"), col("x.id").as("a"),
        col("y.id").as("b"))

  test("chunked self-pairs equal the naive self-join, skew or not") {
    // 400 rows: 50% in one hot band, the rest spread over 37 bands
    val df = (1 to 400)
      .map(i => (if (i <= 200) "HOT" else s"band-${i % 37}", i.toLong))
      .toDF("band", "id")
    val naive = naivePairs(df)
    for (chunks <- Seq(1, 3, 8)) {
      val chunked = ScaleJoins.chunkedSelfPairs(df, Seq("band"), "id", chunks)
      assert(chunked.count() === naive.count(), s"chunks=$chunks")
      assert(chunked.exceptAll(naive).isEmpty, s"extra pairs at chunks=$chunks")
      assert(naive.exceptAll(chunked).isEmpty, s"lost pairs at chunks=$chunks")
    }
  }

  test("hot-bucket pair generation spreads across shuffle cells") {
    val df = (1 to 2000).map(i => ("HOT", i.toLong)).toDF("band", "id")
    def maxShare(pairs: DataFrame): Double = withShuffleJoins {
      val counts = pairs.rdd
        .mapPartitions(it => Iterator(it.size.toLong)).collect()
      counts.max.toDouble / math.max(counts.sum, 1L)
    }
    // naive: every one of the ~2M pairs is produced by the one reducer
    // that owns band=HOT
    assert(maxShare(naivePairs(df)) > 0.99)
    // chunked (8 → 36 cells): no task holds more than half the work
    assert(maxShare(
      ScaleJoins.chunkedSelfPairs(df, Seq("band"), "id", 8)) < 0.5)
  }
}
