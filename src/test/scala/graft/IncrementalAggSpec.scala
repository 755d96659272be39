package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.etl.IncrementalAgg

/** Incremental materialized aggregate: folding random batch splits must
  * equal the full recompute, exactly (DECIMAL partials). */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def rows(rnd: Random, n: Int) =
    (0 until n).map(_ => (s"m${rnd.nextInt(12)}", rnd.nextInt(10000) / 100.0))

  test("incremental refreshes over random splits equal the full recompute") {
    val rnd = new Random(7)
    val all = rows(rnd, 5000)

    // full recompute reference
    val full = all.toDF("k", "v")
      .groupBy("k")
      .agg(sum(col("v").cast("decimal(18,4)")).cast("double").as("sum_value"),
           count(lit(1)).as("n"))
      .orderBy("k")
      .as[(String, Double, Long)].collect().toSeq

    // fold the same rows in 7 random-size batches
    val path = tmpDir("incr-agg") + "/t"
    var rest = all
    while (rest.nonEmpty) {
      val take = math.min(rest.size, 1 + rnd.nextInt(1500))
      val (batch, tail) = rest.splitAt(take)
      rest = tail
      IncrementalAgg.refresh(spark, path, batch.toDF("k", "v"), "k", "v")
    }
    val got = IncrementalAgg.read(spark, path)
      .select("k", "sum_value", "n").orderBy("k")
      .as[(String, Double, Long)].collect().toSeq
    assert(got === full)
  }

  test("groups only ever touched by one batch survive untouched merges") {
    val path = tmpDir("incr-agg") + "/t"
    IncrementalAgg.refresh(spark, path,
      Seq(("a", 1.5), ("b", 2.5)).toDF("k", "v"), "k", "v")
    IncrementalAgg.refresh(spark, path,
      Seq(("b", 1.0), ("c", 9.0)).toDF("k", "v"), "k", "v")
    val got = IncrementalAgg.read(spark, path)
      .select("k", "sum_value", "n").orderBy("k")
      .as[(String, Double, Long)].collect().toSeq
    assert(got === Seq(("a", 1.5, 1L), ("b", 3.5, 2L), ("c", 9.0, 1L)))
  }
}
