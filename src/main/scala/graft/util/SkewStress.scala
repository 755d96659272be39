package graft.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skew stress for self-join candidate generation (PERFORMANCE.md round
  * 3): one band bucket holding half the corpus — the LSH dedup worst
  * case (boilerplate documents). Measures naive band self-join vs
  * chunkedSelfPairs: wall time and the per-task share of produced pairs.
  *
  *   runMain graft.util.SkewStress <hotRows> <coldRows> <chunks>
  */
object SkewStress {
  def main(args: Array[String]): Unit = {
    val hot = if (args.length > 0) args(0).toInt else 8000
    val cold = if (args.length > 1) args(1).toInt else 8000
    val chunks = if (args.length > 2) args(2).toInt else 16

    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.ansi.enabled", "false")
      // shuffle joins only: broadcast hides the skew being measured, and
      // AQE's own skew split would blur the A/B (it helps the naive side
      // for moderate skew; chunking is the explicit tool for pathological
      // self-joins)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val df = ((1 to hot).map(i => ("HOT", i.toLong)) ++
        (1 to cold).map(i => (s"band-${i % 997}", (hot + i).toLong)))
      .toDF("band", "id").repartition(8).cache()
    df.count()

    def measure(label: String, pairs: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val counts = pairs.rdd
        .mapPartitions(it => Iterator(it.size.toLong)).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      val total = counts.sum
      println(f"[skew] $label%-8s pairs=$total tasks=${counts.length} " +
        f"maxTaskShare=${counts.max.toDouble / math.max(total, 1)}%.3f " +
        f"time=${sec}%.1fs")
    }

    measure("naive", df.alias("x").join(df.alias("y"),
        col("x.band") === col("y.band") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b")))
    measure("chunked",
      ScaleJoins.chunkedSelfPairs(df, Seq("band"), "id", chunks)
        .select("a", "b"))
    spark.stop()
  }
}
