package graft.tools

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch diagnostic (r21): (a) does Dataset.observe() resolve its
  * Observation when the action is an EAGER localCheckpoint (so a global
  * scalar can be folded into the checkpoint's materialization job instead
  * of costing a separate pass/broadcast)? (b) plan shape of a
  * shuffle_hash-hinted join. Driver-side tooling only.
  */
object ScratchCkptPart {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val obs = Observation("tot")
    val df = (1 to 100000).map(i => (i % 1000L, i.toLong)).toDF("k", "v")
      .groupBy("k").agg(sum($"v").as("s"))
      .observe(obs, sum(floor($"s" * 2 + 0.5).cast("long")).as("t"))
      .localCheckpoint()
    println("== checkpointed; getting observation with 10s timeout ==")
    @volatile var got: Option[Map[String, Any]] = None
    val th = new Thread(() => { got = Some(obs.get) })
    th.setDaemon(true)
    th.start()
    th.join(10000)
    println(s"== observation (None means NOT resolved in 10s): $got ==")
    if (got.isEmpty) {
      df.write.format("noop").mode("overwrite").save()
      th.join(5000)
      println(s"== after noop action: $got ==")
    }
    spark.stop()
  }
}
