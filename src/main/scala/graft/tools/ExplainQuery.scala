package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-audit diagnostic: print the formatted physical plan of registry
  * queries without executing them. Usage:
  *
  *   sbt -batch "runMain graft.tools.ExplainQuery <sfDir> <name> [name…]"
  *
  * The per-round audit loop is: correctness green → explain → check the
  * plan is the one you'd WANT at 100 TB (pushed filters, pruned columns,
  * broadcast where a side is small, no unexpected global sort/shuffle,
  * wide WholeStageCodegen spans) — not just the first one that passed.
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ExplainQuery <sfDir> <name> [name…]")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("explain")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      println(s"==== $name ====")
      graft.SparkEntry.queries(name)(spark, args(0)).explain("formatted")
    }
    spark.stop()
  }
}
