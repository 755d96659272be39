package graft.tools

import org.apache.spark.sql.SparkSession

/** Forked-JVM workers for MultiProcessStressSpec (r7): the GroupCommit
  * page claim and the PartitionedMerge compact/append protocols are
  * FILESYSTEM-based, so in-JVM thread stress (the r6 x20 specs) shares
  * one NIO view and one process identity — the honest test races two
  * separate JVMs against the same directories. Each main is one worker;
  * the spec forks several and asserts the end state.
  */
object StressMains {
  private[tools] def session(app: String): SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .appName(app)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** args: stagingDir workerId nPages — stage nPages one-row pages into a
  * shared staging dir (no auto-flush: the race under test is the claim).
  */
object StressGroupCommit {
  def main(args: Array[String]): Unit = {
    val Array(stagingDir, workerId, nPages) = args
    val spark = StressMains.session(s"stress-gc-$workerId")
    import spark.implicits._
    val gc = new graft.etl.GroupCommit(spark, stagingDir, Int.MaxValue,
      "k", _ => 0L)
    val w = workerId.toInt
    (0 until nPages.toInt).foreach { i =>
      gc.stage(Seq((w * 1000 + i, s"w$w-p$i")).toDF("k", "v")): Unit
    }
    spark.stop()
  }
}

/** args: tableDir role workerId nOps — role `append`: nOps one-row
  * delta appends cycling 5 keys (later values must win through any
  * compaction), with a low auto-compact threshold so appenders contend
  * on the compaction lock too; role `compact`: nOps explicit compaction
  * attempts, paced to overlap the appenders. */
object StressCompactAppend {
  def main(args: Array[String]): Unit = {
    val Array(tableDir, role, workerId, nOps) = args
    val spark = StressMains.session(s"stress-ca-$workerId-$role")
    import spark.implicits._
    val w = workerId.toInt
    role match {
      case "append" =>
        (0 until nOps.toInt).foreach { i =>
          graft.etl.PartitionedMerge.appendInto(spark, tableDir,
            Seq((w * 1000 + i % 5, i)).toDF("k", "v"), Seq("k"),
            numBuckets = 2, compactThreshold = 4): Unit
        }
      case "compact" =>
        (0 until nOps.toInt).foreach { _ =>
          graft.etl.PartitionedMerge.compact(spark, tableDir, Seq("k")): Unit
          Thread.sleep(300)
        }
    }
    spark.stop()
  }
}
