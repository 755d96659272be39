package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

/** Date-partitioned layout + partition pruning: the 100 TB fact-table
  * contract — a time-ranged query must plan PartitionFilters and touch
  * only the matching year directories, not the whole table. */
class PartitionPruneSpec extends SparkSpec {

  test("year filter prunes partitions at planning time") {
    val path = tmpDir("prune") + "/orders_by_year"
    graft.util.Tables.t(spark, "/root/testdata/sf0.001", "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .write.partitionBy("o_year").parquet(path)

    val q = spark.read.parquet(path).filter(col("o_year") === 1996)
    val scan = q.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.get
    // pruning happened in the planner: only the 1996 directory is read
    assert(scan.partitionFilters.nonEmpty, "expected PartitionFilters")
    assert(scan.relation.location.inputFiles.length >
      scan.selectedPartitions.totalNumberOfFiles,
      "scan should select a strict subset of files")
    assert(scan.selectedPartitions.partitionCount === 1)
    // and values are right
    val n = q.count()
    val expected = graft.util.Tables
      .t(spark, "/root/testdata/sf0.001", "orders")
      .filter(year(col("o_orderdate")) === 1996).count()
    assert(n === expected)
  }
}
