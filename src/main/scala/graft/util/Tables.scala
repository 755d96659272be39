package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the harness fixtures (TESTDATA.md).
  *
  * At 100 TB these reads are partitioned parquet directories; filter pushdown
  * and column pruning reach the scan automatically because every operator
  * downstream is declarative (SURVEY.md §4).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
