package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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

  /** events.ts is TIMESTAMP(NANOS) parquet, which Spark only reads via
    * spark.sql.legacy.parquet.nanosAsLong (sessions set it); convert the
    * raw nano count back to a microsecond timestamp with integer division
    * (double division would lose precision above 2^53 ns).
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" &&
        df.schema.fields.exists(f => f.name == "ts" && f.dataType == LongType))
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** Register every fixture table as a temp view so the engine's full
    * `spark.sql` surface works over the dataset (the SQL twin of the
    * DataFrame API — same Catalyst plans, see q_sql_sales_summary). */
  def registerViews(spark: SparkSession, dir: String): Unit =
    all.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
