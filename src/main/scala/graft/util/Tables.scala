package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

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

  /** events.ts has shipped in two physical encodings across fixture
    * regenerations: TIMESTAMP(NANOS) (readable only via
    * spark.sql.legacy.parquet.nanosAsLong, surfacing as a raw nano LongType)
    * and plain timestamp[us] with no timezone (surfacing as TIMESTAMP_NTZ).
    * Normalize BOTH to session-TZ TIMESTAMP here — sessions pin UTC — so no
    * downstream op (unix_micros, window ranges, date_trunc) ever sees the raw
    * variant. Nano → micro uses integer division (double division would lose
    * precision above 2^53 ns).
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name != "events") df
    else df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }

  /** Register every fixture table as a temp view so the engine's full
    * `spark.sql` surface works over the dataset (the SQL twin of the
    * DataFrame API — same Catalyst plans, see q_sql_sales_summary). */
  def registerViews(spark: SparkSession, dir: String): Unit =
    all.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
