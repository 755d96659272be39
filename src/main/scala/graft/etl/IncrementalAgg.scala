package graft.etl

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental materialized-aggregate maintenance — the analytics twin of
  * the reference's incremental loads (SURVEY.md §2.7): a dashboard
  * aggregate (e.g. revenue by month) kept up to date by folding in ONLY
  * the rows that arrived since the last refresh, instead of recomputing
  * over the full history.
  *
  * Correctness rests on the aggregate being decomposable: SUM and COUNT
  * partials merge by addition, and the sums run as DECIMAL(18,4) so the
  * merge is exact and order-independent (the same trick as
  * Coercions.dsum). `refreshed(old ⊎ new) == full-recompute(all)` is the
  * contract, property-tested in IncrementalAggSpec.
  *
  * Scale posture: the delta aggregation is a partial+final hash aggregate
  * over O(new rows); the merge joins O(touched groups) against the
  * materialized table on the group key. At 100 TB the materialized table
  * is bucket-partitioned on the group key (PartitionedMerge) so the merge
  * rewrites only touched buckets.
  */
object IncrementalAgg {

  /** Fold a batch of new fact rows into the materialized (key, sum_dec,
    * n) table at `path`. `keyCol` is the group key; `valueCol` the summed
    * measure. Returns the refreshed row count. */
  def refresh(spark: SparkSession, path: String, newRows: DataFrame,
              keyCol: String, valueCol: String): Long = {
    val delta = newRows.groupBy(col(keyCol))
      .agg(sum(col(valueCol).cast("decimal(18,4)")).as("sum_dec"),
           count(lit(1)).as("n"))
    val merged =
      if (!Files.exists(Paths.get(path))) delta
      else {
        val existing = spark.read.parquet(path)
        existing.select(col(keyCol), col("sum_dec").as("old_sum"),
            col("n").as("old_n"))
          .join(delta, Seq(keyCol), "full_outer")
          .select(col(keyCol),
            (coalesce(col("old_sum"), lit(0).cast("decimal(18,4)")) +
             coalesce(col("sum_dec"), lit(0).cast("decimal(18,4)")))
              .cast("decimal(18,4)").as("sum_dec"),
            (coalesce(col("old_n"), lit(0L)) + coalesce(col("n"), lit(0L)))
              .as("n"))
      }
    val tmp = path + ".tmp"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    graft.util.Fs.swapInto(Paths.get(tmp), Paths.get(path))
    spark.read.parquet(path).count()
  }

  /** Read the materialized aggregate with a double-typed sum column. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .select(col("*"), col("sum_dec").cast("double").as("sum_value"))
      .drop("sum_dec")
}
