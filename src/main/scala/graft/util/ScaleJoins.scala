package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-path join utilities (SURVEY.md §4, PERFORMANCE.md):
  *
  *  - **bucketed co-location**: the fact⋈fact join (orders⋈lineitem at
  *    100 TB) shuffles both sides on every query unless the tables are
  *    written bucketed on the join key — then sort-merge join reads
  *    bucket-aligned files with NO Exchange. `writeBucketed` is the write
  *    side of that contract.
  *  - **salting**: a skewed hot key overwhelms one reducer in a shuffle
  *    join. `saltedJoin` spreads the big side's rows across `buckets`
  *    sub-keys and replicates the small side per sub-key, trading a
  *    bounded small-side blowup for even task sizes. (AQE's skew-join
  *    split handles moderate skew automatically; salting is the explicit
  *    tool for pathological keys.)
  */
object ScaleJoins {

  /** Write `df` as a bucketed+sorted managed table so later equi-joins on
    * `key` against an identically-bucketed table are shuffle-free. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Equi-join `big ⋈ small` on `key` with salt-spread skew mitigation.
    * Deterministic: the big side's salt derives from a row hash, not rand().
    * Result equals the plain inner join. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 buckets: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(hash(big.columns.map(col): _*), lit(buckets)))
    val saltedSmall = small.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
