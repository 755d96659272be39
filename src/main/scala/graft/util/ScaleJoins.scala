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

  /** Per-key top-k via the graft_topk bounded-heap aggregate — the scale
    * replacement for `row_number().over(partitionBy(keys).orderBy(score
    * DESC, id ASC)) <= k`: map-side partials ship at most k entries per
    * key (shuffle O(partitions·k), not O(rows)) and no group is sorted.
    * Identical answer to the rank window, including the id tie-break.
    * Output: keys ++ (id, score, rank). Requires a registered session
    * (GraftFunctions.register). */
  def topKPerKey(df: DataFrame, keys: Seq[String], scoreCol: String,
                 idCol: String, k: Int): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(expr(s"graft_topk($scoreCol, $idCol, $k)").as("__top"))
      .select(keys.map(col) :+ posexplode(col("__top")): _*)
      .select(keys.map(col) ++ Seq(
        col("col.id").as(idCol), col("col.score").as(scoreCol),
        (col("pos") + 1).cast("long").as("rank")): _*)

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
