package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.types.Coercions.{detRound, dsum}
import graft.util.Tables.t

/** Robust / order statistics over the fixture streams — the
  * interpolation-free formulations that survive a cross-engine hash
  * compare: every quantile-like quantity is an ELEMENT SELECTED BY RANK
  * (row_number over a total order), never an interpolated value, because
  * `percentile_cont`'s (1-f)·a + f·b arithmetic is not specified to the
  * ulp across engines while rank selection is exact by construction.
  */
object StatsOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "x_robust_stats" -> ((s, d) => {
      // median/MAD outlier detection per event_type (the robust
      // alternative to mean±3σ — a single fat-fingered value moves the
      // mean arbitrarily but not the median). Median = lower median by
      // rank selection; MAD = lower median of |v − med|; outlier cut =
      // 3 · 1.4826 · MAD (the Gaussian-consistent scale factor).
      // Two window passes + one grouped count per type — shuffles on
      // event_type only; the selection indexes are integers, the only
      // float ops are the final scalar comparisons, identical per row
      // in both engines.
      val wV = Window.partitionBy("event_type")
        .orderBy(col("value"), col("event_id"))
      val ev = t(s, d, "events")
        .select(col("event_id"), col("event_type"), col("value"))
        .localCheckpoint()
      val n = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
      val med = ev.withColumn("rn", row_number().over(wV))
        .join(broadcast(n), "event_type")
        .filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("event_type"), col("value").as("med"))
      val wA = Window.partitionBy("event_type")
        .orderBy(col("ad"), col("event_id"))
      val withDev = ev.join(broadcast(med), "event_type")
        .withColumn("ad", abs(col("value") - col("med")))
        .localCheckpoint()
      val mad = withDev.withColumn("rn", row_number().over(wA))
        .join(broadcast(n), "event_type")
        .filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("event_type"), col("ad").as("mad"))
      withDev.join(broadcast(mad), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          detRound(max(col("med")), 6).as("median"),
          detRound(max(col("mad")), 6).as("mad"),
          sum(when(col("ad") > lit(3.0) * lit(1.4826) * col("mad"), 1L)
            .otherwise(0L)).cast("long").as("n_outliers"))
        .withColumn("outlier_frac", detRound(col("n_outliers") / col("n"), 6))
        .orderBy("event_type")
    }),

    "x_quantile_bins" -> ((s, d) => {
      // equi-depth feature binning (the discretization step feature
      // pipelines run before crossing / hashing continuous features):
      // 10 equal-count bins of l_extendedprice via ntile over a total
      // order, per-bin boundaries + decimal-exact sums. The bin edges
      // double as an exact 10-quantile sketch gauge. At scale ntile is
      // a range-partitioned sort — the same shape as a global sort-by
      // write; boundaries per bin are grouped min/max.
      val wP = Window.orderBy(col("l_extendedprice"), col("l_orderkey"),
        col("l_linenumber"))
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"))
        .withColumn("bin", ntile(10).over(wP).cast("long"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          detRound(min(col("l_extendedprice")), 4).as("lo"),
          detRound(max(col("l_extendedprice")), 4).as("hi"),
          dsum(col("l_extendedprice")).as("bin_sum"))
        .orderBy("bin")
    }))

  def oracleSql: Map[String, String] = Map(

    "x_robust_stats" ->
      """WITH ev AS (
           SELECT event_id, event_type, value FROM events),
         n AS (SELECT event_type, COUNT(*) AS n FROM ev GROUP BY 1),
         med AS (
           SELECT event_type, value AS med FROM (
             SELECT e.event_type, e.value,
                    row_number() OVER (PARTITION BY e.event_type
                      ORDER BY e.value, e.event_id) AS rn, n.n
             FROM ev e JOIN n USING (event_type))
           WHERE rn = (n + 1) // 2),
         dev AS MATERIALIZED (
           SELECT e.event_id, e.event_type, e.value, m.med,
                  abs(e.value - m.med) AS ad
           FROM ev e JOIN med m USING (event_type)),
         mad AS (
           SELECT event_type, ad AS mad FROM (
             SELECT d.event_type, d.ad,
                    row_number() OVER (PARTITION BY d.event_type
                      ORDER BY d.ad, d.event_id) AS rn, n.n
             FROM dev d JOIN n USING (event_type))
           WHERE rn = (n + 1) // 2)
         SELECT d.event_type, COUNT(*) AS n,
                floor(MAX(d.med) * 1e6 + 0.5) / 1e6 AS median,
                floor(MAX(m.mad) * 1e6 + 0.5) / 1e6 AS mad,
                CAST(SUM(CASE WHEN d.ad > CAST(3.0 AS DOUBLE)
                                         * CAST(1.4826 AS DOUBLE) * m.mad
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
                floor((CAST(SUM(CASE WHEN d.ad > CAST(3.0 AS DOUBLE)
                                         * CAST(1.4826 AS DOUBLE) * m.mad
                                     THEN 1 ELSE 0 END) AS BIGINT)
                       / COUNT(*)) * 1e6 + 0.5) / 1e6 AS outlier_frac
         FROM dev d JOIN mad m USING (event_type)
         GROUP BY 1 ORDER BY event_type""",

    "x_quantile_bins" ->
      """SELECT bin, COUNT(*) AS n,
                floor(MIN(l_extendedprice) * 1e4 + 0.5) / 1e4 AS lo,
                floor(MAX(l_extendedprice) * 1e4 + 0.5) / 1e4 AS hi,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                  AS bin_sum
         FROM (SELECT l_extendedprice,
                      CAST(ntile(10) OVER (ORDER BY l_extendedprice,
                        l_orderkey, l_linenumber) AS BIGINT) AS bin
               FROM lineitem)
         GROUP BY 1 ORDER BY bin""")
}
