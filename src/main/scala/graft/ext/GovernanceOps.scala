package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables.t

/** Data-governance operators (round 11): declarative quality
  * expectations and privacy-risk gauges — the checks a training-data
  * pipeline runs between ingest and release (Deequ/dbt-test-style
  * expectations; k-anonymity/l-diversity from Sweeney 2002 / Machanavajjhala
  * 2007 for quasi-identifier risk in released or logged tables).
  *
  * Scale posture: every per-table rule family evaluates in ONE aggregate
  * over one scan (sum(when(...)) partials, map-side combined);
  * referential rules are anti-join counts on the key (broadcast when the
  * parent side is a dimension); the anonymity gauges are a single
  * groupBy over the quasi-identifier tuple — all shapes that survive
  * 100× data volume unchanged.
  */
object GovernanceOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "x_dq_expectations" -> ((s, d) => {
      // Declarative expectation suite over the order pipeline: each rule
      // is (rule, n_checked, n_violations, pass). Single-scan rule
      // families share one Aggregate; the two referential rules are
      // anti-join counts. pass is 0/1 so the whole suite is one
      // hash-comparable relation (and a release gate is
      // `min(pass) == 1`).
      val o = t(s, d, "orders")
      val li = t(s, d, "lineitem")
      val c = t(s, d, "customer")
      val oAgg = o.agg(
        count(lit(1)).as("n"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("v_null"),
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_uniq"),
        sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("v_range"),
        sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L)
          .otherwise(0L)).as("v_set"),
        sum(when(col("o_orderdate") < to_timestamp(lit("1995-01-01")) ||
          col("o_orderdate") >= to_timestamp(lit("2002-01-01")), 1L)
          .otherwise(0L)).as("v_date"))
        .localCheckpoint() // one row; five rules read it without rescans
      def oRule(rule: String, v: String): DataFrame =
        oAgg.select(lit(rule).as("rule"), col("n").as("n_checked"),
          col(v).as("n_violations"))
      val refO = o.join(c.select(col("c_custkey").as("o_custkey")),
          Seq("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .crossJoin(oAgg.select(col("n").as("n_checked")))
        .select(lit("ref_orders_customer").as("rule"), col("n_checked"),
          col("n_violations"))
      val nLi = li.agg(count(lit(1)).as("n_checked"))
      val refLi = li.select(col("l_orderkey"))
        .join(o.select(col("o_orderkey").as("l_orderkey")),
          Seq("l_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .crossJoin(nLi)
        .select(lit("ref_lineitem_orders").as("rule"), col("n_checked"),
          col("n_violations"))
      Seq(
        oRule("not_null_o_custkey", "v_null"),
        oRule("unique_o_orderkey", "v_uniq"),
        oRule("range_o_totalprice_pos", "v_range"),
        oRule("set_o_orderstatus", "v_set"),
        oRule("range_o_orderdate_window", "v_date"),
        refO, refLi)
        .reduce(_ unionByName _)
        .select(col("rule"), col("n_checked"), col("n_violations"),
          when(col("n_violations") === 0, 1L).otherwise(0L).as("pass"))
        .orderBy("rule")
    }),

    "x_k_anonymity" -> ((s, d) => {
      // Privacy-risk gauge before releasing (or logging) the customer
      // table keyed by quasi-identifiers (nationkey, mktsegment): a row
      // is k-anonymous iff its quasi-identifier group has ≥ k members —
      // smaller groups re-identify. l-diversity tightens it: a group
      // whose SENSITIVE attribute (account-balance sign here) is
      // uniform leaks the sensitive value even at size ≥ k. One groupBy
      // over the quasi tuple yields both gauges; thresholds k=8, l=2.
      val k = 8
      val g = t(s, d, "customer")
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          countDistinct(when(col("c_acctbal") < 0, 1).otherwise(0))
            .as("l_div"))
      g.agg(
        count(lit(1)).as("n_groups"),
        min(col("n")).as("min_group_size"),
        sum(when(col("n") < k, 1L).otherwise(0L)).as("n_groups_below_k"),
        coalesce(sum(when(col("n") < k, col("n"))), lit(0L)).cast("long")
          .as("n_rows_below_k"),
        sum(when(col("l_div") < 2, 1L).otherwise(0L))
          .as("n_groups_low_diversity"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "x_dq_expectations" ->
      """WITH oa AS (
           SELECT COUNT(*) AS n,
             CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS v_null,
             COUNT(*) - COUNT(DISTINCT o_orderkey) AS v_uniq,
             CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS v_range,
             CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                  THEN 1 ELSE 0 END) AS BIGINT) AS v_set,
             CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1995-01-01'
                  OR o_orderdate >= TIMESTAMP '2002-01-01'
                  THEN 1 ELSE 0 END) AS BIGINT) AS v_date
           FROM orders),
         rows_ AS (
           SELECT 'not_null_o_custkey' AS rule, n AS n_checked,
                  v_null AS n_violations FROM oa
           UNION ALL
           SELECT 'unique_o_orderkey', n, v_uniq FROM oa
           UNION ALL
           SELECT 'range_o_totalprice_pos', n, v_range FROM oa
           UNION ALL
           SELECT 'set_o_orderstatus', n, v_set FROM oa
           UNION ALL
           SELECT 'range_o_orderdate_window', n, v_date FROM oa
           UNION ALL
           SELECT 'ref_orders_customer', (SELECT n FROM oa),
                  (SELECT COUNT(*) FROM orders o
                   WHERE NOT EXISTS (SELECT 1 FROM customer c
                                     WHERE c.c_custkey = o.o_custkey))
           UNION ALL
           SELECT 'ref_lineitem_orders',
                  (SELECT COUNT(*) FROM lineitem),
                  (SELECT COUNT(*) FROM lineitem l
                   WHERE NOT EXISTS (SELECT 1 FROM orders o
                                     WHERE o.o_orderkey = l.l_orderkey)))
         SELECT rule, n_checked, n_violations,
                CASE WHEN n_violations = 0 THEN CAST(1 AS BIGINT)
                     ELSE CAST(0 AS BIGINT) END AS pass
         FROM rows_ ORDER BY rule""",

    "x_k_anonymity" ->
      """WITH g AS (
           SELECT c_nationkey, c_mktsegment, COUNT(*) AS n,
                  COUNT(DISTINCT CASE WHEN c_acctbal < 0 THEN 1
                                      ELSE 0 END) AS l_div
           FROM customer GROUP BY 1, 2)
         SELECT COUNT(*) AS n_groups,
                MIN(n) AS min_group_size,
                CAST(SUM(CASE WHEN n < 8 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_groups_below_k,
                CAST(COALESCE(SUM(CASE WHEN n < 8 THEN n END), 0)
                  AS BIGINT) AS n_rows_below_k,
                CAST(SUM(CASE WHEN l_div < 2 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_groups_low_diversity
         FROM g"""
  )
}
