package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.types.Coercions._
import graft.util.Tables.t

/** Round-2 additions to the analytical surface (SURVEY.md §2.9): window
  * frames, ranking, CUBE grouping sets, set operators, and distinct
  * counting — the dashboard-class shapes the reference's schema serves
  * that round 1 had not yet covered.
  *
  * Scale posture matches Analytics: partial+final hash aggregates, window
  * shuffles keyed by their partition column (the only global-order window,
  * w4's monthly frame, runs over O(months) pre-aggregated rows, never raw
  * facts). Set ops compile to hash joins/aggregates on the key projection.
  */
object AdvancedAnalytics {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_schema_profile" -> ((s, d) => {
      // one-pass data profiler over orders — the null-rate / distinct /
      // min-max summary an ingest pipeline records per landing (the
      // "did the upstream schema drift?" smoke read). All six columns
      // profile in a SINGLE Aggregate (one scan; the multi-countDistinct
      // Expand is 6x the scan rows map-side, the standard Spark cost of
      // exact per-column distincts in one pass), then stack() unpivots
      // the 1-row result to a row per column. Numeric min/max are
      // quantized to integers and timestamps formatted, so the VARCHAR
      // repr is hash-identical across engines.
      val o = t(s, d, "orders")
      def nu(c: String) = sum(when(col(c).isNull, 1L).otherwise(0L))
      val a = o.agg(
        nu("o_orderkey").as("nu1"), countDistinct(col("o_orderkey")).as("nd1"),
        min(col("o_orderkey")).as("mn1"), max(col("o_orderkey")).as("mx1"),
        nu("o_custkey").as("nu2"), countDistinct(col("o_custkey")).as("nd2"),
        min(col("o_custkey")).as("mn2"), max(col("o_custkey")).as("mx2"),
        nu("o_orderstatus").as("nu3"),
        countDistinct(col("o_orderstatus")).as("nd3"),
        min(col("o_orderstatus")).as("mn3"),
        max(col("o_orderstatus")).as("mx3"),
        nu("o_orderpriority").as("nu4"),
        countDistinct(col("o_orderpriority")).as("nd4"),
        min(col("o_orderpriority")).as("mn4"),
        max(col("o_orderpriority")).as("mx4"),
        nu("o_totalprice").as("nu5"),
        countDistinct(col("o_totalprice")).as("nd5"),
        min(col("o_totalprice")).as("mn5"), max(col("o_totalprice")).as("mx5"),
        nu("o_orderdate").as("nu6"), countDistinct(col("o_orderdate")).as("nd6"),
        min(col("o_orderdate")).as("mn6"), max(col("o_orderdate")).as("mx6"))
      a.select(expr(
        """stack(6,
             'o_orderkey', nu1, nd1, cast(mn1 as string), cast(mx1 as string),
             'o_custkey', nu2, nd2, cast(mn2 as string), cast(mx2 as string),
             'o_orderstatus', nu3, nd3, mn3, mx3,
             'o_orderpriority', nu4, nd4, mn4, mx4,
             'o_totalprice', nu5, nd5,
               cast(cast(floor(mn5 * 1e4 + 0.5) as bigint) as string),
               cast(cast(floor(mx5 * 1e4 + 0.5) as bigint) as string),
             'o_orderdate', nu6, nd6,
               date_format(mn6, 'yyyy-MM-dd HH:mm:ss'),
               date_format(mx6, 'yyyy-MM-dd HH:mm:ss'))
           AS (col_name, null_cnt, n_distinct, min_repr, max_repr)"""))
        .orderBy("col_name")
    }),

    "w4_moving_avg" -> ((s, d) => {
      // 3-month moving revenue (window FRAME over the pre-aggregated
      // monthly table — O(months) rows at the window, facts stay in the
      // partial agg). DECIMAL frame sum keeps both engines bit-identical.
      val w = Window.orderBy("month").rowsBetween(-2, 0)
      t(s, d, "orders")
        .groupBy(fmtD(date_trunc("month", col("o_orderdate"))).as("month"))
        .agg(dsum(col("o_totalprice")).as("revenue"))
        .select(col("month"), col("revenue"),
          detRound(
            sum(col("revenue").cast("decimal(18,4)")).over(w).cast("double")
              / count(lit(1)).over(w), 4).as("mov_avg_3m"))
        .orderBy("month")
    }),

    "w7_frame_bounds" -> ((s, d) => {
      // frame-boundary functions over the monthly series with an
      // EXCLUSIVE trailing frame (2 PRECEDING .. 1 PRECEDING): first /
      // last / nth_value read specific offsets of the frame, NULL until
      // the frame exists — the frame-clause semantics that default-frame
      // last_value silently gets wrong.
      val w = Window.orderBy("month").rowsBetween(-2, -1)
      t(s, d, "orders")
        .groupBy(fmtD(date_trunc("month", col("o_orderdate"))).as("month"))
        .agg(dsum(col("o_totalprice")).as("revenue"))
        .select(col("month"), col("revenue"),
          first(col("revenue")).over(w).as("frame_first"),
          last(col("revenue")).over(w).as("frame_last"),
          nth_value(col("revenue"), 2).over(w).as("frame_second"))
        .orderBy("month")
    }),

    "w5_rank_ntile" -> ((s, d) => {
      // ranking family over per-customer spend within a segment; the
      // window ORDER BY is made total (spend DESC, custkey ASC) so rank /
      // dense_rank / ntile agree across engines on ties
      val spend = t(s, d, "orders").join(t(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"), col("o_custkey"))
        .agg(dsum(col("o_totalprice")).as("spend"))
      val w = Window.partitionBy("segment")
        .orderBy(desc("spend"), asc("o_custkey"))
      spend.select(col("segment"), col("o_custkey"), col("spend"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile"),
          // (rank−1)/(n−1) and rank_ties/n: identical rational formulas
          // in both engines, rounded 6 dp for hash comparison
          graft.types.Coercions.detRound(percent_rank().over(w), 6)
            .as("pct_rank"),
          graft.types.Coercions.detRound(cume_dist().over(w), 6)
            .as("cume"))
        .filter(col("rnk") <= 5)
        .orderBy("segment", "rnk", "o_custkey")
    }),

    "q_sales_cube" -> ((s, d) => {
      // CUBE = all grouping-set combinations (the ROLLUP twin from round
      // 1 covered the hierarchy case); NULL markers coalesced for a
      // total, engine-agnostic sort order
      t(s, d, "orders").join(t(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .cube(col("c_mktsegment"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
             dsum(col("o_totalprice")).as("revenue"))
        .select(coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          col("n_orders"), col("revenue"))
        .orderBy("segment", "status")
    }),

    "j7_bloom_prejoin" -> ((s, d) => {
      // bloom-filter semi-join pruning — the 100 TB shuffle reducer:
      // build one bloom over the SELECTIVE side's keys (a single small
      // binary, computed by a mergeable partial aggregate), then discard
      // non-matching fact rows at the scan side BEFORE the join shuffle.
      // The bloom only prunes — false positives pass and the real join
      // removes them — so the result is exactly the plain join, which is
      // the oracle. Spark's optimizer injects this same shape as a
      // "runtime filter" when statistics allow; making it an explicit
      // operator keeps the guarantee statistics-independent.
      graft.functions.GraftFunctions.register(s)
      t(s, d, "orders").createOrReplaceTempView("v_bl_orders")
      t(s, d, "lineitem").createOrReplaceTempView("v_bl_lineitem")
      s.sql("""
        WITH sel AS (
          SELECT o_orderkey,
                 date_format(date_trunc('month', o_orderdate), 'yyyy-MM-dd')
                   AS month
          FROM v_bl_orders WHERE o_orderpriority = '1-URGENT'),
        pruned AS (
          SELECT l_orderkey, l_extendedprice FROM v_bl_lineitem
          WHERE graft_might_contain(
            (SELECT graft_bloom_agg(o_orderkey, 100000L, 800000L) FROM sel),
            l_orderkey))
        SELECT month, COUNT(*) AS n_items,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                 AS revenue
        FROM pruned JOIN sel ON l_orderkey = o_orderkey
        GROUP BY 1 ORDER BY month""")
    }),

    "j6_set_ops" -> ((s, d) => {
      // INTERSECT / EXCEPT over customer key sets (1996 vs 1997 buyers).
      // Compiles to hash semi/anti aggregation on the key projection —
      // only keys shuffle, never order rows.
      def buyers(year: Int) = t(s, d, "orders")
        .filter(org.apache.spark.sql.functions.year(col("o_orderdate")) === year)
        .select(col("o_custkey"))
      val both = buyers(1996).intersect(buyers(1997))
        .withColumn("tag", lit("both"))
      val only96 = buyers(1996).except(buyers(1997))
        .withColumn("tag", lit("only_1996"))
      both.unionByName(only96)
        .select("tag", "o_custkey")
        .orderBy("tag", "o_custkey")
    }),

    "a5_distinct_counts" -> ((s, d) => {
      // multi-distinct aggregate (Catalyst plans one Expand + two-phase
      // agg); buyers + priorities + order count per year
      t(s, d, "orders")
        .groupBy(org.apache.spark.sql.functions.year(col("o_orderdate"))
          .cast("long").as("year"))
        .agg(countDistinct(col("o_custkey")).as("n_buyers"),
             countDistinct(col("o_orderpriority")).as("n_priorities"),
             count(lit(1)).as("n_orders"))
        .orderBy("year")
    }),

    "q_sales_pivot" -> ((s, d) => {
      // relational pivot (status columns per year) via the DataFrame
      // pivot operator with pinned values — plans as ONE pass with
      // conditional aggregates, no extra shuffle vs the plain groupBy.
      // Missing combinations coalesced to 0 (Spark pivots count to NULL,
      // the oracle's FILTER counts to 0).
      t(s, d, "orders")
        .groupBy(date_format(date_trunc("year", col("o_orderdate")), "yyyy")
          .as("year"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("year"),
          coalesce(col("F"), lit(0L)).as("F"),
          coalesce(col("O"), lit(0L)).as("O"),
          coalesce(col("P"), lit(0L)).as("P"))
        .orderBy("year")
    }),

    "w6_cumulative" -> ((s, d) => {
      // running total (RANGE/ROWS UNBOUNDED PRECEDING frame) over the
      // pre-aggregated monthly table; DECIMAL frame sum keeps the
      // running value exact and order-independent within the frame
      val w = Window.orderBy("month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .groupBy(fmtD(date_trunc("month", col("o_orderdate"))).as("month"))
        .agg(dsum(col("o_totalprice")).as("revenue"))
        .withColumn("cum_revenue",
          sum(col("revenue").cast("decimal(18,4)")).over(w).cast("double"))
        .orderBy("month")
    }),

    "a7_approx_percentile" -> ((s, d) => {
      // sketch-based percentiles (the 100 TB path where exact percentile
      // would sort every group). Bounded-gauge form (r7): the oracle can't
      // reproduce an engine-specific sketch, so the query checks the
      // sketch's PUBLISHED guarantee in-query — the fraction of rows at or
      // below the sketch's answer must sit within eps of the target
      // quantile (rank error ≤ 1/accuracy = 1e-4, plus one-rank
      // discreteness, with slack to 0.005) — and emits exact values plus
      // 0/1 flags the DuckDB twin asserts as constant-true. Value-space
      // error would be data-dependent; rank error is the guarantee.
      val orders = t(s, d, "orders")
      val sk = orders.groupBy(col("o_orderstatus").as("status"))
        .agg(expr("approx_percentile(o_totalprice, 0.5, 10000)").as("p50"),
             expr("approx_percentile(o_totalprice, 0.9, 10000)").as("p90"))
      orders.join(broadcast(sk), col("o_orderstatus") === col("status"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n_orders"),
          (sum(when(col("o_totalprice") <= col("p50"), 1L).otherwise(0L))
            / count(lit(1))).as("frac50"),
          (sum(when(col("o_totalprice") <= col("p90"), 1L).otherwise(0L))
            / count(lit(1))).as("frac90"))
        .select(col("status"), col("n_orders"),
          when(abs(col("frac50") - 0.5) <=
            lit(0.005) + lit(1.0) / col("n_orders"), 1L).otherwise(0L)
            .as("p50_rank_ok"),
          when(abs(col("frac90") - 0.9) <=
            lit(0.005) + lit(1.0) / col("n_orders"), 1L).otherwise(0L)
            .as("p90_rank_ok"))
        .orderBy("status")
    }),

    "a8_cms_freq" -> ((s, d) => {
      // Count-Min frequency sketch — the third of the sketch trio (a6
      // HLL distinct, a7 KLL percentile, a8 CMS frequency): the 100 TB
      // path for per-key frequency estimates without shuffling keys.
      // count_min_sketch partial-aggregates per partition and merges by
      // element-wise addition (commutative ⇒ the estimate is identical
      // across partitionings); the one-row sketch then broadcasts to the
      // probe side, answered by the native graft_cms_probe expression.
      // Bounded-gauge form (r7): the CMS guarantee — never undercounts,
      // overshoot ≤ eps·N (eps = 0.001) with confidence δ, deterministic
      // here under the fixed seed — is checked in-query against the exact
      // per-key count, emitted as 0/1 flags the DuckDB twin asserts as
      // constant-true. The spec additionally bounds the raw estimates and
      // asserts merge invariance under repartitioning.
      graft.functions.GraftFunctions.register(s)
      val li = t(s, d, "lineitem")
      val sk = li.agg(
        expr("count_min_sketch(l_partkey, 0.001d, 0.99d, 42)").as("sk"),
        count(lit(1)).as("total"))
      val exact = li.filter(col("l_partkey") <= 100)
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("exact_freq"))
      exact.crossJoin(sk) // sk is a single aggregate row — broadcast NL join
        .select(col("l_partkey"), col("exact_freq"), col("total"),
          expr("graft_cms_probe(sk, l_partkey)").as("est"))
        .select(col("l_partkey"), col("exact_freq"),
          when(col("est") >= col("exact_freq"), 1L).otherwise(0L)
            .as("cms_ge_exact"),
          when(col("est") <= col("exact_freq")
            + ceil(col("total") * 0.001) * 3, 1L).otherwise(0L)
            .as("cms_within_eps"))
        .orderBy("l_partkey")
    }),

    "a6_approx_distinct" -> ((s, d) => {
      // HLL++ approximate distinct — the 100 TB path where exact distinct
      // would shuffle every key: sketch merges are O(sketch), constant
      // memory. Bounded-gauge form (r7): a different engine's sketch gives
      // a different estimate, so instead of comparing estimates the query
      // compares its OWN estimate to the exact distinct computed in the
      // same aggregate and emits the exact value plus a 0/1 bound flag
      // (|est − exact| ≤ 3·rsd, rsd = 0.02) the DuckDB twin asserts as
      // constant-true — the sketch's error bound is now hash-checked by
      // the driver instead of invisible to it.
      t(s, d, "orders")
        .groupBy(col("o_orderstatus").as("status"))
        .agg(approx_count_distinct(col("o_custkey"), 0.02).as("approx"),
             countDistinct(col("o_custkey")).as("exact_buyers"),
             count(lit(1)).as("n_orders"))
        .select(col("status"), col("exact_buyers"), col("n_orders"),
          when(abs(col("approx") - col("exact_buyers")) <=
            greatest(lit(1.0), col("exact_buyers") * 0.06), 1L).otherwise(0L)
            .as("hll_within_3rsd"))
        .orderBy("status")
    }),

    "x_pareto_front" -> ((s, d) => {
      // 2-D skyline (Pareto front) over part: maximize p_size, minimize
      // p_retailprice — "largest part per price point" catalog analysis.
      // The naive skyline is a quadratic NOT EXISTS self-join; the
      // scale-safe decomposition exploits that one dimension (size) has
      // BOUNDED cardinality (TPC-H pins 1..50 at any SF):
      //   1. per-size minimum price — a 50-row histogram, map-side
      //      partial aggregation, one shuffle on size;
      //   2. running min over STRICTLY larger sizes — an unpartitioned
      //      window, but over the 50-row grouped table (the audited
      //      bounded-window posture, never raw parts);
      //   3. a part is on the front iff it achieves its size's minimum
      //      AND that minimum undercuts every larger size's minimum —
      //      a broadcast join of the ≤50-row front spec back to the
      //      scan, so the fact table is touched exactly twice and never
      //      shuffled on an unbounded key.
      // Ties on (size, min price) are all on the front (no strict
      // dominance either way), matching the NOT EXISTS oracle.
      val p = t(s, d, "part")
        .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
      val bySize = p.groupBy(col("p_size"))
        .agg(min(col("p_retailprice")).as("min_price"))
      val wGt = Window.orderBy(col("p_size").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val front = bySize
        .withColumn("gt_min", min(col("min_price")).over(wGt))
        .filter(col("gt_min").isNull || col("min_price") < col("gt_min"))
        .select(col("p_size"), col("min_price"))
      p.join(broadcast(front), Seq("p_size"))
        .filter(col("p_retailprice") === col("min_price"))
        .select(col("p_partkey"), col("p_size"),
          col("p_retailprice").as("price"))
        .orderBy(col("p_size").desc, col("p_partkey"))
    }),

    "x_cms_join_estimate" -> ((s, d) => {
      // Sketch-based JOIN-SIZE estimation — the planning primitive a
      // 100 TB optimizer wants before committing to a shuffle: the inner
      // product of two Count-Min sketches estimates |R ⋈ S on k| =
      // Σ_k n_R(k)·n_S(k) without joining anything (AGMS/CM sketch
      // inner-product theorem: estimate = min over rows of the
      // counter-wise dot product; never an undercount, overshoot ≤
      // eps·|R|·|S| with the sketch's confidence). Both sketches build
      // in one pass each (partial-aggregated, mergeable), the dot is
      // O(depth·width) on two broadcast one-row sides — the fact tables
      // are never co-shuffled. Bounded-gauge form (the a8 pattern): the
      // exact join size is computed from the two key histograms (DECIMAL
      // partials), the estimate's guarantees are emitted as 0/1 flags
      // the DuckDB twin pins constant-true, with the 3x slop a8 uses.
      graft.functions.GraftFunctions.register(s)
      val o = t(s, d, "orders")
      val e = t(s, d, "events")
      val sk1 = o.agg(
        expr("count_min_sketch(o_custkey, 0.001d, 0.99d, 42)").as("sk1"),
        count(lit(1)).as("n_orders"))
      val sk2 = e.agg(
        expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)").as("sk2"),
        count(lit(1)).as("n_events"))
      val exact = o.groupBy(col("o_custkey").as("k"))
        .agg(count(lit(1)).as("c1"))
        .join(e.groupBy(col("user_id").as("k"))
          .agg(count(lit(1)).as("c2")), Seq("k"))
        .agg(coalesce(sum((col("c1") * col("c2")).cast("decimal(20,0)")),
          lit(0).cast("decimal(20,0)")).cast("long").as("exact_join_size"))
      exact.crossJoin(broadcast(sk1)).crossJoin(broadcast(sk2))
        .select(col("exact_join_size"), col("n_orders"), col("n_events"),
          expr("graft_cms_dot(sk1, sk2)").as("est"))
        .select(col("exact_join_size"), col("n_orders"), col("n_events"),
          when(col("est") >= col("exact_join_size"), 1L).otherwise(0L)
            .as("est_ge_exact"),
          when(col("est").cast("double") <=
            col("exact_join_size").cast("double")
              + col("n_orders").cast("double")
                * col("n_events").cast("double") * 0.001 * 3, 1L)
            .otherwise(0L).as("est_within_eps"))
    })
  )

  private val M = "CAST(SUM(CAST(%s AS DECIMAL(18,4))) AS DOUBLE)"
  private def m(c: String) = M.format(c)

  def oracleSql: Map[String, String] = Map(
    "x_schema_profile" ->
      """WITH a AS (
           SELECT
             CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS nu1,
             COUNT(DISTINCT o_orderkey) AS nd1,
             MIN(o_orderkey) AS mn1, MAX(o_orderkey) AS mx1,
             CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS nu2,
             COUNT(DISTINCT o_custkey) AS nd2,
             MIN(o_custkey) AS mn2, MAX(o_custkey) AS mx2,
             CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS nu3,
             COUNT(DISTINCT o_orderstatus) AS nd3,
             MIN(o_orderstatus) AS mn3, MAX(o_orderstatus) AS mx3,
             CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS nu4,
             COUNT(DISTINCT o_orderpriority) AS nd4,
             MIN(o_orderpriority) AS mn4, MAX(o_orderpriority) AS mx4,
             CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS nu5,
             COUNT(DISTINCT o_totalprice) AS nd5,
             MIN(o_totalprice) AS mn5, MAX(o_totalprice) AS mx5,
             CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS nu6,
             COUNT(DISTINCT o_orderdate) AS nd6,
             MIN(o_orderdate) AS mn6, MAX(o_orderdate) AS mx6
           FROM orders)
         SELECT 'o_orderkey' AS col_name, nu1 AS null_cnt,
                nd1 AS n_distinct, CAST(mn1 AS VARCHAR) AS min_repr,
                CAST(mx1 AS VARCHAR) AS max_repr FROM a
         UNION ALL SELECT 'o_custkey', nu2, nd2,
                CAST(mn2 AS VARCHAR), CAST(mx2 AS VARCHAR) FROM a
         UNION ALL SELECT 'o_orderstatus', nu3, nd3, mn3, mx3 FROM a
         UNION ALL SELECT 'o_orderpriority', nu4, nd4, mn4, mx4 FROM a
         UNION ALL SELECT 'o_totalprice', nu5, nd5,
                CAST(CAST(floor(mn5 * 1e4 + 0.5) AS BIGINT) AS VARCHAR),
                CAST(CAST(floor(mx5 * 1e4 + 0.5) AS BIGINT) AS VARCHAR)
           FROM a
         UNION ALL SELECT 'o_orderdate', nu6, nd6,
                strftime(mn6, '%Y-%m-%d %H:%M:%S'),
                strftime(mx6, '%Y-%m-%d %H:%M:%S') FROM a
         ORDER BY col_name""",

    "w4_moving_avg" ->
      s"""SELECT month, revenue,
          floor((CAST(SUM(CAST(revenue AS DECIMAL(18,4))) OVER w AS DOUBLE)
                 / COUNT(*) OVER w) * 1e4 + 0.5) / 1e4 AS mov_avg_3m
          FROM (SELECT strftime(date_trunc('month', o_orderdate),
                         '%Y-%m-%d') AS month,
                       ${m("o_totalprice")} AS revenue
                FROM orders GROUP BY 1)
          WINDOW w AS (ORDER BY month ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
          ORDER BY month""",

    "w7_frame_bounds" ->
      s"""SELECT month, revenue,
          first_value(revenue) OVER w AS frame_first,
          last_value(revenue) OVER w AS frame_last,
          nth_value(revenue, 2) OVER w AS frame_second
          FROM (SELECT strftime(date_trunc('month', o_orderdate),
                         '%Y-%m-%d') AS month,
                       ${m("o_totalprice")} AS revenue
                FROM orders GROUP BY 1)
          WINDOW w AS (ORDER BY month
                       ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING)
          ORDER BY month""",

    "w5_rank_ntile" ->
      s"""SELECT * FROM (
            SELECT segment, o_custkey, spend,
                   rank() OVER w AS rnk,
                   dense_rank() OVER w AS drnk,
                   ntile(4) OVER w AS quartile,
                   floor(percent_rank() OVER w * 1e6 + 0.5) / 1e6 AS pct_rank,
                   floor(cume_dist() OVER w * 1e6 + 0.5) / 1e6 AS cume
            FROM (SELECT c_mktsegment AS segment, o_custkey,
                         ${m("o_totalprice")} AS spend
                  FROM orders JOIN customer ON o_custkey = c_custkey
                  GROUP BY 1, 2)
            WINDOW w AS (PARTITION BY segment
                         ORDER BY spend DESC, o_custkey ASC))
          WHERE rnk <= 5 ORDER BY segment, rnk, o_custkey""",

    "q_sales_cube" ->
      s"""SELECT COALESCE(c_mktsegment, 'ALL') AS segment,
          COALESCE(o_orderstatus, 'ALL') AS status,
          COUNT(*) AS n_orders, ${m("o_totalprice")} AS revenue
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY CUBE(c_mktsegment, o_orderstatus)
          ORDER BY segment, status""",

    // the bloom is pruning-only, so the exact answer IS the plain join
    "j7_bloom_prejoin" ->
      """SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
         COUNT(*) AS n_items,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderpriority = '1-URGENT'
         GROUP BY 1 ORDER BY month""",

    "j6_set_ops" ->
      """SELECT 'both' AS tag, o_custkey FROM (
           SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
           INTERSECT
           SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
         UNION ALL
         SELECT 'only_1996' AS tag, o_custkey FROM (
           SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
           EXCEPT
           SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
         ORDER BY tag, o_custkey""",

    "a5_distinct_counts" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS year,
         COUNT(DISTINCT o_custkey) AS n_buyers,
         COUNT(DISTINCT o_orderpriority) AS n_priorities,
         COUNT(*) AS n_orders
         FROM orders GROUP BY 1 ORDER BY year""",

    "q_sales_pivot" ->
      """SELECT strftime(date_trunc('year', o_orderdate), '%Y') AS year,
         COUNT(*) FILTER (o_orderstatus = 'F') AS F,
         COUNT(*) FILTER (o_orderstatus = 'O') AS O,
         COUNT(*) FILTER (o_orderstatus = 'P') AS P
         FROM orders GROUP BY 1 ORDER BY year""",

    "w6_cumulative" ->
      s"""SELECT month, revenue,
          CAST(SUM(CAST(revenue AS DECIMAL(18,4)))
               OVER (ORDER BY month ROWS UNBOUNDED PRECEDING) AS DOUBLE)
            AS cum_revenue
          FROM (SELECT strftime(date_trunc('month', o_orderdate),
                         '%Y-%m-%d') AS month,
                       ${m("o_totalprice")} AS revenue
                FROM orders GROUP BY 1)
          ORDER BY month""",

    // Sketch gauges (r7): DuckDB cannot reproduce an engine-specific
    // sketch, but it CAN reproduce the exact values and assert the
    // bound flags as constant-true — the Spark side computes the flags
    // by comparing its own sketch estimate to the exact value in-query,
    // so a sketch drifting outside its published error bound hash-fails
    // the driver's gate instead of being invisible to it.
    "a6_approx_distinct" ->
      """SELECT o_orderstatus AS status,
         COUNT(DISTINCT o_custkey) AS exact_buyers,
         COUNT(*) AS n_orders,
         CAST(1 AS BIGINT) AS hll_within_3rsd
         FROM orders GROUP BY 1 ORDER BY status""",

    "a7_approx_percentile" ->
      """SELECT o_orderstatus AS status, COUNT(*) AS n_orders,
         CAST(1 AS BIGINT) AS p50_rank_ok,
         CAST(1 AS BIGINT) AS p90_rank_ok
         FROM orders GROUP BY 1 ORDER BY status""",

    "a8_cms_freq" ->
      """SELECT l_partkey, COUNT(*) AS exact_freq,
         CAST(1 AS BIGINT) AS cms_ge_exact,
         CAST(1 AS BIGINT) AS cms_within_eps
         FROM lineitem WHERE l_partkey <= 100
         GROUP BY 1 ORDER BY l_partkey""",

    "x_pareto_front" ->
      """SELECT x.p_partkey, x.p_size, x.p_retailprice AS price
         FROM part x
         WHERE NOT EXISTS (
           SELECT 1 FROM part y
           WHERE y.p_size >= x.p_size
             AND y.p_retailprice <= x.p_retailprice
             AND (y.p_size > x.p_size
                  OR y.p_retailprice < x.p_retailprice))
         ORDER BY x.p_size DESC, x.p_partkey""",

    "x_cms_join_estimate" ->
      """WITH h1 AS (
           SELECT o_custkey AS k, COUNT(*) AS c1 FROM orders GROUP BY 1),
         h2 AS (
           SELECT user_id AS k, COUNT(*) AS c2 FROM events GROUP BY 1)
         SELECT
           CAST(COALESCE((SELECT SUM(CAST(c1 AS HUGEINT) * c2)
                          FROM h1 JOIN h2 USING (k)), 0) AS BIGINT)
             AS exact_join_size,
           (SELECT COUNT(*) FROM orders) AS n_orders,
           (SELECT COUNT(*) FROM events) AS n_events,
           CAST(1 AS BIGINT) AS est_ge_exact,
           CAST(1 AS BIGINT) AS est_within_eps"""
  )
}
