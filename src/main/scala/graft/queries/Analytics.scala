package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.types.Coercions._
import graft.util.Tables.t

/** Dashboard-class analytical queries (SURVEY.md §2.9) — the query surface
  * the reference's loaded schema exists to serve (README.md:3 "para posterior
  * análise e criação de dashboards"). Testdata stand-ins per FIXTURES.md §2:
  * orders/lineitem = pedidos/pedido_itens, part = produtos, customer names =
  * vendors, supplier = depots, region→nation = category hierarchy.
  *
  * Scale posture: all aggregations are partial+final hash aggregates; the
  * only joins are fact⋈dim where the dim side (customer/nation/region/part at
  * real ERP scale: thousands of rows) is broadcast by Catalyst/AQE; no
  * driver-side collect anywhere.
  */
object Analytics {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sales_by_period" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy(fmtD(date_trunc("month", col("o_orderdate"))).as("month"))
        .agg(dsum(col("o_totalprice")).as("revenue"),
             count(lit(1)).as("n_orders"))
        .orderBy("month")
    }),

    "q_sales_by_vendor" -> ((s, d) => {
      // customer mktsegment plays nome_vendedor; status breakdown per ref :88
      t(s, d, "orders").join(t(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"),
                 col("o_orderstatus").as("status"))
        .agg(dsum(col("o_totalprice")).as("revenue"),
             count(lit(1)).as("n_orders"))
        .orderBy("segment", "status")
    }),

    "q_top_products" -> ((s, d) => {
      // r20 optimization (guide §2.3 "aggregate before you shuffle"):
      // the fact side reduces to the part grain BEFORE the dimension
      // join, so the aggregate hashes 600k rows on a bare long key
      // instead of a (long, string) pair post-join, and the join probes
      // O(parts) rows. The DECIMAL sums are exact and key-complete
      // either way (inner join, FK-clean), so the result and the oracle
      // hash are unchanged.
      val usage = t(s, d, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum(revenue(col("l_extendedprice"), col("l_discount")))
               .as("rev"),
             dsum(col("l_quantity")).as("qty"))
      usage.join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .select(col("p_partkey"), col("p_name"),
          col("rev").cast("double").as("revenue"), col("qty"))
        .orderBy(desc("revenue"), asc("p_partkey"))
        .limit(10)
    }),

    "q_stock_by_depot" -> ((s, d) => {
      // supplier-by-nation plays stock-by-depot (q_stock_by_depot, ref :87);
      // dim side pinned broadcast — at 100 TB stats can mislead AQE
      t(s, d, "supplier").join(broadcast(t(s, d, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("depot"))
        .agg(dsum(col("s_acctbal")).as("stock_value"),
             count(lit(1)).as("n_suppliers"))
        .orderBy("depot")
    }),

    "q_stock_coverage" -> ((s, d) => {
      // days-of-cover analog: p_size (stock) vs demand (sum qty), ref :86-89
      val demand = t(s, d, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(dsum(col("l_quantity")).as("dq"))
      t(s, d, "part").join(demand, col("p_partkey") === col("l_partkey"), "left")
        .select(col("p_partkey"),
          coalesce(col("dq"), lit(0.0)).as("demand_qty"),
          detRound(col("p_size").cast("double") /
            when(col("dq") =!= 0.0, col("dq")), 4)
            .as("coverage"))
        .orderBy("p_partkey")
    }),

    "q_category_rollup" -> ((s, d) => {
      // revenue rolled up the 2-level region→nation hierarchy (j4 analog)
      val rev = t(s, d, "orders").join(t(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")),
          col("n_regionkey") === col("r_regionkey"))
      val byNation = rev.groupBy(col("n_name").as("node"))
        .agg(dsum(col("o_totalprice")).as("revenue"))
        .withColumn("level", lit("nation"))
      val byRegion = rev.groupBy(col("r_name").as("node"))
        .agg(dsum(col("o_totalprice")).as("revenue"))
        .withColumn("level", lit("region"))
      byNation.unionByName(byRegion)
        .select("level", "node", "revenue")
        .orderBy("level", "node")
    }),

    "q_order_funnel" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy(col("o_orderstatus").as("status"))
        .agg(count(lit(1)).as("n_orders"),
             dsum(col("o_totalprice")).as("revenue"))
        .orderBy("status")
    }),

    "q_sales_by_priority" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy(col("o_orderpriority").as("priority"))
        .agg(count(lit(1)).as("n_orders"),
             dsum(col("o_totalprice")).as("revenue"))
        .orderBy("priority")
    }),

    "q_sales_rollup" -> ((s, d) => {
      // ROLLUP subtotals (segment, status) → (segment) → grand total;
      // NULL grouping markers coalesced to 'ALL' so both engines order
      // identically (Spark sorts NULLS FIRST, DuckDB NULLS LAST)
      t(s, d, "orders").join(t(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .rollup(col("c_mktsegment"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
             dsum(col("o_totalprice")).as("revenue"),
             // standard bitmask (segment bit MSB): disambiguates a real
             // 'ALL' value from a rollup subtotal, unlike the COALESCE
             grouping_id().cast("long").as("gid"))
        .select(coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          col("n_orders"), col("revenue"), col("gid"))
        .orderBy("segment", "status")
    }),

    "q_percentiles" -> ((s, d) => {
      // exact interpolated percentiles (both engines implement the
      // standard p*(n-1) linear interpolation); per-status breakdown
      t(s, d, "orders")
        .groupBy(col("o_orderstatus").as("status"))
        .agg(expr("percentile(o_totalprice, 0.5)").as("p50"),
             expr("percentile(o_totalprice, 0.9)").as("p90"),
             count(lit(1)).as("n"))
        .orderBy("status")
    }),

    "q_monthly_growth" -> ((s, d) => {
      // month-over-month revenue growth (lag window over the monthly agg)
      val w = org.apache.spark.sql.expressions.Window.orderBy("month")
      t(s, d, "orders")
        .groupBy(fmtD(date_trunc("month", col("o_orderdate"))).as("month"))
        .agg(dsum(col("o_totalprice")).as("revenue"))
        .withColumn("prev", lag(col("revenue"), 1).over(w))
        .select(col("month"), col("revenue"),
          detRound((col("revenue") - col("prev")) / col("prev"), 4)
            .as("growth"))
        .orderBy("month")
    }),

    "q_customer_ltv" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
             dsum(col("o_totalprice")).as("ltv"),
             fmtD(min(col("o_orderdate"))).as("first_order"),
             fmtD(max(col("o_orderdate"))).as("last_order"))
        .orderBy("o_custkey")
    }),

    "q_sql_sales_summary" -> ((s, d) => {
      // the engine's SQL surface (BASELINE "DataFrame transformations +
      // SQL"): temp views + spark.sql, same Catalyst plan as the
      // DataFrame twin
      t(s, d, "orders").createOrReplaceTempView("v_orders")
      t(s, d, "customer").createOrReplaceTempView("v_customer")
      s.sql("""
        SELECT c_mktsegment AS segment,
               date_format(date_trunc('year', o_orderdate), 'yyyy') AS year,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM v_orders JOIN v_customer ON o_custkey = c_custkey
        GROUP BY 1, 2
        ORDER BY segment, year""")
    })
  )

  private val M = "CAST(SUM(CAST(%s AS DECIMAL(18,4))) AS DOUBLE)"
  private def m(c: String) = M.format(c)

  def oracleSql: Map[String, String] = Map(
    "q_sales_by_period" ->
      s"""SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
          ${m("o_totalprice")} AS revenue, COUNT(*) AS n_orders
          FROM orders GROUP BY 1 ORDER BY month""",

    "q_sales_by_vendor" ->
      s"""SELECT c_mktsegment AS segment, o_orderstatus AS status,
          ${m("o_totalprice")} AS revenue, COUNT(*) AS n_orders
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY 1, 2 ORDER BY segment, status""",

    "q_top_products" ->
      """SELECT p_partkey, p_name,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                  CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY 1, 2 ORDER BY revenue DESC, p_partkey ASC LIMIT 10""",

    "q_stock_by_depot" ->
      s"""SELECT n_name AS depot, ${m("s_acctbal")} AS stock_value,
          COUNT(*) AS n_suppliers
          FROM supplier JOIN nation ON s_nationkey = n_nationkey
          GROUP BY 1 ORDER BY depot""",

    "q_stock_coverage" ->
      s"""WITH demand AS (
            SELECT l_partkey, ${m("l_quantity")} AS dq
            FROM lineitem GROUP BY 1)
          SELECT p_partkey, COALESCE(dq, 0.0) AS demand_qty,
          floor((CAST(p_size AS DOUBLE) /
                (CASE WHEN dq <> 0.0 THEN dq END)) * 1e4 + 0.5) / 1e4 AS coverage
          FROM part LEFT JOIN demand ON p_partkey = l_partkey
          ORDER BY p_partkey""",

    "q_category_rollup" ->
      s"""WITH rev AS (
            SELECT n_name, r_name, o_totalprice
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey)
          SELECT 'nation' AS level, n_name AS node, ${m("o_totalprice")} AS revenue
          FROM rev GROUP BY 2
          UNION ALL
          SELECT 'region' AS level, r_name AS node, ${m("o_totalprice")} AS revenue
          FROM rev GROUP BY 2
          ORDER BY level, node""",

    "q_order_funnel" ->
      s"""SELECT o_orderstatus AS status, COUNT(*) AS n_orders,
          ${m("o_totalprice")} AS revenue
          FROM orders GROUP BY 1 ORDER BY status""",

    "q_sales_by_priority" ->
      s"""SELECT o_orderpriority AS priority, COUNT(*) AS n_orders,
          ${m("o_totalprice")} AS revenue
          FROM orders GROUP BY 1 ORDER BY priority""",

    "q_sales_rollup" ->
      s"""SELECT COALESCE(c_mktsegment, 'ALL') AS segment,
          COALESCE(o_orderstatus, 'ALL') AS status,
          COUNT(*) AS n_orders, ${m("o_totalprice")} AS revenue,
          CAST(GROUPING(c_mktsegment, o_orderstatus) AS BIGINT) AS gid
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY ROLLUP(c_mktsegment, o_orderstatus)
          ORDER BY segment, status""",

    "q_percentiles" ->
      """SELECT o_orderstatus AS status,
         quantile_cont(o_totalprice, 0.5) AS p50,
         quantile_cont(o_totalprice, 0.9) AS p90,
         COUNT(*) AS n
         FROM orders GROUP BY 1 ORDER BY status""",

    "q_monthly_growth" ->
      s"""SELECT month, revenue,
          floor(((revenue - prev) / prev) * 1e4 + 0.5) / 1e4 AS growth
          FROM (SELECT month, revenue,
                       lag(revenue) OVER (ORDER BY month) AS prev
                FROM (SELECT strftime(date_trunc('month', o_orderdate),
                               '%Y-%m-%d') AS month,
                             ${m("o_totalprice")} AS revenue
                      FROM orders GROUP BY 1))
          ORDER BY month""",

    "q_customer_ltv" ->
      s"""SELECT o_custkey, COUNT(*) AS n_orders,
          ${m("o_totalprice")} AS ltv,
          strftime(MIN(o_orderdate), '%Y-%m-%d') AS first_order,
          strftime(MAX(o_orderdate), '%Y-%m-%d') AS last_order
          FROM orders GROUP BY 1 ORDER BY o_custkey""",

    "q_sql_sales_summary" ->
      s"""SELECT c_mktsegment AS segment,
          strftime(date_trunc('year', o_orderdate), '%Y') AS year,
          COUNT(*) AS n_orders, ${m("o_totalprice")} AS revenue
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY 1, 2 ORDER BY segment, year"""
  )
}
