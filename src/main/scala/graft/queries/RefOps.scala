package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.etl.Upsert
import graft.types.Coercions._
import graft.util.Tables
import graft.util.Tables.t

/** Reference operator inventory as oracle-checked queries (SURVEY.md §2.2-2.6
  * and §2.1 sinks). Each op-id demonstrates one operator from the reference
  * over the harness testdata; dirty inputs (comma decimals, malformed dates)
  * are constructed deterministically from key columns since the parquet
  * fixtures are clean.
  */
object RefOps {

  /** Deterministic dirty date-string column over orders (exercises t3/t4/f2/
    * f3/a1): ~1/7 empty, 1/7 garbage, 1/7 ISO (wrong format), rest valid
    * dd/MM/yyyy — mirrors the defensive paths at tiny_api_v2_cliente.py:133-134.
    */
  private def dirtyDate: Column = {
    val k = col("o_orderkey") % 7
    when(k === 0, lit(""))
      .when(k === 1, lit("not-a-date"))
      .when(k === 2, lit("2024-12-31"))
      .otherwise(date_format(col("o_orderdate"), "dd/MM/yyyy"))
  }

  private val dirtyDateSql =
    """CASE WHEN o_orderkey % 7 = 0 THEN ''
            WHEN o_orderkey % 7 = 1 THEN 'not-a-date'
            WHEN o_orderkey % 7 = 2 THEN '2024-12-31'
            ELSE strftime(o_orderdate, '%d/%m/%Y') END"""

  /** Tiny-API envelope schema (ref parser :246-285, fixture shapes
    * FIXTURES.md §3) — itens generalized as the entity array. */
  private val envelopeSchema: StructType = StructType.fromDDL(
    "retorno STRUCT<status: STRING, status_processamento: STRING, " +
      "itens: ARRAY<STRUCT<item: STRUCT<id: STRING, valor: STRING>>>>")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- §2.2 transforms ----------------------------------------------
    "t1_coerce_br_float" -> ((s, d) => {
      t(s, d, "lineitem")
        .withColumn("br",
          when(col("l_orderkey") % 97 === 0, lit("abc"))
            .otherwise(translate(
              format_string("%.2f", col("l_quantity")), ".", ",")))
        .groupBy(col("l_returnflag"))
        .agg(dsum(coerceBrFloat(col("br"))).as("sum_qty"),
             count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),

    "t2_parse_br_date" -> ((s, d) => {
      t(s, d, "orders")
        .withColumn("br",
          when(col("o_orderkey") % 3 === 0,
            date_format(col("o_orderdate"), "dd/MM/yyyy"))
          .otherwise(date_format(col("o_orderdate"), "dd/MM/yyyy HH:mm:ss")))
        .select(col("o_orderkey"), fmtTs(parseBrDate(col("br"))).as("ts_parsed"))
        .orderBy("o_orderkey")
    }),

    "t3_regex_date_valid" -> ((s, d) => {
      t(s, d, "orders")
        .select(isBrDateLike(dirtyDate).as("is_valid"))
        .groupBy("is_valid").agg(count(lit(1)).as("n"))
        .orderBy("is_valid")
    }),

    "t4_nullif_empty" -> ((s, d) => {
      t(s, d, "orders")
        .agg(count(lit(1)).as("total"),
             count(nullIfEmpty(dirtyDate)).as("n_nonempty"))
    }),

    "t5_ts_format" -> ((s, d) => {
      t(s, d, "events")
        .select(col("event_id"), brFormat(col("ts")).as("br_ts"))
        .orderBy("event_id")
    }),

    "t6_ts_arith" -> ((s, d) => {
      t(s, d, "events").select(col("event_id"),
          fmtTs(plusOneSecond(col("ts"))).as("ts_plus1s"),
          fmtTs(nextMidnight(col("ts"))).as("ts_next_midnight"),
          fmtTs(minusDays(col("ts"), 60)).as("ts_minus60d"))
        .orderBy("event_id")
    }),

    "t7_mask_secret" -> ((s, d) => {
      t(s, d, "customer")
        .select(col("c_custkey"), maskSecret(col("c_name")).as("masked"))
        .orderBy("c_custkey")
    }),

    "t8_pct_progress" -> ((s, d) => {
      t(s, d, "lineitem").select(col("l_linenumber")).distinct()
        .select(col("l_linenumber"),
                pctProgress(col("l_linenumber"), lit(7)).as("pct"))
        .orderBy("l_linenumber")
    }),

    "t9_json_field" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(jsonField(col("props"), "$.k").as("k_str"))
        .agg(count(lit(1)).as("n"))
        .orderBy("k_str")
    }),

    // ---- §2.3 filters --------------------------------------------------
    "f1_incr_pushdown" -> ((s, d) => {
      // incremental watermark predicate pushed to the parquet scan IN
      // STORAGE UNITS (raw nanos): filtering before the ts conversion lets
      // row-group stats skip data — wrapped-column predicates can't push
      val raw = s.read.parquet(s"$d/events.parquet")
      val filtered =
        if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
          raw.filter(col("ts") >= lit(1704412800000000000L)) // 2024-01-05Z ns
            .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        else raw.filter(col("ts") >= lit("2024-01-05 00:00:00").cast("timestamp"))
      filtered.agg(count(lit(1)).as("n"),
             fmtTs(min(col("ts"))).as("min_ts"),
             fmtTs(max(col("ts"))).as("max_ts"))
    }),

    "f2_regex_filter" -> ((s, d) => {
      t(s, d, "documents")
        .filter(col("text").rlike("table .*join"))
        .groupBy(col("lang")).agg(count(lit(1)).as("n"))
        .orderBy("lang")
    }),

    "f3_nonempty" -> ((s, d) => {
      t(s, d, "orders")
        .filter(length(dirtyDate) > 0)
        .agg(count(lit(1)).as("n"))
    }),

    // ---- §2.4 aggregations --------------------------------------------
    "a1_max_valid_date" -> ((s, d) => {
      // reference computes string-MAX over dd/mm/yyyy (latent bug, ref :133);
      // we implement the intent: validate → parse → max (SURVEY.md §7.4)
      t(s, d, "orders")
        .filter(isBrDateLike(dirtyDate))
        .agg(fmtTs(max(parseBrDate(nullIfEmpty(dirtyDate)))).as("max_date"),
             count(lit(1)).as("n_valid"))
    }),

    "a2_count_star" -> ((s, d) => {
      Tables.all.map { name =>
        t(s, d, name).agg(count(lit(1)).as("n")).select(lit(name).as("tbl"), col("n"))
      }.reduce(_.unionByName(_)).orderBy("tbl")
    }),

    "a3_running_sum" -> ((s, d) => {
      val w = Window.orderBy("month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .groupBy(fmtD(date_trunc("month", col("o_orderdate"))).as("month"))
        .agg(count(lit(1)).as("n"))
        .withColumn("running_n", sum(col("n")).over(w))
        .orderBy("month")
    }),

    "a4_group_counts" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
             dsum(col("l_quantity")).as("sum_qty"),
             dsum(col("l_extendedprice")).as("sum_price"),
             sum(revenue(col("l_extendedprice"), col("l_discount")))
               .cast("double").as("sum_revenue"),
             detRound(dsum(col("l_quantity")) / count(lit(1)), 4).as("avg_qty"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ---- §2.5 joins ----------------------------------------------------
    "j1_header_detail" -> ((s, d) => {
      // detail side pre-aggregated per order BEFORE the join: the
      // header⋈detail fan-out never materializes, count(*) replaces the
      // countDistinct Expand, and the join input shrinks from O(items)
      // to O(orders). Decimal partial sums re-summed per status are
      // exact, so the oracle's single-level SUM hash-matches.
      val items = t(s, d, "lineitem").groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("ni"),
             sum(revenue(col("l_extendedprice"), col("l_discount"))).as("rev"))
      t(s, d, "orders").join(items, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus").as("status"))
        .agg(count(lit(1)).as("n_orders"),
             sum(col("ni")).as("n_items"),
             sum(col("rev")).cast("double").as("revenue"))
        .orderBy("status")
    }),

    "j2_product_stock" -> ((s, d) => {
      val usage = t(s, d, "lineitem").groupBy(col("l_partkey"))
        .agg(dsum(col("l_quantity")).as("qty"), count(lit(1)).as("n_lines"))
      t(s, d, "part").join(usage, col("p_partkey") === col("l_partkey"), "left")
        .select(col("p_partkey"),
          coalesce(col("qty"), lit(0.0)).as("used_qty"),
          coalesce(col("n_lines"), lit(0L)).as("n_lines"))
        .orderBy("p_partkey")
    }),

    "j3_mn_bridge" -> ((s, d) => {
      // p_brand plays the M:N category bridge key (FIXTURES.md §2)
      t(s, d, "lineitem").join(t(s, d, "part"),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand").as("category"))
        .agg(count(lit(1)).as("n_lines"),
             sum(revenue(col("l_extendedprice"), col("l_discount")))
               .cast("double").as("revenue"))
        .orderBy("category")
    }),

    "j4_tree_closure" -> ((s, d) => {
      // adjacency list from the region→nation 2-level hierarchy; the
      // closure is computed by the generic iterative fixed-point operator
      val nations = t(s, d, "nation").join(t(s, d, "region"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_name").as("id"), col("r_name").as("parent"))
      val regions = t(s, d, "region")
        .select(col("r_name").as("id"), lit(null).cast("string").as("parent"))
      graft.etl.TreeFlatten.ancestorClosure(nations.unionByName(regions))
        .select(col("id").as("node"), col("ancestor"), col("depth"))
        .orderBy("node", "ancestor")
    }),

    "j4b_deep_closure" -> ((s, d) => {
      // the reference's categoria tree is ARBITRARY depth (árvore endpoint
      // ref :33); j4's region→nation fixture only exercises 2 levels, so
      // this drives the SAME generic fixed-point operator through a
      // deterministic 5-tier hierarchy built from region×nation keys
      // (5 regions → 25 nations → 100 → 300 → 600 synthetic nodes; id
      // ranges disjoint by construction) and oracle-checks the closure
      // against a DuckDB WITH RECURSIVE twin — depths 1 through 4.
      val reg = t(s, d, "region")
        .select(col("r_regionkey").cast("long").as("id"),
          lit(null).cast("long").as("parent"))
      val nat = t(s, d, "nation")
        .select((col("n_nationkey") + 100).cast("long").as("id"),
          col("n_regionkey").cast("long").as("parent"))
      val l2 = t(s, d, "nation")
        .select(col("n_nationkey").as("nk"),
          explode(expr("sequence(0, 3)")).as("i"))
        .select((lit(1000) + col("nk") * 10 + col("i")).cast("long").as("id"),
          (col("nk") + 100).cast("long").as("parent"))
      val l3 = l2
        .select(col("id").as("pid"), explode(expr("sequence(0, 2)")).as("j"))
        .select((lit(100000) + col("pid") * 10 + col("j")).cast("long").as("id"),
          col("pid").as("parent"))
      val l4 = l3
        .select(col("id").as("pid"), explode(expr("sequence(0, 1)")).as("k"))
        .select((lit(10000000) + col("pid") * 10 + col("k")).cast("long").as("id"),
          col("pid").as("parent"))
      val edges = reg.unionByName(nat).unionByName(l2)
        .unionByName(l3).unionByName(l4)
      graft.etl.TreeFlatten.ancestorClosure(edges)
        .select(col("id").as("node"), col("ancestor"), col("depth"))
        .orderBy("node", "ancestor")
    }),

    "j5_anti_semi" -> ((s, d) => {
      val customer = t(s, d, "customer")
      val orders = t(s, d, "orders")
      val without = Upsert.newRows(customer, orders.select(col("o_custkey").as("c_custkey")), Seq("c_custkey"))
        .agg(count(lit(1)).as("n")).select(lit("no_orders").as("kind"), col("n"))
      val withO = Upsert.matchedRows(customer, orders.select(col("o_custkey").as("c_custkey")), Seq("c_custkey"))
        .agg(count(lit(1)).as("n")).select(lit("with_orders").as("kind"), col("n"))
      without.unionByName(withO).orderBy("kind")
    }),

    // ---- §2.6 windows --------------------------------------------------
    "w1_pagination" -> ((s, d) => {
      // page 3 @ 50/page; at 100 TB pagination is keyset (WHERE key > last)
      // — row_number over a global sort is the reference-faithful small case
      val w = Window.orderBy("o_orderkey")
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .withColumn("rn", row_number().over(w).cast("long")) // duckdb BIGINT
        .filter(col("rn").between(101, 150))
        .orderBy("rn")
    }),

    "w1b_keyset_pagination" -> ((s, d) => {
      // keyset pagination — w1's documented 100 TB path made first-class:
      // the previous page's last key becomes a range predicate the scan
      // PUSHES DOWN (PushedFilters: GreaterThan — plan-asserted in
      // KeysetPaginationSpec), and orderBy+limit plans as
      // TakeOrderedAndProject: per-partition top-N, no global sort, no
      // single-partition window. Cost is O(page) regardless of how deep
      // the page is — the fix for w1's global row_number.
      val lastKey = 400L // last key of the previous page (client-held state)
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .filter(col("o_orderkey") > lastKey)
        .orderBy("o_orderkey")
        .limit(50)
    }),

    "w2_latest_per_key" -> ((s, d) => {
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
      // l_shipdate joins the version order so ties can't flip the output.
      // r20 optimization (guide §2.3 "aggregate before you shuffle"):
      // the output projects ONLY the version-order columns, so the
      // row_number window (shuffle + per-key sort) is equivalent to
      // max(struct(l_linenumber, l_shipdate)) — struct ordering is the
      // same lexicographic (line, date) DESC-first pick, ties project
      // identical values — and the aggregate ships map-side partial
      // maxima instead of every row. The full-row upsert path this
      // query's window used to demonstrate still runs under oracle in
      // dedup_upsert_last_wins (etl/Upsert.latestPerKey, unchanged).
      t(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(max(struct(col("l_linenumber"), col("l_shipdate"))).as("m"))
        .select(col("l_orderkey"), col("m.l_linenumber").as("last_line"),
                fmtD(col("m.l_shipdate")).as("ship_date"))
        .orderBy("l_orderkey")
    }),

    "w2b_latest_per_key_agg" -> ((s, d) => {
      // pre-aggregation variant of w2 (PERFORMANCE.md): when only aggregate
      // facts of the latest version are needed, a hash agg with map-side
      // partials beats the window sort — no per-key row materialization
      t(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(max(col("l_linenumber")).as("last_line"),
             count(lit(1)).as("n_versions"))
        .orderBy("l_orderkey")
    }),

    "w3_watermark_clamp" -> ((s, d) => {
      // greatest(wm, now()-60d) clamp (ref :163-167) with a fixed bound
      t(s, d, "events")
        .select(col("event_id"),
          fmtTs(greatest(col("ts"),
            lit("2024-01-05 00:00:00").cast("timestamp"))).as("clamped"))
        .orderBy("event_id")
    }),

    // ---- §2.1 sources / sinks -----------------------------------------
    "src_envelope_decode" -> ((s, d) => {
      // build Tiny-API envelopes from events rows, then decode with the real
      // machinery: from_json(envelope schema) → status gate → explode
      val env = concat(
        lit("{\"retorno\":{\"status\":\"OK\",\"status_processamento\":\"3\",\"itens\":[{\"item\":{\"id\":\""),
        col("event_id").cast("string"),
        lit("\",\"valor\":\""),
        translate(format_string("%.2f", col("value")), ".", ","),
        lit("\"}}]}}"))
      // status gate folded INTO the explode input (when(cond, itens):
      // explode(NULL) emits nothing) — a separate Filter would be pushed
      // through the projection and re-evaluate from_json per predicate;
      // this shape parses each envelope exactly once (plan-verified)
      t(s, d, "events")
        .select(from_json(env, envelopeSchema).as("env"))
        .select(explode(when(
            col("env.retorno.status") === "OK" &&
            col("env.retorno.status_processamento").isin("3", "10"),
            col("env.retorno.itens"))).as("it"))
        .select(col("it.item.id").cast("long").as("event_id"),
                coerceBrFloat(col("it.item.valor")).as("valor"))
        .orderBy("event_id")
    }),

    "dedup_upsert_last_wins" -> ((s, d) => {
      // sink_jdbc_upsert semantics via merge-by-union (SURVEY.md §2.1)
      val ev = t(s, d, "events").select(col("event_id"), col("value"))
      val existing = ev.filter(col("event_id") % 3 =!= 0)
      val updates = ev.filter(col("event_id") % 2 === 0)
        .withColumn("value", col("value") + lit(1000.0))
      Upsert.merge(existing, updates, Seq("event_id"))
        .orderBy("event_id")
    }),

    "sink_audit_counts" -> ((s, d) => {
      // final audit COUNT(*) over every table (ref :395-402) + total row
      val per = Tables.all.map { name =>
        t(s, d, name).agg(count(lit(1)).as("n"))
          .select(lit(name).as("tbl"), col("n"))
      }.reduce(_.unionByName(_))
      per.unionByName(per.agg(sum(col("n")).as("n"))
          .select(lit("__total__").as("tbl"), col("n")))
        .orderBy("tbl")
    })
  )

  private def m(c: String) = s"CAST(SUM(CAST($c AS DECIMAL(18,4))) AS DOUBLE)"
  private val rev =
    """CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
       CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE)"""

  def oracleSql: Map[String, String] = Map(
    "t1_coerce_br_float" ->
      s"""SELECT l_returnflag,
          ${m("COALESCE(TRY_CAST(replace(trim(br), ',', '.') AS DOUBLE), 0.0)")} AS sum_qty,
          COUNT(*) AS n
          FROM (SELECT l_returnflag,
                  CASE WHEN l_orderkey % 97 = 0 THEN 'abc'
                       ELSE replace(printf('%.2f', l_quantity), '.', ',') END AS br
                FROM lineitem)
          GROUP BY 1 ORDER BY l_returnflag""",

    "t2_parse_br_date" ->
      """SELECT o_orderkey,
         strftime(COALESCE(try_strptime(br, '%d/%m/%Y %H:%M:%S'),
                           try_strptime(br, '%d/%m/%Y')),
                  '%Y-%m-%d %H:%M:%S') AS ts_parsed
         FROM (SELECT o_orderkey,
                 CASE WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%d/%m/%Y')
                      ELSE strftime(o_orderdate, '%d/%m/%Y %H:%M:%S') END AS br
               FROM orders)
         ORDER BY o_orderkey""",

    "t3_regex_date_valid" ->
      s"""SELECT regexp_matches($dirtyDateSql, '^\\d{2}/\\d{2}/\\d{4}') AS is_valid,
          COUNT(*) AS n FROM orders GROUP BY 1 ORDER BY is_valid""",

    "t4_nullif_empty" ->
      s"""SELECT COUNT(*) AS total, COUNT(NULLIF($dirtyDateSql, '')) AS n_nonempty
          FROM orders""",

    "t5_ts_format" ->
      """SELECT event_id, strftime(ts, '%d/%m/%Y %H:%M:%S') AS br_ts
         FROM events ORDER BY event_id""",

    "t6_ts_arith" ->
      """SELECT event_id,
         strftime(ts + INTERVAL 1 SECOND, '%Y-%m-%d %H:%M:%S') AS ts_plus1s,
         strftime(CAST(date_trunc('day', ts + INTERVAL 1 DAY) AS TIMESTAMP),
                  '%Y-%m-%d %H:%M:%S') AS ts_next_midnight,
         strftime(ts - INTERVAL 60 DAY, '%Y-%m-%d %H:%M:%S') AS ts_minus60d
         FROM events ORDER BY event_id""",

    "t7_mask_secret" ->
      """SELECT c_custkey, substr(c_name, 1, 5) || '...' AS masked
         FROM customer ORDER BY c_custkey""",

    "t8_pct_progress" ->
      """SELECT l_linenumber, floor((l_linenumber * 100.0 / 7) * 1e1 + 0.5) / 1e1 AS pct
         FROM (SELECT DISTINCT l_linenumber FROM lineitem)
         ORDER BY l_linenumber""",

    "t9_json_field" ->
      """SELECT json_extract_string(props, '$.k') AS k_str, COUNT(*) AS n
         FROM events GROUP BY 1 ORDER BY k_str""",

    "f1_incr_pushdown" ->
      """SELECT COUNT(*) AS n,
         strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS min_ts,
         strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS max_ts
         FROM events WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'""",

    "f2_regex_filter" ->
      """SELECT lang, COUNT(*) AS n FROM documents
         WHERE regexp_matches(text, 'table .*join')
         GROUP BY 1 ORDER BY lang""",

    "f3_nonempty" ->
      s"""SELECT COUNT(*) AS n FROM orders WHERE length($dirtyDateSql) > 0""",

    "a1_max_valid_date" ->
      s"""SELECT strftime(MAX(COALESCE(
            try_strptime(NULLIF($dirtyDateSql, ''), '%d/%m/%Y %H:%M:%S'),
            try_strptime(NULLIF($dirtyDateSql, ''), '%d/%m/%Y'))),
            '%Y-%m-%d %H:%M:%S') AS max_date,
          COUNT(*) AS n_valid
          FROM orders
          WHERE regexp_matches($dirtyDateSql, '^\\d{2}/\\d{2}/\\d{4}')""",

    "a2_count_star" ->
      Tables.all.map(n => s"SELECT '$n' AS tbl, COUNT(*) AS n FROM $n")
        .mkString("", " UNION ALL ", " ORDER BY tbl"),

    "a3_running_sum" ->
      """SELECT month, n,
         CAST(SUM(n) OVER (ORDER BY month
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_n
         FROM (SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
                      COUNT(*) AS n
               FROM orders GROUP BY 1)
         ORDER BY month""",

    "a4_group_counts" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
          ${m("l_quantity")} AS sum_qty,
          ${m("l_extendedprice")} AS sum_price,
          $rev AS sum_revenue,
          floor((${m("l_quantity")} / COUNT(*)) * 1e4 + 0.5) / 1e4 AS avg_qty
          FROM lineitem GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus""",

    "j1_header_detail" ->
      s"""SELECT o_orderstatus AS status,
          COUNT(DISTINCT o_orderkey) AS n_orders, COUNT(*) AS n_items,
          $rev AS revenue
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          GROUP BY 1 ORDER BY status""",

    "j2_product_stock" ->
      s"""WITH usage AS (
            SELECT l_partkey, ${m("l_quantity")} AS qty, COUNT(*) AS n_lines
            FROM lineitem GROUP BY 1)
          SELECT p_partkey, COALESCE(qty, 0.0) AS used_qty,
                 COALESCE(n_lines, 0) AS n_lines
          FROM part LEFT JOIN usage ON p_partkey = l_partkey
          ORDER BY p_partkey""",

    "j3_mn_bridge" ->
      s"""SELECT p_brand AS category, COUNT(*) AS n_lines, $rev AS revenue
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY 1 ORDER BY category""",

    "j4_tree_closure" ->
      """SELECT n_name AS node, r_name AS ancestor, 1 AS depth
         FROM nation JOIN region ON n_regionkey = r_regionkey
         ORDER BY node, ancestor""",

    "j4b_deep_closure" ->
      """WITH RECURSIVE
         l2 AS (SELECT CAST(1000 + n_nationkey * 10 + i AS BIGINT) AS id,
                       CAST(n_nationkey + 100 AS BIGINT) AS parent
                FROM nation, range(4) t(i)),
         l3 AS (SELECT CAST(100000 + id * 10 + j AS BIGINT) AS id,
                       id AS parent
                FROM l2, range(3) u(j)),
         l4 AS (SELECT CAST(10000000 + id * 10 + k AS BIGINT) AS id,
                       id AS parent
                FROM l3, range(2) v(k)),
         edges AS (
           SELECT CAST(r_regionkey AS BIGINT) AS id,
                  CAST(NULL AS BIGINT) AS parent FROM region
           UNION ALL
           SELECT CAST(n_nationkey + 100 AS BIGINT),
                  CAST(n_regionkey AS BIGINT) FROM nation
           UNION ALL SELECT id, parent FROM l2
           UNION ALL SELECT id, parent FROM l3
           UNION ALL SELECT id, parent FROM l4),
         closure AS (
           SELECT id, parent AS ancestor, 1 AS depth FROM edges
           WHERE parent IS NOT NULL
           UNION ALL
           SELECT c.id, e.parent, c.depth + 1
           FROM closure c JOIN edges e
             ON c.ancestor = e.id AND e.parent IS NOT NULL)
         SELECT id AS node, ancestor, depth FROM closure
         ORDER BY node, ancestor""",

    "j5_anti_semi" ->
      """SELECT 'no_orders' AS kind, COUNT(*) AS n FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         UNION ALL
         SELECT 'with_orders' AS kind, COUNT(*) AS n FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY kind""",

    "w1_pagination" ->
      """SELECT * FROM (
           SELECT o_orderkey, o_totalprice,
                  row_number() OVER (ORDER BY o_orderkey) AS rn
           FROM orders)
         WHERE rn BETWEEN 101 AND 150 ORDER BY rn""",

    "w1b_keyset_pagination" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_orderkey > 400 ORDER BY o_orderkey LIMIT 50""",

    "w2_latest_per_key" ->
      """SELECT l_orderkey, l_linenumber AS last_line,
                strftime(l_shipdate, '%Y-%m-%d') AS ship_date
         FROM (SELECT l_orderkey, l_linenumber, l_shipdate,
                      row_number() OVER (PARTITION BY l_orderkey
                        ORDER BY l_linenumber DESC, l_shipdate DESC) AS rn
               FROM lineitem)
         WHERE rn = 1 ORDER BY l_orderkey""",

    "w2b_latest_per_key_agg" ->
      """SELECT l_orderkey, MAX(l_linenumber) AS last_line,
         COUNT(*) AS n_versions
         FROM lineitem GROUP BY 1 ORDER BY l_orderkey""",

    "w3_watermark_clamp" ->
      """SELECT event_id,
         strftime(greatest(ts, TIMESTAMP '2024-01-05 00:00:00'),
                  '%Y-%m-%d %H:%M:%S') AS clamped
         FROM events ORDER BY event_id""",

    "src_envelope_decode" ->
      """SELECT CAST(json_extract_string(env, '$.retorno.itens[0].item.id') AS BIGINT) AS event_id,
         COALESCE(TRY_CAST(replace(
           json_extract_string(env, '$.retorno.itens[0].item.valor'), ',', '.')
           AS DOUBLE), 0.0) AS valor
         FROM (SELECT '{"retorno":{"status":"OK","status_processamento":"3","itens":[{"item":{"id":"'
                 || CAST(event_id AS VARCHAR) || '","valor":"'
                 || replace(printf('%.2f', value), '.', ',')
                 || '"}}]}}' AS env
               FROM events)
         WHERE json_extract_string(env, '$.retorno.status') = 'OK'
           AND json_extract_string(env, '$.retorno.status_processamento') IN ('3','10')
         ORDER BY event_id""",

    "dedup_upsert_last_wins" ->
      """WITH ev AS (SELECT event_id, value FROM events),
         existing AS (SELECT * FROM ev WHERE event_id % 3 <> 0),
         updates AS (SELECT event_id, value + 1000.0 AS value FROM ev
                     WHERE event_id % 2 = 0)
         SELECT event_id, value FROM updates
         UNION ALL
         SELECT event_id, value FROM existing e
         WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.event_id = e.event_id)
         ORDER BY event_id""",

    "sink_audit_counts" -> {
      val per = Tables.all
        .map(n => s"SELECT '$n' AS tbl, COUNT(*) AS n FROM $n")
        .mkString(" UNION ALL ")
      s"""WITH per AS ($per)
          SELECT tbl, n FROM per
          UNION ALL
          SELECT '__total__' AS tbl, CAST(SUM(n) AS BIGINT) AS n FROM per
          ORDER BY tbl"""
    }
  )
}
