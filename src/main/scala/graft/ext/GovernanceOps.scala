package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.types.Coercions.detRound
import graft.util.Tables.t

/** Data-governance operators (round 11): declarative quality
  * expectations and privacy-risk gauges — the checks a training-data
  * pipeline runs between ingest and release (Deequ/dbt-test-style
  * expectations; k-anonymity/l-diversity from Sweeney 2002 / Machanavajjhala
  * 2007 for quasi-identifier risk in released or logged tables; the
  * geometric mechanism of Ghosh/Roughgarden/Sundararajan 2009 for
  * differentially-private released counts; snapshot reconciliation for
  * load auditing).
  *
  * Scale posture: every per-table rule family evaluates in ONE aggregate
  * over one scan (sum(when(...)) partials, map-side combined);
  * referential rules are anti-join counts on the key (broadcast when the
  * parent side is a dimension); the anonymity gauges are a single
  * groupBy over the quasi-identifier tuple; the snapshot diff is one
  * full-outer hash join on the primary key comparing ONE fingerprint per
  * row — all shapes that survive 100× data volume unchanged.
  */
object GovernanceOps {

  // ---- discrete Laplace (two-sided geometric) CDF ladder -----------------
  // Geometric mechanism with α = 1/2 (ε = ln 2, sensitivity 1):
  // P(0) = 1/3, P(±k) = (1/3)·2^(-k). CDF(k) = 2^(k+1)/3 for k < 0,
  // 1 − 2^(-k)/3 for k ≥ 0; tails clamped at ±8 (mass beyond: 2^-8/3 per
  // side ≈ 0.0013). Thresholds are emitted as 17-significant-digit decimal
  // strings so Scala's toDouble and DuckDB's strtod parse the IDENTICAL
  // binary64 (the PoisCdf trick, StatsOps.scala) — the ladder below is
  // interpolated verbatim into the oracle SQL, so both engines walk the
  // same comparisons in the same order.
  private val DLapCdf: Seq[(Int, String)] = (-8 to 7).map { k =>
    val cdf =
      if (k < 0) math.pow(2.0, (k + 1).toDouble) / 3.0
      else 1.0 - math.pow(2.0, -k.toDouble) / 3.0
    (k, graft.util.Num.lit17(cdf))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "x_srm_check" -> ((s, d) => {
      // sample-ratio-mismatch check over the deterministic md5 dataset
      // split (x_dataset_split's assignment): observed train/valid/test
      // counts vs the exact 204/26/26-of-256 hash-bucket expectation, a
      // chi-square goodness-of-fit with df = 2 — the experimentation
      // gate that catches a biased splitter or a lost partition before
      // anyone trusts a downstream eval. Per-arm z residuals beside the
      // global statistic; the chi-square terms are 1e9-quantized before
      // the cross-arm sum (3 terms, order-free by quantization). One
      // scan-side map + one 3-row aggregate — shuffle is O(arms).
      val h = substring(md5(col("doc_id").cast("string")), 1, 2)
      val arms = t(s, d, "documents")
        .select(when(h < "cc", "train").when(h < "e6", "valid")
          .otherwise("test").as("split"))
        .groupBy("split").agg(count(lit(1)).as("n_obs"))
        .withColumn("share",
          when(col("split") === "train", lit(204.0 / 256.0))
            .when(col("split") === "valid", lit(26.0 / 256.0))
            .otherwise(lit(26.0 / 256.0)))
      val tot = arms.agg(sum(col("n_obs")).as("n"))
      val scored = arms.crossJoin(broadcast(tot))
        .withColumn("expected", col("n").cast("double") * col("share"))
        .withColumn("z",
          (col("n_obs").cast("double") - col("expected")) /
            sqrt(col("expected") * (lit(1.0) - col("share"))))
        .withColumn("qterm",
          floor((col("n_obs").cast("double") - col("expected")) *
            (col("n_obs").cast("double") - col("expected")) /
            col("expected") * 1e9 + lit(0.5)).cast("long"))
      val chi = scored.agg(sum(col("qterm")).as("qchi"))
        .select(detRound(col("qchi").cast("double") / lit(1e9), 6)
          .as("chi2"),
          (col("qchi").cast("double") / lit(1e9) >
            lit(5.991464547107979)).as("srm_flag")) // df=2, alpha=0.05
      scored.crossJoin(broadcast(chi))
        .select(col("split"), col("n_obs"),
          detRound(col("expected"), 4).as("expected"),
          detRound(col("z"), 6).as("z"),
          col("chi2"), col("srm_flag"))
        .orderBy("split")
    }),

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
    }),

    "x_l_diversity" -> ((s, d) => {
      // the l-diversity instantiations proper (Machanavajjhala et al.
      // 2007) — x_k_anonymity's l gauge counts distinct sensitive
      // values, which a 99:1 split satisfies vacuously; this op adds
      // the two stronger variants over the 4-way balance-bucket
      // sensitive attribute: ENTROPY l-diversity (class entropy ≥ ln l)
      // and RECURSIVE (c,l)-diversity (the most frequent value must not
      // dominate: r1 < c·(n − r1) at l = 2, c = 3). Per-class entropy
      // sums 1e9-quantized −p·ln p terms (integer accumulation, so
      // bucket order can't skew the hash); everything is one class ×
      // bucket groupBy — O(classes·4) rows after the single scan.
      val cls = t(s, d, "customer")
        .select(col("c_nationkey"), col("c_mktsegment"),
          when(col("c_acctbal") < 0, 0L)
            .when(col("c_acctbal") < 3333, 1L)
            .when(col("c_acctbal") < 6666, 2L).otherwise(3L).as("sens"))
        .groupBy(col("c_nationkey"), col("c_mktsegment"), col("sens"))
        .agg(count(lit(1)).as("r"))
      val per = cls
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_distinct"),
          sum(col("r")).as("n"), max(col("r")).as("r1"))
      val ent = cls
        .join(per.select(col("c_nationkey"), col("c_mktsegment"),
          col("n")), Seq("c_nationkey", "c_mktsegment"))
        .withColumn("qterm", floor(-(col("r").cast("double") / col("n"))
          * log(col("r").cast("double") / col("n")) * 1e9).cast("long"))
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(sum(col("qterm")).as("qent"))
      per.join(ent, Seq("c_nationkey", "c_mktsegment"))
        .agg(count(lit(1)).as("n_classes"),
          min(col("n_distinct")).as("min_distinct_sensitive"),
          sum(when(col("n_distinct") < 2, 1L).otherwise(0L))
            .as("n_classes_below_l2"),
          detRound(min(col("qent")) / 1e9, 6).as("min_entropy"),
          sum(when(col("qent").cast("double") / 1e9
            < lit(0.6931471805599453), 1L).otherwise(0L))
            .as("n_classes_entropy_below_ln2"),
          sum(when(col("r1") * 4 >= col("n") * 3, 1L).otherwise(0L))
            .as("n_classes_recursive_fail_c3"))
    }),

    "x_t_closeness" -> ((s, d) => {
      // t-closeness — the third leg of the release-privacy triad
      // (x_k_anonymity covers k and l): a quasi-identifier class leaks
      // even when large and diverse if its SENSITIVE-attribute
      // distribution differs sharply from the table's, so the gauge is
      // the total-variation distance between each class's
      // balance-bucket distribution and the global one, against the
      // conventional t = 0.2 line. The class × bucket grid is built
      // explicitly (a class missing a bucket still contributes
      // |0 − global share|); per-term quantization (1e9) before the
      // 4-term class sum. Everything is O(classes × buckets) after one
      // grouped count.
      val bkt = when(col("c_acctbal") < 0, "neg")
        .when(col("c_acctbal") < 3333, "low")
        .when(col("c_acctbal") < 6666, "mid")
        .otherwise("high")
      val cb = t(s, d, "customer")
        .select(col("c_nationkey").cast("long").as("nk"), bkt.as("bkt"))
        .groupBy("nk", "bkt").agg(count(lit(1)).as("n"))
        .localCheckpoint()
      val cls = cb.groupBy("nk").agg(sum(col("n")).cast("long").as("nc"))
      val gl = cb.groupBy("bkt").agg(sum(col("n")).cast("long").as("nb"))
      val tot = cb.agg(sum(col("n")).cast("long").as("nn"))
      val grid = cls.crossJoin(broadcast(gl))
      grid.join(cb, Seq("nk", "bkt"), "left")
        .withColumn("cn", coalesce(col("n"), lit(0L)))
        .crossJoin(broadcast(tot))
        .withColumn("qterm", floor(abs(
          col("cn").cast("double") / col("nc") -
            col("nb").cast("double") / col("nn")) * 1e9 + 0.5)
          .cast("long"))
        .groupBy("nk", "nc")
        .agg(sum(col("qterm")).as("qs"))
        .select(col("nk").as("nationkey"), col("nc").as("n_class"),
          graft.types.Coercions.detRound(
            col("qs").cast("double") / 1e9 * 0.5, 6).as("tvd"),
          (col("qs").cast("double") / 1e9 * 0.5 > 0.2)
            .as("violates_t02"))
        .orderBy("nationkey")
    }),

    "x_dp_noisy_counts" -> ((s, d) => {
      // Differentially-private release of per-nation customer counts via
      // the geometric mechanism (discrete Laplace, ε = ln 2): each exact
      // count gets integer noise drawn by inverse-CDF over the DLapCdf
      // ladder from an md5-uniform keyed on the group value, then a
      // post-processing clamp at 0 (post-processing preserves DP). The
      // hash seed makes the draw reproducible for the oracle gate — the
      // MECHANISM shape (noise distribution, clamp) is the real artifact;
      // a production release swaps the fixed seed string for a secret
      // per-release nonce. One groupBy over the grouping key, noise
      // applied map-side on the |groups|-row result: scale-free.
      val g = t(s, d, "customer")
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n"))
        .withColumn("u",
          conv(substring(md5(concat(lit("dp:"), col("c_nationkey"))), 1, 12),
            16, 10).cast("long") / lit(281474976710656.0))
      val noise = DLapCdf.reverse
        .foldLeft(lit(8L)) { case (acc, (k, cdf)) =>
          when(col("u") < lit(cdf.toDouble), lit(k.toLong)).otherwise(acc)
        }
      g.select(col("c_nationkey"),
          greatest(col("n") + noise, lit(0L)).as("noisy_count"))
        .orderBy("c_nationkey")
    }),

    "x_freshness" -> ((s, d) => {
      // Freshness/staleness SLO gauge per event source: minutes since
      // each event_type's last arrival relative to the newest event in
      // the table, plus arrival volume over the trailing 24 hour-buckets
      // (bucket-aligned so the figure is exact from the grouped hourly
      // table — no raw-row comparison against a runtime global max).
      // Shapes: one groupBy(type, hour) over the scan (bounded by
      // types × observed hours), everything after runs on that grouped
      // table with the 1-row global max broadcast — the
      // x_time_to_convert posture.
      import graft.types.Coercions.fmtTs
      val hourly = t(s, d, "events")
        .groupBy(col("event_type"),
          unix_millis(date_trunc("hour", col("ts"))).as("h_ms"))
        .agg(count(lit(1)).as("c"), max(col("ts")).as("mts"))
      val gm = hourly.agg(max(col("mts")).as("gmts"),
        max(col("h_ms")).as("gh_ms"))
      hourly.crossJoin(broadcast(gm))
        .groupBy(col("event_type"))
        .agg(sum(col("c")).cast("long").as("n_rows"),
          fmtTs(max(col("mts"))).as("last_seen"),
          floor((unix_millis(max(col("gmts")))
            - unix_millis(max(col("mts")))) / lit(60000.0)).cast("long")
            .as("lag_minutes"),
          sum(when(col("h_ms") >= col("gh_ms") - lit(82800000L), col("c"))
            .otherwise(0L)).cast("long").as("rows_last_24h"))
        .orderBy("event_type")
    }),

    "x_snapshot_diff" -> ((s, d) => {
      // Snapshot reconciliation (load audit): classify every primary key
      // across two loads of the orders table as added / removed /
      // changed / unchanged, plus the money drift on changed rows. The
      // two snapshots are derived deterministically from the fixture so
      // the oracle can rebuild them: snapshot A ("previous load") lacks
      // the keys ≡3 (mod 97) (arrived later), carries a stale priority
      // on keys ≡0 (mod 13) and a pre-correction price (−10.00) on keys
      // ≡0 (mod 17); snapshot B ("current load") lacks keys ≡5 (mod 89)
      // (purged). Change detection compares ONE md5 fingerprint per row
      // — built from engine-stable renderings (strings and integer
      // cents; never raw double→string, whose formatting diverges across
      // engines) — so a 100-column table still costs one comparison per
      // key, and the whole op is a single full-outer hash join on the
      // primary key with map-side fingerprinting.
      val o = t(s, d, "orders")
      val cents = round(col("o_totalprice") * 100).cast("long")
      def fp(c: Column): Column =
        md5(concat_ws("|", col("o_orderstatus"), col("o_orderpriority2"),
          c.cast("string")))
      val snapA = o.filter(col("o_orderkey") % 97 =!= 3)
        .withColumn("o_orderpriority2",
          when(col("o_orderkey") % 13 === 0, lit("0-STALE"))
            .otherwise(col("o_orderpriority")))
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 17 === 0,
            round((col("o_totalprice") - 10.0) * 100).cast("long"))
            .otherwise(cents).as("cents_a"),
          fp(when(col("o_orderkey") % 17 === 0,
            round((col("o_totalprice") - 10.0) * 100).cast("long"))
            .otherwise(cents)).as("fp_a"))
      val snapB = o.filter(col("o_orderkey") % 89 =!= 5)
        .withColumn("o_orderpriority2", col("o_orderpriority"))
        .select(col("o_orderkey"), cents.as("cents_b"),
          fp(cents).as("fp_b"))
      snapA.join(snapB, Seq("o_orderkey"), "full_outer")
        .select(
          when(col("fp_a").isNull, lit("added"))
            .when(col("fp_b").isNull, lit("removed"))
            .when(col("fp_a") === col("fp_b"), lit("unchanged"))
            .otherwise(lit("changed")).as("change_type"),
          col("cents_a"), col("cents_b"))
        .groupBy("change_type")
        .agg(count(lit(1)).as("n"),
          coalesce(sum(when(col("cents_a").isNotNull &&
              col("cents_b").isNotNull &&
              col("cents_a") =!= col("cents_b"),
            col("cents_b") - col("cents_a")).otherwise(0L)), lit(0L))
            .cast("long").as("cents_delta"))
        .orderBy("change_type")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "x_srm_check" ->
      """WITH arms AS (
           SELECT CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                         < 'cc' THEN 'train'
                       WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                         < 'e6' THEN 'valid'
                       ELSE 'test' END AS split,
                  COUNT(*) AS n_obs
           FROM documents GROUP BY 1),
         sh AS (
           SELECT split, CAST(n_obs AS BIGINT) AS n_obs,
                  CASE WHEN split = 'train' THEN 204.0 / 256.0
                       WHEN split = 'valid' THEN 26.0 / 256.0
                       ELSE 26.0 / 256.0 END AS share
           FROM arms),
         tot AS (SELECT CAST(SUM(n_obs) AS DOUBLE) AS n FROM sh),
         scored AS (
           SELECT s.split, s.n_obs, t.n * s.share AS expected,
                  (CAST(s.n_obs AS DOUBLE) - t.n * s.share)
                    / sqrt((t.n * s.share) * (1.0 - s.share)) AS z,
                  CAST(floor((CAST(s.n_obs AS DOUBLE) - t.n * s.share)
                             * (CAST(s.n_obs AS DOUBLE) - t.n * s.share)
                             / (t.n * s.share) * 1e9 + 0.5) AS BIGINT)
                    AS qterm
           FROM sh s, tot t),
         chi AS (
           SELECT floor((CAST(SUM(qterm) AS DOUBLE) / 1e9) * 1e6 + 0.5)
                    / 1e6 AS chi2,
                  (CAST(SUM(qterm) AS DOUBLE) / 1e9)
                    > 5.991464547107979 AS srm_flag
           FROM scored)
         SELECT s.split, s.n_obs,
                floor(s.expected * 1e4 + 0.5) / 1e4 AS expected,
                floor(s.z * 1e6 + 0.5) / 1e6 AS z,
                c.chi2, c.srm_flag
         FROM scored s, chi c ORDER BY s.split""",

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
         FROM g""",

    "x_l_diversity" ->
      """WITH cls AS (
           SELECT c_nationkey, c_mktsegment,
                  CASE WHEN c_acctbal < 0 THEN 0
                       WHEN c_acctbal < 3333 THEN 1
                       WHEN c_acctbal < 6666 THEN 2 ELSE 3 END AS sens,
                  COUNT(*) AS r
           FROM customer GROUP BY 1, 2, 3),
         per AS (
           SELECT c_nationkey, c_mktsegment,
                  CAST(COUNT(*) AS BIGINT) AS n_distinct,
                  CAST(SUM(r) AS BIGINT) AS n,
                  CAST(MAX(r) AS BIGINT) AS r1
           FROM cls GROUP BY 1, 2),
         ent AS (
           SELECT cls.c_nationkey, cls.c_mktsegment,
                  CAST(SUM(CAST(floor(-(CAST(r AS DOUBLE) / n)
                    * ln(CAST(r AS DOUBLE) / n) * 1e9) AS BIGINT))
                    AS BIGINT) AS qent
           FROM cls JOIN per
             ON cls.c_nationkey = per.c_nationkey
            AND cls.c_mktsegment = per.c_mktsegment
           GROUP BY 1, 2)
         SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
                MIN(n_distinct) AS min_distinct_sensitive,
                CAST(SUM(CASE WHEN n_distinct < 2 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_classes_below_l2,
                floor(MIN(qent) / 1e9 * 1e6 + 0.5) / 1e6 AS min_entropy,
                CAST(SUM(CASE WHEN CAST(qent AS DOUBLE) / 1e9
                       < 0.6931471805599453 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_classes_entropy_below_ln2,
                CAST(SUM(CASE WHEN r1 * 4 >= n * 3 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_classes_recursive_fail_c3
         FROM per JOIN ent
           ON per.c_nationkey = ent.c_nationkey
          AND per.c_mktsegment = ent.c_mktsegment""",

    "x_t_closeness" ->
      """WITH cb AS MATERIALIZED (
           SELECT CAST(c_nationkey AS BIGINT) AS nk,
                  CASE WHEN c_acctbal < 0 THEN 'neg'
                       WHEN c_acctbal < 3333 THEN 'low'
                       WHEN c_acctbal < 6666 THEN 'mid'
                       ELSE 'high' END AS bkt,
                  COUNT(*) AS n
           FROM customer GROUP BY 1, 2),
         cls AS (SELECT nk, CAST(SUM(n) AS BIGINT) AS nc
                 FROM cb GROUP BY 1),
         gl AS (SELECT bkt, CAST(SUM(n) AS BIGINT) AS nb
                FROM cb GROUP BY 1),
         tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM cb),
         grid AS (SELECT cls.nk, cls.nc, gl.bkt, gl.nb
                  FROM cls CROSS JOIN gl),
         terms AS (
           SELECT g.nk, g.nc,
                  CAST(floor(abs(CAST(COALESCE(c.n, 0) AS DOUBLE) / g.nc
                                 - CAST(g.nb AS DOUBLE) / t.nn)
                             * 1e9 + 0.5) AS BIGINT) AS qterm
           FROM grid g
           LEFT JOIN cb c ON c.nk = g.nk AND c.bkt = g.bkt
           CROSS JOIN tot t),
         agg AS (
           SELECT nk, nc, CAST(SUM(qterm) AS BIGINT) AS qs
           FROM terms GROUP BY 1, 2)
         SELECT nk AS nationkey, nc AS n_class,
                floor(CAST(qs AS DOUBLE) / 1e9 * 0.5 * 1e6 + 0.5) / 1e6
                  AS tvd,
                CAST(qs AS DOUBLE) / 1e9 * 0.5 > 0.2 AS violates_t02
         FROM agg ORDER BY nationkey""",

    "x_dp_noisy_counts" -> {
      val ladder = "CASE " + DLapCdf.map { case (k, cdf) =>
        s"WHEN u < $cdf THEN CAST($k AS BIGINT)"
      }.mkString(" ") + " ELSE CAST(8 AS BIGINT) END"
      s"""WITH g AS (
           SELECT c_nationkey, COUNT(*) AS n,
                  CAST(('0x' || substr(md5('dp:' || c_nationkey), 1, 12))
                       AS BIGINT) / CAST(281474976710656.0 AS DOUBLE) AS u
           FROM customer GROUP BY 1)
         SELECT c_nationkey, GREATEST(n + ($ladder), 0) AS noisy_count
         FROM g ORDER BY c_nationkey"""
    },

    "x_freshness" ->
      """WITH hourly AS (
           SELECT event_type,
                  epoch_ms(date_trunc('hour', ts)) AS h_ms,
                  COUNT(*) AS c, MAX(ts) AS mts
           FROM events GROUP BY 1, 2),
         gm AS (SELECT MAX(mts) AS gmts, MAX(h_ms) AS gh_ms FROM hourly)
         SELECT event_type,
                CAST(SUM(c) AS BIGINT) AS n_rows,
                strftime(MAX(mts), '%Y-%m-%d %H:%M:%S') AS last_seen,
                CAST(FLOOR((epoch_ms(MAX(gmts)) - epoch_ms(MAX(mts)))
                           / 60000.0) AS BIGINT) AS lag_minutes,
                CAST(SUM(CASE WHEN h_ms >= gh_ms - 82800000
                              THEN c ELSE 0 END) AS BIGINT)
                  AS rows_last_24h
         FROM hourly, gm
         GROUP BY event_type ORDER BY event_type""",

    "x_snapshot_diff" ->
      """WITH a AS (
           SELECT o_orderkey,
                  CASE WHEN o_orderkey % 17 = 0
                       THEN CAST(round((o_totalprice - 10.0) * 100) AS BIGINT)
                       ELSE CAST(round(o_totalprice * 100) AS BIGINT)
                  END AS cents_a,
                  md5(concat_ws('|', o_orderstatus,
                    CASE WHEN o_orderkey % 13 = 0 THEN '0-STALE'
                         ELSE o_orderpriority END,
                    CAST(CASE WHEN o_orderkey % 17 = 0
                       THEN CAST(round((o_totalprice - 10.0) * 100) AS BIGINT)
                       ELSE CAST(round(o_totalprice * 100) AS BIGINT)
                    END AS VARCHAR))) AS fp_a
           FROM orders WHERE o_orderkey % 97 <> 3),
         b AS (
           SELECT o_orderkey,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents_b,
                  md5(concat_ws('|', o_orderstatus, o_orderpriority,
                    CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                         AS VARCHAR))) AS fp_b
           FROM orders WHERE o_orderkey % 89 <> 5)
         SELECT CASE WHEN fp_a IS NULL THEN 'added'
                     WHEN fp_b IS NULL THEN 'removed'
                     WHEN fp_a = fp_b THEN 'unchanged'
                     ELSE 'changed' END AS change_type,
                COUNT(*) AS n,
                CAST(COALESCE(SUM(CASE WHEN cents_a IS NOT NULL
                          AND cents_b IS NOT NULL AND cents_a <> cents_b
                          THEN cents_b - cents_a ELSE 0 END), 0) AS BIGINT)
                  AS cents_delta
         FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
         GROUP BY 1 ORDER BY 1"""
  )
}
