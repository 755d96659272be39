package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.types.Coercions.detRound
import graft.util.Tables.t

/** Censored survival analysis (r14) — the time-to-event layer the
  * engine's retention questions were missing. x_survival_curve
  * (EventOps) computes the uncensored lifetime curve its scaladoc is
  * explicit about; a real corpus never observes every spell to its
  * event, so this family implements the censored estimators proper:
  * Kaplan–Meier (1958), Nelson–Aalen (1972), the two-sample log-rank
  * test (Mantel 1966), the O/E hazard ratio with Peto CI, and the
  * restricted mean survival time.
  *
  * Spell construction (shared): for every order, the days until the
  * SAME customer's next order (event = 1, the customer "returned"), or
  * — for a customer's last observed order — the days to the fixture's
  * horizon max(o_orderdate) with event = 0 (right-censored: the next
  * order exists beyond the window, we just did not see it). The spell
  * window is a per-customer partitioned lead (never a global sort);
  * everything downstream runs on the (duration, group) day-grain
  * HISTOGRAM, so windows order O(distinct days) rows — the x_mannwhitney
  * posture — and the fact table is touched exactly once per op.
  *
  * Cross-engine arithmetic discipline: at-risk counts and event counts
  * are exact integers from the histogram cumsum; every per-time ratio
  * term (d/n for the hazard, d·n1/n for the log-rank expectation) is
  * quantized to 1e9 fixed point BEFORE the cumulative/total sum (the
  * x_pagerank rule — sums of integers are order-free), and the KM
  * product runs as an integer-quantized log-sum with an explicit
  * S = 0 latch for the n = d boundary so ln(0) never enters either
  * engine. */
object SurvivalOps {

  /** grp: urgent/high priority orders open 'hi' spells — the two-sample
    * factor the log-rank family compares. */
  private def spellsFrame(s: SparkSession, d: String): DataFrame = {
    val orders = t(s, d, "orders")
    val mx = orders.agg(max(col("o_orderdate")).as("mxd"))
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "hi")
          .otherwise("lo").as("grp"))
      .withColumn("nxt", lead(col("o_orderdate"), 1).over(w))
      .crossJoin(broadcast(mx))
      .select(
        when(col("nxt").isNotNull, datediff(col("nxt"), col("o_orderdate")))
          .otherwise(datediff(col("mxd"), col("o_orderdate")))
          .cast("long").as("dur"),
        when(col("nxt").isNotNull, 1L).otherwise(0L).as("event"),
        col("grp"))
  }

  private val spellsSql =
    """mx AS (SELECT max(o_orderdate) AS mxd FROM orders),
       sp AS (
         SELECT o_custkey,
                CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 'hi' ELSE 'lo' END AS grp,
                o_orderdate,
                lead(o_orderdate) OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey) AS nxt
         FROM orders),
       spells AS (
         SELECT CASE WHEN nxt IS NOT NULL THEN
                  date_diff('day', CAST(o_orderdate AS DATE),
                            CAST(nxt AS DATE))
                ELSE
                  date_diff('day', CAST(o_orderdate AS DATE),
                            CAST((SELECT mxd FROM mx) AS DATE))
                END AS dur,
                CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END AS event,
                grp
         FROM sp)"""

  /** (t_days, n_risk, d_events, qln, zflag) event-time rows: the KM
    * ladder's integer core, shared by the curve and the RMST integral.
    * zflag latches S = 0 where the whole risk set dies (n = d). */
  private def kmEventRows(s: SparkSession, d: String): DataFrame = {
    val spells = spellsFrame(s, d).localCheckpoint()
    val tot = spells.agg(count(lit(1)).as("ntot"))
    val hist = spells.groupBy("dur")
      .agg(count(lit(1)).as("m"), sum(col("event")).as("dd"))
    val w = Window.orderBy("dur")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist.crossJoin(broadcast(tot))
      .withColumn("cum", sum(col("m")).over(w))
      .withColumn("n_risk", col("ntot") - col("cum") + col("m"))
      .filter(col("dd") > 0)
      .withColumn("qln", when(col("dd") < col("n_risk"),
        floor(log((col("n_risk") - col("dd")).cast("double") /
          col("n_risk").cast("double")) * 1e9).cast("long"))
        .otherwise(lit(0L)))
      .withColumn("zflag",
        when(col("dd") >= col("n_risk"), 1L).otherwise(0L))
      .select(col("dur").as("t_days"), col("n_risk"),
        col("dd").as("d_events"), col("qln"), col("zflag"))
  }

  private val kmEventRowsSql =
    s"""$spellsSql,
       hist AS (SELECT dur, COUNT(*) AS m, CAST(SUM(event) AS BIGINT) AS dd
                FROM spells GROUP BY 1),
       tot AS (SELECT COUNT(*) AS ntot FROM spells),
       risk AS (
         SELECT dur, m, dd,
                CAST(ntot - SUM(m) OVER (ORDER BY dur ROWS BETWEEN
                  UNBOUNDED PRECEDING AND CURRENT ROW) + m AS BIGINT)
                  AS n_risk
         FROM hist, tot),
       ev AS (
         SELECT dur AS t_days, n_risk, dd AS d_events,
                CASE WHEN dd < n_risk THEN
                  CAST(floor(ln(CAST(n_risk - dd AS DOUBLE)
                    / CAST(n_risk AS DOUBLE)) * 1e9) AS BIGINT)
                ELSE 0 END AS qln,
                CASE WHEN dd >= n_risk THEN 1 ELSE 0 END AS zflag
         FROM risk WHERE dd > 0)"""

  /** The quantized KM ladder (t_days, n_risk, d_events, survival). */
  private def kmLadder(s: SparkSession, d: String): DataFrame = {
    val w = Window.orderBy("t_days")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    kmEventRows(s, d)
      .withColumn("qcum", sum(col("qln")).over(w))
      .withColumn("zcum", sum(col("zflag")).over(w))
      .select(col("t_days"), col("n_risk"), col("d_events"),
        when(col("zcum") > 0, lit(0.0))
          .otherwise(floor(exp(col("qcum") / 1e9) * 1e6 + 0.5) / 1e6)
          .as("survival"))
  }

  private val kmLadderSql =
    s"""$kmEventRowsSql,
       km AS (
         SELECT t_days, n_risk, d_events,
                CAST(CASE WHEN SUM(zflag) OVER (ORDER BY t_days ROWS
                       BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) > 0
                     THEN 0.0
                     ELSE floor(exp(CAST(SUM(qln) OVER (ORDER BY t_days
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS DOUBLE) / 1e9) * 1e6 + 0.5) / 1e6
                END AS DOUBLE) AS survival
         FROM ev)"""

  /** Per-event-time two-sample table for the log-rank family:
    * (t, n1, n0, d1, d0) with quantized E1/E0/V terms. */
  private def logrankRows(s: SparkSession, d: String): DataFrame = {
    val spells = spellsFrame(s, d).localCheckpoint()
    val gh = spells.groupBy("dur", "grp")
      .agg(count(lit(1)).as("m"), sum(col("event")).as("dd"))
    val wide = gh.groupBy("dur").agg(
      sum(when(col("grp") === "hi", col("m")).otherwise(0L)).as("m1"),
      sum(when(col("grp") === "hi", col("dd")).otherwise(0L)).as("d1"),
      sum(when(col("grp") === "lo", col("m")).otherwise(0L)).as("m0"),
      sum(when(col("grp") === "lo", col("dd")).otherwise(0L)).as("d0"))
    // group totals as CONDITIONAL SUMS in one agg (the oracle's shape):
    // filtering to 'hi'/'lo' rows and crossJoining collapsed the whole
    // result to zero rows when either group was absent, while the oracle
    // kept rows with nt = 0 — single-group datasets diverged (r15 ADVICE)
    val tots = spells.agg(
      sum(when(col("grp") === "hi", 1L).otherwise(0L)).as("nt1"),
      sum(when(col("grp") === "lo", 1L).otherwise(0L)).as("nt0"))
    val w = Window.orderBy("dur")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wide.crossJoin(broadcast(tots))
      .withColumn("c1", sum(col("m1")).over(w))
      .withColumn("c0", sum(col("m0")).over(w))
      .withColumn("n1", col("nt1") - col("c1") + col("m1"))
      .withColumn("n0", col("nt0") - col("c0") + col("m0"))
      .withColumn("dd", col("d1") + col("d0"))
      .withColumn("n", col("n1") + col("n0"))
      .filter(col("dd") > 0)
      .withColumn("qe1", floor(col("dd").cast("double") * col("n1")
        / col("n") * 1e9).cast("long"))
      .withColumn("qe0", floor(col("dd").cast("double") * col("n0")
        / col("n") * 1e9).cast("long"))
      .withColumn("qv", when(col("n") > 1,
        floor(col("dd").cast("double") * col("n1") / col("n")
          * (col("n0").cast("double") / col("n"))
          * ((col("n") - col("dd")).cast("double") / (col("n") - 1))
          * 1e9).cast("long")).otherwise(lit(0L)))
  }

  private val logrankRowsSql =
    s"""$spellsSql,
       gh AS (SELECT dur, grp, COUNT(*) AS m,
                     CAST(SUM(event) AS BIGINT) AS dd
              FROM spells GROUP BY 1, 2),
       wide AS (
         SELECT dur,
                CAST(SUM(CASE WHEN grp = 'hi' THEN m ELSE 0 END)
                     AS BIGINT) AS m1,
                CAST(SUM(CASE WHEN grp = 'hi' THEN dd ELSE 0 END)
                     AS BIGINT) AS d1,
                CAST(SUM(CASE WHEN grp = 'lo' THEN m ELSE 0 END)
                     AS BIGINT) AS m0,
                CAST(SUM(CASE WHEN grp = 'lo' THEN dd ELSE 0 END)
                     AS BIGINT) AS d0
         FROM gh GROUP BY 1),
       tots AS (
         SELECT CAST(SUM(CASE WHEN grp = 'hi' THEN 1 ELSE 0 END)
                     AS BIGINT) AS nt1,
                CAST(SUM(CASE WHEN grp = 'lo' THEN 1 ELSE 0 END)
                     AS BIGINT) AS nt0
         FROM spells),
       r AS (
         SELECT dur, m1, d1, m0, d0,
                CAST(nt1 - SUM(m1) OVER (ORDER BY dur ROWS BETWEEN
                  UNBOUNDED PRECEDING AND CURRENT ROW) + m1 AS BIGINT)
                  AS n1,
                CAST(nt0 - SUM(m0) OVER (ORDER BY dur ROWS BETWEEN
                  UNBOUNDED PRECEDING AND CURRENT ROW) + m0 AS BIGINT)
                  AS n0
         FROM wide, tots),
       lr AS (
         SELECT dur, n1, n0, d1, d0, d1 + d0 AS dd, n1 + n0 AS n,
                CAST(floor(CAST(d1 + d0 AS DOUBLE) * n1 / (n1 + n0) * 1e9)
                     AS BIGINT) AS qe1,
                CAST(floor(CAST(d1 + d0 AS DOUBLE) * n0 / (n1 + n0) * 1e9)
                     AS BIGINT) AS qe0,
                CASE WHEN n1 + n0 > 1 THEN
                  CAST(floor(CAST(d1 + d0 AS DOUBLE) * n1 / (n1 + n0)
                    * (CAST(n0 AS DOUBLE) / (n1 + n0))
                    * (CAST(n1 + n0 - (d1 + d0) AS DOUBLE)
                       / (n1 + n0 - 1)) * 1e9) AS BIGINT)
                ELSE 0 END AS qv
         FROM r WHERE d1 + d0 > 0)"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "x_kaplan_meier" -> ((s, d) => {
      // the censored survival curve proper: S(t) = Π (1 − d_i/n_i) over
      // event days, with the last spell of every customer right-censored
      // at the fixture horizon. The product runs as an integer-quantized
      // log-sum (order-free), with an S = 0 latch for an n = d day.
      kmLadder(s, d).orderBy("t_days")
    }),

    "x_nelson_aalen" -> ((s, d) => {
      // cumulative hazard H(t) = Σ d_i/n_i — the estimator of choice
      // when the hazard (not the survival fraction) is the readout,
      // and the exact-arithmetic sibling of KM: every per-day term is a
      // ratio of integers quantized to 1e9 before the cumsum, so there
      // is no transcendental anywhere and the twin match is exact by
      // construction.
      val w = Window.orderBy("t_days")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      kmEventRows(s, d)
        .withColumn("qh", floor(col("d_events").cast("double")
          / col("n_risk") * 1e9).cast("long"))
        .withColumn("qcum", sum(col("qh")).over(w))
        .select(col("t_days"), col("n_risk"), col("d_events"),
          detRound(col("qcum") / 1e9, 6).as("cum_hazard"))
        .orderBy("t_days")
    }),

    "x_logrank_test" -> ((s, d) => {
      // two-sample log-rank: do urgent/high-priority orders lead to a
      // different re-order hazard than low-priority ones? At each event
      // day the observed hi-group events are compared with the
      // hypergeometric expectation d·n1/n; χ² = (O1 − E1)²/V, df = 1.
      // All O are exact integers; E and V sum quantized terms.
      // sqv = 0 (no event day with both groups at risk) makes the χ²
      // division engine-dependent NaN/Inf — NULL stats instead, the
      // same guard x_cox_one_step and x_hazard_ratio already apply.
      val okv = col("sqv") > 0
      logrankRows(s, d)
        .agg(count(lit(1)).as("n_event_days"),
          sum(col("d1")).cast("long").as("observed_hi"),
          sum(col("d0")).cast("long").as("observed_lo"),
          sum(col("qe1")).as("sqe1"), sum(col("qv")).as("sqv"))
        .select(col("n_event_days"), col("observed_hi"),
          col("observed_lo"),
          detRound(col("sqe1") / 1e9, 6).as("expected_hi"),
          detRound(when(okv, pow(col("observed_hi") - col("sqe1") / 1e9, 2)
            / (col("sqv") / 1e9)), 6).as("chi2"),
          when(okv, pow(col("observed_hi") - col("sqe1") / 1e9, 2)
            / (col("sqv") / 1e9) > 3.841458821).as("significant_05"))
    }),

    "x_hazard_ratio" -> ((s, d) => {
      // O/E hazard ratio with the Peto log-rank CI: HR =
      // (O1/E1)/(O0/E0), CI = exp(ln HR ± 1.96·√(1/E1 + 1/E0)). The
      // one-number effect size next to x_logrank_test's verdict.
      // a zero observed count or expectation in either group makes the
      // O/E ratio or ln(HR) diverge engine-dependently — emit NULL
      // stats instead (the x_rate_ratio guard discipline)
      val ok = col("o1") > 0 && col("o0") > 0 &&
        col("sqe1") > 0 && col("sqe0") > 0
      logrankRows(s, d)
        .agg(sum(col("d1")).cast("long").as("o1"),
          sum(col("d0")).cast("long").as("o0"),
          sum(col("qe1")).as("sqe1"), sum(col("qe0")).as("sqe0"))
        .select(col("o1"), col("o0"),
          detRound(col("sqe1") / 1e9, 6).as("e1"),
          detRound(col("sqe0") / 1e9, 6).as("e0"),
          detRound(when(ok, (col("o1") / (col("sqe1") / 1e9))
            / (col("o0") / (col("sqe0") / 1e9))), 6).as("hazard_ratio"),
          detRound(when(ok, exp(log((col("o1") / (col("sqe1") / 1e9))
            / (col("o0") / (col("sqe0") / 1e9)))
            - lit(1.96) * sqrt(lit(1e9) / col("sqe1")
              + lit(1e9) / col("sqe0")))), 6).as("ci_lo"),
          detRound(when(ok, exp(log((col("o1") / (col("sqe1") / 1e9))
            / (col("o0") / (col("sqe0") / 1e9)))
            + lit(1.96) * sqrt(lit(1e9) / col("sqe1")
              + lit(1e9) / col("sqe0")))), 6).as("ci_hi"))
    }),

    "x_cox_one_step" -> ((s, d) => {
      // one-step Cox partial-likelihood estimator for the binary
      // priority covariate: starting from β = 0 the score is the
      // log-rank numerator U = O1 − E1 and the information is the
      // log-rank variance V, so β̂ = U/V is the textbook one-Newton-step
      // estimate of the log hazard ratio, with the score CI
      // exp(β̂ ± 1.96/√V) — the semiparametric regression view of the
      // same per-day table x_logrank_test verdicts on.
      // sqv = 0 (no events, or a single group at every event day) makes
      // β = x/0 diverge engine-dependently — emit NULL stats instead
      // (the x_rate_ratio guard discipline)
      val okv = col("sqv") > 0
      logrankRows(s, d)
        .agg(sum(col("d1")).cast("long").as("o1"),
          sum(col("qe1")).as("sqe1"), sum(col("qv")).as("sqv"))
        .select(col("o1"),
          detRound(col("sqe1") / 1e9, 6).as("e1"),
          detRound(col("sqv") / 1e9, 6).as("information"),
          detRound(when(okv, (col("o1") - col("sqe1") / 1e9)
            / (col("sqv") / 1e9)), 6).as("beta_hat"),
          detRound(when(okv, exp((col("o1") - col("sqe1") / 1e9)
            / (col("sqv") / 1e9))), 6).as("hr_one_step"),
          detRound(when(okv, exp((col("o1") - col("sqe1") / 1e9)
            / (col("sqv") / 1e9)
            - lit(1.96) / sqrt(col("sqv") / 1e9))), 6).as("ci_lo"),
          detRound(when(okv, exp((col("o1") - col("sqe1") / 1e9)
            / (col("sqv") / 1e9)
            + lit(1.96) / sqrt(col("sqv") / 1e9))), 6).as("ci_hi"),
          detRound(when(okv, (col("o1") - col("sqe1") / 1e9)
            / sqrt(col("sqv") / 1e9)), 6).as("score_z"))
    }),

    "x_cumulative_incidence" -> ((s, d) => {
      // competing-risks cumulative incidence (Aalen–Johansen for two
      // terminal causes): a spell "ends" either into an urgent/high
      // next order or a medium/low one — the 1 − KM complement is WRONG
      // per cause (it treats the other cause as censoring and
      // overstates both), so the CIF sums S(t⁻)·d_k/n over event days:
      // the probability of having re-ordered VIA cause k by t. S(t⁻)
      // is the all-cause KM at the previous event day (exclusive-window
      // quantized log-sum); each increment quantizes to 1e9 before the
      // cumsum, so CIF_hi + CIF_lo + S(t) ≈ 1 holds to rounding by
      // construction.
      val orders = t(s, d, "orders")
      val mx = orders.agg(max(col("o_orderdate")).as("mxd"))
      val w0 = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val spells = orders
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority"))
        .withColumn("nxt", lead(col("o_orderdate"), 1).over(w0))
        .withColumn("nxtp", lead(col("o_orderpriority"), 1).over(w0))
        .crossJoin(broadcast(mx))
        .select(
          when(col("nxt").isNotNull,
            datediff(col("nxt"), col("o_orderdate")))
            .otherwise(datediff(col("mxd"), col("o_orderdate")))
            .cast("long").as("dur"),
          when(col("nxt").isNull, 0L)
            .when(col("nxtp").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(2L).as("cause"))
        .localCheckpoint()
      val tot = spells.agg(count(lit(1)).as("ntot"))
      val hist = spells.groupBy("dur")
        .agg(count(lit(1)).as("m"),
          sum(when(col("cause") === 1L, 1L).otherwise(0L)).as("d1"),
          sum(when(col("cause") === 2L, 1L).otherwise(0L)).as("d2"))
      val w = Window.orderBy("dur")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wx = Window.orderBy("dur")
        .rowsBetween(Window.unboundedPreceding, -1)
      val ev = hist.crossJoin(broadcast(tot))
        .withColumn("cum", sum(col("m")).over(w))
        .withColumn("n_risk", col("ntot") - col("cum") + col("m"))
        .withColumn("dd", col("d1") + col("d2"))
        .filter(col("dd") > 0)
        .withColumn("qln", when(col("dd") < col("n_risk"),
          floor(log((col("n_risk") - col("dd")).cast("double") /
            col("n_risk").cast("double")) * 1e9).cast("long"))
          .otherwise(lit(0L)))
        .withColumn("zflag",
          when(col("dd") >= col("n_risk"), 1L).otherwise(0L))
      ev
        .withColumn("qprev", coalesce(sum(col("qln")).over(wx), lit(0L)))
        .withColumn("zprev", coalesce(sum(col("zflag")).over(wx), lit(0L)))
        .withColumn("sprev", when(col("zprev") > 0, lit(0.0))
          .otherwise(exp(col("qprev") / 1e9)))
        .withColumn("qi1", floor(col("sprev") * col("d1")
          / col("n_risk") * 1e9).cast("long"))
        .withColumn("qi2", floor(col("sprev") * col("d2")
          / col("n_risk") * 1e9).cast("long"))
        .withColumn("qc1", sum(col("qi1")).over(w))
        .withColumn("qc2", sum(col("qi2")).over(w))
        .select(col("dur").as("t_days"), col("n_risk"),
          col("d1").as("d_hi"), col("d2").as("d_lo"),
          detRound(col("qc1") / 1e9, 6).as("cif_hi"),
          detRound(col("qc2") / 1e9, 6).as("cif_lo"))
        .orderBy("t_days")
    }),

    "x_restricted_mean_survival" -> ((s, d) => {
      // RMST(τ = 365): ∫₀^τ S(t) dt — "expected re-order-free days in
      // the first year", the censoring-robust effect scale regulators
      // ask for when hazards are non-proportional. The step integral
      // sums S_{i−1}·(min(t_i,τ) − min(t_{i−1},τ)) plus the tail
      // S_last·(τ − t_last); S carries 6 decimals and widths are whole
      // days, so every term is exact in 1e6 fixed point.
      val km = kmLadder(s, d)
      // spell-count identities, not a second spell build (every order
      // opens exactly one spell; each customer's LAST order is the one
      // censored spell) — a narrow count instead of re-running the
      // per-customer lead window
      val nn = t(s, d, "orders").agg(count(lit(1)).as("n_spells"),
        (count(lit(1)) - countDistinct(col("o_custkey"))).cast("long")
          .as("n_events"))
      val w = Window.orderBy("t_days")
      val terms = km
        .withColumn("pt", lag(col("t_days"), 1, 0L).over(w))
        .withColumn("ps", lag(col("survival"), 1, 1.0).over(w))
        .withColumn("qterm", floor(col("ps") * 1e6 + 0.5).cast("long")
          * (least(col("t_days"), lit(365L))
            - least(col("pt"), lit(365L))))
      val tail = km.agg(max(struct(col("t_days"), col("survival")))
          .as("mx"))
        .select((floor(col("mx.survival") * 1e6 + 0.5).cast("long")
          * (lit(365L) - least(col("mx.t_days"), lit(365L))))
          .as("qtail"))
      terms.agg(sum(col("qterm")).as("qsum"))
        .crossJoin(broadcast(tail))
        .crossJoin(broadcast(nn))
        .select(lit(365L).as("tau_days"), col("n_spells"),
          col("n_events"),
          detRound((col("qsum") + col("qtail")) / 1e6, 4).as("rmst_days"))
    }),

    "x_weibull_fit" -> ((s, d) => {
      // Parametric Weibull fit over the KM curve — the smooth-model tier
      // above the nonparametric estimators: median-rank regression
      // (Weibull probability plotting, the standard reliability-
      // engineering estimator) linearizes S(t) = exp(−(t/λ)^k) to
      // ln(−ln S) = k·ln t − k·ln λ and fits OLS over the KM ladder's
      // (t, S) points with 0 < S < 1 and t > 0 — O(distinct event days)
      // points, everything downstream of the one shared spell pass.
      // Both regression coordinates are 1e9-quantized BEFORE the OLS
      // sums and every cross term is an exact DECIMAL(38,0) sum of
      // quantized products, so slope/intercept/r² come from identical
      // integer inputs in both engines. Outputs: shape k (k > 1 ⇒
      // rising re-order hazard, k < 1 ⇒ infant-mortality churn), scale
      // λ (the 63.2% characteristic life), the fitted median
      // λ·(ln 2)^{1/k}, and r² as the goodness-of-linearization gauge.
      val pts = kmLadder(s, d)
        .filter(col("survival") > 0.0 && col("survival") < 1.0 &&
          col("t_days") > 0)
        .select(
          floor(log(col("t_days").cast("double")) * 1e9 + 0.5)
            .cast("decimal(19,0)").as("qx"),
          floor(log(-log(col("survival"))) * 1e9 + 0.5)
            .cast("decimal(19,0)").as("qy"))
      pts.agg(count(lit(1)).cast("long").as("np"),
          sum(col("qx")).cast("decimal(38,0)").as("sx"),
          sum(col("qy")).cast("decimal(38,0)").as("sy"),
          sum(col("qx") * col("qx")).cast("decimal(38,0)").as("sxx"),
          sum(col("qy") * col("qy")).cast("decimal(38,0)").as("syy"),
          sum(col("qx") * col("qy")).cast("decimal(38,0)").as("sxy"))
        .withColumn("vx", col("np") * col("sxx").cast("double")
          - col("sx").cast("double") * col("sx").cast("double"))
        .withColumn("vy", col("np") * col("syy").cast("double")
          - col("sy").cast("double") * col("sy").cast("double"))
        .withColumn("cxy", col("np") * col("sxy").cast("double")
          - col("sx").cast("double") * col("sy").cast("double"))
        .withColumn("kk", when(col("vx") > 0, col("cxy") / col("vx")))
        .withColumn("ic", (col("sy").cast("double") - col("kk")
          * col("sx").cast("double")) / col("np") / 1e9)
        .withColumn("lam", when(col("kk") > 0,
          exp(-col("ic") / col("kk"))))
        .select(col("np").as("n_points"),
          detRound(col("kk"), 6).as("shape_k"),
          detRound(col("lam"), 4).as("scale_lambda"),
          detRound(col("lam") * exp(log(log(lit(2.0))) / col("kk")), 4)
            .as("median_days"),
          detRound(when(col("vx") > 0 && col("vy") > 0,
            col("cxy") * col("cxy") / (col("vx") * col("vy"))), 6)
            .as("r_squared"))
    }))

  def oracleSql: Map[String, String] = Map(

    "x_kaplan_meier" ->
      s"""WITH $kmLadderSql
          SELECT t_days, n_risk, d_events, survival
          FROM km ORDER BY t_days""",

    "x_nelson_aalen" ->
      s"""WITH $kmEventRowsSql,
          na AS (
            SELECT t_days, n_risk, d_events,
                   SUM(CAST(floor(CAST(d_events AS DOUBLE) / n_risk * 1e9)
                            AS BIGINT))
                     OVER (ORDER BY t_days ROWS BETWEEN UNBOUNDED
                           PRECEDING AND CURRENT ROW) AS qcum
            FROM ev)
          SELECT t_days, n_risk, d_events,
                 floor(CAST(qcum AS DOUBLE) / 1e9 * 1e6 + 0.5) / 1e6
                   AS cum_hazard
          FROM na ORDER BY t_days""",

    "x_logrank_test" ->
      s"""WITH $logrankRowsSql,
          agg AS (
            SELECT COUNT(*) AS n_event_days,
                   CAST(SUM(d1) AS BIGINT) AS observed_hi,
                   CAST(SUM(d0) AS BIGINT) AS observed_lo,
                   CAST(SUM(qe1) AS BIGINT) AS sqe1,
                   CAST(SUM(qv) AS BIGINT) AS sqv
            FROM lr)
          SELECT n_event_days, observed_hi, observed_lo,
                 floor(sqe1 / 1e9 * 1e6 + 0.5) / 1e6 AS expected_hi,
                 CAST(CASE WHEN sqv > 0 THEN
                   floor(pow(observed_hi - sqe1 / 1e9, 2) / (sqv / 1e9)
                     * 1e6 + 0.5) / 1e6 END AS DOUBLE) AS chi2,
                 CASE WHEN sqv > 0 THEN
                   pow(observed_hi - sqe1 / 1e9, 2) / (sqv / 1e9)
                     > 3.841458821 END AS significant_05
          FROM agg""",

    "x_hazard_ratio" ->
      s"""WITH $logrankRowsSql,
          agg AS (
            SELECT CAST(SUM(d1) AS BIGINT) AS o1,
                   CAST(SUM(d0) AS BIGINT) AS o0,
                   CAST(SUM(qe1) AS BIGINT) AS sqe1,
                   CAST(SUM(qe0) AS BIGINT) AS sqe0
            FROM lr)
          SELECT o1, o0,
                 floor(sqe1 / 1e9 * 1e6 + 0.5) / 1e6 AS e1,
                 floor(sqe0 / 1e9 * 1e6 + 0.5) / 1e6 AS e0,
                 CASE WHEN o1 > 0 AND o0 > 0 AND sqe1 > 0 AND sqe0 > 0
                 THEN floor((o1 / (sqe1 / 1e9)) / (o0 / (sqe0 / 1e9))
                   * 1e6 + 0.5) / 1e6 END AS hazard_ratio,
                 CASE WHEN o1 > 0 AND o0 > 0 AND sqe1 > 0 AND sqe0 > 0
                 THEN floor(exp(ln((o1 / (sqe1 / 1e9))
                     / (o0 / (sqe0 / 1e9)))
                   - 1.96 * sqrt(1e9 / sqe1 + 1e9 / sqe0)) * 1e6 + 0.5)
                   / 1e6 END AS ci_lo,
                 CASE WHEN o1 > 0 AND o0 > 0 AND sqe1 > 0 AND sqe0 > 0
                 THEN floor(exp(ln((o1 / (sqe1 / 1e9))
                     / (o0 / (sqe0 / 1e9)))
                   + 1.96 * sqrt(1e9 / sqe1 + 1e9 / sqe0)) * 1e6 + 0.5)
                   / 1e6 END AS ci_hi
          FROM agg""",

    "x_cox_one_step" ->
      s"""WITH $logrankRowsSql,
          agg AS (
            SELECT CAST(SUM(d1) AS BIGINT) AS o1,
                   CAST(SUM(qe1) AS BIGINT) AS sqe1,
                   CAST(SUM(qv) AS BIGINT) AS sqv
            FROM lr)
          SELECT o1,
                 floor(sqe1 / 1e9 * 1e6 + 0.5) / 1e6 AS e1,
                 floor(sqv / 1e9 * 1e6 + 0.5) / 1e6 AS information,
                 CASE WHEN sqv > 0 THEN
                   floor((o1 - sqe1 / 1e9) / (sqv / 1e9) * 1e6 + 0.5)
                   / 1e6 END AS beta_hat,
                 CASE WHEN sqv > 0 THEN
                   floor(exp((o1 - sqe1 / 1e9) / (sqv / 1e9)) * 1e6 + 0.5)
                   / 1e6 END AS hr_one_step,
                 CASE WHEN sqv > 0 THEN
                   floor(exp((o1 - sqe1 / 1e9) / (sqv / 1e9)
                     - 1.96 / sqrt(sqv / 1e9)) * 1e6 + 0.5) / 1e6
                 END AS ci_lo,
                 CASE WHEN sqv > 0 THEN
                   floor(exp((o1 - sqe1 / 1e9) / (sqv / 1e9)
                     + 1.96 / sqrt(sqv / 1e9)) * 1e6 + 0.5) / 1e6
                 END AS ci_hi,
                 CASE WHEN sqv > 0 THEN
                   floor((o1 - sqe1 / 1e9) / sqrt(sqv / 1e9) * 1e6 + 0.5)
                   / 1e6 END AS score_z
          FROM agg""",

    "x_cumulative_incidence" ->
      """WITH mx AS (SELECT max(o_orderdate) AS mxd FROM orders),
         sp AS (
           SELECT o_custkey, o_orderdate,
                  lead(o_orderdate) OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey) AS nxt,
                  lead(o_orderpriority) OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey) AS nxtp
           FROM orders),
         spells AS (
           SELECT CASE WHEN nxt IS NOT NULL THEN
                    date_diff('day', CAST(o_orderdate AS DATE),
                              CAST(nxt AS DATE))
                  ELSE
                    date_diff('day', CAST(o_orderdate AS DATE),
                              CAST((SELECT mxd FROM mx) AS DATE))
                  END AS dur,
                  CASE WHEN nxt IS NULL THEN 0
                       WHEN nxtp IN ('1-URGENT', '2-HIGH') THEN 1
                       ELSE 2 END AS cause
           FROM sp),
         hist AS (
           SELECT dur, COUNT(*) AS m,
                  CAST(SUM(CASE WHEN cause = 1 THEN 1 ELSE 0 END)
                       AS BIGINT) AS d1,
                  CAST(SUM(CASE WHEN cause = 2 THEN 1 ELSE 0 END)
                       AS BIGINT) AS d2
           FROM spells GROUP BY 1),
         tot AS (SELECT COUNT(*) AS ntot FROM spells),
         risk AS (
           SELECT dur, d1, d2, d1 + d2 AS dd,
                  CAST(ntot - SUM(m) OVER (ORDER BY dur ROWS BETWEEN
                    UNBOUNDED PRECEDING AND CURRENT ROW) + m AS BIGINT)
                    AS n_risk
           FROM hist, tot),
         ev AS (
           SELECT dur, n_risk, d1, d2, dd,
                  CASE WHEN dd < n_risk THEN
                    CAST(floor(ln(CAST(n_risk - dd AS DOUBLE)
                      / CAST(n_risk AS DOUBLE)) * 1e9) AS BIGINT)
                  ELSE 0 END AS qln,
                  CASE WHEN dd >= n_risk THEN 1 ELSE 0 END AS zflag
           FROM risk WHERE dd > 0),
         pv AS (
           SELECT dur, n_risk, d1, d2,
                  COALESCE(SUM(qln) OVER (ORDER BY dur ROWS BETWEEN
                    UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS qprev,
                  COALESCE(SUM(zflag) OVER (ORDER BY dur ROWS BETWEEN
                    UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS zprev
           FROM ev),
         inc AS (
           SELECT dur, n_risk, d1, d2,
                  CAST(floor(CASE WHEN zprev > 0 THEN 0.0
                    ELSE exp(CAST(qprev AS DOUBLE) / 1e9) END
                    * d1 / n_risk * 1e9) AS BIGINT) AS qi1,
                  CAST(floor(CASE WHEN zprev > 0 THEN 0.0
                    ELSE exp(CAST(qprev AS DOUBLE) / 1e9) END
                    * d2 / n_risk * 1e9) AS BIGINT) AS qi2
           FROM pv)
         SELECT dur AS t_days, n_risk, d1 AS d_hi, d2 AS d_lo,
                floor(CAST(SUM(qi1) OVER (ORDER BY dur ROWS BETWEEN
                  UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 1e9
                  * 1e6 + 0.5) / 1e6 AS cif_hi,
                floor(CAST(SUM(qi2) OVER (ORDER BY dur ROWS BETWEEN
                  UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 1e9
                  * 1e6 + 0.5) / 1e6 AS cif_lo
         FROM inc ORDER BY t_days""",

    "x_restricted_mean_survival" ->
      s"""WITH $kmLadderSql,
          nn AS (SELECT COUNT(*) AS n_spells,
                        CAST(COUNT(*) - COUNT(DISTINCT o_custkey)
                             AS BIGINT) AS n_events
                 FROM orders),
          terms AS (
            SELECT CAST(floor(lag(survival, 1, CAST(1.0 AS DOUBLE))
                     OVER (ORDER BY t_days) * 1e6 + 0.5) AS BIGINT)
                   * (least(t_days, 365)
                      - least(lag(t_days, 1, 0) OVER (ORDER BY t_days),
                              365)) AS qterm
            FROM km),
          tail AS (
            SELECT CAST(floor(max_by(survival, t_days) * 1e6 + 0.5)
                     AS BIGINT)
                   * (365 - least(max(t_days), 365)) AS qtail
            FROM km)
          SELECT CAST(365 AS BIGINT) AS tau_days, n_spells, n_events,
                 floor((CAST((SELECT SUM(qterm) FROM terms) AS DOUBLE)
                   + (SELECT qtail FROM tail)) / 1e6 * 1e4 + 0.5) / 1e4
                   AS rmst_days
          FROM nn""",

    "x_weibull_fit" ->
      s"""WITH $kmLadderSql,
          pts AS (
            SELECT CAST(floor(ln(CAST(t_days AS DOUBLE)) * 1e9 + 0.5)
                     AS HUGEINT) AS qx,
                   CAST(floor(ln(-ln(survival)) * 1e9 + 0.5)
                     AS HUGEINT) AS qy
            FROM km
            WHERE survival > 0.0 AND survival < 1.0 AND t_days > 0),
          st AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS np,
                   CAST(SUM(qx) AS DOUBLE) AS sx,
                   CAST(SUM(qy) AS DOUBLE) AS sy,
                   CAST(SUM(qx * qx) AS DOUBLE) AS sxx,
                   CAST(SUM(qy * qy) AS DOUBLE) AS syy,
                   CAST(SUM(qx * qy) AS DOUBLE) AS sxy
            FROM pts),
          ols AS (
            SELECT np,
                   np * sxx - sx * sx AS vx,
                   np * syy - sy * sy AS vy,
                   np * sxy - sx * sy AS cxy,
                   sx, sy
            FROM st),
          ft AS (
            SELECT np, vx, vy, cxy,
                   CASE WHEN vx > 0 THEN cxy / vx END AS kk,
                   (sy - (CASE WHEN vx > 0 THEN cxy / vx END) * sx)
                     / np / 1e9 AS ic
            FROM ols),
          fin AS (
            SELECT np, vx, vy, cxy, kk,
                   CASE WHEN kk > 0 THEN exp(-ic / kk) END AS lam
            FROM ft)
          SELECT np AS n_points,
                 floor(kk * 1e6 + 0.5) / 1e6 AS shape_k,
                 floor(lam * 1e4 + 0.5) / 1e4 AS scale_lambda,
                 floor(lam * exp(ln(ln(2.0)) / kk) * 1e4 + 0.5) / 1e4
                   AS median_days,
                 floor(CASE WHEN vx > 0 AND vy > 0
                       THEN cxy * cxy / (vx * vy) END * 1e6 + 0.5) / 1e6
                   AS r_squared
          FROM fin""")
}
