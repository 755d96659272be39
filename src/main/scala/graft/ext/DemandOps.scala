package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.types.Coercions.{detRound, fmtD, revenue}
import graft.util.Num.lit17
import graft.util.Tables.t

/** Inventory / demand-planning operators (r15) — the decision layer the
  * reference's schema exists to feed. The reference loads products,
  * per-depot stock and order lines into PostgreSQL explicitly "for later
  * analysis and dashboard creation" (reference README.md:3, DDL at
  * tiny_api_v2_cliente.py:84-89); q_stock_coverage already answers
  * "how long does current stock last" — this family answers the NEXT
  * questions a planner asks: what is the demand forecast for a sparse
  * series (Croston), how much buffer does a service level require
  * (safety stock / reorder point), and what single-period stock level
  * maximizes expected profit (newsvendor critical fractile).
  *
  * Shared grain: per-brand daily shipped quantity. The brand dimension
  * is bounded (25 values) and broadcast; the one fact-table pass is a
  * groupBy to (brand, day) with map-side partials, so the shuffle is
  * O(brands × days) at any corpus size — every estimator downstream
  * runs on that day-grain table (the SurvivalOps histogram posture).
  * Demand days are genuinely intermittent on the fixture (~40% of
  * calendar days have no demand per brand), which is exactly the
  * regime Croston (1972) was built for.
  *
  * Cross-engine arithmetic discipline: daily quantities are exact
  * (per-row 1e4 fixed point, DECIMAL sums — order-free); smoothing
  * weights β^j are computed ONCE on the driver and embedded in both
  * engines as 17-digit round-trip literals (the x_ewma_anomaly trick);
  * every weighted term is 1e9-quantized BEFORE its sum; sqrt is an
  * exactly-rounded IEEE op so both engines agree bit-for-bit on it.
  */
object DemandOps {

  // Croston smoothing: alpha = 0.2 (the classic intermittent-demand
  // setting), ladder truncated at 40 observed demand periods — beta^40
  // ≈ 1.3e-4, far below the 1e-6 output quantizer on normalized
  // estimates. Weights embedded identically in both engines.
  private val CrostonLags = 40
  private val CrostonBeta = 0.8
  private def crW(i: Int): Double = math.pow(CrostonBeta, i)
  private def crWLit(i: Int): String = lit17(crW(i))
  private def crQW(i: Int): Long = math.floor(crW(i) * 1e9 + 0.5).toLong

  // Syntetos–Boylan approximation bias correction: (1 − alpha/2).
  private val SbaFactor = 0.9

  // Backtest holdout: the last K demand periods per brand are scored,
  // everything before them trains the estimators. The SES comparison
  // smooths the DAILY series including zeros with the same beta ladder;
  // its normalizer is the full 40-weight quantized sum (every calendar
  // lag is "present" on a zero-inclusive series), a constant embedded
  // identically in both engines.
  private val CrostonHoldout = 8
  private val SesDenQ: Long = (0 until CrostonLags).map(crQW).sum

  // Shared Croston-family lag ladder, one definition per engine (the
  // r17 review lesson: croston_demand and croston_backtest carried
  // identical copies in both engines; tsb_demand would have made it
  // three): truncated weighted sum over the present lags, each term
  // 1e9-quantized before the row-local sum, present-lag quantized
  // weights as the normalizer. A quantizer change now cannot drift the
  // three ops apart.
  private def ladderNumSql(e: String): String =
    (0 until CrostonLags).map { i =>
      val v = if (i == 0) e else s"lag($e, $i) OVER win"
      s"""CASE WHEN $v IS NOT NULL
          THEN CAST(floor($v * CAST(${crWLit(i)} AS DOUBLE) * 1e9 + 0.5)
               AS BIGINT) ELSE 0 END"""
    }.mkString(" + ")
  private def ladderDenSql(e: String): String =
    (0 until CrostonLags).map { i =>
      val v = if (i == 0) e else s"lag($e, $i) OVER win"
      s"""CASE WHEN $v IS NOT NULL THEN CAST(${crQW(i)} AS BIGINT)
          ELSE CAST(0 AS BIGINT) END"""
    }.mkString(" + ")

  /** Quantized β-weight looked up by CALENDAR lag — the TSB
    * probability ladder's kernel (x_tsb_demand anchored at the global
    * last day, x_tsb_backtest at the per-brand cut day); embedded
    * literals, no pow at query time. */
  private def calLagQWCase(lagd: Column = col("lagd")): Column =
    (0 until CrostonLags).foldLeft(when(lit(false), lit(0L))) {
      (acc, i) => acc.when(lagd === i, lit(crQW(i)))
    }
  private def calLagQWCaseSql: String =
    (0 until CrostonLags).map(i =>
      s"WHEN $i THEN CAST(${crQW(i)} AS BIGINT)").mkString(" ")

  // ---- backtest scaffolding (r18: hoisted when x_tsb_backtest became
  // the second consumer; r21: the whole train/cut/holdout protocol
  // folds to ONE groupBy(brand) over the desc-sorted (day, q) array —
  // the x_tsb_demand pattern. Array index IS the old reverse row
  // number minus one: entries 0..7 are the holdout demand days, entry
  // 8 is the cut day, entries 8.. are the train series. Every ladder,
  // the SES/TSB horizon sums, and the holdout error sums become
  // per-row folds with term-for-term identical arithmetic (exact long
  // quantized terms; the old grouped sums were order-free), so the
  // old shape's three window passes, four derived tables, two
  // checkpoints, and holdout join disappear. ------------------------------

  /** Shared array-ladder terms (one definition for croston_demand,
    * tsb_demand, and both backtests — the r17 one-ladder lesson). */
  private[ext] def ladNumArr(v: Int => Column): Column =
    (0 until CrostonLags).map(i =>
      when(v(i).isNotNull,
        floor(v(i) * lit(crW(i)) * 1e9 + 0.5).cast("long"))
        .otherwise(0L)).reduce(_ + _)
  private[ext] def ladDenArr(v: Int => Column): Column =
    (0 until CrostonLags).map(i =>
      when(v(i).isNotNull, lit(crQW(i))).otherwise(0L)).reduce(_ + _)

  private val dsc = col("ds")
  /** Lag i of q / of the inter-demand interval as seen from the CUT
    * row (array index CrostonHoldout + i) — null exactly where the old
    * window lag() over the train prefix was null (the oldest train day
    * has no interval; lags past the train length do not exist). */
  private def cutQ(i: Int): Column = dsc(CrostonHoldout + i)("q")
  private def cutIv(i: Int): Column =
    datediff(dsc(CrostonHoldout + i)("day"),
      dsc(CrostonHoldout + i + 1)("day")).cast("double")

  /** The SES weight ladder looked up by calendar lag (double weights —
    * the quantized twin is calLagQWCase). */
  private def crWCase(lagd: Column): Column =
    (0 until CrostonLags).foldLeft(when(lit(false), 0.0)) {
      (acc, i) => acc.when(lagd === i, lit(crW(i)))
    }

  /** Σ term(q, lagd) over train entries within the cut's 40-day
    * calendar horizon (lagd = cut_day − day ∈ [0, CrostonLags)) —
    * exactly the rows the old train⋈cut + lagd filter kept. */
  private def cutHorizonFold(term: (Column, Column) => Column): Column =
    aggregate(
      filter(dsc, (e, i) =>
        i >= CrostonHoldout &&
          datediff(dsc(CrostonHoldout)("day"), e("day")) < CrostonLags),
      lit(0L),
      (acc, e) => acc + coalesce(
        term(e("q"), datediff(dsc(CrostonHoldout)("day"), e("day"))),
        lit(0L)))

  /** Σ floor(|q − rate|·1e6 + 0.5) over the CrostonHoldout holdout
    * entries; a NULL rate poisons the fold to NULL exactly as the old
    * all-NULL-terms grouped sum was NULL (the rate is per-brand
    * constant, so the terms were all-or-nothing NULL). */
  private def holdoutErrFold(rate: Column): Column =
    aggregate(slice(dsc, 1, CrostonHoldout), lit(0L),
      (acc, e) => acc +
        floor(abs(e("q") - rate) * 1e6 + 0.5).cast("long"))

  /** Per-brand scored backtest base: brands with more than
    * CrostonHoldout demand days (exactly the brands whose old train
    * prefix was non-empty), with cut-day estimates (Croston z/p ladder,
    * croston/sba/ses rates) and the holdout window constants. dmax off
    * the checkpointed grain (FK gate-asserted; oracle twins still
    * lineitem-derived, hash-compared). */
  private def bktScored(s: SparkSession, d: String): DataFrame = {
    val daily = demandDaily(s, d).localCheckpoint()
    val dmaxF = daily.agg(max(col("day")).as("dmax"))
    daily.groupBy(col("brand"))
      .agg(sort_array(collect_list(struct(col("day"), col("q"))),
        asc = false).as("ds"), count(lit(1)).as("nd"))
      .filter(col("nd") > CrostonHoldout)
      .crossJoin(broadcast(dmaxF))
      .withColumn("cut_day", dsc(CrostonHoldout)("day"))
      .withColumn("nt", col("nd") - CrostonHoldout)
      .withColumn("z",
        ladNumArr(cutQ).cast("double") / ladDenArr(cutQ).cast("double"))
      .withColumn("dp", ladDenArr(cutIv))
      .withColumn("p", when(col("dp") > 0,
        ladNumArr(cutIv).cast("double") / col("dp").cast("double")))
      .withColumn("croston_rate", when(col("p") > 0, col("z") / col("p")))
      .withColumn("sba_rate",
        when(col("p") > 0, lit(SbaFactor) * col("z") / col("p")))
      .withColumn("sesq", cutHorizonFold((q, lagd) =>
        floor(q * crWCase(lagd) * 1e9 + 0.5).cast("long")))
      .withColumn("ses_rate",
        col("sesq").cast("double") / lit(SesDenQ).cast("double"))
      .withColumn("hn", lit(CrostonHoldout.toLong))
      .withColumn("h_span",
        datediff(col("dmax"), col("cut_day")).cast("long"))
  }

  /** Exact integer holdout score for one method: demand-day error fold
    * plus the (h_span − hn)·⌊rate·1e6⌉ zero-day term. */
  private def qScore(rate: Column): Column =
    holdoutErrFold(rate) + (col("h_span") - col("hn")) *
      floor(rate * 1e6 + 0.5).cast("long")

  // One-sided 95% normal service-level quantile (Φ⁻¹(0.95)), and the
  // review lead time in days for the reorder-point policy.
  private val Z95 = "1.6448536269514722"
  private val LeadDays = 7

  // Newsvendor costs: underage 3 (lost margin), overage 1 (holding) —
  // critical ratio Cu/(Cu+Co) = 3/4, kept as INTEGER arithmetic
  // (cum·4 ≥ 3·span) so the quantile pick is exact in both engines.
  private val NvUnder = 3
  private val NvOver = 1

  // EOQ policy constants (documented, like NvUnder/NvOver): fixed cost
  // per replenishment order and holding cost per unit-year.
  private val EoqOrderCost = 50.0
  private val EoqHoldPerYear = 2.0

  /** Per-(brand, day) exact shipped quantity. One dim join (part is a
    * true dimension that GROWS with scale, so the broadcast decision is
    * left to AQE's size threshold rather than forced — the PlanAudit
    * unbounded-broadcast rule) + one fact groupBy; `q` is DECIMAL-exact
    * and identical in both engines (inputs are 4-dp-clean doubles). */
  private def demandDaily(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .join(t(s, d, "part").select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"),
        date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum(floor(col("l_quantity") * 1e4 + 0.5).cast("decimal(38,0)"))
        .as("qq"))
      .withColumn("q", col("qq").cast("double") / 1e4)

  private val demandDailySql =
    """SELECT p_brand AS brand, date_trunc('day', l_shipdate) AS day,
              CAST(SUM(CAST(floor(l_quantity * 1e4 + 0.5) AS HUGEINT))
                AS DOUBLE) / 1e4 AS q
       FROM lineitem JOIN part ON l_partkey = p_partkey
       GROUP BY 1, 2"""

  // Global calendar span (scalar, broadcast): zero-demand days are
  // implicit in the day-grain table, so every per-brand statistic that
  // must count them derives the zero count from this one span. Since
  // r21 every Spark-side consumer derives it from its own checkpointed
  // (brand, day) grain (min/max day over the grain == min/max over
  // lineitem because the part join drops nothing — FK asserted by the
  // oracle gate) instead of paying a second pruned fact scan; the
  // DuckDB twin below still scans lineitem, so the hash compare proves
  // the equivalence on every fixture.
  private val spanSql =
    """SELECT CAST(date_diff('day', min(date_trunc('day', l_shipdate)),
                             max(date_trunc('day', l_shipdate))) + 1
              AS BIGINT) AS span
       FROM lineitem"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "x_croston_demand" -> ((s, d) => {
      // Croston's method (Croston, Oper. Res. Q. 1972) — THE forecast
      // for intermittent demand, where plain exponential smoothing
      // (x_ewma_anomaly) decays toward zero between demand spikes and
      // systematically lags. Two separate smoothings run over DEMAND
      // PERIODS only (zero days never update either estimate): demand
      // SIZE z and inter-demand INTERVAL p; the per-period demand rate
      // is z/p, plus the Syntetos–Boylan bias correction (1−α/2)·z/p
      // (SBA, JORS 2005 — Croston's ratio estimator is biased high).
      // The recursion is expanded to one truncated weighted lag ladder
      // (the x_holt_forecast formulation): order O(demand days) rows
      // per brand in one window pass, normalized over present lags, all
      // terms 1e9-quantized before summing. Output: the latest estimate
      // per brand with the intermittency profile (zero-day fraction)
      // that justifies the method.
      // r21 optimization (guide §1.2/§2.4, the x_tsb_demand pattern):
      // the two lag ladders need only the latest row's view of the last
      // 40 demand days per brand, so the three window passes (80 lag
      // frames evaluated on EVERY grain row, then discarded for all but
      // rn=1) and the separate calendar-span fact scan collapse into
      // ONE groupBy(brand) over the checkpointed grain plus a scalar
      // fold of it. The desc-sorted (day, q) array gives lag i of q as
      // ds[i].q and lag i of the inter-demand interval as
      // datediff(ds[i].day, ds[i+1].day) — null exactly where the old
      // lag()s were null (the oldest demand day has no interval), so
      // ladder terms are value-identical. span derives from the grain:
      // the part join drops nothing (FK asserted by the oracle gate),
      // so grain min/max day == lineitem min/max day and the oracle
      // twin, which still scans lineitem for it, hash-matches.
      val daily = demandDaily(s, d).localCheckpoint()
      val scal = daily.agg(
        (datediff(max(col("day")), min(col("day"))) + 1).cast("long")
          .as("span"))
      val ds = col("ds")
      def entQ(i: Int): Column = ds(i)("q")
      def entIv(i: Int): Column =
        datediff(ds(i)("day"), ds(i + 1)("day")).cast("double")
      daily.groupBy(col("brand"))
        .agg(sort_array(collect_list(struct(col("day"), col("q"))),
          asc = false).as("ds"),
          count(lit(1)).as("nd"))
        .crossJoin(broadcast(scal))
        .withColumn("z",
          ladNumArr(entQ).cast("double") / ladDenArr(entQ).cast("double"))
        .withColumn("dp", ladDenArr(entIv))
        .withColumn("p", when(col("dp") > 0,
          ladNumArr(entIv).cast("double") / col("dp").cast("double")))
        .select(col("brand"), fmtD(ds(0)("day")).as("last_day"),
          col("nd").as("n_demand_days"),
          detRound((col("span") - col("nd")).cast("double") / col("span"), 6)
            .as("zero_frac"),
          detRound(col("z"), 6).as("size_hat"),
          detRound(col("p"), 6).as("interval_hat"),
          detRound(when(col("p") > 0, col("z") / col("p")), 6)
            .as("demand_rate"),
          detRound(when(col("p") > 0,
            lit(SbaFactor) * col("z") / col("p")), 6).as("sba_rate"))
        .orderBy("brand")
    }),

    "x_tsb_demand" -> ((s, d) => {
      // Teunter–Syntetos–Babai forecast (TSB, EJOR 2011) — the
      // intermittent-demand estimator that handles OBSOLESCENCE, which
      // Croston structurally cannot: Croston's interval estimate only
      // updates on demand days, so a discontinued item's forecast
      // freezes at its last positive rate forever, while TSB smooths
      // the demand PROBABILITY every calendar period (zeros included)
      // and therefore decays toward zero as an item dies. Probability
      // p̂ is the normalized β-weight ladder over the last 40 CALENDAR
      // days anchored at the global last shipping day — zero days
      // contribute 0 to the numerator so they are never materialized
      // (the croston_backtest discipline: demand days inside the
      // horizon carry quantized weight crQW(lag), the normalizer is
      // the constant full-ladder sum); size ẑ is the same demand-day
      // ladder as Croston's; forecast rate = p̂·ẑ. Scale: one fact
      // pass to the (brand, day) grain, a grouped O(brands) probability
      // table, broadcast scalars — windows over demand-day rows only.
      // r20 optimization (guide §2.4): the day grain is materialized
      // once and both scalar anchors (global last day, calendar span)
      // come off the grain instead of two more bare-date fact scans —
      // the inner join drops nothing (FK verified on every shipped
      // fixture AND asserted by the oracle gate since r21), so min/max
      // day over the grain equal min/max over lineitem and the oracle
      // twin, which still derives them from lineitem, hash-matches.
      // r21 optimization (guide §1.2 "the distributed algorithm"): the
      // three window passes (80 lag frames evaluated on EVERY grain row
      // and then discarded for all but the rn=1 row, plus the per-brand
      // count and the desc row_number) and the separate probability
      // aggregate + left join collapse into ONE groupBy(brand) over the
      // grain: each brand folds to its desc-sorted (day, q) array —
      // bounded by the calendar (O(days) entries) at ANY corpus size —
      // the z ladder reads the array's first 40 entries with the exact
      // term arithmetic of ladderNum/ladderDen (same doubles, same
      // floor/quantize ops, index i == lag i because the array is the
      // brand's demand days in desc day order), and the probability
      // mass folds crQW(lagd) over the lagd<40 prefix exactly as the
      // old filtered aggregate did (order-free long sum). Grain rows
      // now ship once (collect_list partials) instead of once per
      // window pass, and the job chain drops ~15 -> ~6 barriers.
      val daily = demandDaily(s, d).localCheckpoint()
      val scal = daily
        .agg(max(col("day")).as("dmax"),
          (datediff(max(col("day")), min(col("day"))) + 1).cast("long")
            .as("span"))
      val ds = col("ds")
      def entQ(i: Int): Column = ds(i)("q")
      val nz = ladNumArr(entQ)
      val dz = ladDenArr(entQ)
      val pnum = aggregate(
        filter(ds, e =>
          datediff(col("dmax"), e("day")) < CrostonLags),
        lit(0L),
        (acc, e) => acc +
          coalesce(calLagQWCase(datediff(col("dmax"), e("day"))), lit(0L)))
      daily.groupBy(col("brand"))
        .agg(sort_array(collect_list(struct(col("day"), col("q"))),
          asc = false).as("ds"),
          count(lit(1)).as("nd"))
        .crossJoin(broadcast(scal))
        .withColumn("z", nz.cast("double") / dz.cast("double"))
        .withColumn("p",
          pnum.cast("double") / lit(SesDenQ).cast("double"))
        .select(col("brand"),
          fmtD(ds(0)("day")).as("last_demand_day"),
          col("nd").as("n_demand_days"),
          detRound((col("span") - col("nd")).cast("double")
            / col("span"), 6).as("zero_frac"),
          detRound(col("p"), 6).as("p_hat"),
          detRound(col("z"), 6).as("z_hat"),
          detRound(col("p") * col("z"), 6).as("tsb_rate"))
        .orderBy("brand")
    }),

    "x_safety_stock" -> ((s, d) => {
      // Service-level inventory policy per brand: safety stock
      // SS = z₀.₉₅ · σ_daily · √L and reorder point ROP = μ_daily·L + SS
      // for a 7-day replenishment lead time — the classic normal-demand
      // buffer formula (Silver–Pyke–Peterson ch. 7). Daily mean and
      // variance COUNT THE ZERO DAYS (demand days alone would overstate
      // both): n = calendar span, zero days contribute nothing to Σq and
      // Σq², so both moments come from the demand-day table + the scalar
      // span. All sums DECIMAL-exact; σ and √L are single exactly-rounded
      // IEEE sqrt ops on identical doubles.
      // r21 (guide §2.4): span off the checkpointed grain instead of a
      // second pruned fact scan — FK gate-asserted, oracle twin still
      // lineitem-derived, hash unchanged (the x_tsb_demand argument)
      val daily = demandDaily(s, d).localCheckpoint()
      val scal = daily.agg(
        (datediff(max(col("day")), min(col("day"))) + 1).cast("long")
          .as("span"))
      daily
        .groupBy(col("brand"))
        .agg(count(lit(1)).as("nd"), sum(col("qq")).as("s1"),
          sum(floor(col("q") * col("q") * 1e4 + 0.5).cast("decimal(38,0)"))
            .as("s2"))
        .crossJoin(broadcast(scal))
        .withColumn("sy", col("s1").cast("double") / 1e4)
        .withColumn("syy", col("s2").cast("double") / 1e4)
        .withColumn("mu", col("sy") / col("span"))
        // span = 1 would divide by zero: NaN in Spark vs NULL in DuckDB
        // — NULL stats on a degenerate one-day calendar, both engines
        .withColumn("vr", when(col("span") > 1,
          (col("syy") - col("sy") * col("sy") / col("span"))
            / (col("span") - 1)))
        // sqrt only on a strictly positive variance: a near-constant
        // zero-inclusive series can land vr tiny-negative via float
        // cancellation — DuckDB sqrt(<0) THROWS while Spark returns NaN,
        // so both engines guard BEFORE the sqrt (r15 advice)
        .withColumn("sd", when(col("vr") > 0, sqrt(col("vr"))))
        .withColumn("ss", lit(Z95.toDouble) * col("sd")
          * sqrt(lit(LeadDays.toDouble)))
        .select(col("brand"), col("span").as("n_span_days"),
          col("nd").as("n_demand_days"),
          detRound(col("mu"), 6).as("mean_daily"),
          detRound(col("sd"), 6).as("sd_daily"),
          detRound(col("ss"), 4).as("safety_stock"),
          detRound(col("mu") * LeadDays + col("ss"), 4).as("reorder_point"))
        .orderBy("brand")
    }),

    "x_newsvendor_quantile" -> ((s, d) => {
      // Newsvendor single-period stock level per brand: with underage
      // cost 3 and overage cost 1 the optimal order is the 75th
      // percentile of daily demand (critical fractile Cu/(Cu+Co) —
      // Arrow–Harris–Marschak 1951), INCLUDING the zero days. The
      // empirical quantile is an exact order statistic off the
      // (brand, q) histogram: inject one zero-level row per brand with
      // the implicit zero-day count, cumulative-sum over quantity
      // levels (window ordered O(distinct levels)), pick the first
      // level whose 4·cum ≥ 3·span — pure integer comparison, no
      // floating-point percentile semantics to disagree on.
      // r21 (guide §2.4): grain checkpointed once; BOTH span uses read
      // one grain-derived scalar frame instead of two more pruned fact
      // scans (FK gate-asserted; oracle twin unchanged)
      val daily = demandDaily(s, d).localCheckpoint()
      val scal = daily.agg(
        (datediff(max(col("day")), min(col("day"))) + 1).cast("long")
          .as("span"))
      val hist = daily
        .groupBy(col("brand"), col("q")).agg(count(lit(1)).as("cnt"))
      val withZero = hist.unionByName(
        hist.groupBy(col("brand")).agg(sum(col("cnt")).cast("long").as("nd"))
          .crossJoin(broadcast(scal))
          .select(col("brand"), lit(0.0).as("q"),
            (col("span") - col("nd")).as("cnt")))
      val cw = Window.partitionBy("brand").orderBy("q")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      withZero
        .withColumn("cum", sum(col("cnt")).over(cw))
        .crossJoin(broadcast(scal))
        .filter(col("cum") * (NvUnder + NvOver) >= lit(NvUnder) * col("span"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("brand").orderBy("q")))
        .filter(col("rn") === 1)
        .select(col("brand"), col("span").as("n_span_days"),
          detRound(lit(NvUnder.toDouble / (NvUnder + NvOver)), 6)
            .as("critical_ratio"),
          detRound(col("q"), 4).as("stock_level"),
          detRound(col("cum").cast("double") / col("span"), 6)
            .as("cdf_at_level"))
        .orderBy("brand")
    }),

    "x_croston_backtest" -> ((s, d) => {
      // Does Croston actually beat naive smoothing on THIS data? The
      // intermittent-demand twin of a forecast backtest: hold out the
      // last 8 demand periods per brand, fit three flat forecasters on
      // the train prefix — Croston's rate ẑ/p̂, the SBA-corrected
      // (1−α/2)·ẑ/p̂, and plain SES over the zero-inclusive DAILY
      // series (the method Croston 1972 was written against, which
      // decays toward zero between spikes) — then score daily-demand
      // MAE over the holdout calendar window. Zero days are never
      // materialized: a zero day's |0 − f| = f, so the holdout error is
      // Σ_{demand days}|q − f| + (window − K)·f with the window length
      // from the scalar global calendar, and SES's numerator only needs
      // demand days within the 40-day lag horizon (zero days contribute
      // nothing) with the full 40-weight sum as its constant
      // normalizer. The winner is picked on the exact INTEGER quantized
      // error sums (never the divided doubles), ties broken
      // croston > sba > ses. Scale: one fact pass to day grain,
      // everything downstream O(brands × demand days).
      // r21: one groupBy(brand) over the sorted day array replaces the
      // train/cut/ses/holdout table chain — see the scaffolding note
      bktScored(s, d)
        .withColumn("q_cro", qScore(col("croston_rate")))
        .withColumn("q_sba", qScore(col("sba_rate")))
        .withColumn("q_ses", qScore(col("ses_rate")))
        .select(col("brand"), fmtD(col("cut_day")).as("cut_day"),
          col("nt").as("n_train"), col("hn").as("n_holdout"),
          col("h_span").as("h_span_days"),
          detRound(col("q_cro").cast("double") / 1e6 / col("h_span"), 6)
            .as("mae_croston"),
          detRound(col("q_sba").cast("double") / 1e6 / col("h_span"), 6)
            .as("mae_sba"),
          detRound(col("q_ses").cast("double") / 1e6 / col("h_span"), 6)
            .as("mae_ses"),
          when(col("q_cro").isNotNull && col("q_sba").isNotNull &&
              col("q_ses").isNotNull,
            when(col("q_cro") <= col("q_sba") &&
              col("q_cro") <= col("q_ses"), "croston")
              .when(col("q_sba") <= col("q_ses"), "sba")
              .otherwise("ses")).as("best_method"))
        .orderBy("brand")
    }),

    "x_tsb_backtest" -> ((s, d) => {
      // Does TSB's obsolescence handling actually WIN on this data?
      // The four-way extension of x_croston_backtest: same train/
      // holdout split, same cut-day scaffolding (shared builders —
      // bktScored/cutHorizonFold/qScore), plus the
      // TSB estimate at the cut — probability from the calendar-lag
      // β-ladder anchored at the per-brand cut day (train demand days
      // only, zero days never materialized), size = the cut's own
      // Croston ẑ, rate = p̂·ẑ — scored on the same exact integer
      // quantized holdout MAE. Ties break tsb > croston > sba > ses.
      // Honest expectation (and the fixture's verdict): on a corpus
      // with NO dying items, TSB should roughly tie Croston/SBA —
      // SBA keeps most brands (15/25), TSB takes 7; TSB's edge is
      // obsolescence, which this calendar does not contain. Scale:
      // identical posture to x_croston_backtest.
      // r21: one groupBy(brand) over the sorted day array replaces the
      // train/cut/ses/tsbp/holdout table chain — see the scaffolding
      // note; pnum is the same horizon fold with the quantized weights
      bktScored(s, d)
        .withColumn("pnum", cutHorizonFold((_, lagd) =>
          calLagQWCase(lagd)))
        .withColumn("tsb_rate",
          col("pnum").cast("double")
            / lit(SesDenQ).cast("double") * col("z"))
        .withColumn("q_tsb", qScore(col("tsb_rate")))
        .withColumn("q_cro", qScore(col("croston_rate")))
        .withColumn("q_sba", qScore(col("sba_rate")))
        .withColumn("q_ses", qScore(col("ses_rate")))
        .select(col("brand"), fmtD(col("cut_day")).as("cut_day"),
          col("nt").as("n_train"), col("hn").as("n_holdout"),
          col("h_span").as("h_span_days"),
          detRound(col("q_tsb").cast("double") / 1e6 / col("h_span"), 6)
            .as("mae_tsb"),
          detRound(col("q_cro").cast("double") / 1e6 / col("h_span"), 6)
            .as("mae_croston"),
          detRound(col("q_sba").cast("double") / 1e6 / col("h_span"), 6)
            .as("mae_sba"),
          detRound(col("q_ses").cast("double") / 1e6 / col("h_span"), 6)
            .as("mae_ses"),
          when(col("q_tsb").isNotNull && col("q_cro").isNotNull &&
              col("q_sba").isNotNull && col("q_ses").isNotNull,
            when(col("q_tsb") <= col("q_cro") &&
              col("q_tsb") <= col("q_sba") &&
              col("q_tsb") <= col("q_ses"), "tsb")
              .when(col("q_cro") <= col("q_sba") &&
                col("q_cro") <= col("q_ses"), "croston")
              .when(col("q_sba") <= col("q_ses"), "sba")
              .otherwise("ses")).as("best_method"))
        .orderBy("brand")
    }),

    "x_eoq_policy" -> ((s, d) => {
      // Economic order quantity policy per brand (Harris 1913; the
      // square-root formula of Silver–Pyke–Peterson ch. 5) — the
      // missing HOW-MUCH beside x_safety_stock's WHEN: EOQ = √(2·D·S/H)
      // with annualized demand D from the same zero-inclusive day grain
      // (D = ΣQ·365/span), ordering cost S = 50 per order and holding
      // cost H = 2 per unit-year as documented policy constants. Joined
      // with the z·σ√L service-level machinery into the full (s, Q)
      // policy row a planner orders from — when stock hits the reorder
      // point (the s), order EOQ units (the Q); orders_per_year = D/EOQ
      // and cycle_days = 365·EOQ/D give the implied cadence. One fact
      // pass to the day grain, everything downstream O(brands); moments
      // DECIMAL-exact; √ is a single exactly-rounded IEEE op on
      // identical doubles, divisions guarded per the family discipline.
      // r21 (guide §2.4): span off the checkpointed grain — the
      // x_safety_stock note applies verbatim
      val daily = demandDaily(s, d).localCheckpoint()
      val scal = daily.agg(
        (datediff(max(col("day")), min(col("day"))) + 1).cast("long")
          .as("span"))
      daily
        .groupBy(col("brand"))
        .agg(sum(col("qq")).as("s1"),
          sum(floor(col("q") * col("q") * 1e4 + 0.5).cast("decimal(38,0)"))
            .as("s2"))
        .crossJoin(broadcast(scal))
        .withColumn("sy", col("s1").cast("double") / 1e4)
        .withColumn("syy", col("s2").cast("double") / 1e4)
        .withColumn("mu", col("sy") / col("span"))
        .withColumn("vr", when(col("span") > 1,
          (col("syy") - col("sy") * col("sy") / col("span"))
            / (col("span") - 1)))
        .withColumn("sd", when(col("vr") > 0, sqrt(col("vr"))))
        .withColumn("ss", lit(Z95.toDouble) * col("sd")
          * sqrt(lit(LeadDays.toDouble)))
        .withColumn("dann", col("sy") * lit(365.0) / col("span"))
        .withColumn("eoq", when(col("dann") > 0,
          sqrt(lit(2.0) * col("dann") * lit(EoqOrderCost)
            / lit(EoqHoldPerYear))))
        .select(col("brand"), col("span").as("n_span_days"),
          detRound(col("dann"), 2).as("annual_demand"),
          detRound(col("eoq"), 2).as("eoq_units"),
          detRound(col("ss"), 4).as("safety_stock"),
          detRound(col("mu") * LeadDays + col("ss"), 4)
            .as("reorder_point"),
          detRound(when(col("eoq") > 0, col("dann") / col("eoq")), 4)
            .as("orders_per_year"),
          detRound(when(col("dann") > 0,
            lit(365.0) * col("eoq") / col("dann")), 4).as("cycle_days"))
        .orderBy("brand")
    }),

    "x_abc_xyz" -> ((s, d) => {
      // ABC × XYZ inventory classification — the 9-cell planning matrix
      // every ERP planner keeps (Silver–Pyke–Peterson ch. 3): ABC ranks
      // brands by cumulative revenue share (A ≤ 80%, B ≤ 95%, C rest)
      // and XYZ classes demand PREDICTABILITY by the coefficient of
      // variation of weekly demand at the classic 0.5/1.0 cuts. Weekly
      // grain (not daily) is the standard XYZ window — daily CV on an
      // intermittent series is dominated by the zero days and classes
      // everything Z. Weeks are INTEGER day-diff buckets from the
      // global first ship day (never date_trunc('week') — engines
      // disagree on week-start conventions), zero weeks counted via
      // the scalar calendar span exactly like x_safety_stock's zero
      // days. Revenue and cumulative shares are exact DECIMAL sums
      // (window cum over the 25-row brand table) cast to double once;
      // the CV guards follow the family discipline (nw > 1, vr > 0,
      // mu > 0 — NULL class on a degenerate series, both engines).
      // Scale: ONE fact pass (r16 verdict #4 — the first cut scanned
      // lineitem 4×): a checkpointed (brand, day) grain carries BOTH
      // the exact DECIMAL day revenue and the quantized day quantity,
      // so brand revenue (DECIMAL sums are associative — day partials
      // re-sum to the identical exact total), the weekly quantities,
      // the global first ship day AND the calendar span all derive
      // from the same O(brands × days) intermediate; everything
      // downstream O(brands).
      val dayGrain = t(s, d, "lineitem")
        .join(t(s, d, "part").select("p_partkey", "p_brand"),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand").as("brand"),
          date_trunc("day", col("l_shipdate")).as("day"))
        .agg(sum(revenue(col("l_extendedprice"), col("l_discount")))
            .as("drev"),
          sum(floor(col("l_quantity") * 1e4 + 0.5).cast("decimal(38,0)"))
            .as("qq"))
        .localCheckpoint()
      val rev = dayGrain.groupBy(col("brand"))
        .agg(sum(col("drev")).as("revd"))
      val tot = rev.agg(sum(col("revd")).as("totd"))
      val wcum = Window.orderBy(desc("revd"), asc("brand"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val abc = rev.crossJoin(broadcast(tot))
        .withColumn("cumd", sum(col("revd")).over(wcum))
        .withColumn("rev_share",
          col("revd").cast("double") / col("totd").cast("double"))
        .withColumn("cum_share",
          col("cumd").cast("double") / col("totd").cast("double"))
        .withColumn("abc_class",
          when(col("cum_share") <= 0.80, "A")
            .when(col("cum_share") <= 0.95, "B").otherwise("C"))
      // every lineitem ships a part, so min/max over the grain's day
      // column equal the raw-scan d0/span exactly
      val cal = dayGrain
        .agg(min(col("day")).as("d0"), max(col("day")).as("mx"))
        .select(col("d0"),
          (datediff(col("mx"), col("d0")) + 1).cast("long").as("span"))
      val weekly = dayGrain
        .crossJoin(broadcast(cal))
        .withColumn("wk",
          floor(datediff(col("day"), col("d0")) / lit(7.0)).cast("long"))
        .groupBy(col("brand"), col("wk"))
        .agg(sum(col("qq")).as("wq"), first(col("span")).as("span"))
      val xyz = weekly
        .withColumn("w", col("wq").cast("double") / 1e4)
        .groupBy(col("brand"), col("span"))
        .agg(sum(col("wq")).as("s1"),
          sum(floor(col("w") * col("w") * 1e4 + 0.5).cast("decimal(38,0)"))
            .as("s2"))
        .withColumn("nw",
          (floor((col("span") - 1) / lit(7.0)) + 1).cast("long"))
        .withColumn("sy", col("s1").cast("double") / 1e4)
        .withColumn("syy", col("s2").cast("double") / 1e4)
        .withColumn("mu", col("sy") / col("nw"))
        .withColumn("vr", when(col("nw") > 1,
          (col("syy") - col("sy") * col("sy") / col("nw"))
            / (col("nw") - 1)))
        .withColumn("sd", when(col("vr") > 0, sqrt(col("vr"))))
        .withColumn("cv", when(col("mu") > 0, col("sd") / col("mu")))
        .withColumn("xyz_class",
          when(col("cv") < 0.5, "X").when(col("cv") < 1.0, "Y")
            .when(col("cv").isNotNull, "Z"))
      abc.join(xyz, Seq("brand"))
        .select(col("brand"),
          detRound(col("revd").cast("double"), 2).as("revenue"),
          detRound(col("rev_share"), 6).as("rev_share"),
          detRound(col("cum_share"), 6).as("cum_share"),
          col("abc_class"), col("nw").as("n_weeks"),
          detRound(col("mu"), 4).as("mean_weekly"),
          detRound(col("cv"), 6).as("cv_weekly"),
          col("xyz_class"),
          concat(col("abc_class"), col("xyz_class")).as("policy_class"))
        .orderBy("brand")
    }))

  def oracleSql: Map[String, String] = Map(

    "x_croston_demand" -> {
      s"""WITH daily AS ($demandDailySql),
          sp AS ($spanSql),
          iv AS (
            SELECT brand, day, q,
                   CAST(date_diff('day', lag(day, 1) OVER win, day)
                     AS DOUBLE) AS iv
            FROM daily
            WINDOW win AS (PARTITION BY brand ORDER BY day)),
          lad AS (
            SELECT brand, day,
                   ${ladderNumSql("q")} AS nz, ${ladderDenSql("q")} AS dz,
                   ${ladderNumSql("iv")} AS np, ${ladderDenSql("iv")} AS dp,
                   COUNT(*) OVER (PARTITION BY brand) AS nd,
                   row_number() OVER (PARTITION BY brand ORDER BY day DESC)
                     AS rn
            FROM iv
            WINDOW win AS (PARTITION BY brand ORDER BY day)),
          fin AS (
            SELECT l.brand, l.day, l.nd, s.span,
                   CAST(l.nz AS DOUBLE) / CAST(l.dz AS DOUBLE) AS z,
                   CASE WHEN l.dp > 0
                        THEN CAST(l.np AS DOUBLE) / CAST(l.dp AS DOUBLE)
                   END AS p
            FROM lad l CROSS JOIN sp s WHERE l.rn = 1)
          SELECT brand, strftime(day, '%Y-%m-%d') AS last_day,
                 nd AS n_demand_days,
                 floor(CAST(span - nd AS DOUBLE) / span * 1e6 + 0.5) / 1e6
                   AS zero_frac,
                 floor(z * 1e6 + 0.5) / 1e6 AS size_hat,
                 floor(p * 1e6 + 0.5) / 1e6 AS interval_hat,
                 floor(CASE WHEN p > 0 THEN z / p END * 1e6 + 0.5) / 1e6
                   AS demand_rate,
                 floor(CASE WHEN p > 0
                       THEN CAST(${lit17(SbaFactor)} AS DOUBLE) * z / p
                       END * 1e6 + 0.5) / 1e6 AS sba_rate
          FROM fin ORDER BY brand"""
    },

    "x_tsb_demand" -> {
      s"""WITH daily AS ($demandDailySql),
          sp AS ($spanSql),
          dm AS (SELECT max(date_trunc('day', l_shipdate)) AS dmax
                 FROM lineitem),
          lad AS (
            SELECT brand, day,
                   ${ladderNumSql("q")} AS nz, ${ladderDenSql("q")} AS dz,
                   COUNT(*) OVER (PARTITION BY brand) AS nd,
                   row_number() OVER (PARTITION BY brand ORDER BY day
                     DESC) AS rn
            FROM daily
            WINDOW win AS (PARTITION BY brand ORDER BY day)),
          zest AS (
            SELECT brand, day AS last_demand_day, nd,
                   CAST(nz AS DOUBLE) / CAST(dz AS DOUBLE) AS z
            FROM lad WHERE rn = 1),
          pest AS (
            SELECT d.brand,
                   CAST(SUM(CASE date_diff('day', d.day, m.dmax)
                        $calLagQWCaseSql END) AS BIGINT) AS pnum
            FROM daily d CROSS JOIN dm m
            WHERE date_diff('day', d.day, m.dmax) < $CrostonLags
            GROUP BY 1),
          fin AS (
            SELECT z.brand, z.last_demand_day, z.nd, s.span,
                   CAST(COALESCE(p.pnum, 0) AS DOUBLE)
                     / CAST($SesDenQ AS DOUBLE) AS p,
                   z.z
            FROM zest z LEFT JOIN pest p ON p.brand = z.brand
            CROSS JOIN sp s)
          SELECT brand,
                 strftime(last_demand_day, '%Y-%m-%d') AS last_demand_day,
                 nd AS n_demand_days,
                 floor(CAST(span - nd AS DOUBLE) / span * 1e6 + 0.5) / 1e6
                   AS zero_frac,
                 floor(p * 1e6 + 0.5) / 1e6 AS p_hat,
                 floor(z * 1e6 + 0.5) / 1e6 AS z_hat,
                 floor(p * z * 1e6 + 0.5) / 1e6 AS tsb_rate
          FROM fin ORDER BY brand"""
    },

    "x_safety_stock" ->
      s"""WITH daily AS ($demandDailySql),
          sp AS ($spanSql),
          g AS (
            SELECT brand, COUNT(*) AS nd,
                   CAST(SUM(CAST(floor(q * 1e4 + 0.5) AS HUGEINT))
                     AS DOUBLE) / 1e4 AS sy,
                   CAST(SUM(CAST(floor(q * q * 1e4 + 0.5) AS HUGEINT))
                     AS DOUBLE) / 1e4 AS syy
            FROM daily GROUP BY 1),
          st0 AS (
            SELECT g.brand, g.nd, s.span,
                   g.sy / s.span AS mu,
                   CASE WHEN s.span > 1 THEN
                     (g.syy - g.sy * g.sy / s.span) / (s.span - 1)
                   END AS vr
            FROM g CROSS JOIN sp s),
          st AS (
            -- guard BEFORE sqrt: DuckDB sqrt(<0) throws (r15 advice)
            SELECT brand, nd, span, mu,
                   CASE WHEN vr > 0 THEN sqrt(vr) END AS sd
            FROM st0),
          fin AS (
            SELECT brand, span, nd, mu, sd,
                   CAST($Z95 AS DOUBLE) * sd
                     * sqrt(CAST($LeadDays AS DOUBLE)) AS ss
            FROM st)
          SELECT brand, span AS n_span_days, nd AS n_demand_days,
                 floor(mu * 1e6 + 0.5) / 1e6 AS mean_daily,
                 floor(sd * 1e6 + 0.5) / 1e6 AS sd_daily,
                 floor(ss * 1e4 + 0.5) / 1e4 AS safety_stock,
                 floor((mu * $LeadDays + ss) * 1e4 + 0.5) / 1e4
                   AS reorder_point
          FROM fin ORDER BY brand""",

    "x_newsvendor_quantile" ->
      s"""WITH daily AS ($demandDailySql),
          sp AS ($spanSql),
          hist AS (SELECT brand, q, COUNT(*) AS cnt FROM daily GROUP BY 1, 2),
          hz AS (
            SELECT brand, q, cnt FROM hist
            UNION ALL
            SELECT h.brand, CAST(0.0 AS DOUBLE) AS q, s.span - h.nd AS cnt
            FROM (SELECT brand, CAST(SUM(cnt) AS BIGINT) AS nd
                  FROM hist GROUP BY 1) h
            CROSS JOIN sp s),
          cm AS (
            SELECT brand, q,
                   SUM(cnt) OVER (PARTITION BY brand ORDER BY q
                     ROWS UNBOUNDED PRECEDING) AS cum
            FROM hz),
          pick AS (
            SELECT c.brand, c.q, c.cum, s.span,
                   row_number() OVER (PARTITION BY c.brand ORDER BY c.q)
                     AS rn
            FROM cm c CROSS JOIN sp s
            WHERE c.cum * ${NvUnder + NvOver} >= $NvUnder * s.span)
          SELECT brand, span AS n_span_days,
                 floor(CAST(${lit17(NvUnder.toDouble / (NvUnder + NvOver))}
                   AS DOUBLE) * 1e6 + 0.5) / 1e6 AS critical_ratio,
                 floor(q * 1e4 + 0.5) / 1e4 AS stock_level,
                 floor(CAST(cum AS DOUBLE) / span * 1e6 + 0.5) / 1e6
                   AS cdf_at_level
          FROM pick WHERE rn = 1 ORDER BY brand""",

    "x_croston_backtest" -> {
      val wcaseSql = (0 until CrostonLags).map(i =>
        s"WHEN $i THEN CAST(${crWLit(i)} AS DOUBLE)").mkString(" ")
      s"""WITH daily0 AS (
            SELECT brand, day, q,
                   row_number() OVER (PARTITION BY brand ORDER BY day
                     DESC) AS rnd
            FROM ($demandDailySql)),
          train AS (SELECT brand, day, q FROM daily0
                    WHERE rnd > $CrostonHoldout),
          iv AS (
            SELECT brand, day, q,
                   CAST(date_diff('day', lag(day, 1) OVER win, day)
                     AS DOUBLE) AS iv
            FROM train
            WINDOW win AS (PARTITION BY brand ORDER BY day)),
          lad AS (
            SELECT brand, day,
                   ${ladderNumSql("q")} AS nz, ${ladderDenSql("q")} AS dz,
                   ${ladderNumSql("iv")} AS np, ${ladderDenSql("iv")} AS dp,
                   COUNT(*) OVER (PARTITION BY brand) AS nt,
                   row_number() OVER (PARTITION BY brand ORDER BY day
                     DESC) AS rn2
            FROM iv
            WINDOW win AS (PARTITION BY brand ORDER BY day)),
          cut AS (
            SELECT brand, day AS cut_day, nt,
                   CAST(nz AS DOUBLE) / CAST(dz AS DOUBLE) AS z,
                   CASE WHEN dp > 0
                        THEN CAST(np AS DOUBLE) / CAST(dp AS DOUBLE)
                   END AS p
            FROM lad WHERE rn2 = 1),
          cut2 AS (
            SELECT brand, cut_day, nt,
                   CASE WHEN p > 0 THEN z / p END AS croston_rate,
                   CASE WHEN p > 0
                        THEN CAST(${lit17(SbaFactor)} AS DOUBLE) * z / p
                   END AS sba_rate
            FROM cut),
          sesrows AS (
            SELECT t.brand,
                   CAST(floor(t.q
                     * (CASE date_diff('day', t.day, c.cut_day)
                        $wcaseSql END) * 1e9 + 0.5) AS BIGINT) AS qt
            FROM train t JOIN cut2 c ON c.brand = t.brand
            WHERE date_diff('day', t.day, c.cut_day) < $CrostonLags),
          ses AS (
            SELECT brand,
                   CAST(SUM(qt) AS DOUBLE)
                     / CAST($SesDenQ AS DOUBLE) AS ses_rate
            FROM sesrows GROUP BY 1),
          est AS (
            SELECT c.brand, c.cut_day, c.nt, c.croston_rate, c.sba_rate,
                   s.ses_rate
            FROM cut2 c JOIN ses s ON s.brand = c.brand),
          dmax AS (SELECT max(date_trunc('day', l_shipdate)) AS dmax
                   FROM lineitem),
          sc AS (
            SELECT d.brand,
                   SUM(CAST(floor(abs(d.q - e.croston_rate) * 1e6 + 0.5)
                     AS HUGEINT)) AS e_cro,
                   SUM(CAST(floor(abs(d.q - e.sba_rate) * 1e6 + 0.5)
                     AS HUGEINT)) AS e_sba,
                   SUM(CAST(floor(abs(d.q - e.ses_rate) * 1e6 + 0.5)
                     AS HUGEINT)) AS e_ses,
                   CAST(COUNT(*) AS BIGINT) AS hn
            FROM daily0 d JOIN est e ON e.brand = d.brand
            WHERE d.rnd <= $CrostonHoldout
            GROUP BY 1),
          fin AS (
            SELECT s.brand, e.cut_day, e.nt, s.hn,
                   CAST(date_diff('day', e.cut_day, m.dmax) AS BIGINT)
                     AS h_span,
                   CAST(s.e_cro AS BIGINT)
                     + (CAST(date_diff('day', e.cut_day, m.dmax)
                          AS BIGINT) - s.hn)
                       * CAST(floor(e.croston_rate * 1e6 + 0.5)
                           AS BIGINT) AS q_cro,
                   CAST(s.e_sba AS BIGINT)
                     + (CAST(date_diff('day', e.cut_day, m.dmax)
                          AS BIGINT) - s.hn)
                       * CAST(floor(e.sba_rate * 1e6 + 0.5)
                           AS BIGINT) AS q_sba,
                   CAST(s.e_ses AS BIGINT)
                     + (CAST(date_diff('day', e.cut_day, m.dmax)
                          AS BIGINT) - s.hn)
                       * CAST(floor(e.ses_rate * 1e6 + 0.5)
                           AS BIGINT) AS q_ses
            FROM sc s JOIN est e ON e.brand = s.brand CROSS JOIN dmax m)
          SELECT brand, strftime(cut_day, '%Y-%m-%d') AS cut_day,
                 nt AS n_train, hn AS n_holdout, h_span AS h_span_days,
                 floor(CAST(q_cro AS DOUBLE) / 1e6 / h_span * 1e6 + 0.5)
                   / 1e6 AS mae_croston,
                 floor(CAST(q_sba AS DOUBLE) / 1e6 / h_span * 1e6 + 0.5)
                   / 1e6 AS mae_sba,
                 floor(CAST(q_ses AS DOUBLE) / 1e6 / h_span * 1e6 + 0.5)
                   / 1e6 AS mae_ses,
                 CASE WHEN q_cro IS NOT NULL AND q_sba IS NOT NULL
                           AND q_ses IS NOT NULL THEN
                   CASE WHEN q_cro <= q_sba AND q_cro <= q_ses
                          THEN 'croston'
                        WHEN q_sba <= q_ses THEN 'sba'
                        ELSE 'ses' END END AS best_method
          FROM fin ORDER BY brand"""
    },

    "x_tsb_backtest" -> {
      val wcaseSql = (0 until CrostonLags).map(i =>
        s"WHEN $i THEN CAST(${crWLit(i)} AS DOUBLE)").mkString(" ")
      s"""WITH daily0 AS (
            SELECT brand, day, q,
                   row_number() OVER (PARTITION BY brand ORDER BY day
                     DESC) AS rnd
            FROM ($demandDailySql)),
          train AS (SELECT brand, day, q FROM daily0
                    WHERE rnd > $CrostonHoldout),
          iv AS (
            SELECT brand, day, q,
                   CAST(date_diff('day', lag(day, 1) OVER win, day)
                     AS DOUBLE) AS iv
            FROM train
            WINDOW win AS (PARTITION BY brand ORDER BY day)),
          lad AS (
            SELECT brand, day,
                   ${ladderNumSql("q")} AS nz, ${ladderDenSql("q")} AS dz,
                   ${ladderNumSql("iv")} AS np, ${ladderDenSql("iv")} AS dp,
                   COUNT(*) OVER (PARTITION BY brand) AS nt,
                   row_number() OVER (PARTITION BY brand ORDER BY day
                     DESC) AS rn2
            FROM iv
            WINDOW win AS (PARTITION BY brand ORDER BY day)),
          cut AS (
            SELECT brand, day AS cut_day, nt,
                   CAST(nz AS DOUBLE) / CAST(dz AS DOUBLE) AS z,
                   CASE WHEN dp > 0
                        THEN CAST(np AS DOUBLE) / CAST(dp AS DOUBLE)
                   END AS p
            FROM lad WHERE rn2 = 1),
          cut2 AS (
            SELECT brand, cut_day, nt, z,
                   CASE WHEN p > 0 THEN z / p END AS croston_rate,
                   CASE WHEN p > 0
                        THEN CAST(${lit17(SbaFactor)} AS DOUBLE) * z / p
                   END AS sba_rate
            FROM cut),
          sesrows AS (
            SELECT t.brand,
                   CAST(floor(t.q
                     * (CASE date_diff('day', t.day, c.cut_day)
                        $wcaseSql END) * 1e9 + 0.5) AS BIGINT) AS qt
            FROM train t JOIN cut2 c ON c.brand = t.brand
            WHERE date_diff('day', t.day, c.cut_day) < $CrostonLags),
          ses AS (
            SELECT brand,
                   CAST(SUM(qt) AS DOUBLE)
                     / CAST($SesDenQ AS DOUBLE) AS ses_rate
            FROM sesrows GROUP BY 1),
          tsbp AS (
            SELECT t.brand,
                   CAST(SUM(CASE date_diff('day', t.day, c.cut_day)
                        $calLagQWCaseSql END) AS BIGINT) AS pnum
            FROM train t JOIN cut2 c ON c.brand = t.brand
            WHERE date_diff('day', t.day, c.cut_day) < $CrostonLags
            GROUP BY 1),
          est AS (
            SELECT c.brand, c.cut_day, c.nt, c.croston_rate, c.sba_rate,
                   s.ses_rate,
                   CAST(COALESCE(p.pnum, 0) AS DOUBLE)
                     / CAST($SesDenQ AS DOUBLE) * c.z AS tsb_rate
            FROM cut2 c JOIN ses s ON s.brand = c.brand
            LEFT JOIN tsbp p ON p.brand = c.brand),
          dmax AS (SELECT max(date_trunc('day', l_shipdate)) AS dmax
                   FROM lineitem),
          sc AS (
            SELECT d.brand,
                   SUM(CAST(floor(abs(d.q - e.tsb_rate) * 1e6 + 0.5)
                     AS HUGEINT)) AS e_tsb,
                   SUM(CAST(floor(abs(d.q - e.croston_rate) * 1e6 + 0.5)
                     AS HUGEINT)) AS e_cro,
                   SUM(CAST(floor(abs(d.q - e.sba_rate) * 1e6 + 0.5)
                     AS HUGEINT)) AS e_sba,
                   SUM(CAST(floor(abs(d.q - e.ses_rate) * 1e6 + 0.5)
                     AS HUGEINT)) AS e_ses,
                   CAST(COUNT(*) AS BIGINT) AS hn
            FROM daily0 d JOIN est e ON e.brand = d.brand
            WHERE d.rnd <= $CrostonHoldout
            GROUP BY 1),
          fin AS (
            SELECT s.brand, e.cut_day, e.nt, s.hn,
                   CAST(date_diff('day', e.cut_day, m.dmax) AS BIGINT)
                     AS h_span,
                   CAST(s.e_tsb AS BIGINT)
                     + (CAST(date_diff('day', e.cut_day, m.dmax)
                          AS BIGINT) - s.hn)
                       * CAST(floor(e.tsb_rate * 1e6 + 0.5)
                           AS BIGINT) AS q_tsb,
                   CAST(s.e_cro AS BIGINT)
                     + (CAST(date_diff('day', e.cut_day, m.dmax)
                          AS BIGINT) - s.hn)
                       * CAST(floor(e.croston_rate * 1e6 + 0.5)
                           AS BIGINT) AS q_cro,
                   CAST(s.e_sba AS BIGINT)
                     + (CAST(date_diff('day', e.cut_day, m.dmax)
                          AS BIGINT) - s.hn)
                       * CAST(floor(e.sba_rate * 1e6 + 0.5)
                           AS BIGINT) AS q_sba,
                   CAST(s.e_ses AS BIGINT)
                     + (CAST(date_diff('day', e.cut_day, m.dmax)
                          AS BIGINT) - s.hn)
                       * CAST(floor(e.ses_rate * 1e6 + 0.5)
                           AS BIGINT) AS q_ses
            FROM sc s JOIN est e ON e.brand = s.brand CROSS JOIN dmax m)
          SELECT brand, strftime(cut_day, '%Y-%m-%d') AS cut_day,
                 nt AS n_train, hn AS n_holdout, h_span AS h_span_days,
                 floor(CAST(q_tsb AS DOUBLE) / 1e6 / h_span * 1e6 + 0.5)
                   / 1e6 AS mae_tsb,
                 floor(CAST(q_cro AS DOUBLE) / 1e6 / h_span * 1e6 + 0.5)
                   / 1e6 AS mae_croston,
                 floor(CAST(q_sba AS DOUBLE) / 1e6 / h_span * 1e6 + 0.5)
                   / 1e6 AS mae_sba,
                 floor(CAST(q_ses AS DOUBLE) / 1e6 / h_span * 1e6 + 0.5)
                   / 1e6 AS mae_ses,
                 CASE WHEN q_tsb IS NOT NULL AND q_cro IS NOT NULL
                           AND q_sba IS NOT NULL AND q_ses IS NOT NULL
                      THEN
                   CASE WHEN q_tsb <= q_cro AND q_tsb <= q_sba
                             AND q_tsb <= q_ses THEN 'tsb'
                        WHEN q_cro <= q_sba AND q_cro <= q_ses
                          THEN 'croston'
                        WHEN q_sba <= q_ses THEN 'sba'
                        ELSE 'ses' END END AS best_method
          FROM fin ORDER BY brand"""
    },

    "x_eoq_policy" ->
      s"""WITH daily AS ($demandDailySql),
          sp AS ($spanSql),
          g AS (
            SELECT brand,
                   CAST(SUM(CAST(floor(q * 1e4 + 0.5) AS HUGEINT))
                     AS DOUBLE) / 1e4 AS sy,
                   CAST(SUM(CAST(floor(q * q * 1e4 + 0.5) AS HUGEINT))
                     AS DOUBLE) / 1e4 AS syy
            FROM daily GROUP BY 1),
          st0 AS (
            SELECT g.brand, s.span,
                   g.sy / s.span AS mu,
                   g.sy * 365.0 / s.span AS dann,
                   CASE WHEN s.span > 1 THEN
                     (g.syy - g.sy * g.sy / s.span) / (s.span - 1)
                   END AS vr
            FROM g CROSS JOIN sp s),
          st AS (
            -- guard BEFORE sqrt: DuckDB sqrt(<0) throws (r15 advice)
            SELECT brand, span, mu, dann,
                   CASE WHEN vr > 0 THEN sqrt(vr) END AS sd
            FROM st0),
          fin AS (
            SELECT brand, span, mu, dann, sd,
                   CAST($Z95 AS DOUBLE) * sd
                     * sqrt(CAST($LeadDays AS DOUBLE)) AS ss,
                   CASE WHEN dann > 0 THEN
                     sqrt(2.0 * dann * ${lit17(EoqOrderCost)}
                          / ${lit17(EoqHoldPerYear)})
                   END AS eoq
            FROM st)
          SELECT brand, span AS n_span_days,
                 floor(dann * 1e2 + 0.5) / 1e2 AS annual_demand,
                 floor(eoq * 1e2 + 0.5) / 1e2 AS eoq_units,
                 floor(ss * 1e4 + 0.5) / 1e4 AS safety_stock,
                 floor((mu * $LeadDays + ss) * 1e4 + 0.5) / 1e4
                   AS reorder_point,
                 floor(CASE WHEN eoq > 0 THEN dann / eoq END * 1e4 + 0.5)
                   / 1e4 AS orders_per_year,
                 floor(CASE WHEN dann > 0 THEN 365.0 * eoq / dann END
                   * 1e4 + 0.5) / 1e4 AS cycle_days
          FROM fin ORDER BY brand""",

    "x_abc_xyz" ->
      s"""WITH rev AS (
            SELECT p_brand AS brand,
                   SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                       CAST(1.0 - l_discount AS DECIMAL(4,2))) AS revd
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY 1),
          tot AS (SELECT SUM(revd) AS totd FROM rev),
          abc AS (
            SELECT r.brand, r.revd, t.totd,
                   SUM(r.revd) OVER (ORDER BY r.revd DESC, r.brand
                     ROWS UNBOUNDED PRECEDING) AS cumd
            FROM rev r CROSS JOIN tot t),
          abc2 AS (
            SELECT brand, revd,
                   CAST(revd AS DOUBLE) / CAST(totd AS DOUBLE)
                     AS rev_share,
                   CAST(cumd AS DOUBLE) / CAST(totd AS DOUBLE)
                     AS cum_share
            FROM abc),
          abc3 AS (
            SELECT *, CASE WHEN cum_share <= 0.80 THEN 'A'
                           WHEN cum_share <= 0.95 THEN 'B'
                           ELSE 'C' END AS abc_class
            FROM abc2),
          d0 AS (SELECT min(date_trunc('day', l_shipdate)) AS d0
                 FROM lineitem),
          weekly AS (
            SELECT p_brand AS brand,
                   CAST(floor(date_diff('day', d.d0,
                     date_trunc('day', l_shipdate)) / 7.0) AS BIGINT)
                     AS wk,
                   SUM(CAST(floor(l_quantity * 1e4 + 0.5) AS HUGEINT))
                     AS wq
            FROM lineitem JOIN part ON l_partkey = p_partkey
            CROSS JOIN d0 d
            GROUP BY 1, 2),
          mom AS (
            SELECT brand, SUM(wq) AS s1,
                   SUM(CAST(floor((CAST(wq AS DOUBLE) / 1e4)
                     * (CAST(wq AS DOUBLE) / 1e4) * 1e4 + 0.5)
                     AS HUGEINT)) AS s2
            FROM weekly GROUP BY 1),
          sp AS ($spanSql),
          x0 AS (
            SELECT m.brand,
                   CAST(floor((s.span - 1) / 7.0) + 1 AS BIGINT) AS nw,
                   CAST(m.s1 AS DOUBLE) / 1e4 AS sy,
                   CAST(m.s2 AS DOUBLE) / 1e4 AS syy
            FROM mom m CROSS JOIN sp s),
          x1 AS (
            SELECT brand, nw, sy / nw AS mu,
                   CASE WHEN nw > 1 THEN
                     (syy - sy * sy / nw) / (nw - 1) END AS vr
            FROM x0),
          x2 AS (
            SELECT brand, nw, mu,
                   CASE WHEN vr > 0 THEN sqrt(vr) END AS sd
            FROM x1),
          x3 AS (
            SELECT brand, nw, mu,
                   CASE WHEN mu > 0 THEN sd / mu END AS cv
            FROM x2),
          x4 AS (
            SELECT brand, nw, mu, cv,
                   CASE WHEN cv < 0.5 THEN 'X'
                        WHEN cv < 1.0 THEN 'Y'
                        WHEN cv IS NOT NULL THEN 'Z' END AS xyz_class
            FROM x3)
          SELECT a.brand,
                 floor(CAST(a.revd AS DOUBLE) * 1e2 + 0.5) / 1e2
                   AS revenue,
                 floor(a.rev_share * 1e6 + 0.5) / 1e6 AS rev_share,
                 floor(a.cum_share * 1e6 + 0.5) / 1e6 AS cum_share,
                 a.abc_class, x.nw AS n_weeks,
                 floor(x.mu * 1e4 + 0.5) / 1e4 AS mean_weekly,
                 floor(x.cv * 1e6 + 0.5) / 1e6 AS cv_weekly,
                 x.xyz_class,
                 a.abc_class || x.xyz_class AS policy_class
          FROM abc3 a JOIN x4 x ON a.brand = x.brand
          ORDER BY a.brand""")
}
