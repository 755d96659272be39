package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.types.Coercions.detRound
import graft.util.Tables.t

/** Observational causal-effect estimators — the analysis layer a data
  * platform runs AFTER the descriptive stats: "did the discount CAUSE
  * returns, or do discounted parts just differ?". Both estimators are
  * pure grouped-count algebra: cells are one groupBy over the fact
  * table (map-side partials, shuffle = O(cells)), every rate is a
  * double division of exact integers, and cross-stratum sums quantize
  * each term to 1e12 fixed point BEFORE summing (the x_pagerank
  * discipline) so the accumulation order cannot skew the hash compare.
  */
object CausalOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "x_stratified_effect" -> ((s, d) => {
      // covariate-adjusted treatment effect by direct standardization
      // (the discrete IPW twin): treatment = deep discount (≥ 6%),
      // outcome = line returned, confounder strata = quantity decile
      // buckets. Reports the per-stratum contrast next to the pooled
      // (naive) contrast and the stratum-size-weighted standardized
      // effect — when the two differ, Simpson's paradox is live and the
      // naive number is the wrong one to ship. Strata are BOUNDED by
      // construction (quantity div 10), so every table after the one
      // fact-table groupBy is O(strata) and broadcast-sized.
      val cells = t(s, d, "lineitem")
        .select(expr("cast(l_quantity as bigint) div 10").as("stratum"),
          (col("l_discount") >= 0.06).as("treated"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
        .groupBy("stratum", "treated")
        .agg(count(lit(1)).as("n"), sum(col("y")).as("k"))
      val wide = cells.groupBy("stratum")
        .agg(
          sum(when(col("treated"), col("n")).otherwise(0L)).as("n1"),
          sum(when(col("treated"), col("k")).otherwise(0L)).as("k1"),
          sum(when(!col("treated"), col("n")).otherwise(0L)).as("n0"),
          sum(when(!col("treated"), col("k")).otherwise(0L)).as("k0"))
        .filter(col("n1") > 0 && col("n0") > 0)
        .withColumn("rate1",
          col("k1").cast("double") / col("n1").cast("double"))
        .withColumn("rate0",
          col("k0").cast("double") / col("n0").cast("double"))
        .withColumn("diff", col("rate1") - col("rate0"))
      val tot = wide.agg(
          sum(col("n1") + col("n0")).as("nn"),
          sum(col("n1")).as("tn1"), sum(col("k1")).as("tk1"),
          sum(col("n0")).as("tn0"), sum(col("k0")).as("tk0"))
      val std = wide.crossJoin(broadcast(tot))
        .select(floor(
          ((col("n1") + col("n0")).cast("double") /
            col("nn").cast("double")) * col("diff") * 1e12 + lit(0.5))
          .cast("long").as("qterm"),
          col("tn1"), col("tk1"), col("tn0"), col("tk0"))
        .groupBy("tn1", "tk1", "tn0", "tk0")
        .agg(sum(col("qterm")).as("qsum"))
        .select(
          detRound(col("qsum").cast("double") / lit(1e12), 8)
            .as("standardized_diff"),
          detRound(col("tk1").cast("double") / col("tn1").cast("double") -
            col("tk0").cast("double") / col("tn0").cast("double"), 8)
            .as("naive_diff"))
      wide.crossJoin(broadcast(std))
        .select(col("stratum"), col("n1"), col("n0"),
          detRound(col("rate1"), 8).as("rate_treated"),
          detRound(col("rate0"), 8).as("rate_control"),
          detRound(col("diff"), 8).as("stratum_diff"),
          col("naive_diff"), col("standardized_diff"))
        .orderBy("stratum")
    }),

    "x_quantile_treatment_effect" -> ((s, d) => {
      // quantile treatment effects at the quartiles — the
      // DISTRIBUTIONAL view a mean contrast (x_ipw_ate, x_cuped)
      // averages away: an intervention can leave the mean flat while
      // compressing the tails, and QTE(q) = Q_treated(q) − Q_control(q)
      // is where that shows. Arms are the md5 order coin on order
      // value. Each quantile is a RANK SELECTION per arm (value at
      // rank ⌈q·n⌉) over the grouped (arm, cent-value) histogram —
      // the engine's interpolation-free median machinery, windows only
      // over distinct values per arm, never raw rows.
      val hist = t(s, d, "orders")
        .select(
          when(substring(md5(col("o_orderkey").cast("string")), 1, 1)
            < "8", "treated").otherwise("control").as("arm"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("qv"))
        .groupBy("arm", "qv").agg(count(lit(1)).as("c"))
      val wC = Window.partitionBy("arm").orderBy("qv")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist
        .withColumn("cum", sum(col("c")).over(wC))
        .localCheckpoint()
      val ns = cum.groupBy("arm")
        .agg(max(col("cum")).cast("long").as("n"))
      val qs = Seq(25, 50, 75)
      val sel = cum.join(broadcast(ns), "arm")
        .select(col("arm"), col("qv"), col("cum"), col("n"),
          explode(expr(s"array(${qs.mkString(", ")})")).as("q"))
        // value at rank ⌈q·n/100⌉: smallest qv whose cum reaches it.
        // Ceiling as (qn+99) div 100 on POSITIVE ints only — Spark's
        // div truncates toward zero while DuckDB's // floors, so the
        // negate-divide-negate ceiling idiom diverges on negatives.
        .filter(col("cum") >= expr("(q * n + 99) div 100"))
        .groupBy("q")
        .agg(
          min(when(col("arm") === "treated", col("qv"))).as("qt"),
          min(when(col("arm") === "control", col("qv"))).as("qc"))
      sel.select(col("q").cast("long").as("quantile_pct"),
          detRound(col("qt") / 100.0, 2).as("v_treated"),
          detRound(col("qc") / 100.0, 2).as("v_control"),
          detRound((col("qt") - col("qc")) / 100.0, 2).as("qte"))
        .orderBy("quantile_pct")
    }),

    "x_mediation_sobel" -> ((s, d) => {
      // mediation analysis (Baron–Kenny with the Sobel test): does a
      // deep discount raise returns DIRECTLY, or by inflating the
      // ordered quantity which then drives returns? a-path regresses
      // quantity on treatment, b-path regresses returns on quantity
      // CONTROLLING for treatment (two-regressor OLS in closed form),
      // indirect effect = a·b, Sobel z = a·b/√(b²s_a² + a²s_b²). All
      // eight sufficient statistics are exact integer sums from ONE
      // grouped pass (T and Y are 0/1, M is integral quantity), the
      // N-scaled centered moments stay inside int64, and every derived
      // coefficient is the identical IEEE expression tree in both
      // engines, so the single-row output is hash-stable.
      val base = t(s, d, "lineitem").select(
        when(col("l_discount") >= 0.06, 1L).otherwise(0L).as("tt"),
        col("l_quantity").cast("long").as("m"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
      val agg = base.agg(count(lit(1)).as("n"),
        sum(col("tt")).as("st"), sum(col("m")).as("sm"),
        sum(col("y")).as("sy"),
        sum(col("tt") * col("m")).as("stm"),
        sum(col("tt") * col("y")).as("sty"),
        sum(col("m") * col("y")).as("smy"),
        sum(col("m") * col("m")).as("smm"))
      agg
        .withColumn("sxx",
          (col("n") * col("st") - col("st") * col("st")).cast("double"))
        .withColumn("sxm",
          (col("n") * col("stm") - col("st") * col("sm")).cast("double"))
        .withColumn("smm2",
          (col("n") * col("smm") - col("sm") * col("sm")).cast("double"))
        .withColumn("sxy",
          (col("n") * col("sty") - col("st") * col("sy")).cast("double"))
        .withColumn("smy2",
          (col("n") * col("smy") - col("sm") * col("sy")).cast("double"))
        .withColumn("syy",
          (col("n") * col("sy") - col("sy") * col("sy")).cast("double"))
        .withColumn("a", col("sxm") / col("sxx"))
        .withColumn("den",
          col("sxx") * col("smm2") - col("sxm") * col("sxm"))
        .withColumn("b", (col("sxx") * col("smy2")
          - col("sxm") * col("sxy")) / col("den"))
        .withColumn("cdir", (col("smm2") * col("sxy")
          - col("sxm") * col("smy2")) / col("den"))
        .withColumn("ctot", col("sxy") / col("sxx"))
        .withColumn("sa2", (col("smm2") - col("sxm") * col("sxm")
          / col("sxx")) / ((col("n") - 2) * col("sxx")))
        .withColumn("sig2", (col("syy") - col("cdir") * col("sxy")
          - col("b") * col("smy2"))
          / (col("n").cast("double") * (col("n") - 3)))
        .withColumn("sb2",
          col("sig2") * col("n") * col("sxx") / col("den"))
        .withColumn("sobel", col("a") * col("b")
          / sqrt(col("b") * col("b") * col("sa2")
            + col("a") * col("a") * col("sb2")))
        .select(col("n"),
          detRound(col("a"), 6).as("a_path"),
          detRound(col("b"), 6).as("b_path"),
          detRound(col("cdir"), 6).as("direct_effect"),
          detRound(col("ctot"), 6).as("total_effect"),
          detRound(col("a") * col("b"), 6).as("indirect_effect"),
          detRound(col("a") * col("b") / col("ctot"), 6)
            .as("prop_mediated"),
          detRound(col("sobel"), 6).as("sobel_z"),
          (abs(col("sobel")) > lit(1.96)).as("significant_05"))
    }),

    "x_ipw_ate" -> ((s, d) => {
      // inverse-propensity-weighted ATE with EXACT discrete propensities
      // — the reweighting complement to x_stratified_effect's direct
      // standardization: within covariate cells (quantity deciles) the
      // propensity e_c = n1_c/n_c is the observed cell frequency, so
      // Σ T·y/e reduces to k1_c·n_c/n1_c per cell and the whole
      // estimator is grouped-count algebra (with exact cell
      // propensities the Horvitz–Thompson and Hájek forms coincide —
      // both denominators equal Σ n_c — so one number is reported).
      // Alongside: the positivity diagnostic (min/max propensity — the
      // assumption IPW dies on) and the 0.1 ≤ e ≤ 0.9 trimmed
      // estimator practitioners actually ship when positivity is thin.
      // Per-cell terms quantize to 1e12 fixed point before the
      // unordered sum (the x_pagerank discipline); cells are bounded
      // (quantity div 10) so everything after the one fact-table
      // groupBy is broadcast-sized.
      val wide = t(s, d, "lineitem")
        .select(expr("cast(l_quantity as bigint) div 10").as("stratum"),
          (col("l_discount") >= 0.06).as("treated"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
        .groupBy("stratum")
        .agg(
          sum(when(col("treated"), 1L).otherwise(0L)).as("n1"),
          sum(when(col("treated"), col("y")).otherwise(0L)).as("k1"),
          sum(when(!col("treated"), 1L).otherwise(0L)).as("n0"),
          sum(when(!col("treated"), col("y")).otherwise(0L)).as("k0"))
        .filter(col("n1") > 0 && col("n0") > 0)
        .withColumn("n", col("n1") + col("n0"))
        .withColumn("e",
          col("n1").cast("double") / col("n").cast("double"))
        .localCheckpoint()
      val trimmed = col("e") >= 0.1 && col("e") <= 0.9
      val tot = wide.agg(
        sum(col("n")).cast("long").as("nn"),
        count(lit(1)).as("n_cells"),
        sum(col("n1")).cast("long").as("tn1"),
        sum(col("k1")).cast("long").as("tk1"),
        sum(col("n0")).cast("long").as("tn0"),
        sum(col("k0")).cast("long").as("tk0"),
        min(col("e")).as("emin"), max(col("e")).as("emax"),
        coalesce(sum(when(trimmed, col("n")).otherwise(0L)), lit(0L))
          .cast("long").as("nt"),
        sum(when(trimmed, 1L).otherwise(0L)).as("nt_cells"))
      wide.crossJoin(broadcast(tot))
        .select(
          floor((col("k1").cast("double") * col("n") / col("n1")
            - col("k0").cast("double") * col("n") / col("n0"))
            / col("nn") * 1e12 + 0.5).cast("long").as("qterm"),
          when(trimmed && col("nt") > 0,
            floor((col("k1").cast("double") * col("n") / col("n1")
              - col("k0").cast("double") * col("n") / col("n0"))
              / col("nt") * 1e12 + 0.5).cast("long")).otherwise(0L)
            .as("qtrim"),
          col("nn"), col("n_cells"), col("tn1"), col("tk1"),
          col("tn0"), col("tk0"), col("emin"), col("emax"),
          col("nt"), col("nt_cells"))
        .groupBy("nn", "n_cells", "tn1", "tk1", "tn0", "tk0",
          "emin", "emax", "nt", "nt_cells")
        .agg(sum(col("qterm")).as("qs"), sum(col("qtrim")).as("qst"))
        .select(col("nn").as("n_used"), col("n_cells"),
          detRound(col("emin"), 6).as("min_propensity"),
          detRound(col("emax"), 6).as("max_propensity"),
          detRound(col("tk1").cast("double") / col("tn1")
            - col("tk0").cast("double") / col("tn0"), 8).as("naive_diff"),
          detRound(col("qs").cast("double") / 1e12, 8).as("ate_ipw"),
          col("nt").as("n_trimmed"), col("nt_cells"),
          when(col("nt") > 0,
            detRound(col("qst").cast("double") / 1e12, 8))
            .as("ate_ipw_trimmed"))
    }),

    "x_group_sequential" -> ((s, d) => {
      // group-sequential monitoring with an O'Brien–Fleming-SHAPED
      // boundary: five interim looks at calendar cuts, cumulative
      // two-proportion z at each look, boundary b_k = c/√t_k with t_k
      // the realized information fraction and c = 2.04 pinned at the
      // final look (the OBF shape — conservative early, nominal late —
      // with c as a documented constant rather than the α-spending
      // integral, which needs numerical quadrature neither engine
      // guarantees bit-identically). The experiment: md5 order-coin
      // arms, outcome = order fulfilled ('F'). Each order fans to the
      // ≤ 5 looks whose cut it precedes — skinny integer rows,
      // map-side partials, shuffle O(looks × arms); every z/boundary
      // is double arithmetic on exact cumulative counts.
      val cuts = Seq("1997-01-01", "1998-01-01", "1999-01-01",
        "2000-01-01", "2001-01-01")
      val lookCase = cuts.zipWithIndex.map { case (c, i) =>
        s"IF(o_orderdate < timestamp'$c 00:00:00', ${i + 1}, NULL)"
      }.mkString("array(", ", ", ")")
      val looks = t(s, d, "orders")
        .select(
          when(substring(md5(col("o_orderkey").cast("string")), 1, 1)
            < "8", 1L).otherwise(0L).as("treated"),
          when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"),
          explode(expr(s"filter($lookCase, x -> x is not null)"))
            .as("look"))
        .groupBy("look")
        .agg(
          sum(col("treated")).as("n1"),
          sum(col("treated") * col("y")).as("k1"),
          sum(lit(1L) - col("treated")).as("n0"),
          sum((lit(1L) - col("treated")) * col("y")).as("k0"))
      val fin = looks.agg(max(col("n1") + col("n0")).as("n_final"))
      val scored = looks.crossJoin(broadcast(fin))
        .withColumn("p1", col("k1").cast("double") / col("n1").cast("double"))
        .withColumn("p0", col("k0").cast("double") / col("n0").cast("double"))
        .withColumn("pp",
          (col("k1") + col("k0")).cast("double") /
            (col("n1") + col("n0")).cast("double"))
        .withColumn("z",
          (col("p1") - col("p0")) /
            sqrt(col("pp") * (lit(1.0) - col("pp")) *
              (lit(1.0) / col("n1").cast("double") +
                lit(1.0) / col("n0").cast("double"))))
        .withColumn("t_frac",
          (col("n1") + col("n0")).cast("double") /
            col("n_final").cast("double"))
        .withColumn("boundary", lit(2.04) / sqrt(col("t_frac")))
        .withColumn("crossed", abs(col("z")) > col("boundary"))
      scored
        .select(col("look").cast("long").as("look"),
          (col("n1") + col("n0")).as("n_cum"),
          detRound(col("p1"), 6).as("rate_treated"),
          detRound(col("p0"), 6).as("rate_control"),
          detRound(col("z"), 6).as("z_stat"),
          detRound(col("boundary"), 6).as("obf_boundary"),
          col("crossed"))
        .orderBy("look")
    }),

    "x_cuped" -> ((s, d) => {
      // CUPED variance reduction (Deng et al. 2013) — the modern A/B
      // workhorse: adjust each unit's post-period metric by its
      // PRE-period covariate, post' = post − θ·(pre − mean_pre) with
      // θ = cov(pre, post)/var(pre), shrinking metric variance by
      // exactly ρ² without biasing the arm contrast. Units are
      // customers, arms a deterministic md5 coin, the metric total
      // spend after the 1998 cut, the covariate spend before it (orders span 1995-2001 in the fixtures).
      // Everything reduces to per-customer cent-integer sums (one
      // grouped pass over orders), a pooled moment aggregate in
      // DECIMAL(38,0)/HUGEINT, and per-arm sums — arm-level adjusted
      // means need NO per-row second pass because mean(post') =
      // mean_post_arm − θ·(mean_pre_arm − mean_pre), so the whole
      // estimator is three broadcast-sized aggregates.
      val per = t(s, d, "orders")
        .select(col("o_custkey"),
          when(col("o_orderdate") < lit("1998-01-01").cast("timestamp"),
            floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
            .otherwise(0L).as("pre_c"),
          when(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"),
            floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
            .otherwise(0L).as("post_c"))
        .groupBy("o_custkey")
        .agg(sum(col("pre_c")).as("pre"), sum(col("post_c")).as("post"))
        .withColumn("arm",
          when(substring(md5(col("o_custkey").cast("string")), 1, 1) < "8",
            "treatment").otherwise("control"))
      val mom = per.agg(count(lit(1)).as("n"),
          sum(col("pre").cast("decimal(38,0)")).as("sx"),
          sum(col("post").cast("decimal(38,0)")).as("sy"),
          sum((col("pre").cast("decimal(38,0)") *
            col("pre").cast("decimal(38,0)"))).as("sxx"),
          sum((col("pre").cast("decimal(38,0)") *
            col("post").cast("decimal(38,0)"))).as("sxy"),
          sum((col("post").cast("decimal(38,0)") *
            col("post").cast("decimal(38,0)"))).as("syy"))
        .select(col("n").cast("double").as("dn"),
          col("sx").cast("double").as("sx"),
          col("sy").cast("double").as("sy"),
          col("sxx").cast("double").as("sxx"),
          col("sxy").cast("double").as("sxy"),
          col("syy").cast("double").as("syy"))
        .withColumn("mpre", col("sx") / col("dn"))
        .withColumn("vpre",
          col("sxx") / col("dn") - col("mpre") * col("mpre"))
        .withColumn("vpost", col("syy") / col("dn") -
          (col("sy") / col("dn")) * (col("sy") / col("dn")))
        .withColumn("cov", col("sxy") / col("dn") -
          col("mpre") * (col("sy") / col("dn")))
        .withColumn("theta", col("cov") / col("vpre"))
        .withColumn("rho2",
          col("cov") * col("cov") / (col("vpre") * col("vpost")))
        .select("mpre", "theta", "rho2")
      val arms = per.groupBy("arm")
        .agg(count(lit(1)).as("n_customers"),
          sum(col("pre")).as("apre"), sum(col("post")).as("apost"))
        .crossJoin(broadcast(mom))
        .withColumn("mean_post",
          col("apost").cast("double") / col("n_customers").cast("double")
            / lit(100.0))
        .withColumn("mean_adjusted",
          (col("apost").cast("double") / col("n_customers").cast("double") -
            col("theta") *
              (col("apre").cast("double") /
                col("n_customers").cast("double") - col("mpre")))
            / lit(100.0))
      val armsOut = arms.select("arm", "n_customers", "mean_post",
        "mean_adjusted")
      val summary = arms
        .groupBy()
        .agg(
          sum(when(col("arm") === "treatment", col("mean_post"))
            .otherwise(0.0)).as("tp"),
          sum(when(col("arm") === "control", col("mean_post"))
            .otherwise(0.0)).as("cp"),
          sum(when(col("arm") === "treatment", col("mean_adjusted"))
            .otherwise(0.0)).as("ta"),
          sum(when(col("arm") === "control", col("mean_adjusted"))
            .otherwise(0.0)).as("ca"),
          max(col("theta")).as("th"), max(col("rho2")).as("r2"))
        .select(detRound(col("tp") - col("cp"), 4).as("diff_raw"),
          detRound(col("ta") - col("ca"), 4).as("diff_cuped"),
          detRound(col("th"), 6).as("theta"),
          detRound(col("r2"), 6).as("variance_reduction"))
      armsOut.crossJoin(broadcast(summary))
        .select(col("arm"), col("n_customers"),
          detRound(col("mean_post"), 4).as("mean_post"),
          detRound(col("mean_adjusted"), 4).as("mean_adjusted"),
          col("diff_raw"), col("diff_cuped"), col("theta"),
          col("variance_reduction"))
        .orderBy("arm")
    }),

    "x_power_mde" -> ((s, d) => {
      // experiment sizing: the minimum detectable effect of a
      // two-proportion z-test (alpha 0.05 two-sided, power 0.80) at the
      // md5-split arm sizes, for the baseline rate "customer placed an
      // order after the 1998 cut". MDE = (z_alpha/2 + z_beta) ·
      // sqrt(p(1-p)(1/n1 + 1/n2)) — the pre-launch answer to "is this
      // experiment even worth running at our traffic". The z constants
      // are embedded as 17-significant-digit decimal literals (the
      // PoisCdf trick) so both engines use the identical binary64; the
      // rest is exact counts from one grouped pass.
      val za = lit(1.9599639845400545) // Phi^-1(0.975)
      val zb = lit(0.8416212335729143) // Phi^-1(0.80)
      val per = t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(max(when(col("o_orderdate") >=
          lit("1998-01-01").cast("timestamp"), 1L).otherwise(0L))
          .as("converted"))
        .withColumn("arm",
          when(substring(md5(col("o_custkey").cast("string")), 1, 1) < "8",
            "treatment").otherwise("control"))
      per.groupBy("arm")
        .agg(count(lit(1)).as("n"), sum(col("converted")).as("k"))
        .groupBy()
        .agg(
          sum(when(col("arm") === "treatment", col("n")).otherwise(0L))
            .as("n1"),
          sum(when(col("arm") === "control", col("n")).otherwise(0L))
            .as("n2"),
          sum(col("k")).as("k"), sum(col("n")).as("n"))
        .withColumn("p", col("k").cast("double") / col("n").cast("double"))
        .withColumn("mde_abs", (za + zb) *
          sqrt(col("p") * (lit(1.0) - col("p")) *
            (lit(1.0) / col("n1").cast("double") +
              lit(1.0) / col("n2").cast("double"))))
        .select(col("n1"), col("n2"),
          detRound(col("p"), 6).as("baseline_rate"),
          detRound(col("mde_abs"), 6).as("mde_abs"),
          detRound(col("mde_abs") / col("p"), 6).as("mde_rel"))
    }),

    "x_regression_discontinuity" -> ((s, d) => {
      // sharp regression discontinuity at the 1997-01-01 cut: local
      // linear fits of daily average order value on days-from-cut,
      // ±180-day bandwidth, one OLS per side, jump = the difference of
      // the two intercepts AT the cut. The running variable is an
      // integer day offset and the fit input is the BOUNDED daily table
      // (≤ 360 rows at any SF), so after the one grouped pass over
      // orders everything is broadcast-sized. Daily means are quantized
      // to 1e6 fixed point before the OLS sums (integer-exact sufficient
      // statistics), and the closed forms cast each exact sum to double
      // first — the x_zipf_fit discipline.
      val cut = lit("1997-01-01").cast("timestamp")
      val daily = t(s, d, "orders")
        .select(datediff(col("o_orderdate"), cut).cast("long").as("x"),
          col("o_totalprice").cast("decimal(18,2)").as("v"))
        .filter(col("x") >= -180 && col("x") < 180)
        .groupBy("x")
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
        .withColumn("qy",
          floor(col("sv").cast("double") / col("n").cast("double") * 1e6 +
            lit(0.5)).cast("long"))
        .withColumn("side", when(col("x") < 0, "pre").otherwise("post"))
      val fits = daily.groupBy("side")
        .agg(count(lit(1)).as("n_days"),
          sum(col("x")).as("sx"), sum(col("qy")).as("sy"),
          sum(col("x") * col("qy")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .withColumn("slope_q",
          (col("n_days").cast("double") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) /
            (col("n_days").cast("double") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")))
        .withColumn("intercept_q",
          (col("sy").cast("double") -
            col("slope_q") * col("sx").cast("double")) /
            col("n_days").cast("double"))
      val jump = fits
        .groupBy()
        .agg(
          sum(when(col("side") === "post", col("intercept_q"))
            .otherwise(0.0)).as("ipost"),
          sum(when(col("side") === "pre", col("intercept_q"))
            .otherwise(0.0)).as("ipre"))
        .select(detRound((col("ipost") - col("ipre")) / lit(1e6), 4)
          .as("rd_jump"))
      fits.crossJoin(broadcast(jump))
        .select(col("side"), col("n_days"),
          detRound(col("slope_q") / lit(1e6), 6).as("slope"),
          detRound(col("intercept_q") / lit(1e6), 4).as("intercept"),
          col("rd_jump"))
        .orderBy("side")
    }),

    "x_did_estimate" -> ((s, d) => {
      // difference-in-differences: urgent-priority orders (treated) vs
      // low-priority (control), before vs after the 1997-01-01 cut, on
      // average order value. The DiD contrast cancels both the group
      // level and the common time trend — the standard quasi-experiment
      // readout when randomization isn't available. Four cells from one
      // grouped pass; sums in DECIMAL(18,2) so cell means are exact
      // divisions of exact decimals; the contrast itself is four-double
      // arithmetic, identical IEEE in both engines.
      val cells = t(s, d, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(
          when(col("o_orderpriority") === "1-URGENT", "treated")
            .otherwise("control").as("grp"),
          when(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"),
            "post").otherwise("pre").as("period"),
          col("o_totalprice").cast("decimal(18,2)").as("v"))
        .groupBy("grp", "period")
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
        .withColumn("avg_value",
          col("sv").cast("double") / col("n").cast("double"))
      val did = cells
        .groupBy()
        .agg(
          sum(when(col("grp") === "treated" && col("period") === "post",
            col("avg_value")).otherwise(0.0)).as("tp"),
          sum(when(col("grp") === "treated" && col("period") === "pre",
            col("avg_value")).otherwise(0.0)).as("tr"),
          sum(when(col("grp") === "control" && col("period") === "post",
            col("avg_value")).otherwise(0.0)).as("cp"),
          sum(when(col("grp") === "control" && col("period") === "pre",
            col("avg_value")).otherwise(0.0)).as("cr"))
        .select(detRound(
          (col("tp") - col("tr")) - (col("cp") - col("cr")), 6)
          .as("did_estimate"))
      cells.crossJoin(broadcast(did))
        .select(col("grp"), col("period"), col("n"),
          detRound(col("avg_value"), 6).as("avg_value"),
          col("did_estimate"))
        .orderBy("grp", "period")
    }))

  def oracleSql: Map[String, String] = Map(

    "x_mediation_sobel" ->
      """WITH base AS (
           SELECT CASE WHEN l_discount >= 0.06 THEN 1 ELSE 0 END AS tt,
                  CAST(l_quantity AS BIGINT) AS m,
                  CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
           FROM lineitem),
         agg AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(tt) AS BIGINT) AS st,
                  CAST(SUM(m) AS BIGINT) AS sm,
                  CAST(SUM(y) AS BIGINT) AS sy,
                  CAST(SUM(tt * m) AS BIGINT) AS stm,
                  CAST(SUM(tt * y) AS BIGINT) AS sty,
                  CAST(SUM(m * y) AS BIGINT) AS smy,
                  CAST(SUM(m * m) AS BIGINT) AS smm
           FROM base),
         mom AS (
           SELECT n,
                  CAST(n * st - st * st AS DOUBLE) AS sxx,
                  CAST(n * stm - st * sm AS DOUBLE) AS sxm,
                  CAST(n * smm - sm * sm AS DOUBLE) AS smm2,
                  CAST(n * sty - st * sy AS DOUBLE) AS sxy,
                  CAST(n * smy - sm * sy AS DOUBLE) AS smy2,
                  CAST(n * sy - sy * sy AS DOUBLE) AS syy
           FROM agg),
         co AS (
           SELECT n, sxx, sxm, smm2, sxy, smy2, syy,
                  sxm / sxx AS a,
                  sxx * smm2 - sxm * sxm AS den
           FROM mom),
         fit AS (
           SELECT n, a,
                  (sxx * smy2 - sxm * sxy) / den AS b,
                  (smm2 * sxy - sxm * smy2) / den AS cdir,
                  sxy / sxx AS ctot,
                  (smm2 - sxm * sxm / sxx) / ((n - 2) * sxx) AS sa2,
                  (syy - ((smm2 * sxy - sxm * smy2) / den) * sxy
                    - ((sxx * smy2 - sxm * sxy) / den) * smy2)
                    / (CAST(n AS DOUBLE) * (n - 3)) AS sig2,
                  sxx, den
           FROM co),
         fin AS (
           SELECT n, a, b, cdir, ctot, sa2,
                  sig2 * n * sxx / den AS sb2
           FROM fit)
         SELECT n,
                floor(a * 1e6 + 0.5) / 1e6 AS a_path,
                floor(b * 1e6 + 0.5) / 1e6 AS b_path,
                floor(cdir * 1e6 + 0.5) / 1e6 AS direct_effect,
                floor(ctot * 1e6 + 0.5) / 1e6 AS total_effect,
                floor(a * b * 1e6 + 0.5) / 1e6 AS indirect_effect,
                floor(a * b / ctot * 1e6 + 0.5) / 1e6 AS prop_mediated,
                floor(a * b / sqrt(b * b * sa2 + a * a * sb2)
                  * 1e6 + 0.5) / 1e6 AS sobel_z,
                abs(a * b / sqrt(b * b * sa2 + a * a * sb2)) > 1.96
                  AS significant_05
         FROM fin""",

    "x_stratified_effect" ->
      """WITH cells AS (
           SELECT CAST(l_quantity AS BIGINT) // 10 AS stratum,
                  l_discount >= 0.06 AS treated,
                  CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
           FROM lineitem),
         agg AS (
           SELECT stratum, treated, COUNT(*) AS n,
                  CAST(SUM(y) AS BIGINT) AS k
           FROM cells GROUP BY 1, 2),
         wide AS (
           SELECT stratum,
                  CAST(SUM(CASE WHEN treated THEN n ELSE 0 END) AS BIGINT)
                    AS n1,
                  CAST(SUM(CASE WHEN treated THEN k ELSE 0 END) AS BIGINT)
                    AS k1,
                  CAST(SUM(CASE WHEN NOT treated THEN n ELSE 0 END)
                       AS BIGINT) AS n0,
                  CAST(SUM(CASE WHEN NOT treated THEN k ELSE 0 END)
                       AS BIGINT) AS k0
           FROM agg GROUP BY 1
           HAVING n1 > 0 AND n0 > 0),
         rates AS (
           SELECT stratum, n1, n0,
                  CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS rate1,
                  CAST(k0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS rate0,
                  CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                    - CAST(k0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS diff,
                  k1, k0
           FROM wide),
         tot AS (
           SELECT CAST(SUM(n1 + n0) AS DOUBLE) AS nn,
                  CAST(SUM(n1) AS DOUBLE) AS tn1,
                  CAST(SUM(k1) AS DOUBLE) AS tk1,
                  CAST(SUM(n0) AS DOUBLE) AS tn0,
                  CAST(SUM(k0) AS DOUBLE) AS tk0
           FROM rates),
         std AS (
           SELECT floor((CAST(SUM(CAST(floor(
                      (CAST(r.n1 + r.n0 AS DOUBLE) / t.nn) * r.diff * 1e12
                      + 0.5) AS BIGINT)) AS DOUBLE) / 1e12) * 1e8 + 0.5)
                    / 1e8 AS standardized_diff,
                  floor((MAX(t.tk1) / MAX(t.tn1)
                         - MAX(t.tk0) / MAX(t.tn0)) * 1e8 + 0.5) / 1e8
                    AS naive_diff
           FROM rates r, tot t)
         SELECT r.stratum, r.n1, r.n0,
                floor(r.rate1 * 1e8 + 0.5) / 1e8 AS rate_treated,
                floor(r.rate0 * 1e8 + 0.5) / 1e8 AS rate_control,
                floor(r.diff * 1e8 + 0.5) / 1e8 AS stratum_diff,
                s.naive_diff, s.standardized_diff
         FROM rates r, std s ORDER BY r.stratum""",

    "x_quantile_treatment_effect" ->
      """WITH hist AS (
           SELECT CASE WHEN substring(md5(CAST(o_orderkey AS VARCHAR)),
                         1, 1) < '8' THEN 'treated' ELSE 'control' END
                    AS arm,
                  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS qv,
                  COUNT(*) AS c
           FROM orders GROUP BY 1, 2),
         cum AS MATERIALIZED (
           SELECT arm, qv,
                  CAST(SUM(c) OVER (PARTITION BY arm ORDER BY qv)
                       AS BIGINT) AS cum
           FROM hist),
         ns AS (SELECT arm, CAST(MAX(cum) AS BIGINT) AS n
                FROM cum GROUP BY 1),
         sel AS (
           SELECT q.q, c.arm, c.qv
           FROM cum c
           JOIN ns USING (arm)
           CROSS JOIN (SELECT unnest([25, 50, 75]) AS q) q
           WHERE c.cum >= (q.q * ns.n + 99) // 100),
         agg AS (
           SELECT q,
                  MIN(CASE WHEN arm = 'treated' THEN qv END) AS qt,
                  MIN(CASE WHEN arm = 'control' THEN qv END) AS qc
           FROM sel GROUP BY 1)
         SELECT CAST(q AS BIGINT) AS quantile_pct,
                floor(CAST(qt AS DOUBLE) / 1e2 * 1e2 + 0.5) / 1e2
                  AS v_treated,
                floor(CAST(qc AS DOUBLE) / 1e2 * 1e2 + 0.5) / 1e2
                  AS v_control,
                floor(CAST(qt - qc AS DOUBLE) / 1e2 * 1e2 + 0.5) / 1e2
                  AS qte
         FROM agg ORDER BY quantile_pct""",

    "x_ipw_ate" ->
      """WITH cells AS (
           SELECT CAST(l_quantity AS BIGINT) // 10 AS stratum,
                  l_discount >= 0.06 AS treated,
                  CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
           FROM lineitem),
         wide AS MATERIALIZED (
           SELECT stratum,
                  CAST(SUM(CASE WHEN treated THEN 1 ELSE 0 END) AS BIGINT)
                    AS n1,
                  CAST(SUM(CASE WHEN treated THEN y ELSE 0 END) AS BIGINT)
                    AS k1,
                  CAST(SUM(CASE WHEN NOT treated THEN 1 ELSE 0 END)
                       AS BIGINT) AS n0,
                  CAST(SUM(CASE WHEN NOT treated THEN y ELSE 0 END)
                       AS BIGINT) AS k0
           FROM cells GROUP BY 1
           HAVING n1 > 0 AND n0 > 0),
         ext AS (
           SELECT *, n1 + n0 AS n,
                  CAST(n1 AS DOUBLE) / CAST(n1 + n0 AS DOUBLE) AS e
           FROM wide),
         tot AS (
           SELECT CAST(SUM(n) AS BIGINT) AS nn, COUNT(*) AS n_cells,
                  CAST(SUM(n1) AS BIGINT) AS tn1,
                  CAST(SUM(k1) AS BIGINT) AS tk1,
                  CAST(SUM(n0) AS BIGINT) AS tn0,
                  CAST(SUM(k0) AS BIGINT) AS tk0,
                  MIN(e) AS emin, MAX(e) AS emax,
                  CAST(COALESCE(SUM(CASE WHEN e >= 0.1 AND e <= 0.9
                                    THEN n ELSE 0 END), 0) AS BIGINT)
                    AS nt,
                  CAST(SUM(CASE WHEN e >= 0.1 AND e <= 0.9 THEN 1
                           ELSE 0 END) AS BIGINT) AS nt_cells
           FROM ext),
         terms AS (
           SELECT t.nn, t.n_cells, t.tn1, t.tk1, t.tn0, t.tk0,
                  t.emin, t.emax, t.nt, t.nt_cells,
                  CAST(floor((CAST(x.k1 AS DOUBLE) * x.n / x.n1
                              - CAST(x.k0 AS DOUBLE) * x.n / x.n0)
                             / t.nn * 1e12 + 0.5) AS BIGINT) AS qterm,
                  CASE WHEN x.e >= 0.1 AND x.e <= 0.9 AND t.nt > 0 THEN
                    CAST(floor((CAST(x.k1 AS DOUBLE) * x.n / x.n1
                                - CAST(x.k0 AS DOUBLE) * x.n / x.n0)
                               / t.nt * 1e12 + 0.5) AS BIGINT)
                  ELSE 0 END AS qtrim
           FROM ext x CROSS JOIN tot t),
         agg AS (
           SELECT nn, n_cells, tn1, tk1, tn0, tk0, emin, emax, nt,
                  nt_cells,
                  CAST(SUM(qterm) AS BIGINT) AS qs,
                  CAST(SUM(qtrim) AS BIGINT) AS qst
           FROM terms
           GROUP BY 1, 2, 3, 4, 5, 6, 7, 8, 9, 10)
         SELECT nn AS n_used, n_cells,
                floor(emin * 1e6 + 0.5) / 1e6 AS min_propensity,
                floor(emax * 1e6 + 0.5) / 1e6 AS max_propensity,
                floor((CAST(tk1 AS DOUBLE) / tn1
                       - CAST(tk0 AS DOUBLE) / tn0) * 1e8 + 0.5) / 1e8
                  AS naive_diff,
                floor(CAST(qs AS DOUBLE) / 1e12 * 1e8 + 0.5) / 1e8
                  AS ate_ipw,
                nt AS n_trimmed, nt_cells,
                CASE WHEN nt > 0 THEN
                  floor(CAST(qst AS DOUBLE) / 1e12 * 1e8 + 0.5) / 1e8
                END AS ate_ipw_trimmed
         FROM agg""",

    "x_group_sequential" ->
      """WITH cuts AS (
           SELECT * FROM (VALUES
             (1, TIMESTAMP '1997-01-01 00:00:00'),
             (2, TIMESTAMP '1998-01-01 00:00:00'),
             (3, TIMESTAMP '1999-01-01 00:00:00'),
             (4, TIMESTAMP '2000-01-01 00:00:00'),
             (5, TIMESTAMP '2001-01-01 00:00:00')) AS t(look, cut)),
         base AS (
           SELECT CASE WHEN substring(md5(CAST(o_orderkey AS VARCHAR)),
                         1, 1) < '8' THEN 1 ELSE 0 END AS treated,
                  CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
                  o_orderdate
           FROM orders),
         looks AS (
           SELECT c.look,
                  CAST(SUM(b.treated) AS BIGINT) AS n1,
                  CAST(SUM(b.treated * b.y) AS BIGINT) AS k1,
                  CAST(SUM(1 - b.treated) AS BIGINT) AS n0,
                  CAST(SUM((1 - b.treated) * b.y) AS BIGINT) AS k0
           FROM base b JOIN cuts c ON b.o_orderdate < c.cut
           GROUP BY 1),
         fin AS (SELECT MAX(n1 + n0) AS n_final FROM looks),
         scored AS (
           SELECT l.look, l.n1 + l.n0 AS n_cum,
                  CAST(l.k1 AS DOUBLE) / CAST(l.n1 AS DOUBLE) AS p1,
                  CAST(l.k0 AS DOUBLE) / CAST(l.n0 AS DOUBLE) AS p0,
                  CAST(l.k1 + l.k0 AS DOUBLE)
                    / CAST(l.n1 + l.n0 AS DOUBLE) AS pp,
                  CAST(l.n1 + l.n0 AS DOUBLE)
                    / CAST(f.n_final AS DOUBLE) AS t_frac,
                  l.n1, l.n0
           FROM looks l, fin f),
         zrows AS (
           SELECT look, n_cum, p1, p0,
                  (p1 - p0) / sqrt(pp * (1.0 - pp)
                    * (1.0 / CAST(n1 AS DOUBLE)
                       + 1.0 / CAST(n0 AS DOUBLE))) AS z,
                  2.04 / sqrt(t_frac) AS boundary
           FROM scored)
         SELECT CAST(look AS BIGINT) AS look, n_cum,
                floor(p1 * 1e6 + 0.5) / 1e6 AS rate_treated,
                floor(p0 * 1e6 + 0.5) / 1e6 AS rate_control,
                floor(z * 1e6 + 0.5) / 1e6 AS z_stat,
                floor(boundary * 1e6 + 0.5) / 1e6 AS obf_boundary,
                abs(z) > boundary AS crossed
         FROM zrows ORDER BY look""",

    "x_cuped" ->
      """WITH per AS (
           SELECT o_custkey,
                  CAST(SUM(CASE WHEN o_orderdate
                             < TIMESTAMP '1998-01-01 00:00:00'
                           THEN CAST(floor(o_totalprice * 100 + 0.5)
                                     AS BIGINT) ELSE 0 END) AS BIGINT)
                    AS pre,
                  CAST(SUM(CASE WHEN o_orderdate
                             >= TIMESTAMP '1998-01-01 00:00:00'
                           THEN CAST(floor(o_totalprice * 100 + 0.5)
                                     AS BIGINT) ELSE 0 END) AS BIGINT)
                    AS post,
                  CASE WHEN substring(md5(CAST(o_custkey AS VARCHAR)), 1, 1)
                         < '8' THEN 'treatment' ELSE 'control' END AS arm
           FROM orders GROUP BY o_custkey),
         mom AS (
           SELECT CAST(COUNT(*) AS DOUBLE) AS dn,
                  CAST(SUM(CAST(pre AS HUGEINT)) AS DOUBLE) AS sx,
                  CAST(SUM(CAST(post AS HUGEINT)) AS DOUBLE) AS sy,
                  CAST(SUM(CAST(pre AS HUGEINT) * CAST(pre AS HUGEINT))
                       AS DOUBLE) AS sxx,
                  CAST(SUM(CAST(pre AS HUGEINT) * CAST(post AS HUGEINT))
                       AS DOUBLE) AS sxy,
                  CAST(SUM(CAST(post AS HUGEINT) * CAST(post AS HUGEINT))
                       AS DOUBLE) AS syy
           FROM per),
         pars AS (
           SELECT sx / dn AS mpre,
                  sxx / dn - (sx / dn) * (sx / dn) AS vpre,
                  syy / dn - (sy / dn) * (sy / dn) AS vpost,
                  sxy / dn - (sx / dn) * (sy / dn) AS cov,
                  sy, dn
           FROM mom),
         pars2 AS (
           SELECT mpre, cov / vpre AS theta,
                  cov * cov / (vpre * vpost) AS rho2
           FROM pars),
         arms AS (
           SELECT arm, COUNT(*) AS n_customers,
                  CAST(SUM(CAST(pre AS HUGEINT)) AS DOUBLE) AS apre,
                  CAST(SUM(CAST(post AS HUGEINT)) AS DOUBLE) AS apost
           FROM per GROUP BY 1),
         scored AS (
           SELECT a.arm, a.n_customers,
                  a.apost / CAST(a.n_customers AS DOUBLE) / 100.0
                    AS mean_post,
                  (a.apost / CAST(a.n_customers AS DOUBLE)
                   - p.theta * (a.apre / CAST(a.n_customers AS DOUBLE)
                                - p.mpre)) / 100.0 AS mean_adjusted,
                  p.theta, p.rho2
           FROM arms a, pars2 p),
         summary AS (
           SELECT floor((SUM(CASE WHEN arm = 'treatment' THEN mean_post
                                  ELSE 0.0 END)
                         - SUM(CASE WHEN arm = 'control' THEN mean_post
                                    ELSE 0.0 END)) * 1e4 + 0.5) / 1e4
                    AS diff_raw,
                  floor((SUM(CASE WHEN arm = 'treatment' THEN mean_adjusted
                                  ELSE 0.0 END)
                         - SUM(CASE WHEN arm = 'control' THEN mean_adjusted
                                    ELSE 0.0 END)) * 1e4 + 0.5) / 1e4
                    AS diff_cuped,
                  floor(MAX(theta) * 1e6 + 0.5) / 1e6 AS theta,
                  floor(MAX(rho2) * 1e6 + 0.5) / 1e6 AS variance_reduction
           FROM scored)
         SELECT s.arm, s.n_customers,
                floor(s.mean_post * 1e4 + 0.5) / 1e4 AS mean_post,
                floor(s.mean_adjusted * 1e4 + 0.5) / 1e4 AS mean_adjusted,
                m.diff_raw, m.diff_cuped, m.theta, m.variance_reduction
         FROM scored s, summary m ORDER BY s.arm""",

    "x_power_mde" ->
      """WITH per AS (
           SELECT o_custkey,
                  MAX(CASE WHEN o_orderdate
                        >= TIMESTAMP '1998-01-01 00:00:00'
                      THEN 1 ELSE 0 END) AS converted,
                  CASE WHEN substring(md5(CAST(o_custkey AS VARCHAR)), 1, 1)
                         < '8' THEN 'treatment' ELSE 'control' END AS arm
           FROM orders GROUP BY o_custkey),
         armc AS (
           SELECT arm, COUNT(*) AS n, CAST(SUM(converted) AS BIGINT) AS k
           FROM per GROUP BY 1),
         tot AS (
           SELECT CAST(SUM(CASE WHEN arm = 'treatment' THEN n ELSE 0 END)
                       AS BIGINT) AS n1,
                  CAST(SUM(CASE WHEN arm = 'control' THEN n ELSE 0 END)
                       AS BIGINT) AS n2,
                  CAST(SUM(k) AS BIGINT) AS k, CAST(SUM(n) AS BIGINT) AS n
           FROM armc),
         calc AS (
           SELECT n1, n2,
                  CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p,
                  (1.9599639845400545 + 0.8416212335729143)
                    * sqrt((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                           * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                           * (1.0 / CAST(n1 AS DOUBLE)
                              + 1.0 / CAST(n2 AS DOUBLE))) AS mde_abs
           FROM tot)
         SELECT n1, n2,
                floor(p * 1e6 + 0.5) / 1e6 AS baseline_rate,
                floor(mde_abs * 1e6 + 0.5) / 1e6 AS mde_abs,
                floor(mde_abs / p * 1e6 + 0.5) / 1e6 AS mde_rel
         FROM calc""",

    "x_regression_discontinuity" ->
      """WITH daily AS (
           SELECT CAST(date_diff('day', TIMESTAMP '1997-01-01 00:00:00',
                    o_orderdate) AS BIGINT) AS x,
                  COUNT(*) AS n,
                  SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sv
           FROM orders
           WHERE CAST(date_diff('day', TIMESTAMP '1997-01-01 00:00:00',
                   o_orderdate) AS BIGINT) BETWEEN -180 AND 179
           GROUP BY 1),
         q AS (
           SELECT x,
                  CAST(floor(CAST(sv AS DOUBLE) / CAST(n AS DOUBLE) * 1e6
                             + 0.5) AS BIGINT) AS qy,
                  CASE WHEN x < 0 THEN 'pre' ELSE 'post' END AS side
           FROM daily),
         fits AS (
           SELECT side, COUNT(*) AS n_days,
                  CAST(SUM(x) AS DOUBLE) AS sx,
                  CAST(SUM(qy) AS DOUBLE) AS sy,
                  CAST(SUM(x * qy) AS DOUBLE) AS sxy,
                  CAST(SUM(x * x) AS DOUBLE) AS sxx
           FROM q GROUP BY 1),
         lines AS (
           SELECT side, n_days,
                  (CAST(n_days AS DOUBLE) * sxy - sx * sy)
                    / (CAST(n_days AS DOUBLE) * sxx - sx * sx) AS slope_q,
                  (sy - ((CAST(n_days AS DOUBLE) * sxy - sx * sy)
                         / (CAST(n_days AS DOUBLE) * sxx - sx * sx)) * sx)
                    / CAST(n_days AS DOUBLE) AS intercept_q
           FROM fits),
         jump AS (
           SELECT floor(((SUM(CASE WHEN side = 'post' THEN intercept_q
                                   ELSE 0.0 END)
                          - SUM(CASE WHEN side = 'pre' THEN intercept_q
                                     ELSE 0.0 END)) / 1e6) * 1e4 + 0.5)
                    / 1e4 AS rd_jump
           FROM lines)
         SELECT side, n_days,
                floor((slope_q / 1e6) * 1e6 + 0.5) / 1e6 AS slope,
                floor((intercept_q / 1e6) * 1e4 + 0.5) / 1e4 AS intercept,
                rd_jump
         FROM lines, jump ORDER BY side""",

    "x_did_estimate" ->
      """WITH cells AS (
           SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'treated'
                       ELSE 'control' END AS grp,
                  CASE WHEN o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
                       THEN 'post' ELSE 'pre' END AS period,
                  CAST(o_totalprice AS DECIMAL(18,2)) AS v
           FROM orders
           WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
         agg AS (
           SELECT grp, period, COUNT(*) AS n,
                  CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                    AS avg_value
           FROM cells GROUP BY 1, 2),
         did AS (
           SELECT floor((
                    (SUM(CASE WHEN grp = 'treated' AND period = 'post'
                              THEN avg_value ELSE 0.0 END)
                     - SUM(CASE WHEN grp = 'treated' AND period = 'pre'
                                THEN avg_value ELSE 0.0 END))
                    - (SUM(CASE WHEN grp = 'control' AND period = 'post'
                               THEN avg_value ELSE 0.0 END)
                       - SUM(CASE WHEN grp = 'control' AND period = 'pre'
                                  THEN avg_value ELSE 0.0 END))
                  ) * 1e6 + 0.5) / 1e6 AS did_estimate
           FROM agg)
         SELECT grp, period, n,
                floor(avg_value * 1e6 + 0.5) / 1e6 AS avg_value,
                did_estimate
         FROM agg, did ORDER BY grp, period""")
}
