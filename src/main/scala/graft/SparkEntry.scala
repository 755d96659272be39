package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ext.{CausalOps, CorpusOps, DedupOps, DemandOps, EvalOps,
  EventOps, GovernanceOps, GraphOps, MultimodalOps, SimilarityOps,
  StatsOps, SurvivalOps, TextOps}
import graft.queries.{AdvancedAnalytics => AA, Analytics => A, RefOps => R}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Registry of every implemented operator (SURVEY.md §2): op-id →
  * `(spark, sfDir) => DataFrame`, with matching DuckDB oracle SQL where the
  * op is SQL-expressible. Determinism rules (SURVEY.md §5): total ORDER BY,
  * decimal-exact money sums cast back to double, timestamps formatted as
  * strings, identical column aliases on both sides.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_sales_by_period")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    A.queries ++ AA.queries ++ R.queries ++ TextOps.queries ++
      DedupOps.queries ++ SimilarityOps.queries ++ EventOps.queries ++
      MultimodalOps.queries ++ GraphOps.queries ++ CorpusOps.queries ++
      StatsOps.queries ++ EvalOps.queries ++ GovernanceOps.queries ++
      CausalOps.queries ++ SurvivalOps.queries ++ DemandOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    A.oracleSql ++ AA.oracleSql ++ R.oracleSql ++ TextOps.oracleSql ++
      DedupOps.oracleSql ++ SimilarityOps.oracleSql ++ EventOps.oracleSql ++
      MultimodalOps.oracleSql ++ GraphOps.oracleSql ++ CorpusOps.oracleSql ++
      StatsOps.oracleSql ++ EvalOps.oracleSql ++ GovernanceOps.oracleSql ++
      CausalOps.oracleSql ++ SurvivalOps.oracleSql ++ DemandOps.oracleSql

  /** Headline subset used by Bench (heaviest / most representative). */
  def benchQueries: Seq[String] = {
    val preferred = Seq(
      "q_sales_by_period", "q_sales_by_vendor", "q_top_products",
      "q_category_rollup", "q_stock_coverage", "a4_group_counts",
      "j1_header_detail", "w2_latest_per_key", "x_dedup_exact",
      "x_dedup_minhash", "x_sim_topk", "x_text_stats",
      // round 2: grouping sets, ranking windows, tf-idf, set ops
      "q_sales_cube", "w5_rank_ntile", "x_tfidf_terms", "j6_set_ops",
      // round 3: keyset pagination, LSH probe dial (the 16 round-1/2
      // queries above are unchanged for round-over-round comparability)
      "w1b_keyset_pagination", "x_ann_multiprobe")
    val present = preferred.filter(queries.contains)
    if (present.nonEmpty) present else queries.keys.toSeq.sorted
  }

  /** Second pinned bench tier (round 10): the registry's EXPENSIVE family.
    * The headline set has been stable since r3 (good for comparability)
    * but no longer represents the full registry's cost profile — the PQ
    * chain and the iterative graph gauges dominate bench_full totals, so
    * a regression there would previously only show up diluted into the
    * 193 s full-registry number. These 12 are benched min-of-N per round
    * alongside the headline set and tracked round-over-round. */
  def heavyQueries: Seq[String] = Seq(
    "x_ann_ivfpq256_recall", "x_ann_pq_adc_recall",
    "x_ann_ivfpq256_residual_recall", "x_ann_ivfpq_recall",
    "x_ann_ivfpq_residual_recall", "x_hits", "x_pagerank",
    "x_recs_holdout_eval", "x_hll_set_ops", "x_fuzzy_pieces_d2",
    "x_ann_clustered_ivf_recall", "x_curation_pipeline"
  ).filter(queries.contains)

  /** Third pinned bench tier (round 13, r12 verdict #6): the newest
    * operator families, ROTATED each round (r13 verdict #5) so every
    * round's additions get one round of min-of-N wall-clock tracking
    * before settling into ShuffleCountSpec-only structural coverage.
    * r19 rotation (r18 verdict #3): ten of the eleven r18 additions —
    * the sub-2 s inequality/forecast/post-hoc battery. x_tsb_backtest
    * stays OUT per the r18 verdict's endorsement of the posture rule:
    * its 7.3 s is a corpus-independent 4×40-term ladder plan/codegen
    * constant (flat at 10×), which would read as a phantom regression
    * in a wall-clock tier. The r18 members (x_generalized_esd,
    * x_tukey_fences, x_theil_inequality, x_page_trend, x_cochran_q,
    * x_kendalls_w, x_eoq_policy) graduated to ShuffleCountSpec's
    * alumni pins — plans still structurally pinned, no longer benched
    * per round. */
  def freshQueries: Seq[String] = Seq(
    "x_quade_test", "x_lorenz_curve", "x_hoover_index",
    "x_atkinson_index", "x_palma_ratio", "x_tsb_demand",
    "x_theil_u_forecast", "x_mase_forecast", "x_nemenyi_posthoc",
    "x_rank_biased_overlap"
  ).filter(queries.contains)
}
