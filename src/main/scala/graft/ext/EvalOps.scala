package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.types.Coercions.detRound
import graft.util.Tables.t

/** Evaluation metrics for the data-quality / classifier layer of a
  * training-data pipeline (extension surface, same family as TextOps's
  * x_quality_classifier): ROC-AUC of a quality signal, fixed-width
  * calibration (reliability) bins, and categorical mutual information
  * between document facets.
  *
  * Every metric here reduces to INTEGER sufficient statistics (grouped
  * counts, rank sums) followed by a scalar closed form — the formulation
  * that both partial-aggregates map-side at 100 TB and hash-matches a
  * DuckDB oracle exactly (no order-sensitive float accumulation; the
  * fixed-point quantize-then-integer-sum discipline from CorpusOps).
  */
object EvalOps {

  /** per-doc signal: lexical type count (distinct tokens) + binary label
    * (doc is English). The signal is deliberately simple — these entries
    * verify METRIC machinery; richer scores plug into the same shape. */
  private def docSignal(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count_distinct(col("tok")).as("v"))
      .withColumn("y", (col("lang") === "en").cast("int"))

  private val docSignalSql =
    """per AS (
         SELECT doc_id, lang, COUNT(DISTINCT tok) AS v,
                CAST(lang = 'en' AS INT) AS y
         FROM (SELECT doc_id, lang,
                      unnest(string_split(text, ' ')) AS tok
               FROM documents)
         GROUP BY doc_id, lang)"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "x_fleiss_kappa" -> ((s, d) => {
      // Fleiss' κ for MULTI-rater agreement — Cohen's κ
      // (x_classifier_agreement) only handles two raters; labeling
      // pipelines routinely run 3+ annotators (or 3+ model labelers)
      // per document and need chance-corrected consensus quality.
      // Raters are three deterministic md5-noise labelers of the
      // binary long-document label (each flips truth with prob 1/8 on
      // its own coin — real disagreement, reproducible everywhere).
      // Per doc the state is just n_pos ∈ {0..3}: P_i = (Σ_j n_ij² −
      // n)/(n(n−1)) needs only that count, so the whole statistic is
      // two grouped integer sums. κ = (P̄ − P_e)/(1 − P_e).
      val n = 3 // raters
      val rated = t(s, d, "documents")
        .select(col("doc_id"), (col("n_chars") >= 300).as("truth"))
        .select(col("doc_id") +: (0 until n).map(r =>
          when(substring(md5(concat(col("doc_id").cast("string"),
            lit(s":rater$r"))), 1, 1) < "2",
            when(col("truth"), 0L).otherwise(1L))
            .otherwise(when(col("truth"), 1L).otherwise(0L))
            .as(s"y$r")): _*)
        .select(col("doc_id"),
          (col("y0") + col("y1") + col("y2")).as("npos"))
      val agg = rated.agg(
        count(lit(1)).as("n_docs"),
        sum(col("npos")).cast("long").as("tot_pos"),
        sum(col("npos") * col("npos") +
          (lit(n) - col("npos")) * (lit(n) - col("npos")))
          .cast("long").as("sq"))
      agg.select(col("n_docs"), col("tot_pos"),
          (col("tot_pos").cast("double") / (col("n_docs") * n))
            .as("p_pos"),
          ((col("sq") - col("n_docs") * n).cast("double") /
            (col("n_docs") * n * (n - 1)).cast("double")).as("p_bar"))
        .withColumn("p_e",
          col("p_pos") * col("p_pos") +
            (lit(1.0) - col("p_pos")) * (lit(1.0) - col("p_pos")))
        .select(col("n_docs"),
          detRound(col("p_pos"), 6).as("p_pos"),
          detRound(col("p_bar"), 6).as("p_bar"),
          detRound(col("p_e"), 6).as("p_e"),
          detRound((col("p_bar") - col("p_e")) /
            (lit(1.0) - col("p_e")), 6).as("fleiss_kappa"))
    }),

    "x_cronbach_alpha" -> ((s, d) => {
      // Cronbach's α internal-consistency coefficient over the same
      // three-rater panel as x_fleiss_kappa — the scale-reliability
      // view of the same data: items = raters, score = their binary
      // votes, α = k/(k−1)·(1 − Σσ²_item/σ²_total). κ asks "do they
      // agree beyond chance", α asks "do the items measure ONE
      // construct" — a labeling pipeline wants both before trusting a
      // consensus label. Binary items make every variance a function
      // of integer sums (y² = y), so the whole statistic is one
      // grouped pass of exact counts.
      val n = 3
      val rated = t(s, d, "documents")
        .select(col("doc_id"), (col("n_chars") >= 300).as("truth"))
        .select(col("doc_id") +: (0 until n).map(r =>
          when(substring(md5(concat(col("doc_id").cast("string"),
            lit(s":rater$r"))), 1, 1) < "2",
            when(col("truth"), 0L).otherwise(1L))
            .otherwise(when(col("truth"), 1L).otherwise(0L))
            .as(s"y$r")): _*)
      val agg = rated.agg(
        count(lit(1)).as("nd"),
        sum(col("y0")).cast("long").as("s0"),
        sum(col("y1")).cast("long").as("s1"),
        sum(col("y2")).cast("long").as("s2"),
        sum((col("y0") + col("y1") + col("y2")) *
          (col("y0") + col("y1") + col("y2"))).cast("long").as("sxx"),
        sum(col("y0") + col("y1") + col("y2")).cast("long").as("sx"))
      def vOf(sc: org.apache.spark.sql.Column) =
        (sc.cast("double") - sc.cast("double") * sc / col("nd")) /
          (col("nd") - 1)
      agg
        .withColumn("item_var",
          vOf(col("s0")) + vOf(col("s1")) + vOf(col("s2")))
        .withColumn("total_var",
          (col("sxx").cast("double") -
            col("sx").cast("double") * col("sx") / col("nd")) /
            (col("nd") - 1))
        .select(col("nd").as("n_docs"), lit(n).as("k_items"),
          detRound(col("item_var"), 6).as("sum_item_var"),
          detRound(col("total_var"), 6).as("total_var"),
          detRound(lit(n.toDouble) / (n - 1) *
            (lit(1.0) - col("item_var") / col("total_var")), 6)
            .as("cronbach_alpha"))
    }),

    "x_mcnemar" -> ((s, d) => {
      // McNemar's paired test — the CORRECT way to compare two
      // classifiers evaluated on the SAME documents (a two-proportion
      // z on their accuracies ignores the pairing and overstates the
      // variance): only the discordant pairs carry information,
      // b = A right ∧ B wrong, c = A wrong ∧ B right, χ² = (b−c)²/(b+c)
      // (plus Edwards' continuity-corrected form, the one tables
      // report). Raters are two md5-noise labelers with DIFFERENT flip
      // rates (1/8 vs 3/16) so the test has a real signal to find.
      // One grouped count over documents; four integer cells.
      def noisy(rater: String, thresh: String) =
        when(substring(md5(concat(col("doc_id").cast("string"),
          lit(s":$rater"))), 1, 1) < thresh,
          !col("truth")).otherwise(col("truth"))
      val paired = t(s, d, "documents")
        .select(col("doc_id"), (col("n_chars") >= 300).as("truth"))
        .select(
          (noisy("ra", "2") === col("truth")).as("a_right"),
          (noisy("rb", "3") === col("truth")).as("b_right"))
      val cells = paired.agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("a_right") && !col("b_right"), 1L).otherwise(0L))
          .cast("long").as("b"),
        sum(when(!col("a_right") && col("b_right"), 1L).otherwise(0L))
          .cast("long").as("c"))
      cells
        .withColumn("chi2",
          (col("b") - col("c")).cast("double") * (col("b") - col("c")) /
            (col("b") + col("c")).cast("double"))
        .withColumn("chi2_cc",
          (abs(col("b") - col("c")) - 1).cast("double") *
            (abs(col("b") - col("c")) - 1) /
            (col("b") + col("c")).cast("double"))
        .select(col("n_docs"), col("b").as("a_only_right"),
          col("c").as("b_only_right"),
          detRound(col("chi2"), 6).as("mcnemar_chi2"),
          detRound(col("chi2_cc"), 6).as("mcnemar_chi2_cc"),
          (col("chi2_cc") > lit(3.841)).as("significant_05"))
    }),

    "x_cumulative_gains" -> ((s, d) => {
      // cumulative gains / lift table — the model-eval readout a ranker
      // ships with: sort by score, cut into deciles, report per-decile
      // positive rate, lift over base rate, and the cumulative share of
      // all positives captured ("the top 20% of scores finds 60% of the
      // positives"). The global rank is the scale-safe decomposition
      // (StatsOps.globalRank posture): exclusive start offsets from the
      // score histogram cumsum (one row per DISTINCT score) plus a
      // row_number PARTITIONED by score for the doc_id tiebreak — bit-
      // identical to row_number over (score desc, doc_id) with no
      // unpartitioned window over raw rows. Decile math is integer
      // ((rnk-1)*10) div n; the only post-rank windows run over the
      // 10-row decile table.
      val per = docSignal(s, d)
        .select(col("doc_id"), col("v"), col("y").cast("long").as("y"))
      val wS = org.apache.spark.sql.expressions.Window.orderBy(desc("v"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, -1)
      val starts = per.groupBy("v").agg(count(lit(1)).as("c"))
        .withColumn("s0", coalesce(sum(col("c")).over(wS), lit(0L)))
        .select("v", "s0")
      val wIn = org.apache.spark.sql.expressions.Window
        .partitionBy("v").orderBy("doc_id")
      val ranked = per
        .withColumn("rw", row_number().over(wIn).cast("long"))
        .join(starts, "v")
        .withColumn("rnk", col("s0") + col("rw"))
      val tot = per.agg(count(lit(1)).as("n"), sum(col("y")).as("npos"))
      val dec = ranked.crossJoin(broadcast(tot))
        .withColumn("decile", expr("((rnk - 1) * 10) div n"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_docs"), sum(col("y")).as("n_pos"),
          max(col("n")).as("n"), max(col("npos")).as("npos"))
      val wC = org.apache.spark.sql.expressions.Window.orderBy("decile")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      dec.withColumn("cum_pos", sum(col("n_pos")).over(wC))
        .select(col("decile").cast("long").as("decile"),
          col("n_docs"), col("n_pos"),
          detRound(col("n_pos").cast("double") /
            col("n_docs").cast("double"), 6).as("positive_rate"),
          detRound((col("n_pos").cast("double") /
            col("n_docs").cast("double")) /
            (col("npos").cast("double") / col("n").cast("double")), 6)
            .as("lift"),
          detRound(col("cum_pos").cast("double") /
            col("npos").cast("double"), 6).as("cum_capture"))
        .orderBy("decile")
    }),

    "x_conformal_interval" -> ((s, d) => {
      // split-conformal prediction intervals (Vovk; Lei et al. 2018) —
      // distribution-free uncertainty: fit any point model on a train
      // split, take the ceil((n+1)·0.9)-th smallest absolute residual
      // on a CALIBRATION split as the interval half-width, and the
      // marginal coverage guarantee ≥ 90% holds on exchangeable test
      // rows regardless of the model. The point model here is the
      // per-priority train mean (the machinery, not the model, is the
      // operator); splits are the deterministic md5 coin. The quantile
      // is an ELEMENT SELECTED BY RANK off the per-(priority, residual)
      // histogram cumsum — the x_winsorized_stats posture: the window
      // runs over the grouped histogram partitioned by priority, never
      // raw rows — so the whole estimator is grouped passes plus one
      // broadcast join of the 5-row width table back onto test rows.
      val h = substring(md5(col("o_orderkey").cast("string")), 1, 1)
      val base = t(s, d, "orders")
        .select(col("o_orderpriority").as("prio"),
          col("o_totalprice").cast("decimal(18,2)").as("v"),
          when(h < "8", "train").when(h < "c", "calib")
            .otherwise("test").as("split"))
      val model = base.filter(col("split") === "train")
        .groupBy("prio")
        .agg(count(lit(1)).as("n_train"), sum(col("v")).as("sv"))
        .withColumn("mean_v",
          col("sv").cast("double") / col("n_train").cast("double"))
        .select("prio", "n_train", "mean_v")
      val calib = base.filter(col("split") === "calib")
        .join(broadcast(model), "prio")
        .select(col("prio"),
          floor(abs(col("v").cast("double") - col("mean_v")) * 1e6 +
            lit(0.5)).cast("long").as("qr"))
      val nCal = calib.groupBy("prio").agg(count(lit(1)).as("n_calib"))
      val wC = org.apache.spark.sql.expressions.Window
        .partitionBy("prio").orderBy("qr")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      val qhat = calib.groupBy("prio", "qr")
        .agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(wC))
        .join(broadcast(nCal), "prio")
        // rank ceil((n+1) * 0.9) = (9*(n+1) + 9) div 10 (integer-exact)
        .filter(col("cum") >= expr("(9 * (n_calib + 1) + 9) div 10"))
        .groupBy("prio")
        .agg(max(col("n_calib")).as("n_calib"),
          min(col("qr")).as("q_width"))
      val test = base.filter(col("split") === "test")
        .join(broadcast(model), "prio")
        .join(broadcast(qhat), "prio")
        .groupBy("prio")
        .agg(count(lit(1)).as("n_test"),
          sum(when(floor(abs(col("v").cast("double") - col("mean_v")) *
            1e6 + lit(0.5)).cast("long") <= col("q_width"), 1L)
            .otherwise(0L)).as("n_covered"),
          max(col("mean_v")).as("mean_v"),
          max(col("n_train")).as("n_train"),
          max(col("n_calib")).as("n_calib"),
          max(col("q_width")).as("q_width"))
      test.select(col("prio"), col("n_train"), col("n_calib"),
          col("n_test"),
          detRound(col("mean_v"), 4).as("point_estimate"),
          detRound(col("q_width").cast("double") / 1e6, 4)
            .as("interval_half_width"),
          detRound(col("n_covered").cast("double") /
            col("n_test").cast("double"), 6).as("test_coverage"))
        .orderBy("prio")
    }),

    "x_auc_roc" -> ((s, d) => {
      // ROC-AUC of the type-count signal predicting lang='en', via the
      // Mann-Whitney U statistic with exact tie handling: group docs by
      // score VALUE (n1/n0 pos/neg per value), scan values ascending,
      // U·2 = Σ_v n1(v)·(2·cum_n0_below + n0(v)) — ties contribute the
      // half-credit term as an integer, so AUC = U2 / (2·N1·N0) is a
      // ratio of EXACT integers (no rank floats, no interpolation).
      // Scale: the window runs over DISTINCT SCORE VALUES (already
      // grouped — thousands of rows, not docs); the per-value products
      // accumulate in DECIMAL(38,0) because N1·N0 passes int64 at
      // ~3e9 docs (Spark's long sum would wrap where DuckDB raises).
      val byV = docSignal(s, d)
        .groupBy(col("v"))
        .agg(sum(col("y")).cast("long").as("n1"),
          (count(lit(1)) - sum(col("y"))).cast("long").as("n0"))
      val wCum = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, -1)
      byV
        .withColumn("c0", coalesce(sum(col("n0")).over(wCum), lit(0L)))
        .agg(sum(col("n1") + col("n0")).cast("long").as("n_docs"),
          sum(col("n1")).cast("long").as("n_pos"),
          sum(col("n0")).cast("long").as("n_neg"),
          sum(col("n1").cast("decimal(19,0)")
            * (lit(2L) * col("c0") + col("n0")).cast("decimal(19,0)"))
            .as("u2"))
        .withColumn("auc", detRound(col("u2").cast("double")
          / (lit(2.0) * col("n_pos").cast("double")
            * col("n_neg").cast("double")), 6))
        .select(col("n_docs"), col("n_pos"), col("n_neg"), col("auc"))
    }),

    "x_calibration_bins" -> ((s, d) => {
      // reliability diagram for a monotone squash of the signal,
      // p = v/(v+50), against the empirical positive rate — the check a
      // pipeline runs before thresholding classifier scores into
      // keep/drop decisions. Bins are FIXED-WIDTH deciles of p
      // (bin = min(floor(10p), 9)) — a pure map-side expression that
      // needs no global rank pass, so the op is one grouped aggregate
      // at any corpus size (rank-deciles would need a distributed
      // quantile pass; fixed-width is the standard ECE binning).
      // mean_p is a 1e9 fixed-point mean; gap compares the two already
      // 6dp-rounded columns so the subtraction is exact.
      docSignal(s, d)
        .withColumn("p", col("v").cast("double")
          / (col("v") + lit(50)).cast("double"))
        .withColumn("bin",
          least(floor(col("p") * 10), lit(9.0)).cast("long"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("y")).cast("long").as("n_pos"),
          sum(floor(col("p") * 1e9 + 0.5).cast("long")).as("sp"))
        .withColumn("mean_p",
          detRound(col("sp").cast("double") / 1e9 / col("n_docs"), 6))
        .withColumn("frac_pos",
          detRound(col("n_pos").cast("double") / col("n_docs"), 6))
        .withColumn("gap", abs(col("mean_p") - col("frac_pos")))
        .select(col("bin"), col("n_docs"), col("n_pos"), col("mean_p"),
          col("frac_pos"), col("gap"))
        .orderBy(col("bin"))
    }),

    "x_isotonic_calibration" -> ((s, d) => {
      // isotonic recalibration of the reliability diagram via the PAV
      // closed form y*_i = max_{j≤i} min_{k≥i} wavg(j..k) (Ayer et al.
      // 1955): pool-adjacent-violators WITHOUT a sequential pass — the
      // O(bins³) max-min search runs as two grouped aggregates over the
      // bounded 10-bin table, one tiny follow-on stage after the single
      // corpus scan x_calibration_bins already pays. wavg(j..k) =
      // (K_k − K_{j−1})/(N_k − N_{j−1}) is a ratio of exact integer
      // prefix-sum differences, and min/max over those ratios involve
      // no accumulation, so the fitted nondecreasing curve is
      // bit-identical in both engines.
      val bins = docSignal(s, d)
        .withColumn("p", col("v").cast("double")
          / (col("v") + lit(50)).cast("double"))
        .withColumn("bin",
          least(floor(col("p") * 10), lit(9.0)).cast("long"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), sum(col("y")).cast("long").as("k"))
        .localCheckpoint()
      val w = Window.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val pre = bins
        .withColumn("cw", sum(col("n")).over(w))
        .withColumn("ck", sum(col("k")).over(w))
        .localCheckpoint()
      val segs = pre.select(col("bin").as("j"),
          (col("cw") - col("n")).as("wj"), (col("ck") - col("k")).as("kj"))
        .join(pre.select(col("bin").as("kk"), col("cw").as("wk"),
          col("ck").as("yk")), col("j") <= col("kk"))
        .select(col("j"), col("kk"),
          ((col("yk") - col("kj")).cast("double")
            / (col("wk") - col("wj"))).as("sa"))
      pre.select(col("bin"), col("n"), col("k"))
        .join(segs, col("j") <= col("bin") && col("kk") >= col("bin"))
        .groupBy(col("bin"), col("n"), col("k"), col("j"))
        .agg(min(col("sa")).as("mn"))
        .groupBy(col("bin"), col("n"), col("k"))
        .agg(max(col("mn")).as("iso"))
        .select(col("bin"), col("n").as("n_docs"), col("k").as("n_pos"),
          detRound(col("k").cast("double") / col("n"), 6).as("raw_rate"),
          detRound(col("iso"), 6).as("iso_rate"))
        .orderBy("bin")
    }),

    "x_mutual_information" -> ((s, d) => {
      // mutual information (nats) between the source and lang facets of
      // the corpus — the redundancy check run before stratifying a data
      // mix on correlated facets (high MI means the strata double-count)
      // — plus normalized MI (MI / sqrt(H_source·H_lang)). Counts are
      // three grouped aggregates (cells + two marginals, all broadcast
      // joins); each cell's term quantizes to 1e12 fixed point before
      // the integer sum. The log argument multiplies two EXACT ratios,
      // (c/r)·(N/s), never the raw products c·N — products of two
      // trillion-row counts would overflow int64/double where the
      // ratio form stays in range at any corpus size.
      val docs = t(s, d, "documents")
      val cells = docs.groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("c"))
      val ms = docs.groupBy(col("source")).agg(count(lit(1)).as("cs"))
      val ml = docs.groupBy(col("lang")).agg(count(lit(1)).as("cl"))
      val tot = docs.agg(count(lit(1)).as("nd"))
      val mi = cells
        .join(broadcast(ms), "source")
        .join(broadcast(ml), "lang")
        .crossJoin(broadcast(tot))
        .withColumn("term",
          (col("c").cast("double") / col("nd"))
            * log((col("c").cast("double") / col("cs"))
              * (col("nd").cast("double") / col("cl"))))
        .agg(max(col("nd")).as("n_docs"),
          count(lit(1)).as("n_cells"),
          sum(floor(col("term") * 1e12 + 0.5).cast("long")).as("qmi"))
      def entropyQ(m: DataFrame, cnt: String): DataFrame =
        m.crossJoin(broadcast(tot))
          .agg(sum(floor(-(col(cnt).cast("double") / col("nd"))
            * log(col(cnt).cast("double") / col("nd")) * 1e12 + 0.5)
            .cast("long")).as("qh"))
      val hs = entropyQ(ms, "cs").withColumnRenamed("qh", "qhs")
      val hl = entropyQ(ml, "cl").withColumnRenamed("qh", "qhl")
      mi.crossJoin(broadcast(hs)).crossJoin(broadcast(hl))
        .withColumn("mi", detRound(col("qmi").cast("double") / 1e12, 6))
        .withColumn("nmi", detRound((col("qmi").cast("double") / 1e12)
          / sqrt((col("qhs").cast("double") / 1e12)
            * (col("qhl").cast("double") / 1e12)), 6))
        .select(col("n_docs"), col("n_cells"), col("mi"), col("nmi"))
    }))

  def oracleSql: Map[String, String] = Map(

    "x_fleiss_kappa" ->
      """WITH rated AS (
           SELECT doc_id,
                  (CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)
                          || ':rater0'), 1, 1) < '2'
                        THEN CASE WHEN n_chars >= 300 THEN 0 ELSE 1 END
                        ELSE CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END
                   END)
                  + (CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)
                          || ':rater1'), 1, 1) < '2'
                        THEN CASE WHEN n_chars >= 300 THEN 0 ELSE 1 END
                        ELSE CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END
                   END)
                  + (CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)
                          || ':rater2'), 1, 1) < '2'
                        THEN CASE WHEN n_chars >= 300 THEN 0 ELSE 1 END
                        ELSE CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END
                   END) AS npos
           FROM documents),
         agg AS (
           SELECT COUNT(*) AS n_docs,
                  CAST(SUM(npos) AS BIGINT) AS tot_pos,
                  CAST(SUM(npos * npos + (3 - npos) * (3 - npos))
                       AS BIGINT) AS sq
           FROM rated),
         st AS (
           SELECT n_docs, tot_pos,
                  CAST(tot_pos AS DOUBLE) / (n_docs * 3) AS p_pos,
                  CAST(sq - n_docs * 3 AS DOUBLE)
                    / CAST(n_docs * 3 * 2 AS DOUBLE) AS p_bar
           FROM agg),
         pe AS (
           SELECT *, p_pos * p_pos + (1.0 - p_pos) * (1.0 - p_pos) AS p_e
           FROM st)
         SELECT n_docs,
                floor(p_pos * 1e6 + 0.5) / 1e6 AS p_pos,
                floor(p_bar * 1e6 + 0.5) / 1e6 AS p_bar,
                floor(p_e * 1e6 + 0.5) / 1e6 AS p_e,
                floor((p_bar - p_e) / (1.0 - p_e) * 1e6 + 0.5) / 1e6
                  AS fleiss_kappa
         FROM pe""",

    "x_cronbach_alpha" ->
      """WITH rated AS (
           SELECT doc_id,
                  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)
                         || ':rater0'), 1, 1) < '2'
                       THEN CASE WHEN n_chars >= 300 THEN 0 ELSE 1 END
                       ELSE CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END
                  END AS y0,
                  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)
                         || ':rater1'), 1, 1) < '2'
                       THEN CASE WHEN n_chars >= 300 THEN 0 ELSE 1 END
                       ELSE CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END
                  END AS y1,
                  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)
                         || ':rater2'), 1, 1) < '2'
                       THEN CASE WHEN n_chars >= 300 THEN 0 ELSE 1 END
                       ELSE CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END
                  END AS y2
           FROM documents),
         agg AS (
           SELECT COUNT(*) AS nd,
                  CAST(SUM(y0) AS BIGINT) AS s0,
                  CAST(SUM(y1) AS BIGINT) AS s1,
                  CAST(SUM(y2) AS BIGINT) AS s2,
                  CAST(SUM((y0 + y1 + y2) * (y0 + y1 + y2)) AS BIGINT)
                    AS sxx,
                  CAST(SUM(y0 + y1 + y2) AS BIGINT) AS sx
           FROM rated),
         st AS (
           SELECT nd,
                  (CAST(s0 AS DOUBLE) - CAST(s0 AS DOUBLE) * s0 / nd)
                    / (nd - 1)
                  + (CAST(s1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / nd)
                    / (nd - 1)
                  + (CAST(s2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / nd)
                    / (nd - 1) AS item_var,
                  (CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * sx / nd) / (nd - 1)
                    AS total_var
           FROM agg)
         SELECT nd AS n_docs, 3 AS k_items,
                floor(item_var * 1e6 + 0.5) / 1e6 AS sum_item_var,
                floor(total_var * 1e6 + 0.5) / 1e6 AS total_var,
                floor(3.0 / 2 * (1.0 - item_var / total_var) * 1e6
                      + 0.5) / 1e6 AS cronbach_alpha
         FROM st""",

    "x_mcnemar" ->
      """WITH paired AS (
           SELECT (CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)
                     || ':ra'), 1, 1) < '2'
                   THEN NOT (n_chars >= 300) ELSE n_chars >= 300 END)
                    = (n_chars >= 300) AS a_right,
                  (CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)
                     || ':rb'), 1, 1) < '3'
                   THEN NOT (n_chars >= 300) ELSE n_chars >= 300 END)
                    = (n_chars >= 300) AS b_right
           FROM documents),
         cells AS (
           SELECT COUNT(*) AS n_docs,
                  CAST(SUM(CASE WHEN a_right AND NOT b_right THEN 1
                           ELSE 0 END) AS BIGINT) AS b,
                  CAST(SUM(CASE WHEN NOT a_right AND b_right THEN 1
                           ELSE 0 END) AS BIGINT) AS c
           FROM paired),
         st AS (
           SELECT n_docs, b, c,
                  CAST(b - c AS DOUBLE) * (b - c)
                    / CAST(b + c AS DOUBLE) AS chi2,
                  CAST(abs(b - c) - 1 AS DOUBLE) * (abs(b - c) - 1)
                    / CAST(b + c AS DOUBLE) AS chi2_cc
           FROM cells)
         SELECT n_docs, b AS a_only_right, c AS b_only_right,
                floor(chi2 * 1e6 + 0.5) / 1e6 AS mcnemar_chi2,
                floor(chi2_cc * 1e6 + 0.5) / 1e6 AS mcnemar_chi2_cc,
                chi2_cc > 3.841 AS significant_05
         FROM st""",

    "x_cumulative_gains" ->
      s"""WITH $docSignalSql,
         tot AS (
           SELECT COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS npos FROM per),
         ranked AS (
           SELECT doc_id, CAST(y AS BIGINT) AS y,
                  row_number() OVER (ORDER BY v DESC, doc_id) AS rnk
           FROM per),
         dec AS (
           SELECT ((r.rnk - 1) * 10) // t.n AS decile,
                  COUNT(*) AS n_docs, CAST(SUM(r.y) AS BIGINT) AS n_pos,
                  MAX(t.n) AS n, MAX(t.npos) AS npos
           FROM ranked r, tot t GROUP BY 1),
         cumd AS (
           SELECT decile, n_docs, n_pos, n, npos,
                  CAST(SUM(n_pos) OVER (ORDER BY decile) AS BIGINT)
                    AS cum_pos
           FROM dec)
         SELECT CAST(decile AS BIGINT) AS decile, n_docs, n_pos,
                floor(CAST(n_pos AS DOUBLE) / CAST(n_docs AS DOUBLE)
                      * 1e6 + 0.5) / 1e6 AS positive_rate,
                floor((CAST(n_pos AS DOUBLE) / CAST(n_docs AS DOUBLE))
                      / (CAST(npos AS DOUBLE) / CAST(n AS DOUBLE))
                      * 1e6 + 0.5) / 1e6 AS lift,
                floor(CAST(cum_pos AS DOUBLE) / CAST(npos AS DOUBLE)
                      * 1e6 + 0.5) / 1e6 AS cum_capture
         FROM cumd ORDER BY decile""",

    "x_conformal_interval" ->
      """WITH base AS (
           SELECT o_orderpriority AS prio,
                  CAST(o_totalprice AS DECIMAL(18,2)) AS v,
                  CASE WHEN substring(md5(CAST(o_orderkey AS VARCHAR)),
                         1, 1) < '8' THEN 'train'
                       WHEN substring(md5(CAST(o_orderkey AS VARCHAR)),
                         1, 1) < 'c' THEN 'calib'
                       ELSE 'test' END AS split
           FROM orders),
         model AS (
           SELECT prio, COUNT(*) AS n_train,
                  CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                    AS mean_v
           FROM base WHERE split = 'train' GROUP BY 1),
         calib AS (
           SELECT b.prio,
                  CAST(floor(abs(CAST(b.v AS DOUBLE) - m.mean_v) * 1e6
                             + 0.5) AS BIGINT) AS qr
           FROM base b JOIN model m USING (prio)
           WHERE b.split = 'calib'),
         ncal AS (SELECT prio, COUNT(*) AS n_calib FROM calib GROUP BY 1),
         hist AS (
           SELECT prio, qr, COUNT(*) AS c,
                  SUM(COUNT(*)) OVER (PARTITION BY prio ORDER BY qr)
                    AS cum
           FROM calib GROUP BY 1, 2),
         qhat AS (
           SELECT h.prio, MAX(n.n_calib) AS n_calib,
                  MIN(h.qr) AS q_width
           FROM hist h JOIN ncal n USING (prio)
           WHERE h.cum >= (9 * (n.n_calib + 1) + 9) // 10
           GROUP BY 1),
         test AS (
           SELECT b.prio, COUNT(*) AS n_test,
                  CAST(SUM(CASE WHEN CAST(floor(abs(CAST(b.v AS DOUBLE)
                               - m.mean_v) * 1e6 + 0.5) AS BIGINT)
                             <= q.q_width THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_covered,
                  MAX(m.mean_v) AS mean_v,
                  MAX(m.n_train) AS n_train,
                  MAX(q.n_calib) AS n_calib,
                  MAX(q.q_width) AS q_width
           FROM base b JOIN model m USING (prio) JOIN qhat q USING (prio)
           WHERE b.split = 'test' GROUP BY 1)
         SELECT prio, n_train, n_calib, n_test,
                floor(mean_v * 1e4 + 0.5) / 1e4 AS point_estimate,
                floor((CAST(q_width AS DOUBLE) / 1e6) * 1e4 + 0.5) / 1e4
                  AS interval_half_width,
                floor(CAST(n_covered AS DOUBLE) / CAST(n_test AS DOUBLE)
                      * 1e6 + 0.5) / 1e6 AS test_coverage
         FROM test ORDER BY prio""",

    "x_auc_roc" ->
      s"""WITH $docSignalSql,
          byv AS (
            SELECT v, CAST(SUM(y) AS BIGINT) AS n1,
                   CAST(COUNT(*) - SUM(y) AS BIGINT) AS n0
            FROM per GROUP BY v),
          cum AS (
            SELECT v, n1, n0,
                   COALESCE(SUM(n0) OVER (ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS c0
            FROM byv)
          SELECT CAST(SUM(n1 + n0) AS BIGINT) AS n_docs,
                 CAST(SUM(n1) AS BIGINT) AS n_pos,
                 CAST(SUM(n0) AS BIGINT) AS n_neg,
                 floor((CAST(SUM(CAST(n1 AS HUGEINT)
                               * (2 * CAST(c0 AS HUGEINT) + n0)) AS DOUBLE)
                        / (CAST(2.0 AS DOUBLE)
                           * CAST(CAST(SUM(n1) AS BIGINT) AS DOUBLE)
                           * CAST(CAST(SUM(n0) AS BIGINT) AS DOUBLE)))
                       * 1e6 + 0.5) / 1e6 AS auc
          FROM cum""",

    "x_calibration_bins" ->
      s"""WITH $docSignalSql,
          scored AS (
            SELECT doc_id, y,
                   CAST(v AS DOUBLE) / CAST(v + 50 AS DOUBLE) AS p
            FROM per),
          b AS (
            SELECT CAST(least(floor(p * 10), 9.0) AS BIGINT) AS bin,
                   COUNT(*) AS n_docs,
                   CAST(SUM(y) AS BIGINT) AS n_pos,
                   CAST(SUM(CAST(floor(p * 1e9 + 0.5) AS BIGINT))
                        AS BIGINT) AS sp
            FROM scored GROUP BY 1)
          SELECT bin, n_docs, n_pos,
                 floor(CAST(sp AS DOUBLE) / 1e9 / n_docs * 1e6 + 0.5)
                   / 1e6 AS mean_p,
                 floor(CAST(n_pos AS DOUBLE) / n_docs * 1e6 + 0.5)
                   / 1e6 AS frac_pos,
                 abs(floor(CAST(sp AS DOUBLE) / 1e9 / n_docs * 1e6 + 0.5)
                       / 1e6
                     - floor(CAST(n_pos AS DOUBLE) / n_docs * 1e6 + 0.5)
                       / 1e6) AS gap
          FROM b ORDER BY bin""",

    "x_isotonic_calibration" ->
      s"""WITH $docSignalSql,
          scored AS (
            SELECT doc_id, y,
                   CAST(v AS DOUBLE) / CAST(v + 50 AS DOUBLE) AS p
            FROM per),
          bins AS (
            SELECT CAST(least(floor(p * 10), 9.0) AS BIGINT) AS bin,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS BIGINT) AS k
            FROM scored GROUP BY 1),
          pre AS (
            SELECT bin, n, k,
                   CAST(SUM(n) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
                     PRECEDING AND CURRENT ROW) AS BIGINT) AS cw,
                   CAST(SUM(k) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
                     PRECEDING AND CURRENT ROW) AS BIGINT) AS ck
            FROM bins),
          segs AS (
            SELECT a.bin AS j, b.bin AS kk,
                   CAST(b.ck - (a.ck - a.k) AS DOUBLE)
                     / (b.cw - (a.cw - a.n)) AS sa
            FROM pre a JOIN pre b ON a.bin <= b.bin),
          inner_min AS (
            SELECT p.bin, p.n, p.k, s.j, MIN(s.sa) AS mn
            FROM pre p JOIN segs s
              ON s.j <= p.bin AND s.kk >= p.bin
            GROUP BY 1, 2, 3, 4),
          iso AS (
            SELECT bin, n, k, MAX(mn) AS iso FROM inner_min
            GROUP BY 1, 2, 3)
          SELECT bin, n AS n_docs, k AS n_pos,
                 floor(CAST(k AS DOUBLE) / n * 1e6 + 0.5) / 1e6
                   AS raw_rate,
                 floor(iso * 1e6 + 0.5) / 1e6 AS iso_rate
          FROM iso ORDER BY bin""",

    "x_mutual_information" ->
      """WITH cells AS (
           SELECT source, lang, COUNT(*) AS c
           FROM documents GROUP BY 1, 2),
         ms AS (SELECT source, COUNT(*) AS cs FROM documents GROUP BY 1),
         ml AS (SELECT lang, COUNT(*) AS cl FROM documents GROUP BY 1),
         tot AS (SELECT COUNT(*) AS nd FROM documents),
         mi AS (
           SELECT MAX(nd) AS n_docs, COUNT(*) AS n_cells,
                  CAST(SUM(CAST(floor(
                    (CAST(c AS DOUBLE) / nd)
                    * ln((CAST(c AS DOUBLE) / cs)
                         * (CAST(nd AS DOUBLE) / cl)) * 1e12 + 0.5)
                    AS BIGINT)) AS BIGINT) AS qmi
           FROM cells
           JOIN ms USING (source) JOIN ml USING (lang) CROSS JOIN tot),
         hs AS (
           SELECT CAST(SUM(CAST(floor(
                    -(CAST(cs AS DOUBLE) / nd)
                    * ln(CAST(cs AS DOUBLE) / nd) * 1e12 + 0.5)
                    AS BIGINT)) AS BIGINT) AS qhs
           FROM ms CROSS JOIN tot),
         hl AS (
           SELECT CAST(SUM(CAST(floor(
                    -(CAST(cl AS DOUBLE) / nd)
                    * ln(CAST(cl AS DOUBLE) / nd) * 1e12 + 0.5)
                    AS BIGINT)) AS BIGINT) AS qhl
           FROM ml CROSS JOIN tot)
         SELECT n_docs, n_cells,
                floor(CAST(qmi AS DOUBLE) / 1e12 * 1e6 + 0.5) / 1e6 AS mi,
                floor((CAST(qmi AS DOUBLE) / 1e12)
                      / sqrt((CAST(qhs AS DOUBLE) / 1e12)
                             * (CAST(qhl AS DOUBLE) / 1e12))
                      * 1e6 + 0.5) / 1e6 AS nmi
         FROM mi CROSS JOIN hs CROSS JOIN hl""")
}
