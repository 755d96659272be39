package graft

/** Brute-force references for the round-12 operators (x_zipf_fit,
  * x_heaps_law, x_moments, x_empirical_bayes): the DuckDB hash-compare
  * proves cross-engine equality of the distributed formulation; these
  * tests prove the formulation itself — a third, independent
  * implementation in plain Scala over the collected sf0.001 tables,
  * written the naive way (build the full frequency map, sort, walk).
  */
class CorpusLawsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def qln(v: Double): Long = math.floor(math.log(v) * 1e6 + 0.5).toLong

  private def olsSlope(pts: Seq[(Long, Long)]): Double = {
    val n = pts.size.toDouble
    val sx = pts.map(_._1).sum.toDouble
    val sy = pts.map(_._2).sum.toDouble
    val sxy = pts.map(p => p._1 * p._2).sum.toDouble
    val sxx = pts.map(p => p._1 * p._1).sum.toDouble
    (n * sxy - sx * sy) / (n * sxx - sx * sx)
  }

  private lazy val docs: Seq[(Long, String, String)] =
    graft.util.Tables.t(spark, sf, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  test("x_zipf_fit equals the sort-the-frequency-table brute force and " +
      "r2 lands in [0, 1]") {
    val got = run("x_zipf_fit").collect().map(r => r.getString(0) -> r).toMap
    val byLang = docs.groupBy(_._2)
    assert(got.keySet === byLang.keySet)
    byLang.foreach { case (lang, rows) =>
      val freq = rows.flatMap(_._3.split(" ")).groupBy(identity)
        .view.mapValues(_.size.toLong).toSeq
      val ranked = freq.sortBy { case (w, f) => (-f, w) }.take(200)
      val pts = ranked.zipWithIndex.map { case ((_, f), i) =>
        (qln((i + 1).toDouble), qln(f.toDouble))
      }
      val slope = olsSlope(pts)
      val r = got(lang)
      assert(r.getAs[Long]("n_words") === ranked.size.toLong, lang)
      assert(math.abs(r.getAs[Double]("zipf_exponent") - (-slope)) < 1e-5,
        s"$lang: ${r.getAs[Double]("zipf_exponent")} vs ${-slope}")
      val r2 = r.getAs[Double]("fit_r2")
      assert(r2 >= 0.0 && r2 <= 1.0 + 1e-9, s"$lang r2=$r2")
      // a natural-ish corpus has a decreasing rank-frequency curve
      assert(r.getAs[Double]("zipf_exponent") > 0.0, lang)
    }
  }

  test("x_heaps_law equals the prefix-walk brute force; the growth curve " +
      "is monotone in both tokens and types") {
    val got = run("x_heaps_law").collect().sortBy(_.getAs[Long]("cp"))
    assert(got.length === 8)
    val maxId = docs.map(_._1).max
    val perDoc = docs.map(d => (d._1, d._3.split(" ").length.toLong))
    val firstOcc = docs.flatMap(d => d._3.split(" ").map(w => (w, d._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val expected = (1 to 8).map { cp =>
      val cut = maxId * cp / 8
      val nTok = perDoc.filter(_._1 <= cut).map(_._2).sum
      val nTyp = firstOcc.count(_._2 <= cut).toLong
      (cp.toLong, nTok, nTyp)
    }
    val curvePts = expected.map { case (_, nt, ny) =>
      (qln(nt.toDouble), qln(ny.toDouble))
    }
    val beta = olsSlope(curvePts)
    got.zip(expected).foreach { case (r, (cp, nTok, nTyp)) =>
      assert(r.getAs[Long]("cp") === cp)
      assert(r.getAs[Long]("n_tokens") === nTok, s"cp=$cp")
      assert(r.getAs[Long]("n_types") === nTyp, s"cp=$cp")
      assert(math.abs(r.getAs[Double]("heaps_beta") - beta) < 1e-5)
    }
    got.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n_tokens") <= b.getAs[Long]("n_tokens"))
      assert(a.getAs[Long]("n_types") <= b.getAs[Long]("n_types"))
    }
  }

  test("x_dedup_saturation equals the first-occurrence prefix walk and " +
      "the dup fraction rises toward the interleaved-copy ceiling") {
    val corpus = docs.flatMap(d =>
      Seq((d._1 * 2 - 1, d._3), (d._1 * 2, d._3)))
    val firstByText = corpus.groupBy(_._2).view.mapValues(_.map(_._1).min)
      .toMap
    val maxId = corpus.map(_._1).max
    val got = run("x_dedup_saturation").collect().sortBy(_.getAs[Long]("cp"))
    assert(got.length === 8)
    var prev = (0L, 0L)
    (1 to 8).zip(got).foreach { case (cp, r) =>
      val cut = maxId * cp / 8
      val in = corpus.filter(_._1 <= cut)
      val nDups = in.count(p => p._1 > firstByText(p._2)).toLong
      assert(r.getAs[Long]("n_docs") === in.size.toLong, s"cp=$cp")
      assert(r.getAs[Long]("n_dups") === nDups, s"cp=$cp")
      assert(math.abs(r.getAs[Double]("dup_frac") -
        nDups.toDouble / in.size) < 1e-5, s"cp=$cp")
      val md = (nDups - prev._2).toDouble / (in.size - prev._1)
      assert(math.abs(r.getAs[Double]("marginal_dup_frac") - md) < 1e-5,
        s"cp=$cp")
      prev = (in.size.toLong, nDups)
    }
    // interleaved copies: every prefix is close to half duplicates
    assert(got.last.getAs[Double]("dup_frac") > 0.4)
  }

  test("x_ess_weights equals the Kish walk; uniform is exactly n and " +
      "sharper reweighting monotonically shrinks the effective sample") {
    val langN = docs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val total = langN.values.sum
    def ess(tau: Double): Double = {
      val qw = langN.view.mapValues { n =>
        val inv = total.toDouble / n
        val w = if (tau == 0.0) 1e9 else if (tau == 0.5) math.sqrt(inv) * 1e9
          else inv * 1e9
        math.floor(w + 0.5).toLong
      }.toMap
      val sw = langN.map { case (l, n) => BigInt(n) * BigInt(qw(l)) }.sum
        .toDouble
      val sww = langN.map { case (l, n) =>
        BigInt(n) * BigInt(qw(l)) * BigInt(qw(l)) }.sum.toDouble
      sw * sw / sww
    }
    val got = run("x_ess_weights").collect()
      .map(r => r.getAs[String]("strategy") -> r).toMap
    assert(got.keySet === Set("t0_uniform", "t05_sqrt_inverse",
      "t1_inverse"))
    val e0 = got("t0_uniform").getAs[Double]("ess")
    val e5 = got("t05_sqrt_inverse").getAs[Double]("ess")
    val e1 = got("t1_inverse").getAs[Double]("ess")
    assert(math.abs(e0 - total.toDouble) < 1e-3, "uniform ESS must be n")
    assert(math.abs(e5 - ess(0.5)) < 1e-2)
    assert(math.abs(e1 - ess(1.0)) < 1e-2)
    assert(e0 >= e5 && e5 >= e1,
      s"sharper reweighting must not increase ESS: $e0, $e5, $e1")
    got.values.foreach { r =>
      val frac = r.getAs[Double]("ess_frac")
      assert(frac > 0.0 && frac <= 1.0 + 1e-9)
    }
  }

  test("x_fdr_bh equals the z-and-sort walk, the embedded critical " +
      "values pin known normal quantiles, and the step-up rule is " +
      "self-consistent") {
    val cust = graft.util.Tables.t(spark, sf, "customer")
      .select("c_custkey", "c_nationkey").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val per = graft.util.Tables.t(spark, sf, "orders")
      .select("o_custkey", "o_orderstatus").collect()
      .map(r => (cust(r.getLong(0)), if (r.getString(1) == "F") 1L else 0L))
      .groupBy(_._1).map { case (nat, rows) =>
        (nat, rows.size.toLong, rows.map(_._2).sum)
      }.toSeq
    val tn = per.map(_._2).sum.toDouble
    val tk = per.map(_._3).sum.toDouble
    val p0 = tk / tn
    val zs = per.map { case (nat, n, k) =>
      (nat, (k.toDouble / n - p0) /
        math.sqrt(p0 * (1.0 - p0) / n))
    }.toMap
    val got = run("x_fdr_bh").collect()
      .sortBy(_.getAs[Long]("bh_rank"))
    assert(got.length === per.size)
    // ranks are |z| descending with nation tiebreak
    val expOrder = zs.toSeq.sortBy { case (nat, z) => (-math.abs(z), nat) }
      .map(_._1)
    assert(got.map(_.getAs[Int]("nation").toLong).toSeq === expOrder)
    got.foreach { r =>
      assert(math.abs(r.getAs[Double]("z_stat") -
        zs(r.getAs[Int]("nation").toLong)) < 1e-5)
    }
    // the embedded Acklam quantiles pin the known normal values:
    // rank m (i = 25): Phi^-1(0.975) = 1.959964; rank 1: Phi^-1(0.999)
    assert(math.abs(got.last.getAs[Double]("bh_crit") - 1.959964) < 1e-4)
    assert(math.abs(got.head.getAs[Double]("bh_crit") - 3.090232) < 1e-4)
    // step-up self-consistency: rejected iff rank <= last passing rank
    val passing = got.filter(r =>
      math.abs(r.getAs[Double]("z_stat")) >= r.getAs[Double]("bh_crit"))
    val imax = if (passing.isEmpty) 0L
      else passing.map(_.getAs[Long]("bh_rank")).max
    got.foreach { r =>
      assert(r.getAs[Boolean]("rejected") ===
        (r.getAs[Long]("bh_rank") <= imax))
    }
  }

  test("x_benjamini_yekutieli: c(m) is the exact quantized harmonic sum, " +
      "every rank's critical value is strictly above BH's (and pins the " +
      "known quantiles), the step-up rule is self-consistent, and the BY " +
      "rejection set nests inside BH's") {
    val by = run("x_benjamini_yekutieli").collect()
      .sortBy(_.getAs[Long]("by_rank"))
    val bh = run("x_fdr_bh").collect()
      .sortBy(_.getAs[Long]("bh_rank"))
    assert(by.length === bh.length)
    // same battery, same ranking: z and order agree with the BH op
    by.zip(bh).foreach { case (a, b) =>
      assert(a.getAs[Int]("nation") === b.getAs[Int]("nation"))
      assert(a.getAs[Double]("z_stat") === b.getAs[Double]("z_stat"))
    }
    // c(m): each 1/i term 1e12-quantized before the sum
    val m = by.head.getAs[Long]("m_tests").toInt
    val cmExp = (1 to m).map(i => math.floor(1e12 / i + 0.5).toLong)
      .sum / 1e12
    by.foreach(r =>
      assert(math.abs(r.getAs[Double]("c_m") - cmExp) < 1e-6))
    // dependence-robust criticals sit strictly above BH's at every rank,
    // and pin the known quantiles at ranks 1 and m (m = 25 battery:
    // Phi^-1(1 - (i*0.05/(25*H25))/2))
    by.zip(bh).foreach { case (a, b) =>
      assert(a.getAs[Double]("by_crit") > b.getAs[Double]("bh_crit"))
    }
    assert(math.abs(by.head.getAs[Double]("by_crit") - 3.468119) < 1e-4)
    assert(math.abs(by.last.getAs[Double]("by_crit") - 2.480961) < 1e-4)
    // step-up self-consistency
    val passing = by.filter(r =>
      math.abs(r.getAs[Double]("z_stat")) >= r.getAs[Double]("by_crit"))
    val imax = if (passing.isEmpty) 0L
      else passing.map(_.getAs[Long]("by_rank")).max
    by.foreach { r =>
      assert(r.getAs[Boolean]("rejected") ===
        (r.getAs[Long]("by_rank") <= imax))
    }
    // conservativeness: BY rejects a subset of BH's rejections
    val byRej = by.filter(_.getAs[Boolean]("rejected"))
      .map(_.getAs[Int]("nation")).toSet
    val bhRej = bh.filter(_.getAs[Boolean]("rejected"))
      .map(_.getAs[Int]("nation")).toSet
    assert(byRej.subsetOf(bhRej))
  }

  test("x_hill_tail_index equals the sort-and-log walk over the top 200") {
    val vs = graft.util.Tables.t(spark, sf, "orders")
      .select("o_totalprice").collect().map(_.getDouble(0))
      .sortBy(-_).take(201)
    val xk1 = vs.last
    val qsum = vs.map(v => math.floor(math.log(v / xk1) * 1e6 + 0.5).toLong)
      .sum
    val alpha = 1.0 / (qsum.toDouble / 1e6 / 200.0)
    val r = run("x_hill_tail_index").collect()(0)
    assert(r.getAs[Long]("k") === 200L)
    assert(math.abs(r.getAs[Double]("threshold_value") - xk1) < 0.01)
    assert(math.abs(r.getAs[Double]("hill_alpha") - alpha) < 1e-5)
    assert(alpha > 0.0)
  }

  test("x_mahalanobis_outliers equals the closed-form 2x2 walk, " +
      "rank-for-rank") {
    val rows = graft.util.Tables.t(spark, sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getDouble(2).toLong,
        math.floor(r.getDouble(3) * 100 + 0.5).toLong))
    val n = rows.length.toDouble
    val sx = rows.map(_._3).sum.toDouble
    val sy = rows.map(r => BigInt(r._4)).sum.toDouble
    val sxx = rows.map(r => r._3 * r._3).sum.toDouble
    val sxy = rows.map(r => BigInt(r._3 * r._4)).sum.toDouble
    val syy = rows.map(r => BigInt(r._4) * BigInt(r._4)).sum.toDouble
    val (mx, my) = (sx / n, sy / n)
    val vxx = sxx / n - mx * mx
    val vyy = syy / n - my * my
    val vxy = sxy / n - mx * my
    val det = vxx * vyy - vxy * vxy
    def d2(x: Long, y: Long): Double = {
      val (dx, dy) = (x - mx, y - my)
      (dx * dx * vyy - 2.0 * dx * dy * vxy + dy * dy * vxx) / det
    }
    val expected = rows
      .map(r => (r._1, r._2, math.floor(d2(r._3, r._4) * 1e9 + 0.5).toLong))
      .sortBy(t => (-t._3, t._1, t._2)).take(15)
    val got = run("x_mahalanobis_outliers").collect()
    assert(got.length === 15)
    got.zip(expected).foreach { case (r, (ok, ln, qd)) =>
      assert(r.getAs[Long]("l_orderkey") === ok)
      assert(r.getAs[Long]("l_linenumber") === ln)
      assert(math.abs(r.getAs[Double]("mahalanobis_d2") - qd / 1e9) < 1e-4)
    }
  }

  test("x_cumulative_gains equals the sort-and-cut walk; deciles " +
      "partition the corpus and cum_capture ends at exactly 1") {
    val per = docs.map { d =>
      val toks = d._3.split(" ").distinct.length.toLong
      (d._1, toks, if (d._2 == "en") 1L else 0L)
    }
    val ranked = per.sortBy(p => (-p._2, p._1)).zipWithIndex
    val n = per.size
    val npos = per.map(_._3).sum.toDouble
    val expected = ranked
      .groupBy { case (_, i) => (i.toLong * 10) / n }
      .view.mapValues { rows =>
        (rows.size.toLong, rows.map(_._1._3).sum)
      }.toMap
    val got = run("x_cumulative_gains").collect()
      .sortBy(_.getAs[Long]("decile"))
    assert(got.map(_.getAs[Long]("n_docs")).sum === n.toLong)
    var cum = 0L
    got.foreach { r =>
      val d = r.getAs[Long]("decile")
      val (nd, kd) = expected(d)
      assert(r.getAs[Long]("n_docs") === nd, s"decile $d")
      assert(r.getAs[Long]("n_pos") === kd, s"decile $d")
      assert(math.abs(r.getAs[Double]("positive_rate") -
        kd.toDouble / nd) < 1e-5, s"decile $d")
      assert(math.abs(r.getAs[Double]("lift") -
        (kd.toDouble / nd) / (npos / n)) < 1e-4, s"decile $d")
      cum += kd
      assert(math.abs(r.getAs[Double]("cum_capture") - cum / npos) < 1e-5)
    }
    assert(math.abs(got.last.getAs[Double]("cum_capture") - 1.0) < 1e-9)
  }

  test("x_conformal_interval equals the rank-selection walk and the " +
      "calibration split itself is covered at >= the nominal rate") {
    def hexOf(k: Long): Char = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(k.toString.getBytes("UTF-8"))
      "0123456789abcdef".charAt((h(0) >> 4) & 0xf)
    }
    val rows = graft.util.Tables.t(spark, sf, "orders")
      .select("o_orderkey", "o_orderpriority", "o_totalprice").collect()
      .map { r =>
        val hx = hexOf(r.getLong(0))
        val split = if (hx < '8') "train" else if (hx < 'c') "calib"
          else "test"
        (r.getString(1), split,
          BigDecimal(r.getDouble(2)).setScale(2,
            BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    val got = run("x_conformal_interval").collect()
      .map(r => r.getAs[String]("prio") -> r).toMap
    rows.groupBy(_._1).foreach { case (prio, prows) =>
      val train = prows.filter(_._2 == "train").map(_._3)
      val calib = prows.filter(_._2 == "calib").map(_._3)
      val test = prows.filter(_._2 == "test").map(_._3)
      if (got.contains(prio)) {
        val mean = train.sum / train.size
        val qrs = calib.map(v =>
          math.floor(math.abs(v - mean) * 1e6 + 0.5).toLong).sorted
        val rank = (9 * (calib.size + 1) + 9) / 10
        val qw = qrs(math.min(rank, qrs.size) - 1)
        val r = got(prio)
        assert(r.getAs[Long]("n_train") === train.size.toLong, prio)
        assert(r.getAs[Long]("n_calib") === calib.size.toLong, prio)
        assert(r.getAs[Long]("n_test") === test.size.toLong, prio)
        assert(math.abs(r.getAs[Double]("interval_half_width") -
          qw / 1e6) < 1e-3, prio)
        val cov = test.count(v => math.floor(math.abs(v - mean) * 1e6
          + 0.5).toLong <= qw).toDouble / test.size
        assert(math.abs(r.getAs[Double]("test_coverage") - cov) < 1e-5,
          prio)
        // the conformal guarantee holds by construction ON the
        // calibration residuals: at least ceil((n+1)*0.9)/n of them
        // sit within the selected width
        val calCov = qrs.count(_ <= qw).toDouble / qrs.size
        assert(calCov >= 0.9 - 1e-9, s"$prio calibration coverage $calCov")
      }
    }
  }

  test("x_moments equals the naive central-moment walk on floor-dollar " +
      "values") {
    val got = run("x_moments").collect().map(r => r.getString(0) -> r).toMap
    val orders = graft.util.Tables.t(spark, sf, "orders")
      .select("o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1)))).toSeq
    val byPrio = orders.groupBy(_._1)
    assert(got.keySet === byPrio.keySet)
    byPrio.foreach { case (prio, rows) =>
      val xs = rows.map(_._2)
      val n = xs.length.toDouble
      val mu = xs.sum / n
      val m2 = xs.map(x => (x - mu) * (x - mu)).sum / n
      val m3 = xs.map(x => math.pow(x - mu, 3)).sum / n
      val m4 = xs.map(x => math.pow(x - mu, 4)).sum / n
      val r = got(prio)
      assert(r.getAs[Long]("n") === xs.length.toLong, prio)
      assert(math.abs(r.getAs[Double]("mean_dollars") - mu) < 1e-3, prio)
      assert(math.abs(r.getAs[Double]("stddev_pop") - math.sqrt(m2)) < 1e-2,
        prio)
      // raw-moment expansion vs the direct centered sums: agreement to
      // float-cancellation tolerance, not bit equality (that's the
      // oracle's job — this asserts the FORMULATION is the right moment)
      assert(math.abs(r.getAs[Double]("skewness") -
        m3 / (m2 * math.sqrt(m2))) < 1e-4, prio)
      assert(math.abs(r.getAs[Double]("excess_kurtosis") -
        (m4 / (m2 * m2) - 3.0)) < 1e-4, prio)
    }
  }

  test("x_empirical_bayes: shrunk rates sit between the raw rate and the " +
      "prior mean, low-n parts shrink hardest, and the prior matches the " +
      "method-of-moments brute force") {
    val li = graft.util.Tables.t(spark, sf, "lineitem")
      .select("l_partkey", "l_returnflag").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val per = li.groupBy(_._1).map { case (pk, rows) =>
      (pk, rows.size.toLong, rows.count(_._2 == "R").toLong)
    }.toSeq
    // brute-force the quantized method-of-moments prior
    val qs = per.map { case (_, n, k) =>
      math.floor(k.toDouble / n.toDouble * 1e9 + 0.5).toLong
    }
    val np = qs.size.toDouble
    val m = qs.sum.toDouble / np / 1e9
    val m2 = qs.map(q => BigDecimal(q) * BigDecimal(q)).sum.toDouble / np / 1e18
    val v = m2 - m * m
    val nu = m * (1.0 - m) / v - 1.0
    val (alpha, beta) = (m * nu, (1.0 - m) * nu)
    assert(alpha > 0 && beta > 0, s"prior must be proper: $alpha, $beta")

    val got = run("x_empirical_bayes").collect()
    assert(got.length === 15)
    got.foreach { r =>
      assert(math.abs(r.getAs[Double]("prior_alpha") - alpha) < 1e-4)
      assert(math.abs(r.getAs[Double]("prior_beta") - beta) < 1e-4)
      val raw = r.getAs[Double]("raw_rate")
      val shrunk = r.getAs[Double]("shrunk_rate")
      // shrinkage moves toward the prior mean and never overshoots it
      val lo = math.min(raw, m) - 1e-6
      val hi = math.max(raw, m) + 1e-6
      assert(shrunk >= lo && shrunk <= hi,
        s"shrunk $shrunk outside [$lo, $hi] (raw $raw, prior mean $m)")
    }
    // the top-delta rows are dominated by low-evidence parts: every one
    // of the 15 must have fewer lines than the per-part average
    val avgN = per.map(_._2).sum.toDouble / per.size
    got.foreach { r =>
      assert(r.getAs[Long]("n") <= math.ceil(avgN * 2).toLong,
        s"a high-evidence part (n=${r.getAs[Long]("n")}) should not " +
          "lead the shrinkage-delta ranking")
    }
  }
}
