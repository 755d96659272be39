package graft

import org.apache.spark.sql.functions._

/** First-principles recompute checks for the demand-planning family —
  * the oracle twin shares the engine's recipe (same ladder, same
  * quantizers), so this spec independently rebuilds the per-brand daily
  * demand series driver-side and re-derives each estimator in plain
  * unquantized Scala doubles. */
class DemandOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** brand -> date-ordered (epochDay, totalQty) demand series, plus the
    * global calendar span — rebuilt directly from the parquet rows. */
  private lazy val (series, spanDays) = {
    val rows = spark.read.parquet(s"$dir/lineitem.parquet")
      .join(spark.read.parquet(s"$dir/part.parquet"),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), to_date(col("l_shipdate")).as("day"),
        col("l_quantity"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay,
        r.getDouble(2)))
    val byBrandDay = rows.groupBy(t => (t._1, t._2))
      .map { case ((b, d), xs) =>
        // mirror the engine's exact per-day decimal sum of 4-dp values
        (b, d, xs.map(x => math.floor(x._3 * 1e4 + 0.5).toLong).sum / 1e4)
      }.toSeq
    val ser = byBrandDay.groupBy(_._1).map { case (b, xs) =>
      b -> xs.map(x => (x._2, x._3)).sortBy(_._1)
    }
    val span = rows.map(_._2).max - rows.map(_._2).min + 1
    (ser, span)
  }

  private val beta = 0.8

  /** Truncated normalized EWMA ladder over the last (up to) 40 values,
    * newest first — the engine's formulation in plain doubles. */
  private def ladder(vals: Seq[Double]): Double = {
    val lags = vals.reverse.take(40)
    val num = lags.zipWithIndex.map { case (v, i) => v * math.pow(beta, i) }
    val den = lags.indices.map(i => math.pow(beta, i))
    num.sum / den.sum
  }

  test("x_croston_demand matches a plain-Scala truncated-ladder Croston " +
      "on every brand (size, interval, rate, SBA correction)") {
    val got = SparkEntry.queries("x_croston_demand")(spark, dir)
      .collect()
      .map(r => r.getAs[String]("brand") ->
        (r.getAs[Long]("n_demand_days"), r.getAs[Double]("zero_frac"),
          r.getAs[Double]("size_hat"), r.getAs[Double]("interval_hat"),
          r.getAs[Double]("demand_rate"), r.getAs[Double]("sba_rate")))
      .toMap
    assert(got.keySet === series.keySet)
    series.foreach { case (b, s) =>
      val (nd, zf, z, p, rate, sba) = got(b)
      assert(nd === s.length.toLong)
      assert(math.abs(zf - (spanDays - s.length).toDouble / spanDays) < 1e-6)
      val ez = ladder(s.map(_._2))
      val ivs = s.sliding(2).collect {
        case Seq(a, c) => (c._1 - a._1).toDouble }.toSeq
      val ep = ladder(ivs)
      assert(math.abs(z - ez) < 1e-5, s"$b size: engine $z vs exact $ez")
      assert(math.abs(p - ep) < 1e-5, s"$b interval: $p vs $ep")
      assert(math.abs(rate - ez / ep) < 1e-4, s"$b rate")
      assert(math.abs(sba - 0.9 * ez / ep) < 1e-4, s"$b sba")
    }
  }

  test("x_safety_stock matches zero-day-inclusive moments and the " +
      "normal-buffer formula on every brand") {
    val got = SparkEntry.queries("x_safety_stock")(spark, dir)
      .collect()
      .map(r => r.getAs[String]("brand") ->
        (r.getAs[Long]("n_span_days"), r.getAs[Double]("mean_daily"),
          r.getAs[Double]("sd_daily"), r.getAs[Double]("safety_stock"),
          r.getAs[Double]("reorder_point")))
      .toMap
    series.foreach { case (b, s) =>
      val (n, mu, sd, ss, rop) = got(b)
      assert(n === spanDays)
      val full = s.map(_._2) ++ Seq.fill((spanDays - s.length).toInt)(0.0)
      val em = full.sum / full.length
      val ev = full.map(v => (v - em) * (v - em)).sum / (full.length - 1)
      val esd = math.sqrt(ev)
      val ess = 1.6448536269514722 * esd * math.sqrt(7.0)
      assert(math.abs(mu - em) < 1e-5, s"$b mean: $mu vs $em")
      assert(math.abs(sd - esd) < 1e-4, s"$b sd: $sd vs $esd")
      assert(math.abs(ss - ess) < 1e-3, s"$b ss: $ss vs $ess")
      assert(math.abs(rop - (7 * em + ess)) < 1e-3, s"$b rop")
    }
  }

  test("x_newsvendor_quantile picks the exact 75th-percentile order " +
      "statistic of the zero-inclusive daily demand distribution") {
    val got = SparkEntry.queries("x_newsvendor_quantile")(spark, dir)
      .collect()
      .map(r => r.getAs[String]("brand") ->
        (r.getAs[Double]("stock_level"), r.getAs[Double]("cdf_at_level")))
      .toMap
    series.foreach { case (b, s) =>
      val (lvl, cdf) = got(b)
      val full = (s.map(_._2) ++
        Seq.fill((spanDays - s.length).toInt)(0.0)).sorted
      // smallest rank c with 4·c ≥ 3·n is ceil(3n/4); the engine's
      // level is the value at that order statistic, and its cdf counts
      // ALL days ≤ that level (a duplicate run rolls up to one level)
      val expLvl = full(((3 * spanDays + 3) / 4 - 1).toInt)
      assert(lvl === expLvl, s"$b level: $lvl vs $expLvl")
      val expCdf = full.count(_ <= expLvl).toDouble / spanDays
      assert(math.abs(cdf - expCdf) < 1e-6, s"$b cdf: $cdf vs $expCdf")
      assert(cdf >= 0.75)
    }
  }

  test("x_abc_xyz: cumulative revenue shares walk the sorted brands, " +
      "classes honor the 80/95 and 0.5/1.0 cuts, and the weekly CV " +
      "matches zero-week-inclusive moments") {
    val revRows = spark.read.parquet(s"$dir/lineitem.parquet")
      .join(spark.read.parquet(s"$dir/part.parquet"),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), col("l_extendedprice"), col("l_discount"))
      .collect()
      .map(r => (r.getString(0),
        // mirror the DECIMAL(18,2) x DECIMAL(4,2) exact product in
        // integer ten-thousandths of a currency unit
        math.floor(r.getDouble(1) * 100 + 0.5).toLong *
          math.floor((1.0 - r.getDouble(2)) * 100 + 0.5).toLong))
    val revByBrand = revRows.groupBy(_._1).map { case (b, xs) =>
      b -> xs.map(_._2).sum
    }
    val totalRev = revByBrand.values.sum.toDouble
    val sorted = revByBrand.toSeq.sortBy { case (b, r) => (-r, b) }
    val cumShares = sorted.scanLeft(0.0) { case (acc, (_, r)) =>
      acc + r
    }.tail.map(_ / totalRev)
    val expAbc = sorted.zip(cumShares).map { case ((b, r), cs) =>
      b -> (r / totalRev, cs,
        if (cs <= 0.80) "A" else if (cs <= 0.95) "B" else "C")
    }.toMap
    val got = SparkEntry.queries("x_abc_xyz")(spark, dir).collect()
    assert(got.length === revByBrand.size)
    got.foreach { r =>
      val b = r.getAs[String]("brand")
      val (share, cum, abc) = expAbc(b)
      assert(math.abs(r.getAs[Double]("rev_share") - share) < 1e-5,
        s"$b share")
      assert(math.abs(r.getAs[Double]("cum_share") - cum) < 1e-5,
        s"$b cum")
      assert(r.getAs[String]("abc_class") === abc, s"$b abc")
      // weekly CV: integer week buckets from the global first ship day,
      // zero weeks counted through the calendar span
      val d0 = series.values.flatMap(_.map(_._1)).min
      val nw = ((spanDays - 1) / 7 + 1).toInt
      val wk = series(b).groupBy(x => (x._1 - d0) / 7)
        .map { case (_, xs) => xs.map(_._2).sum }.toSeq
      val full = wk ++ Seq.fill(nw - wk.size)(0.0)
      val mu = full.sum / nw
      val vr = full.map(v => (v - mu) * (v - mu)).sum / (nw - 1)
      val cv = math.sqrt(vr) / mu
      assert(r.getAs[Long]("n_weeks") === nw.toLong)
      assert(math.abs(r.getAs[Double]("mean_weekly") - mu) < 1e-3,
        s"$b mu")
      assert(math.abs(r.getAs[Double]("cv_weekly") - cv) < 1e-4, s"$b cv")
      val xyz = if (cv < 0.5) "X" else if (cv < 1.0) "Y" else "Z"
      assert(r.getAs[String]("xyz_class") === xyz, s"$b xyz")
      assert(r.getAs[String]("policy_class") === abc + xyz)
    }
  }

  test("x_croston_backtest: holdout MAEs equal a plain-Scala replay " +
      "(train-only ladders, zero-day-aware scoring) and the winner " +
      "has the least error") {
    val K = 8
    val dmax = series.values.flatMap(_.map(_._1)).max
    val got = SparkEntry.queries("x_croston_backtest")(spark, dir)
      .collect()
      .map(r => r.getAs[String]("brand") ->
        (r.getAs[Long]("n_train"), r.getAs[Long]("n_holdout"),
          r.getAs[Long]("h_span_days"), r.getAs[Double]("mae_croston"),
          r.getAs[Double]("mae_sba"), r.getAs[Double]("mae_ses"),
          r.getAs[String]("best_method")))
      .toMap
    series.foreach { case (b, s) =>
      val (train, hold) = s.splitAt(s.length - K)
      val (nt, hn, hs, maeCro, maeSba, maeSes, best) = got(b)
      assert(nt === train.length.toLong)
      assert(hn === K.toLong)
      val cutDay = train.last._1
      assert(hs === dmax - cutDay)
      // croston/SBA at the cut from train-only ladders
      val z = ladder(train.map(_._2))
      val ivs = train.sliding(2).collect {
        case Seq(a, c) => (c._1 - a._1).toDouble }.toSeq
      val p = ladder(ivs)
      val cro = z / p
      val sba = 0.9 * z / p
      // SES over the zero-inclusive daily series: only demand days
      // within the 40-day horizon contribute; normalizer is the full
      // 40-weight sum
      val sesNum = train.filter(x => cutDay - x._1 < 40)
        .map(x => x._2 * math.pow(beta, (cutDay - x._1).toInt)).sum
      val sesDen = (0 until 40).map(i => math.pow(beta, i)).sum
      val ses = sesNum / sesDen
      def mae(f: Double): Double =
        (hold.map(x => math.abs(x._2 - f)).sum +
          (hs - K) * f) / hs
      assert(math.abs(maeCro - mae(cro)) < 1e-3, s"$b croston")
      assert(math.abs(maeSba - mae(sba)) < 1e-3, s"$b sba")
      assert(math.abs(maeSes - mae(ses)) < 1e-3, s"$b ses")
      val maes = Seq("croston" -> maeCro, "sba" -> maeSba,
        "ses" -> maeSes)
      assert(maes.find(_._1 == best).get._2 <= maes.map(_._2).min + 1e-9,
        s"$b winner $best is not minimal")
    }
  }

  test("x_tsb_backtest: the TSB holdout MAE equals a plain-Scala " +
      "replay (cut-anchored calendar probability ladder x train size " +
      "ladder), the winner is minimal, and the three incumbent MAE " +
      "columns equal x_croston_backtest's bit-for-bit (shared " +
      "scaffolding)") {
    val K = 8
    val dmax = series.values.flatMap(_.map(_._1)).max
    val got = SparkEntry.queries("x_tsb_backtest")(spark, dir)
      .collect()
      .map(r => r.getAs[String]("brand") ->
        (r.getAs[Double]("mae_tsb"), r.getAs[Double]("mae_croston"),
          r.getAs[Double]("mae_sba"), r.getAs[Double]("mae_ses"),
          r.getAs[String]("best_method")))
      .toMap
    val cro = SparkEntry.queries("x_croston_backtest")(spark, dir)
      .collect()
      .map(r => r.getAs[String]("brand") ->
        (r.getAs[Double]("mae_croston"), r.getAs[Double]("mae_sba"),
          r.getAs[Double]("mae_ses")))
      .toMap
    series.foreach { case (b, s) =>
      val (train, hold) = s.splitAt(s.length - K)
      val (maeTsb, maeCro, maeSba, maeSes, best) = got(b)
      // the three incumbents run through the SAME shared cut/score
      // builders — identical arithmetic, identical rounding
      assert((maeCro, maeSba, maeSes) == cro(b),
        s"$b incumbent columns must equal x_croston_backtest's")
      val cutDay = train.last._1
      val hs = dmax - cutDay
      // TSB at the cut: probability from calendar lags off the cut
      // day (zero days contribute nothing), size = train z ladder
      val z = ladder(train.map(_._2))
      val pNum = train.filter(x => cutDay - x._1 < 40)
        .map(x => math.pow(beta, (cutDay - x._1).toInt)).sum
      val pDen = (0 until 40).map(i => math.pow(beta, i)).sum
      val tsb = pNum / pDen * z
      def mae(f: Double): Double =
        (hold.map(x => math.abs(x._2 - f)).sum + (hs - K) * f) / hs
      assert(math.abs(maeTsb - mae(tsb)) < 1e-3, s"$b tsb")
      val maes = Seq("tsb" -> maeTsb, "croston" -> maeCro,
        "sba" -> maeSba, "ses" -> maeSes)
      assert(maes.find(_._1 == best).get._2 <= maes.map(_._2).min + 1e-9,
        s"$b winner $best is not minimal")
    }
  }
}
