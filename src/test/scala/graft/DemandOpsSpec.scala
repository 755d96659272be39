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
}
