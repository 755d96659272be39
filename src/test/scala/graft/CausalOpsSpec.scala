package graft

/** Brute-force references for the causal estimators: a third
  * implementation in plain Scala over the collected sf0.001 tables (the
  * DuckDB twin proves cross-engine equality; this proves the estimator
  * itself computes the quantity the textbook defines).
  */
class CausalOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("x_stratified_effect equals the per-stratum contingency walk and " +
      "the standardized effect is the stratum-size-weighted mean of the " +
      "per-stratum diffs") {
    val li = graft.util.Tables.t(spark, sf, "lineitem")
      .select("l_quantity", "l_discount", "l_returnflag").collect()
      .map(r => (r.getDouble(0).toLong / 10L, r.getDouble(1) >= 0.06,
        if (r.getString(2) == "R") 1L else 0L)).toSeq
    val byStratum = li.groupBy(_._1).view.mapValues { rows =>
      val (t1, t0) = rows.partition(_._2)
      (t1.size.toLong, t1.map(_._3).sum, t0.size.toLong, t0.map(_._3).sum)
    }.toMap.filter { case (_, (n1, _, n0, _)) => n1 > 0 && n0 > 0 }

    val got = run("x_stratified_effect").collect()
      .map(r => r.getAs[Long]("stratum") -> r).toMap
    assert(got.keySet === byStratum.keySet)

    val nn = byStratum.values.map(v => v._1 + v._3).sum.toDouble
    var qsum = 0L
    byStratum.toSeq.sortBy(_._1).foreach { case (st, (n1, k1, n0, k0)) =>
      val rate1 = k1.toDouble / n1
      val rate0 = k0.toDouble / n0
      val r = got(st)
      assert(r.getAs[Long]("n1") === n1, s"stratum $st")
      assert(r.getAs[Long]("n0") === n0, s"stratum $st")
      assert(math.abs(r.getAs[Double]("rate_treated") - rate1) < 1e-7, st)
      assert(math.abs(r.getAs[Double]("rate_control") - rate0) < 1e-7, st)
      assert(math.abs(r.getAs[Double]("stratum_diff") -
        (rate1 - rate0)) < 1e-7, st)
      qsum += math.floor(
        ((n1 + n0) / nn) * (rate1 - rate0) * 1e12 + 0.5).toLong
    }
    val std = qsum.toDouble / 1e12
    val tk1 = byStratum.values.map(_._2).sum.toDouble
    val tn1 = byStratum.values.map(_._1).sum.toDouble
    val tk0 = byStratum.values.map(_._4).sum.toDouble
    val tn0 = byStratum.values.map(_._3).sum.toDouble
    val naive = tk1 / tn1 - tk0 / tn0
    got.values.foreach { r =>
      assert(math.abs(r.getAs[Double]("standardized_diff") - std) < 1e-7)
      assert(math.abs(r.getAs[Double]("naive_diff") - naive) < 1e-7)
    }
  }

  test("x_group_sequential equals the cumulative-look walk; the OBF " +
      "boundary is monotone decreasing and pins 2.04 at the final look") {
    def armOf(k: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(k.toString.getBytes("UTF-8"))
      if (((h(0) >> 4) & 0xf) < 8) 1L else 0L
    }
    val orders = graft.util.Tables.t(spark, sf, "orders")
      .select("o_orderkey", "o_orderstatus", "o_orderdate").collect()
      .map(r => (armOf(r.getLong(0)),
        if (r.getString(1) == "F") 1L else 0L,
        r.getAs[java.time.LocalDateTime]("o_orderdate")))
    val cuts = (1997 to 2001).map(y =>
      java.time.LocalDateTime.parse(s"$y-01-01T00:00:00"))
    val got = run("x_group_sequential").collect()
      .map(r => r.getAs[Long]("look") -> r).toMap
    assert(got.keySet === (1L to 5L).toSet)
    val nFinal = orders.count(_._3.isBefore(cuts.last)).toDouble
    cuts.zipWithIndex.foreach { case (cut, i) =>
      val in = orders.filter(_._3.isBefore(cut))
      val (t1, t0) = in.partition(_._1 == 1L)
      val (n1, k1) = (t1.size.toDouble, t1.map(_._2).sum.toDouble)
      val (n0, k0) = (t0.size.toDouble, t0.map(_._2).sum.toDouble)
      val pp = (k1 + k0) / (n1 + n0)
      val z = (k1 / n1 - k0 / n0) /
        math.sqrt(pp * (1.0 - pp) * (1.0 / n1 + 1.0 / n0))
      val b = 2.04 / math.sqrt((n1 + n0) / nFinal)
      val r = got(i + 1L)
      assert(r.getAs[Long]("n_cum") === in.size.toLong, s"look ${i + 1}")
      assert(math.abs(r.getAs[Double]("z_stat") - z) < 1e-5, s"look ${i + 1}")
      assert(math.abs(r.getAs[Double]("obf_boundary") - b) < 1e-5)
      assert(r.getAs[Boolean]("crossed") === (math.abs(z) > b))
    }
    val bs = (1L to 5L).map(k => got(k).getAs[Double]("obf_boundary"))
    assert(bs.sliding(2).forall { case Seq(a, b) => a >= b - 1e-9 },
      s"OBF boundary must decrease across looks: $bs")
    assert(math.abs(bs.last - 2.04) < 1e-9,
      "final-look boundary must be the pinned constant")
  }

  test("x_cuped equals the moment walk: theta = cov/var, the adjusted " +
      "contrast is unbiased under a null split, and variance_reduction " +
      "is the squared pre/post correlation") {
    val cut = java.time.LocalDateTime.parse("1998-01-01T00:00:00")
    val per = graft.util.Tables.t(spark, sf, "orders")
      .select("o_custkey", "o_orderdate", "o_totalprice").collect()
      .map { r =>
        val c = math.floor(r.getDouble(2) * 100 + 0.5).toLong
        val pre = r.getAs[java.time.LocalDateTime]("o_orderdate")
          .isBefore(cut)
        (r.getLong(0), if (pre) c else 0L, if (pre) 0L else c)
      }
      .groupBy(_._1).map { case (ck, rows) =>
        (ck, rows.map(_._2).sum, rows.map(_._3).sum)
      }.toSeq
    val n = per.size.toDouble
    def dsum(f: ((Long, Long, Long)) => BigInt): Double =
      per.map(f).sum.toDouble
    val sx = dsum(p => BigInt(p._2)); val sy = dsum(p => BigInt(p._3))
    val sxx = dsum(p => BigInt(p._2) * BigInt(p._2))
    val sxy = dsum(p => BigInt(p._2) * BigInt(p._3))
    val syy = dsum(p => BigInt(p._3) * BigInt(p._3))
    val mpre = sx / n
    val vpre = sxx / n - mpre * mpre
    val vpost = syy / n - (sy / n) * (sy / n)
    val cov = sxy / n - mpre * (sy / n)
    val theta = cov / vpre
    val rho2 = cov * cov / (vpre * vpost)
    val got = run("x_cuped").collect().map(r => r.getAs[String]("arm") -> r)
      .toMap
    assert(got.keySet === Set("treatment", "control"))
    got.values.foreach { r =>
      assert(math.abs(r.getAs[Double]("theta") - theta) < 1e-5)
      assert(math.abs(r.getAs[Double]("variance_reduction") - rho2) < 1e-5)
      assert(r.getAs[Double]("variance_reduction") > 0.0 &&
        r.getAs[Double]("variance_reduction") < 1.0)
    }
    // per-arm means against the brute-force walk (arm = md5 coin)
    def armOf(ck: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(ck.toString.getBytes("UTF-8"))
      if (((md(0) >> 4) & 0xf) < 8) "treatment" else "control"
    }
    Seq("treatment", "control").foreach { arm =>
      val rows = per.filter(p => armOf(p._1) == arm)
      val na = rows.size.toDouble
      val mp = dsumArm(rows, _._3) / na / 100.0
      val ma = (dsumArm(rows, _._3) / na -
        theta * (dsumArm(rows, _._2) / na - mpre)) / 100.0
      val r = got(arm)
      assert(r.getAs[Long]("n_customers") === rows.size.toLong, arm)
      assert(math.abs(r.getAs[Double]("mean_post") - mp) < 1e-3, arm)
      assert(math.abs(r.getAs[Double]("mean_adjusted") - ma) < 1e-3, arm)
    }
  }

  private def dsumArm(rows: Seq[(Long, Long, Long)],
      f: ((Long, Long, Long)) => Long): Double =
    rows.map(r => BigInt(f(r))).sum.toDouble

  test("x_power_mde equals the closed-form two-proportion sizing walk") {
    val cut = java.time.LocalDateTime.parse("1998-01-01T00:00:00")
    val per = graft.util.Tables.t(spark, sf, "orders")
      .select("o_custkey", "o_orderdate").collect()
      .map(r => (r.getLong(0),
        !r.getAs[java.time.LocalDateTime]("o_orderdate").isBefore(cut)))
      .groupBy(_._1).map { case (ck, rows) => (ck, rows.exists(_._2)) }
    def armOf(ck: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(ck.toString.getBytes("UTF-8"))
      if (((h(0) >> 4) & 0xf) < 8) "treatment" else "control"
    }
    val n1 = per.count(p => armOf(p._1) == "treatment").toLong
    val n2 = per.count(p => armOf(p._1) == "control").toLong
    val k = per.count(_._2).toDouble
    val p = k / (n1 + n2)
    val mde = (1.9599639845400545 + 0.8416212335729143) *
      math.sqrt(p * (1.0 - p) * (1.0 / n1 + 1.0 / n2))
    val r = run("x_power_mde").collect()(0)
    assert(r.getAs[Long]("n1") === n1)
    assert(r.getAs[Long]("n2") === n2)
    assert(math.abs(r.getAs[Double]("baseline_rate") - p) < 1e-5)
    assert(math.abs(r.getAs[Double]("mde_abs") - mde) < 1e-5)
    assert(math.abs(r.getAs[Double]("mde_rel") - mde / p) < 1e-5)
  }

  test("x_regression_discontinuity equals the per-side OLS walk over " +
      "the quantized daily means") {
    val cut = java.time.LocalDateTime.parse("1997-01-01T00:00:00")
    val daily = graft.util.Tables.t(spark, sf, "orders")
      .select("o_orderdate", "o_totalprice").collect()
      .map { r =>
        val dt = r.getAs[java.time.LocalDateTime]("o_orderdate")
        val x = java.time.temporal.ChronoUnit.DAYS.between(
          cut.toLocalDate, dt.toLocalDate)
        (x, BigDecimal(r.getDouble(1))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP))
      }
      .filter(p => p._1 >= -180 && p._1 < 180)
      .groupBy(_._1).map { case (x, rows) =>
        val avg = (rows.map(_._2).sum / rows.size).toDouble
        (x, math.floor(avg * 1e6 + 0.5).toLong)
      }.toSeq
    def fit(pts: Seq[(Long, Long)]): (Double, Double) = {
      val n = pts.size.toDouble
      val sx = pts.map(_._1).sum.toDouble
      val sy = pts.map(_._2.toDouble).sum
      val sxy = pts.map(p => p._1.toDouble * p._2.toDouble).sum
      val sxx = pts.map(p => (p._1 * p._1).toDouble).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      (slope, (sy - slope * sx) / n)
    }
    val (preS, preI) = fit(daily.filter(_._1 < 0))
    val (postS, postI) = fit(daily.filter(_._1 >= 0))
    val got = run("x_regression_discontinuity").collect()
      .map(r => r.getAs[String]("side") -> r).toMap
    assert(got.keySet === Set("pre", "post"))
    assert(math.abs(got("pre").getAs[Double]("slope") - preS / 1e6) < 1e-4)
    assert(math.abs(got("post").getAs[Double]("slope") - postS / 1e6) < 1e-4)
    assert(math.abs(got("pre").getAs[Double]("intercept") - preI / 1e6)
      < 1e-2)
    assert(math.abs(got("post").getAs[Double]("intercept") - postI / 1e6)
      < 1e-2)
    val jump = (postI - preI) / 1e6
    got.values.foreach { r =>
      assert(math.abs(r.getAs[Double]("rd_jump") - jump) < 1e-2)
    }
  }

  test("x_did_estimate equals the four-cell walk and the contrast " +
      "cancels group level and common trend") {
    val cut = java.time.LocalDateTime.parse("1997-01-01T00:00:00")
    val orders = graft.util.Tables.t(spark, sf, "orders")
      .select("o_orderpriority", "o_orderdate", "o_totalprice").collect()
      .map(r => (r.getString(0),
        r.getAs[java.time.LocalDateTime]("o_orderdate"), r.getDouble(2)))
      .filter(o => o._1 == "1-URGENT" || o._1 == "5-LOW")
    def cell(grp: String, post: Boolean): (Long, Double) = {
      val rows = orders.filter(o =>
        (o._1 == "1-URGENT") == (grp == "treated") &&
          !o._2.isBefore(cut) == post)
      val sv = rows.map(o => BigDecimal(o._3)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
      (rows.size.toLong, (sv / rows.size).toDouble)
    }
    val got = run("x_did_estimate").collect()
      .map(r => (r.getAs[String]("grp"), r.getAs[String]("period")) -> r)
      .toMap
    assert(got.size === 4)
    val cells = Map(
      ("treated", "post") -> cell("treated", post = true),
      ("treated", "pre") -> cell("treated", post = false),
      ("control", "post") -> cell("control", post = true),
      ("control", "pre") -> cell("control", post = false))
    cells.foreach { case (key, (n, avg)) =>
      val r = got(key)
      assert(r.getAs[Long]("n") === n, key)
      assert(math.abs(r.getAs[Double]("avg_value") - avg) < 1e-4, key)
    }
    val did = (cells(("treated", "post"))._2 - cells(("treated", "pre"))._2) -
      (cells(("control", "post"))._2 - cells(("control", "pre"))._2)
    got.values.foreach { r =>
      assert(math.abs(r.getAs[Double]("did_estimate") - did) < 1e-4)
    }
  }
}
