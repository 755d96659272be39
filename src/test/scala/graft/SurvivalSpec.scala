package graft

import org.apache.spark.sql.functions._

/** Brute-force recompute checks for the censored survival family —
  * the oracle twin shares the engine's recipe, so (fixture-traps
  * lesson) a degenerate recipe would hash-match its own twin; this
  * spec re-derives KM and the log-rank components independently from
  * first principles over the collected sf0.001 spells. */
class SurvivalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** (dur, event, grp) spells rebuilt directly with driver-side code:
    * per customer sort orders by (date, key); gaps are events, the last
    * order censors at the global max date. */
  private lazy val spells: Seq[(Long, Int, String)] = {
    val rows = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_custkey").cast("long"), col("o_orderkey").cast("long"),
        col("o_orderdate").cast("date"), col("o_orderpriority"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDate(2).toLocalDate,
        r.getString(3)))
    val mx = rows.map(_._3).max
    rows.groupBy(_._1).values.flatMap { cust =>
      val sorted = cust.toSeq.sortBy(o => (o._3.toEpochDay, o._2))
      sorted.sliding(2).flatMap {
        case Seq(a, b) =>
          Seq((b._3.toEpochDay - a._3.toEpochDay, 1,
            if (a._4 == "1-URGENT" || a._4 == "2-HIGH") "hi" else "lo"))
        case _ => Seq.empty
      } ++ Seq({
        val last = sorted.last
        (mx.toEpochDay - last._3.toEpochDay, 0,
          if (last._4 == "1-URGENT" || last._4 == "2-HIGH") "hi" else "lo")
      })
    }.toSeq
  }

  test("x_kaplan_meier equals the first-principles product-limit " +
      "estimator on sf0.001 (every event day: risk set, events, S)") {
    val got = SparkEntry.queries("x_kaplan_meier")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("t_days"), r.getAs[Long]("n_risk"),
        r.getAs[Long]("d_events"), r.getAs[Double]("survival")))
    val byDur = spells.groupBy(_._1)
    val eventDays = byDur.filter(_._2.exists(_._2 == 1)).keys.toSeq.sorted
    var s = 1.0
    val expect = eventDays.map { t =>
      val nRisk = spells.count(_._1 >= t).toLong
      val d = byDur(t).count(_._2 == 1).toLong
      s = if (d >= nRisk) 0.0 else s * (nRisk - d).toDouble / nRisk
      (t, nRisk, d, s)
    }
    assert(got.length === expect.length)
    got.zip(expect).foreach { case ((t, n, d, sv), (et, en, ed, es)) =>
      assert(t === et); assert(n === en); assert(d === ed)
      // engine S is fixed-point via quantized log-sum; agree to ~1e-5
      assert(math.abs(sv - es) < 2e-5, s"S($t): engine $sv vs exact $es")
    }
    assert(got.last._4 >= 0.0 && got.head._4 <= 1.0)
  }

  test("x_logrank_test components equal the first-principles " +
      "hypergeometric O/E/V sums on sf0.001") {
    val row = SparkEntry.queries("x_logrank_test")(spark, dir)
      .collect().head
    val byDur = spells.groupBy(_._1)
    val eventDays = byDur.filter(_._2.exists(_._2 == 1)).keys.toSeq.sorted
    var (o1, e1, v) = (0L, 0.0, 0.0)
    eventDays.foreach { t =>
      val n1 = spells.count(x => x._1 >= t && x._3 == "hi").toLong
      val n0 = spells.count(x => x._1 >= t && x._3 == "lo").toLong
      val d1 = byDur(t).count(x => x._2 == 1 && x._3 == "hi").toLong
      val d0 = byDur(t).count(x => x._2 == 1 && x._3 == "lo").toLong
      val (d, n) = (d1 + d0, n1 + n0)
      o1 += d1
      e1 += d.toDouble * n1 / n
      if (n > 1)
        v += d.toDouble * n1 / n * (n0.toDouble / n) *
          ((n - d).toDouble / (n - 1))
    }
    assert(row.getAs[Long]("observed_hi") === o1)
    assert(math.abs(row.getAs[Double]("expected_hi") - e1) < 1e-4)
    val chi2 = (o1 - e1) * (o1 - e1) / v
    assert(math.abs(row.getAs[Double]("chi2") - chi2) < 1e-3)
    assert(row.getAs[Boolean]("significant_05") === (chi2 > 3.841458821))
  }

  test("x_restricted_mean_survival equals the step integral of the KM " +
      "ladder and is bounded by tau") {
    val km = SparkEntry.queries("x_kaplan_meier")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("t_days"), r.getAs[Double]("survival")))
      .sortBy(_._1)
    val tau = 365L
    var (prevT, prevS, integral) = (0L, 1.0, 0.0)
    km.foreach { case (t, sv) =>
      integral += prevS * (math.min(t, tau) - math.min(prevT, tau))
      prevT = t; prevS = sv
    }
    integral += prevS * (tau - math.min(prevT, tau))
    val row = SparkEntry.queries("x_restricted_mean_survival")(spark, dir)
      .collect().head
    val rmst = row.getAs[Double]("rmst_days")
    assert(math.abs(rmst - integral) < 1e-2, s"engine $rmst vs $integral")
    assert(rmst > 0.0 && rmst <= tau.toDouble)
    assert(row.getAs[Long]("tau_days") === tau)
  }

  test("x_weibull_fit equals a plain-Scala median-rank regression over " +
      "the engine's own KM points") {
    val km = SparkEntry.queries("x_kaplan_meier")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("t_days"), r.getAs[Double]("survival")))
      .filter { case (t, sv) => t > 0 && sv > 0.0 && sv < 1.0 }
    val xs = km.map { case (t, _) => math.log(t.toDouble) }
    val ys = km.map { case (_, sv) => math.log(-math.log(sv)) }
    val n = xs.length.toDouble
    val (sx, sy) = (xs.sum, ys.sum)
    val vx = n * xs.map(x => x * x).sum - sx * sx
    val vy = n * ys.map(y => y * y).sum - sy * sy
    val cxy = n * xs.zip(ys).map { case (x, y) => x * y }.sum - sx * sy
    val k = cxy / vx
    val lam = math.exp(-(sy - k * sx) / n / k)
    val r2 = cxy * cxy / (vx * vy)
    val row = SparkEntry.queries("x_weibull_fit")(spark, dir)
      .collect().head
    assert(row.getAs[Long]("n_points") === km.length.toLong)
    assert(math.abs(row.getAs[Double]("shape_k") - k) < 1e-4,
      s"shape ${row.getAs[Double]("shape_k")} vs brute $k")
    assert(math.abs(row.getAs[Double]("scale_lambda") - lam)
      < 1e-3 * lam, s"scale ${row.getAs[Double]("scale_lambda")} vs $lam")
    assert(math.abs(row.getAs[Double]("r_squared") - r2) < 1e-4)
    val med = lam * math.pow(math.log(2.0), 1.0 / k)
    assert(math.abs(row.getAs[Double]("median_days") - med) < 1e-2 * med)
    assert(row.getAs[Double]("r_squared") > 0.0 &&
      row.getAs[Double]("r_squared") <= 1.0 + 1e-9)
  }
}
