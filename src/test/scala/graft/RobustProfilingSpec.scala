package graft

/** Brute-force references for the round-10 operators (x_trimmed_mean,
  * x_winsorized_stats, x_join_skew_stats, x_schema_profile,
  * x_vocab_coverage, x_time_to_convert): the DuckDB hash-compare proves
  * cross-engine equality of the distributed formulation; these tests
  * prove the formulation itself — a third, independent implementation in
  * plain Scala over the collected sf0.001 tables, written the naive way
  * (sort the rows, walk the list) that the histogram-cumsum plans
  * deliberately avoid.
  */
class RobustProfilingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val events: Seq[(Long, java.sql.Timestamp, Long, String, Double)] =
    graft.util.Tables.t(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4))).toSeq

  // mirror of Coercions.dsum's per-value quantization: double →
  // DECIMAL(18,4) is HALF_UP at the 4th decimal in both engines
  private def dec4(v: Double): BigDecimal =
    BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP)

  test("x_trimmed_mean equals the sort-and-drop brute force") {
    val got = run("x_trimmed_mean").collect()
      .map(r => r.getString(0) -> r).toMap
    val byType = events.groupBy(_._4)
    assert(got.keySet === byType.keySet)
    byType.foreach { case (tpe, rows) =>
      val vs = rows.map(_._5).sorted
      val n = vs.length
      val k = n / 10
      val kept = vs.slice(k, n - k)
      val tm = (kept.map(dec4).sum / (n - 2 * k)).toDouble
      val m = (vs.map(dec4).sum / n).toDouble
      val r = got(tpe)
      assert(r.getAs[Long]("n") === n.toLong, tpe)
      assert(r.getAs[Long]("k_each_side") === k.toLong, tpe)
      assert(math.abs(r.getAs[Double]("trimmed_mean") - tm) < 1e-6, tpe)
      assert(math.abs(r.getAs[Double]("mean") - m) < 1e-6, tpe)
      // the estimator did something: with k > 0 the trimmed mean must
      // sit inside the kept range
      assert(r.getAs[Double]("trimmed_mean") >= kept.head - 1e-9 &&
        r.getAs[Double]("trimmed_mean") <= kept.last + 1e-9, tpe)
    }
  }

  test("x_winsorized_stats equals the clamp brute force; edges are " +
      "ceil-rank order statistics") {
    val got = run("x_winsorized_stats").collect()
      .map(r => r.getString(0) -> r).toMap
    events.groupBy(_._4).foreach { case (tpe, rows) =>
      val vs = rows.map(_._5).sorted
      val n = vs.length
      val lo = vs((n + 19) / 20 - 1)       // value at rank ceil(0.05 n)
      val hi = vs((19 * n + 19) / 20 - 1)  // value at rank ceil(0.95 n)
      val wm = (vs.map(v => dec4(math.min(math.max(v, lo), hi))).sum / n)
        .toDouble
      val r = got(tpe)
      assert(math.abs(r.getAs[Double]("p05") - lo) < 1e-6, tpe)
      assert(math.abs(r.getAs[Double]("p95") - hi) < 1e-6, tpe)
      assert(math.abs(r.getAs[Double]("winsorized_mean") - wm) < 1e-6, tpe)
    }
  }

  test("x_time_to_convert equals the per-user walk") {
    val views = events.filter(_._4 == "view")
      .groupBy(_._3).map { case (u, rs) => u -> rs.map(_._2.getTime).min }
    val deltas = events.filter(_._4 == "purchase")
      .groupBy(_._3).flatMap { case (u, rs) =>
        views.get(u).flatMap { v =>
          val after = rs.map(_._2.getTime).filter(_ >= v)
          if (after.isEmpty) None else Some(after.min - v)
        }
      }.toSeq.sorted
    val r = run("x_time_to_convert").collect()(0)
    assert(r.getAs[Long]("n_viewers") === views.size.toLong)
    assert(r.getAs[Long]("n_converted") === deltas.length.toLong)
    val nc = deltas.length
    assert(r.getAs[Long]("median_ms") === deltas((nc + 1) / 2 - 1))
    assert(r.getAs[Long]("p90_ms") === deltas((9 * nc + 9) / 10 - 1))
    assert(math.abs(r.getAs[Double]("conv_rate")
      - nc.toDouble / views.size) < 1e-6)
  }

  test("x_join_skew_stats equals the frequency-profile brute force") {
    val cnts = graft.util.Tables.t(spark, sf, "lineitem")
      .select("l_partkey").collect().map(_.getLong(0)).toSeq
      .groupBy(identity).map(_._2.size.toLong).toSeq.sorted
    val r = run("x_join_skew_stats").collect()(0)
    assert(r.getAs[Long]("n_keys") === cnts.length.toLong)
    assert(r.getAs[Long]("n_rows") === cnts.sum)
    assert(r.getAs[Long]("max_c") === cnts.max)
    assert(r.getAs[Long]("p99_c") ===
      cnts((99 * cnts.length + 99) / 100 - 1))
    assert(math.abs(r.getAs[Double]("skew_ratio")
      - cnts.max.toDouble * cnts.length / cnts.sum) < 1e-6)
  }

  test("x_schema_profile matches per-column brute force on orders") {
    val o = graft.util.Tables.t(spark, sf, "orders").collect()
    val got = run("x_schema_profile").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet === Set("o_orderkey", "o_custkey", "o_orderstatus",
      "o_orderpriority", "o_totalprice", "o_orderdate"))
    got.values.foreach(r => assert(r.getAs[Long]("null_cnt") === 0L))
    val keys = o.map(_.getAs[Long]("o_orderkey"))
    assert(got("o_orderkey").getAs[Long]("n_distinct") ===
      keys.distinct.length.toLong)
    assert(got("o_orderkey").getAs[String]("min_repr") === keys.min.toString)
    assert(got("o_orderkey").getAs[String]("max_repr") === keys.max.toString)
    val st = o.map(_.getAs[String]("o_orderstatus"))
    assert(got("o_orderstatus").getAs[Long]("n_distinct") ===
      st.distinct.length.toLong)
    assert(got("o_orderstatus").getAs[String]("min_repr") === st.min)
    val tp = o.map(_.getAs[Double]("o_totalprice"))
    assert(got("o_totalprice").getAs[String]("min_repr") ===
      math.floor(tp.min * 1e4 + 0.5).toLong.toString)
    assert(got("o_totalprice").getAs[String]("max_repr") ===
      math.floor(tp.max * 1e4 + 0.5).toLong.toString)
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    // o_orderdate is parquet timestamp[us] WITHOUT timezone — Spark 4
    // infers TIMESTAMP_NTZ, whose external type is LocalDateTime, not
    // java.sql.Timestamp (the r10 spec assumed the TZ'd type and this
    // assertion had never actually run under the full suite)
    val dtMin = new java.sql.Timestamp(o.map { row =>
      row.getAs[Any]("o_orderdate") match {
        case t: java.sql.Timestamp => t.getTime
        case l: java.time.LocalDateTime =>
          l.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      }
    }.min)
    assert(got("o_orderdate").getAs[String]("min_repr") ===
      fmt.format(dtMin))
  }

  test("x_vocab_coverage equals the top-1000 brute force; an in-vocab-" +
      "only source would score zero") {
    val docs = graft.util.Tables.t(spark, sf, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val toks = docs.flatMap { case (src, tx) =>
      tx.split(" ", -1).filter(_.nonEmpty).map(src -> _) }
    val vocab = toks.groupBy(_._2).map { case (t, rs) => (t, rs.size) }
      .toSeq.sortBy { case (t, c) => (-c, t) }.take(1000).map(_._1).toSet
    val got = run("x_vocab_coverage").collect()
      .map(r => r.getString(0) -> r).toMap
    toks.groupBy(_._1).foreach { case (src, rs) =>
      val oov = rs.map(_._2).filterNot(vocab)
      val r = got(src)
      assert(r.getAs[Long]("n_tokens") === rs.length.toLong, src)
      assert(r.getAs[Long]("n_oov") === oov.length.toLong, src)
      assert(r.getAs[Long]("n_oov_types") ===
        oov.distinct.length.toLong, src)
      assert(math.abs(r.getAs[Double]("oov_rate")
        - oov.length.toDouble / rs.length) < 1e-6, src)
    }
  }
}
