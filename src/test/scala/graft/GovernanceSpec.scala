package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** GovernanceOps: the fixtures are clean (every expectation passes with
  * zero violations, hash-checked by the oracle), so this spec proves the
  * rules actually COUNT by planting one violation per rule in a
  * corrupted copy of the tables and asserting each rule reports exactly
  * its planted count — a rule stuck at zero cannot go green here. */
class GovernanceSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("x_dq_expectations counts each planted violation exactly") {
    import spark.implicits._
    val dir = tmpDir("dq-corrupt")
    val o = graft.util.Tables.t(spark, sf, "orders")
    val li = graft.util.Tables.t(spark, sf, "lineitem")
    val c = graft.util.Tables.t(spark, sf, "customer")
    val maxKey = o.agg(max(col("o_orderkey"))).collect()(0).getLong(0)
    val dupKey = o.agg(min(col("o_orderkey"))).collect()(0).getLong(0)
    def ts(s0: String) = java.sql.Timestamp.valueOf(s0 + " 00:00:00")
    // planted rows: (orderkey, custkey, status, totalprice, orderdate, priority)
    val bad = Seq(
      // null custkey (not_null); also valid elsewhere
      (maxKey + 1, None: Option[Long], "O", 10.0, ts("1996-01-01"), "1-URGENT"),
      // duplicate orderkey (unique)
      (dupKey, Some(1L), "O", 10.0, ts("1996-01-01"), "1-URGENT"),
      // non-positive totalprice (range)
      (maxKey + 2, Some(1L), "O", -5.0, ts("1996-01-01"), "1-URGENT"),
      // status outside the set
      (maxKey + 3, Some(1L), "X", 10.0, ts("1996-01-01"), "1-URGENT"),
      // date outside the sanity window
      (maxKey + 4, Some(1L), "O", 10.0, ts("1990-01-01"), "1-URGENT"),
      // custkey with no customer row (ref_orders_customer)
      (maxKey + 5, Some(999999L), "O", 10.0, ts("1996-01-01"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val oCols = o.columns.map(col).toSeq
    o.unionByName(bad.select(oCols: _*), allowMissingColumns = true)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/orders.parquet")
    // one orphan lineitem (ref_lineitem_orders)
    val orphan = li.limit(1).withColumn("l_orderkey", lit(99999999L))
    li.unionByName(orphan)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/lineitem.parquet")
    c.write.mode(SaveMode.Overwrite).parquet(s"$dir/customer.parquet")

    val got = SparkEntry.queries("x_dq_expectations")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val nOrders = o.count() + 6
    assert(got("not_null_o_custkey") === ((nOrders, 1L, 0L)))
    assert(got("unique_o_orderkey") === ((nOrders, 1L, 0L)))
    assert(got("range_o_totalprice_pos") === ((nOrders, 1L, 0L)))
    assert(got("set_o_orderstatus") === ((nOrders, 1L, 0L)))
    assert(got("range_o_orderdate_window") === ((nOrders, 1L, 0L)))
    // ref_orders_customer: the planted 999999 custkey AND the null-custkey
    // row both fail the anti-join (a null key never matches) → 2
    assert(got("ref_orders_customer") === ((nOrders, 2L, 0L)))
    assert(got("ref_lineitem_orders") === ((li.count() + 1, 1L, 0L)))
  }

  test("streaming DQ observation reports planted violations per trigger " +
      "without a second scan") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, Option[Long], String, Double)]
    val stream = mem.toDF()
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val observed = graft.streaming.StreamingIngest.dqObservedOrders(stream)
    mem.addData(
      (1L, Some(1L), "O", 10.0),   // clean
      (2L, None, "O", 10.0),       // null custkey
      (3L, Some(2L), "X", 10.0),   // bad status
      (4L, Some(3L), "F", -1.0),   // non-positive price
      (5L, Some(4L), "P", 20.0))   // clean
    val q = observed.writeStream.format("noop")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val dq = graft.streaming.StreamingIngest.dqViolations(q)
    assert(dq("n_rows") === 5L)
    assert(dq("v_null") === 1L)
    assert(dq("v_set") === 1L)
    assert(dq("v_range") === 1L)
  }

  test("x_k_anonymity flags small quasi-identifier groups at sf0.001") {
    val r = SparkEntry.queries("x_k_anonymity")(spark, sf).collect()(0)
    val nGroups = r.getAs[Long]("n_groups")
    val below = r.getAs[Long]("n_groups_below_k")
    val rowsBelow = r.getAs[Long]("n_rows_below_k")
    // 150 customers over up to 125 (nation, segment) combos: most groups
    // are tiny, so the k=8 gauge must fire here (it reads 0 only on the
    // big SFs where every group clears k)
    assert(nGroups > 0 && below > 0, s"gauge silent: $nGroups/$below")
    assert(rowsBelow >= below, "each risky group has at least one row")
    assert(below <= nGroups)
    // brute-force cross-check of the group histogram
    val exact = graft.util.Tables.t(spark, sf, "customer")
      .groupBy("c_nationkey", "c_mktsegment").count()
      .filter(col("count") < 8).count()
    assert(below === exact)
  }

  test("x_srm_check: counts reconcile with x_dataset_split, the chi2 " +
      "equals the three-term brute force, and the unbiased md5 split " +
      "does not flag") {
    val got = SparkEntry.queries("x_srm_check")(spark, sf).collect()
      .map(r => r.getAs[String]("split") -> r).toMap
    assert(got.keySet === Set("train", "valid", "test"))
    // observed arm counts must be exactly x_dataset_split's counts
    val splitCounts = SparkEntry.queries("x_dataset_split")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_docs")).toMap
    got.foreach { case (arm, r) =>
      assert(r.getAs[Long]("n_obs") === splitCounts(arm), arm)
    }
    val n = splitCounts.values.sum.toDouble
    val shares = Map("train" -> 204.0 / 256.0, "valid" -> 26.0 / 256.0,
      "test" -> 26.0 / 256.0)
    var qchi = 0L
    shares.foreach { case (arm, p) =>
      val e = n * p
      val o = splitCounts(arm).toDouble
      qchi += math.floor((o - e) * (o - e) / e * 1e9 + 0.5).toLong
      assert(math.abs(got(arm).getAs[Double]("expected") - e) < 1e-3, arm)
      assert(math.abs(got(arm).getAs[Double]("z") -
        (o - e) / math.sqrt(e * (1.0 - p))) < 1e-5, arm)
    }
    got.values.foreach { r =>
      assert(math.abs(r.getAs[Double]("chi2") - qchi / 1e9) < 1e-5)
      // the flag must be exactly the brute-force threshold comparison
      // (the md5 split is hash-fair, not sample-fair, so at 500 docs the
      // gate MAY legitimately fire — assert consistency, not innocence)
      assert(r.getAs[Boolean]("srm_flag") ===
        (qchi / 1e9 > 5.991464547107979))
    }
  }

  test("x_snapshot_diff classifies every key against a first-principles " +
      "recount") {
    val keys = graft.util.Tables.t(spark, sf, "orders")
      .select("o_orderkey").collect().map(_.getLong(0))
    val inA = keys.filter(_ % 97 != 3).toSet
    val inB = keys.filter(_ % 89 != 5).toSet
    val both = inA intersect inB
    val expAdded = (inB diff inA).size.toLong
    val expRemoved = (inA diff inB).size.toLong
    val expChanged = both.count(k => k % 13 == 0 || k % 17 == 0).toLong
    val expUnchanged = both.size - expChanged
    val expPriceChanged = both.count(_ % 17 == 0).toLong

    val got = SparkEntry.queries("x_snapshot_diff")(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("added")._1 === expAdded)
    assert(got("removed")._1 === expRemoved)
    assert(got("changed")._1 === expChanged)
    assert(got("unchanged")._1 === expUnchanged)
    // only the price-corrected rows (−10.00 in snapshot A) move money:
    // exactly +1000 cents each; the stale-priority rows contribute 0
    assert(got("changed")._2 === 1000L * expPriceChanged)
    assert(got("added")._2 === 0L && got("removed")._2 === 0L &&
      got("unchanged")._2 === 0L)
  }

  test("x_dp_noisy_counts: bounded deterministic noise, clamped at zero") {
    val dp = SparkEntry.queries("x_dp_noisy_counts")(spark, sf)
    val noisy = dp.collect()
      .map(r => r.getAs[Number](0).longValue() -> r.getLong(1)).toMap
    val exact = graft.util.Tables.t(spark, sf, "customer")
      .groupBy("c_nationkey").count()
      .collect()
      .map(r => r.getAs[Number](0).longValue() -> r.getLong(1)).toMap
    assert(noisy.keySet === exact.keySet)
    // ladder truncates the two-sided geometric at ±8 and the release is
    // clamped at 0, so every noisy count is within 8 of truth and ≥ 0
    noisy.foreach { case (k, v) =>
      assert(v >= 0L, s"nation $k released negative count")
      assert(math.abs(v - exact(k)) <= 8, s"nation $k noise out of range")
    }
    // the seed is the group key, so a re-run releases the SAME counts
    // (oracle-checkable); and the noise is not identically zero
    val again = SparkEntry.queries("x_dp_noisy_counts")(spark, sf)
      .collect()
      .map(r => r.getAs[Number](0).longValue() -> r.getLong(1)).toMap
    assert(again === noisy)
    assert(noisy.exists { case (k, v) => v != exact(k) },
      "noise never fired — ladder is broken")
  }

  test("x_freshness reports exact lag minutes and trailing-24h volume") {
    import spark.implicits._
    val dir = tmpDir("fresh")
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val H = 3600000L
    val t0 = 1700000000000L // not hour-aligned: exercises bucket trunc
    // 'click': the freshest type (defines the global max), 3 rows in the
    // trailing 24 hour-buckets, 1 row 30h earlier (outside)
    // 'view': last seen 90 minutes before the global max → lag 90;
    //         both rows inside the 24h bucket window
    val rows = Seq(
      (1L, ts(t0 - 30 * H), 1L, "click"),
      (2L, ts(t0 - 5 * H), 1L, "click"),
      (3L, ts(t0 - 2 * H), 2L, "click"),
      (4L, ts(t0), 2L, "click"),
      (5L, ts(t0 - 23 * H), 3L, "view"),
      (6L, ts(t0 - 90 * 60000L), 3L, "view"))
    rows.map { case (id, t, u, et) => (id, t, u, et, 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/events.parquet")

    val got = SparkEntry.queries("x_freshness")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(3), r.getLong(4)))).toMap
    assert(got("click") === ((4L, 0L, 3L)))
    // t0 - 23h truncates into the oldest of the 24 trailing hour
    // buckets (global max bucket - 23h), so BOTH view rows count
    assert(got("view") === ((2L, 90L, 2L)))
  }
}
