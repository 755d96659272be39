package graft

/** Structural invariants of the graph-analytics and corpus-diagnostics
  * ops (GraphOps/CorpusOps) — properties the DuckDB hash-compare cannot
  * express. All at sf0.001.
  */
class GraphCorpusSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("x_pagerank: 15 rows, scores positive and non-increasing, both " +
      "node spaces disjoint (entity keys re-offset correctly)") {
    val rows = run("x_pagerank").collect()
    assert(rows.length == 15)
    val prs = rows.map(_.getAs[Double]("pr"))
    assert(prs.forall(_ > 0.0))
    assert(prs.zip(prs.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      val tpe = r.getAs[String]("node_type")
      assert(tpe == "supplier" || tpe == "customer")
      assert(r.getAs[Long]("entity_key") >= 0)
    }
  }

  test("x_betweenness_sample: the k-source Brandes estimate matches a " +
      "plain-Scala level-synchronous replay (sigma counts, dependency " +
      "accumulation, 6-round horizon, source exclusion) over an " +
      "independently rebuilt top-64 strongest-relation backbone") {
    import spark.implicits._
    // weighted trading relations: weight = distinct orders linking the
    // pair; the op traverses each node's top-64 by (w desc, dst asc) —
    // rebuild that capped DIRECTED adjacency here from scratch
    val ew = graft.util.Tables.t(spark, sf, "lineitem")
      .select($"l_orderkey", $"l_suppkey")
      .join(graft.util.Tables.t(spark, sf, "orders")
        .select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .select($"l_orderkey".cast("long"), $"l_suppkey".cast("long"),
        $"o_custkey".cast("long"))
      .distinct().as[(Long, Long, Long)].collect()
      .map { case (_, sKey, c) => (sKey, c) }
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val cOff = 1000000L
    val cap = 64
    val dirW = scala.collection.mutable.Map
      .empty[Long, List[(Long, Long)]].withDefaultValue(Nil)
    ew.foreach { case ((sKey, c), w) =>
      dirW(sKey) = (c + cOff, w) :: dirW(sKey)
      dirW(c + cOff) = (sKey, w) :: dirW(c + cOff)
    }
    val adj: Map[Long, Set[Long]] = dirW.map { case (u, ns) =>
      u -> ns.sortBy { case (v, w) => (-w, v) }.take(cap)
        .map(_._1).toSet
    }.toMap.withDefaultValue(Set.empty)
    val rounds = 6
    val bcExp = scala.collection.mutable.Map.empty[Long, Double]
      .withDefaultValue(0.0)
    // seeds are ALL graph nodes with id <= BfsSeedMax (supplier keys
    // start at 0 on this fixture, so the seed set is {0, 1, 2, 3})
    val sources = adj.keys.filter(_ <= 3L).toSeq.sorted
    sources.foreach { src =>
      // forward: level-synchronous BFS with exact path counts
      val dist = scala.collection.mutable.Map(src -> 0)
      val sigma = scala.collection.mutable.Map(src -> 1L)
      var frontier = Set(src)
      val levels = scala.collection.mutable.ArrayBuffer(Set(src))
      for (r <- 1 to rounds) {
        val nxt = scala.collection.mutable.Map.empty[Long, Long]
          .withDefaultValue(0L)
        frontier.foreach(u => adj(u).foreach { v =>
          if (!dist.contains(v)) nxt(v) += sigma(u)
        })
        nxt.keys.foreach(v => dist(v) = r)
        nxt.foreach { case (v, sg) => sigma(v) = sg }
        frontier = nxt.keySet.toSet
        levels += frontier
      }
      // backward: dependency accumulation deep -> shallow
      val delta = scala.collection.mutable.Map.empty[Long, Double]
        .withDefaultValue(0.0)
      for (l <- rounds to 1 by -1) {
        levels(l - 1).foreach { v =>
          // .toSeq first: mapping a Set would DEDUPE equal term values
          // (two successors with identical sigma/delta collapse to one)
          val dep = adj(v).toSeq.filter(w => dist.get(w).contains(l))
            .map(w => sigma(v).toDouble / sigma(w) * (1.0 + delta(w)))
            .sum
          if (dep > 0) delta(v) = dep
        }
      }
      delta.foreach { case (v, dl) =>
        if (v != src) bcExp(v) += dl
      }
    }
    val expTop = bcExp.toSeq.sortBy { case (v, b) => (-b, v) }.take(15)
    val got = run("x_betweenness_sample").collect()
    assert(got.length == math.min(15, bcExp.size))
    got.sortBy(_.getAs[Long]("rank")).zip(expTop).foreach {
      case (r, (v, b)) =>
        val key = if (v >= cOff) v - cOff else v
        val tpe = if (v >= cOff) "customer" else "supplier"
        assert(r.getAs[Long]("entity_key") == key,
          s"rank ${r.getAs[Long]("rank")}: engine key " +
            s"${r.getAs[Long]("entity_key")} vs replay $key ($b)")
        assert(r.getAs[String]("node_type") == tpe)
        assert(math.abs(r.getAs[Double]("betweenness") - b) < 1e-3,
          s"node $v: engine ${r.getAs[Double]("betweenness")} vs $b")
        assert(r.getAs[Long]("n_sources") == sources.length.toLong)
        assert(r.getAs[Long]("deg_cap") == cap.toLong)
    }
    // the cap must actually bind somewhere at this scale (suppliers
    // trade with ~100+ customers at sf0.001), or the test would pass
    // vacuously on an uncapped rebuild
    assert(dirW.exists(_._2.length > cap),
      "fixture too small to exercise the degree cap")
  }

  test("x_bfs_distances: histogram matches a driver-side BFS replay " +
      "over the same trading graph") {
    import spark.implicits._
    val e0 = graft.util.Tables.t(spark, sf, "lineitem")
      .select($"l_orderkey", $"l_suppkey")
      .join(graft.util.Tables.t(spark, sf, "orders")
        .select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .select($"l_suppkey".cast("long"), $"o_custkey".cast("long"))
      .distinct().as[(Long, Long)].collect()
    val cOff = 1000000L
    val adj = scala.collection.mutable.Map.empty[Long, List[Long]]
      .withDefaultValue(Nil)
    e0.foreach { case (sKey, c) =>
      adj(sKey) = (c + cOff) :: adj(sKey)
      adj(c + cOff) = sKey :: adj(c + cOff)
    }
    val nodes = adj.keySet.toSet
    val dist = scala.collection.mutable.Map.empty[Long, Long]
    var frontier = nodes.filter(_ <= 3L)
    frontier.foreach(dist(_) = 0L)
    for (r <- 1 to 6) {
      val next = frontier.flatMap(adj).filterNot(dist.contains)
      next.foreach(dist(_) = r.toLong)
      frontier = next
    }
    val expected = nodes.groupBy { n =>
      (dist.getOrElse(n, -1L),
        if (n >= cOff) "customer" else "supplier")
    }.map { case ((dd, tpe), ns) =>
      val keys = ns.map(n => if (n >= cOff) n - cOff else n)
      (dd, tpe, ns.size.toLong, keys.min, keys.max)
    }.toSet
    val got = run("x_bfs_distances").collect().map { r =>
      (r.getAs[Long]("dist"), r.getAs[String]("node_type"),
        r.getAs[Long]("n_nodes"), r.getAs[Long]("min_key"),
        r.getAs[Long]("max_key"))
    }.toSet
    assert(got == expected)
    // the seed rows themselves must be present at dist 0
    assert(got.exists { case (dd, tpe, _, _, _) =>
      dd == 0L && tpe == "supplier" })
  }

  test("x_hits: exactly 10 ranks per side, rank order matches score " +
      "order, scores positive") {
    val rows = run("x_hits").collect()
    val bySide = rows.groupBy(_.getAs[String]("side"))
    assert(bySide.keySet == Set("hub", "authority"))
    bySide.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rk"))
      assert(sorted.map(_.getAs[Long]("rk")).toSeq == (1L to 10L))
      val scores = sorted.map(_.getAs[Double]("score"))
      assert(scores.forall(_ > 0.0))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("x_bm25: scores positive and non-increasing, matched-term counts " +
      "within the 3-term query, the rare term lifts some doc to the top") {
    val rows = run("x_bm25").collect()
    assert(rows.nonEmpty)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.forall(_ > 0.0))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      val m = r.getAs[Long]("n_terms_matched")
      assert(m >= 1 && m <= 3)
    }
  }

  test("x_collocations: support above the corpus-scaled threshold, " +
      "pmi finite and non-increasing, at most 20 rows") {
    val rows = run("x_collocations").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val pmis = rows.map(_.getAs[Double]("pmi"))
    assert(pmis.forall(p => !p.isNaN && !p.isInfinite))
    assert(pmis.zip(pmis.tail).forall { case (a, b) => a >= b })
    assert(rows.forall(_.getAs[Long]("cxy") >= 1))
  }

  test("x_source_overlap: full pair spine, jaccards in [0, 1], the 3-sigma " +
      "binomial bound holds for the vast majority of pairs") {
    val rows = run("x_source_overlap").collect()
    val nSources = rows.map(_.getAs[String]("src_a")).distinct.length + 1
    assert(rows.length == nSources * (nSources - 1) / 2,
      s"expected full pair spine, got ${rows.length} rows / $nSources sources")
    rows.foreach { r =>
      val (e, s) = (r.getAs[Double]("exact_j"), r.getAs[Double]("est_j"))
      assert(e >= 0.0 && e <= 1.0 && s >= 0.0 && s <= 1.0)
    }
    val within = rows.count(_.getAs[Boolean]("within_3sigma"))
    assert(within >= rows.length * 8 / 10,
      s"only $within/${rows.length} pairs within the 3-sigma bound")
  }

  test("x_random_projection: JL ratios positive, mean ratio near 1 " +
      "(unbiasedness of the +-1/sqrt(k) projection)") {
    val rows = run("x_random_projection").collect()
    assert(rows.nonEmpty)
    val ratios = rows.map(_.getAs[Double]("sq_ratio"))
    assert(ratios.forall(_ > 0.0))
    val mean = ratios.sum / ratios.length
    assert(mean > 0.6 && mean < 1.4, s"mean sq_ratio $mean far from 1")
  }

  test("x_zorder_layout: both layouts produce 16 files; z-order strictly " +
      "tightens the secondary dimension's per-file spans vs insert order") {
    val rows = run("x_zorder_layout").collect()
    val byLayout = rows.map(r => r.getAs[String]("layout") -> r).toMap
    assert(byLayout.keySet == Set("linear", "zorder"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_files") == 16)
      assert(r.getAs[Double]("avg_frac_x") > 0.0)
      assert(r.getAs[Double]("avg_frac_x") <= 1.0)
    }
    // x (= partkey bits) is random under insert order; z-ordering must
    // cluster it. y's direction depends on how the orderkey range wraps
    // the 4096 domain, so no assertion there.
    assert(byLayout("zorder").getAs[Double]("avg_frac_x")
      < byLayout("linear").getAs[Double]("avg_frac_x"))
  }

  test("x_scd2_intervals: per user, versions are contiguous from 1, " +
      "exactly one open (current) interval, intervals chain " +
      "valid_to == next valid_from, adjacent types differ") {
    val rows = run("x_scd2_intervals").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("version"))
      assert(sorted.map(_.getAs[Long]("version")).toSeq ==
        (1L to sorted.length.toLong))
      assert(sorted.count(_.getAs[Boolean]("is_current")) == 1)
      assert(sorted.last.getAs[Boolean]("is_current"))
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(a.getAs[String]("valid_to") == b.getAs[String]("valid_from"))
        assert(a.getAs[String]("event_type") !=
          b.getAs[String]("event_type"),
          "adjacent SCD2 intervals must change the tracked attribute")
      }
    }
  }

  test("x_domain_cap: kept never exceeds the cap or the domain size, " +
      "kept + dropped == n_docs") {
    val rows = run("x_domain_cap").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, k, dr) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"),
        r.getAs[Long]("n_dropped"))
      assert(k <= 10 && k <= n && k + dr == n)
      assert(k == math.min(n, 10L))
    }
  }

  test("x_cluster_topics: exactly 3 ranked terms per cell, scores " +
      "non-increasing within a cell, cluster doc counts cover the " +
      "joined corpus") {
    val rows = run("x_cluster_topics").collect()
    assert(rows.nonEmpty)
    val cells = rows.groupBy(_.getAs[Long]("cell"))
    cells.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L))
      val scores = sorted.map(_.getAs[Double]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      assert(sorted.map(_.getAs[String]("term")).distinct.length == 3)
    }
    val totalDocs = cells.map(_._2.head.getAs[Long]("n_docs")).sum
    assert(totalDocs > 0)
  }

  test("x_degree_histogram: buckets honest (min/max inside [2^b, 2^(b+1))), " +
      "node counts sum to the graph's node count") {
    val rows = run("x_degree_histogram").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      val (lo, hi) = (r.getAs[Long]("min_deg"), r.getAs[Long]("max_deg"))
      assert(lo >= (1L << b) && hi < (1L << (b + 1)),
        s"bucket $b holds degrees [$lo, $hi] outside [2^$b, 2^${b + 1})")
      assert(lo <= hi)
    }
  }

  test("x_token_entropy: 0 <= H <= ln(n_distinct), normalized entropy " +
      "in [0, 1], uniform-limit reached only when all tokens distinct") {
    val rows = run("x_token_entropy").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy")
      val hn = r.getAs[Double]("entropy_norm")
      val nd = r.getAs[Long]("n_distinct")
      assert(h >= 0.0 && h <= math.log(nd.toDouble) + 1e-6)
      assert(hn >= 0.0 && hn <= 1.0 + 1e-6)
    }
  }

  test("x_weighted_sample: exactly 50 picks, keys non-increasing, " +
      "sampled docs skew long (mean weight above corpus mean)") {
    val rows = run("x_weighted_sample").collect()
    assert(rows.length == 50)
    val keys = rows.map(_.getAs[Double]("key_milli"))
    assert(keys.zip(keys.tail).forall { case (a, b) => a >= b })
    val sampledMeanW = rows.map(_.getAs[Long]("w")).sum.toDouble / 50
    val corpusMeanW = spark.read
      .parquet(s"$sf/documents.parquet")
      .agg(org.apache.spark.sql.functions.avg("n_chars"))
      .head().getDouble(0)
    assert(sampledMeanW > corpusMeanW,
      s"weighted sample mean $sampledMeanW <= corpus mean $corpusMeanW")
  }

  test("x_robust_stats: MAD <= spread, outlier fraction bounded well " +
      "below half (median robustness), counts consistent") {
    val rows = run("x_robust_stats").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("mad") >= 0.0)
      val frac = r.getAs[Double]("outlier_frac")
      assert(frac >= 0.0 && frac < 0.5)
      assert(r.getAs[Long]("n_outliers") <= r.getAs[Long]("n"))
    }
  }

  test("x_quantile_bins: 10 bins, equi-depth within 1 row, " +
      "boundaries non-decreasing and non-overlapping") {
    val rows = run("x_quantile_bins").collect().sortBy(_.getAs[Long]("bin"))
    assert(rows.map(_.getAs[Long]("bin")).toSeq == (1L to 10L))
    val counts = rows.map(_.getAs[Long]("n"))
    assert(counts.max - counts.min <= 1, s"not equi-depth: ${counts.toSeq}")
    rows.zip(rows.tail).foreach { case (a, b) =>
      assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo") + 1e-9)
    }
    rows.foreach(r =>
      assert(r.getAs[Double]("lo") <= r.getAs[Double]("hi")))
  }

  test("x_rolling_features: trailing counts at least 1 (self included), " +
      "sums consistent with counts (zero only when count is zero)") {
    val rows = run("x_rolling_features").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("cnt_24h") >= 1,
        "a RANGE frame ending at CURRENT ROW must include the row itself")
    }
  }

  test("x_ordered_funnel: monotone narrowing signup >= view >= purchase, " +
      "fractions consistent with the counts") {
    val r = run("x_ordered_funnel").collect().head
    val (nu, ns, nv, np) = (r.getAs[Long]("n_users"),
      r.getAs[Long]("n_signup"), r.getAs[Long]("n_view_1h"),
      r.getAs[Long]("n_purchase_24h"))
    assert(ns <= nu && nv <= ns && np <= nv,
      s"funnel must narrow: $nu >= $ns >= $nv >= $np")
    assert(r.getAs[Double]("frac_signup_to_view") <= 1.0)
    assert(r.getAs[Double]("frac_view_to_purchase") <= 1.0)
  }

  test("x_burst_hours: every type scores the same spine length, burst " +
      "count small relative to scored hours (z>3 is a tail event), " +
      "peak z at least the burst threshold when bursts exist") {
    val rows = run("x_burst_hours").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nh, nb) = (r.getAs[Long]("n_hours_scored"),
        r.getAs[Long]("n_bursts"))
      assert(nh > 0 && nb <= nh / 10,
        s"bursts $nb not a tail of $nh scored hours")
      if (nb > 0) assert(r.getAs[Double]("peak_z") > 3.0)
    }
  }

  test("x_target_encoding: no self-leakage (singleton keys fall back to " +
      "the global mean, LOO differs from the naive key mean), smoothing " +
      "pulls toward the global mean") {
    val rows = run("x_target_encoding").collect()
    assert(rows.nonEmpty)
    val globalMean = rows.map(_.getAs[Double]("quantity")).sum / rows.length
    rows.foreach { r =>
      val (n, loo, sm) = (r.getAs[Long]("key_n"),
        r.getAs[Double]("loo_mean"), r.getAs[Double]("smoothed_mean"))
      assert(loo >= 0.0 && sm >= 0.0)
      // smoothing with m=10 keeps the estimate strictly inside the hull
      // of the LOO numerator mean and the global mean's neighborhood
      if (n > 1) {
        val dLoo = math.abs(sm - loo)
        assert(dLoo < 60.0, "smoothed estimate unbounded")
      }
    }
    // at least one singleton key exercises the global-mean fallback OR
    // all keys repeat (then LOO must not equal quantity anywhere)
    val leaky = rows.count(r => r.getAs[Long]("key_n") > 1 &&
      r.getAs[Double]("loo_mean") == r.getAs[Double]("quantity"))
    assert(leaky < rows.length / 2,
      "LOO equal to own label on most rows suggests self-leakage")
    assert(globalMean > 0.0)
  }

  test("x_chi2_independence: dof consistent with table dims, chi2 and " +
      "Cramer's V non-negative, V bounded by 1") {
    val r = run("x_chi2_independence").collect().head
    val (nr, nc, dof) = (r.getAs[Long]("n_sources"),
      r.getAs[Long]("n_langs"), r.getAs[Long]("dof"))
    assert(dof == (nr - 1) * (nc - 1))
    assert(r.getAs[Double]("chi2") >= 0.0)
    val v = r.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0)
  }

  test("x_markov_transitions: rows are a proper conditional distribution " +
      "(per-from probabilities sum to ~1, all in (0, 1])") {
    val rows = run("x_markov_transitions").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (_, rs) =>
      val ps = rs.map(_.getAs[Double]("p"))
      assert(ps.forall(p => p > 0.0 && p <= 1.0))
      assert(math.abs(ps.sum - 1.0) < 1e-4,
        s"row does not normalize: ${ps.sum}")
    }
  }

  test("x_label_propagation: 50 held-out members, majority votes within " +
      "[2, 3] imply agreement, high accuracy on the clustered fixture " +
      "(structure exists by construction)") {
    val rows = run("x_label_propagation").collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val v = r.getAs[Long]("votes")
      assert(v >= 1 && v <= 3)
      assert(r.getAs[Long]("pred_label") >= 0 &&
        r.getAs[Long]("pred_label") < 40)
    }
    val acc = rows.count(_.getAs[Boolean]("correct")).toDouble / rows.length
    assert(acc >= 0.8,
      s"accuracy $acc on the clustered fixture — top-3 neighbors should " +
        "be same-cluster at 0.94 within-cluster cosine")
  }

  test("x_cooccurrence_recs: at most 3 ranked recs per customer, scores " +
      "non-increasing by rank, no customer recommended a supplier they " +
      "already buy from") {
    val rows = run("x_cooccurrence_recs").collect()
    assert(rows.nonEmpty)
    val own = spark.read.parquet(s"$sf/lineitem.parquet")
      .join(spark.read.parquet(s"$sf/orders.parquet"),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      .select(org.apache.spark.sql.functions.col("o_custkey").as("customer"),
        org.apache.spark.sql.functions.col("l_suppkey").as("supplier"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.groupBy(_.getAs[Long]("customer")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.length <= 3)
      val scores = sorted.map(_.getAs[Long]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    rows.foreach { r =>
      assert(!own.contains(
        (r.getAs[Long]("customer"), r.getAs[Long]("supplier"))),
        "recommended an already-used supplier")
    }
  }

  test("x_cooccurrence_recs: a plain-Scala replay WITH the per-supplier " +
      "degree cap reproduces every rec row exactly, and the cap is " +
      "genuinely active on the fixture (some supplier exceeds it)") {
    import org.apache.spark.sql.functions.col
    val rows = run("x_cooccurrence_recs").collect()
      .map(r => (r.getAs[Long]("customer"), r.getAs[Long]("rank"),
        r.getAs[Long]("supplier"), r.getAs[Long]("score"),
        r.getAs[Long]("deg_cap")))
    val cap = rows.head._5.toInt
    // distinct (order, customer, supplier) links -> per-pair distinct-
    // order weights, independently of the engine's frames
    val links = spark.read.parquet(s"$sf/lineitem.parquet")
      .join(spark.read.parquet(s"$sf/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey").as("ok"), col("o_custkey").as("c"),
        col("l_suppkey").as("sp"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ew = links.groupBy(l => (l._2, l._3)).map { case (k, v) =>
      k -> v.length.toLong }
    val e0 = ew.keySet
    // per supplier keep the top-cap customers by (weight desc, c asc).
    // NB .toSeq before flatMap: flatMap on a Map yielding (c, sp)
    // 2-tuples would rebuild a Map keyed by c, silently collapsing the
    // backbone to one supplier per customer
    val capped: Set[(Long, Long)] = ew.toSeq
      .groupBy(_._1._2).toSeq
      .flatMap { case (sp, cs) =>
        cs.sortBy { case ((c, _), w) => (-w, c) }.take(cap)
          .map { case ((c, _), _) => (c, sp) }
      }.toSet
    assert(ew.groupBy(_._1._2).exists(_._2.size > cap),
      "fixture must exercise the truncation or the replay proves nothing")
    val targets = e0.filter(_._1 < 50)
    val pairW = (for {
      (c1, sp) <- targets.toSeq
      (c2, sp2) <- capped if sp2 == sp && c2 != c1
    } yield (c1, c2)).groupBy(identity).map { case (k, v) =>
      k -> v.length.toLong }
    val scores = (for {
      ((c1, c2), w) <- pairW.toSeq
      (cc, cand) <- e0 if cc == c2
    } yield ((c1, cand), w))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
      .filterNot { case ((c1, cand), _) => e0.contains((c1, cand)) }
    val expect = scores.toSeq
      .groupBy(_._1._1)
      .flatMap { case (c1, ss) =>
        ss.sortBy { case ((_, cand), sc) => (-sc, cand) }.take(3)
          .zipWithIndex
          .map { case (((_, cand), sc), i) =>
            (c1, (i + 1).toLong, cand, sc, cap.toLong) }
      }.toSet
    assert(rows.toSet == expect,
      s"engine ${rows.length} rows vs replay ${expect.size}")
  }

  test("x_rfm_segments: segments are three digits 1..5, customer counts " +
      "sum to the customer base, monetary totals positive") {
    val rows = run("x_rfm_segments").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val seg = r.getAs[String]("segment")
      assert(seg.length == 3 && seg.forall(c => c >= '1' && c <= '5'), seg)
      assert(r.getAs[Double]("total_monetary") > 0.0)
    }
    val totalCusts = rows.map(_.getAs[Long]("n_customers")).sum
    val nCusts = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_custkey").distinct().count()
    assert(totalCusts == nCusts,
      s"segment counts $totalCusts != customer base $nCusts")
  }

  test("x_shingle_profile: near-dup similarity stays high at every width " +
      "while background similarity strictly decreases with width — the " +
      "separation widens") {
    val rows = run("x_shingle_profile").collect()
    val byK = rows.groupBy(_.getAs[Long]("shingle_k"))
    assert(byK.keySet == Set(2L, 3L, 5L))
    def j(k: Long, t: String): Double = byK(k)
      .find(_.getAs[String]("pair_type") == t).get
      .getAs[Double]("avg_jaccard")
    Seq(2L, 3L, 5L).foreach { k =>
      assert(j(k, "near_dup") > 0.8, s"near-dup pairs at k=$k")
      assert(j(k, "background") < 0.2)
    }
    assert(j(2, "background") >= j(3, "background"))
    assert(j(3, "background") >= j(5, "background"))
  }

  test("x_rank_correlation: rho in [-1, 1] and entropy-vs-length on a " +
      "small vocabulary correlates positively") {
    val r = run("x_rank_correlation").collect().head
    val rho = r.getAs[Double]("spearman_rho")
    assert(rho >= -1.0 && rho <= 1.0)
    assert(rho > 0.0,
      "longer docs must rank higher-entropy on a bounded vocabulary")
  }

  test("x_abc_analysis: shares sum to 1, class A is the smallest group " +
      "with the largest per-class revenue concentration") {
    val rows = run("x_abc_analysis").collect()
    assert(rows.map(_.getAs[String]("cls")).toSeq.sorted ==
      Seq("A", "B", "C"))
    val shares = rows.map(_.getAs[Double]("revenue_share"))
    assert(math.abs(shares.sum - 1.0) < 1e-4)
    val byCls = rows.map(r => r.getAs[String]("cls") -> r).toMap
    val perHeadA = byCls("A").getAs[Double]("class_revenue") /
      byCls("A").getAs[Long]("n_suppliers")
    val perHeadC = byCls("C").getAs[Double]("class_revenue") /
      byCls("C").getAs[Long]("n_suppliers")
    assert(perHeadA > perHeadC,
      "class A suppliers must out-earn class C per head")
  }

  test("x_autocorrelation: acf bounded by 1 in magnitude, lag-1 pair " +
      "count exceeds lag-24's (shorter shift, more overlap)") {
    val rows = run("x_autocorrelation").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val a = r.getAs[Double]("acf")
      assert(a >= -1.0 - 1e-6 && a <= 1.0 + 1e-6, s"acf $a out of range")
    }
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      val byLag = rs.map(r => r.getAs[Long]("lag") -> r).toMap
      assert(byLag(1L).getAs[Long]("n_pairs") >=
        byLag(24L).getAs[Long]("n_pairs"))
    }
  }

  test("x_cusum_changepoint: statistic non-negative and peak hour lies " +
      "inside the observed series") {
    val rows = run("x_cusum_changepoint").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("max_cusum") >= 0.0)
      assert(r.getAs[Long]("n_hours") > 0)
      assert(r.getAs[String]("peak_hour").startsWith("2024-01-"))
    }
  }

  test("x_page_hinkley: per-type max PH statistics equal a sequential " +
      "plain-Scala replay of the detector over the ordered hourly " +
      "series (the textbook streaming formulation)") {
    import org.apache.spark.sql.functions._
    val rows = run("x_page_hinkley").collect()
    assert(rows.nonEmpty)
    val hourly = spark.read.parquet(s"$sf/events.parquet")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Timestamp]("h").getTime, r.getAs[Long]("c")))
      .groupBy(_._1)
    rows.foreach { r =>
      val series = hourly(r.getAs[String]("event_type"))
        .sortBy(_._2).map(_._3)
      // sequential replay with the op's own quantization (floor to 1e9
      // per term, integer cumulative sums, running extremum)
      var p = 0L; var t = 0L; var mi = 0L; var md = 0L
      var minMi = Long.MaxValue; var maxMd = Long.MinValue
      var phi = 0L; var phd = 0L
      series.foreach { c =>
        p += c; t += 1
        val mean = p.toDouble / t
        mi += math.floor((c - mean - 0.5) * 1e9 + 0.5).toLong
        md += math.floor((c - mean + 0.5) * 1e9 + 0.5).toLong
        minMi = math.min(minMi, mi); maxMd = math.max(maxMd, md)
        phi = math.max(phi, mi - minMi); phd = math.max(phd, maxMd - md)
      }
      def q4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
      assert(r.getAs[Long]("n_hours") == series.length.toLong)
      assert(r.getAs[Double]("max_ph_increase") == q4(phi / 1e9),
        s"PH+ replay mismatch for ${r.getAs[String]("event_type")}")
      assert(r.getAs[Double]("max_ph_decrease") == q4(phd / 1e9),
        s"PH- replay mismatch for ${r.getAs[String]("event_type")}")
      assert(r.getAs[Boolean]("drift_flag") ==
        (phi > 25000000000L || phd > 25000000000L))
    }
  }

  test("x_ols_trend: r2 in [0, 1]; fitted line reproduces the per-group " +
      "mean (mean of y equals slope * mean of x + intercept)") {
    val rows = run("x_ols_trend").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= 0.0 && r2 <= 1.0 + 1e-6)
    }
  }

  test("x_path_ngrams: 10 paths of exactly three event types, counts " +
      "non-increasing, shares a proper sub-distribution") {
    val rows = run("x_path_ngrams").collect()
    assert(rows.length == 10)
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getAs[String]("path").split(">").length == 3)
      val s = r.getAs[Double]("share")
      assert(s > 0.0 && s < 1.0)
    }
    assert(rows.map(_.getAs[Double]("share")).sum <= 1.0 + 1e-6)
  }

  test("x_link_prediction: scores ordered, jaccard bounded, common " +
      "neighbors positive, pairs canonical (s1 < s2)") {
    val rows = run("x_link_prediction").collect()
    assert(rows.nonEmpty)
    val aas = rows.map(_.getAs[Double]("adamic_adar"))
    assert(aas.zip(aas.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getAs[Long]("s1") < r.getAs[Long]("s2"))
      assert(r.getAs[Long]("common") >= 1)
      val j = r.getAs[Double]("jaccard")
      assert(j > 0.0 && j <= 1.0)
    }
  }

  test("x_entropy_rate: conditioning never hurts — H1 <= H0 <= ln(#states), " +
      "gain is their difference") {
    val r = run("x_entropy_rate").collect().head
    val (h0, h1, g) = (r.getAs[Double]("h0_marginal"),
      r.getAs[Double]("h1_markov"), r.getAs[Double]("predictability_gain"))
    assert(h1 <= h0 + 1e-6, "Markov conditioning must not increase entropy")
    assert(h0 <= math.log(5.0) + 1e-6, "marginal bounded by ln(5 states)")
    assert(math.abs(g - (h0 - h1)) < 1e-5)
  }

  test("x_survival_curve: S(0) = 1, non-increasing in t, alive counts " +
      "match the fraction") {
    val rows = run("x_survival_curve").collect().sortBy(_.getAs[Long]("t"))
    assert(rows.length == 29)
    assert(rows.head.getAs[Double]("survival") == 1.0,
      "every user is alive at their own first day")
    val ss = rows.map(_.getAs[Double]("survival"))
    assert(ss.zip(ss.tail).forall { case (a, b) => a >= b })
  }

  test("x_gini_concentration: gini in [0, 1) and consistent with the " +
      "ABC concentration (a skewed distribution is not uniform)") {
    val r = run("x_gini_concentration").collect().head
    val g = r.getAs[Double]("gini")
    assert(g >= 0.0 && g < 1.0)
    assert(r.getAs[Double]("total_revenue") > 0.0)
  }

  test("x_source_divergence: JSD bounded by ln 2, non-negative, one row " +
      "per source") {
    val rows = run("x_source_divergence").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val j = r.getAs[Double]("jsd_nats")
      assert(j >= -1e-9 && j <= math.log(2.0) + 1e-9,
        s"jsd $j outside [0, ln 2]")
    }
    assert(rows.map(_.getAs[String]("source")).distinct.length ==
      rows.length)
  }

  test("x_ks_statistic: D in [0, 1], critical value positive, rejection " +
      "flag consistent with D vs threshold") {
    val r = run("x_ks_statistic").collect().head
    val (d, c) = (r.getAs[Double]("ks_d"), r.getAs[Double]("crit_05"))
    assert(d >= 0.0 && d <= 1.0)
    assert(c > 0.0)
    assert(r.getAs[Boolean]("reject_05") == (d > c) ||
      math.abs(d - c) < 1e-6)
  }

  test("x_benford_digits: nine digits, fracs are distributions, Benford " +
      "column matches log10(1 + 1/d) and decreases in d") {
    val rows = run("x_benford_digits").collect().sortBy(_.getAs[Long]("digit"))
    assert(rows.map(_.getAs[Long]("digit")).toSeq == (1L to 9L))
    val ob = rows.map(_.getAs[Double]("observed_frac"))
    val bf = rows.map(_.getAs[Double]("benford_frac"))
    assert(math.abs(ob.sum - 1.0) < 1e-4)
    assert(math.abs(bf.sum - 1.0) < 1e-4)
    assert(bf.zip(bf.tail).forall { case (a, b) => a > b })
    rows.foreach { r =>
      val d = r.getAs[Long]("digit").toDouble
      assert(math.abs(r.getAs[Double]("benford_frac") -
        math.log10(1.0 + 1.0 / d)) < 1e-5)
    }
  }

  test("x_cluster_size_dist: sizes >= 2 (singletons are not clusters), " +
      "doc counts are size * clusters, corpus-dup structure present") {
    val rows = run("x_cluster_size_dist").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sz, nc, nd) = (r.getAs[Long]("cluster_size"),
        r.getAs[Long]("n_clusters"), r.getAs[Long]("n_docs"))
      assert(sz >= 2, "a cluster needs at least one verified pair")
      assert(nd == sz * nc)
    }
  }

  test("x_seasonality_profile: exactly one peak per weekday, dow in 1..7, " +
      "hour in 0..23, per-day rates positive") {
    val rows = run("x_seasonality_profile").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dw, hr) = (r.getAs[Long]("dow"), r.getAs[Long]("hr"))
      assert(dw >= 1 && dw <= 7)
      assert(hr >= 0 && hr <= 23)
      assert(r.getAs[Double]("events_per_day") > 0.0)
    }
    rows.groupBy(_.getAs[Long]("dow")).foreach { case (_, rs) =>
      assert(rs.count(_.getAs[Boolean]("is_peak")) == 1)
    }
  }

  test("x_market_basket: lift ordered, confidence bounded by 1, support " +
      "consistent (n12 <= N * support bound), canonical pairs") {
    val rows = run("x_market_basket").collect()
    assert(rows.nonEmpty)
    val lifts = rows.map(_.getAs[Double]("lift"))
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getAs[Long]("s1") < r.getAs[Long]("s2"))
      assert(r.getAs[Long]("n12") >= 5)
      val c = r.getAs[Double]("confidence")
      assert(c > 0.0 && c <= 1.0)
      assert(r.getAs[Double]("support") > 0.0)
      assert(r.getAs[Double]("lift") > 0.0)
    }
  }

  test("x_proportion_ztest: rates in [0, 1], significance flag matches " +
      "|z| vs 1.96, cohorts partition the user base") {
    val r = run("x_proportion_ztest").collect().head
    val (ra, rb) = (r.getAs[Double]("rate_a"), r.getAs[Double]("rate_b"))
    assert(ra >= 0.0 && ra <= 1.0 && rb >= 0.0 && rb <= 1.0)
    val z = r.getAs[Double]("z")
    assert(r.getAs[Boolean]("significant_05") == (math.abs(z) > 1.96) ||
      math.abs(math.abs(z) - 1.96) < 1e-6)
    assert(r.getAs[Long]("k1") <= r.getAs[Long]("n1"))
    assert(r.getAs[Long]("k2") <= r.getAs[Long]("n2"))
  }

  test("x_textrank_keywords: top-10 equals a plain-double driver-side " +
      "weighted PageRank over an independently rebuilt word graph") {
    val got = run("x_textrank_keywords").collect()
      .map(r => (r.getAs[String]("keyword"), r.getAs[Double]("textrank"),
        r.getAs[Long]("weighted_degree")))
    assert(got.length == 10)
    // rebuild the +-2-window content-word co-occurrence graph directly
    val pat = "^[a-z]{4,}$".r
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map(_.getString(0).split(" ", -1))
    val pairCounts = scala.collection.mutable.Map.empty[(String, String),
      Long]
    docs.foreach { tk =>
      for (i <- tk.indices; o <- 1 to 2 if i + o < tk.length) {
        val (a, b) = (tk(i), tk(i + o))
        if (pat.matches(a) && pat.matches(b)) {
          pairCounts((a, b)) = pairCounts.getOrElse((a, b), 0L) + 1L
          pairCounts((b, a)) = pairCounts.getOrElse((b, a), 0L) + 1L
        }
      }
    }
    val wdeg = pairCounts.toSeq.groupBy(_._1._1)
      .map { case (w, xs) => w -> xs.map(_._2).sum }
    val nodes = wdeg.keys.toSeq.sorted
    val n = nodes.length.toDouble
    var tr = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 6) {
      val in = scala.collection.mutable.Map.empty[String, Double]
      pairCounts.foreach { case ((w, c), nwc) =>
        in(c) = in.getOrElse(c, 0.0) + tr(w) * nwc / wdeg(w)
      }
      tr = nodes.map(w => w -> (0.15 / n + 0.85 * in.getOrElse(w, 0.0)))
        .toMap
    }
    val expect = tr.toSeq.sortBy { case (w, r) => (-r, w) }.take(10)
    got.zip(expect).foreach { case ((kw, r, wd), (ekw, er)) =>
      assert(kw == ekw, s"keyword order: $kw vs $ekw")
      assert(math.abs(r - er) < 1e-5, s"$kw rank $r vs brute $er")
      assert(wd == wdeg(kw), s"$kw wdeg")
    }
  }
}
