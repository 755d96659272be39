package graft

/** Structural + recomputation invariants for the round-9 evaluation /
  * retrieval / graph batch (EvalOps, the CorpusOps retrieval entries,
  * x_triangle_count, x_ewma_anomaly) — properties the DuckDB
  * hash-compare cannot express, plus independent brute-force
  * recomputations of AUC and the triangle count at sf0.001 so the
  * distributed formulations are checked against a second,
  * structurally different implementation.
  */
class EvalRetrievalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  // co-purchase backbone support threshold, recomputed from the rule
  // (corpus-relative, r16 verdict #1): sup >= 2 AND sup·10000 >= |orders|
  // — at sf0.001 (1.5k orders) this is the historical >= 2, and the
  // replays below stay honest if the fixture scale ever changes
  private lazy val minSup: Int = {
    val nOrders = spark.read.parquet(s"$sf/orders.parquet").count()
    math.max(2L, (nOrders + 9999L) / 10000L).toInt
  }

  test("x_auc_roc: single row, partition adds up, and the rank-based " +
      "AUC equals a brute-force all-pairs recomputation") {
    val r = run("x_auc_roc").collect().head
    val (nd, np, nn) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_pos"),
      r.getAs[Long]("n_neg"))
    val auc = r.getAs[Double]("auc")
    assert(np + nn == nd)
    assert(auc >= 0.0 && auc <= 1.0)
    // brute force: Σ over (pos, neg) pairs of 2·[p>n] + 1·[p==n]
    val sig = spark.read.parquet(s"$sf/documents.parquet")
      .select("text", "lang").collect()
      .map(row => (row.getAs[String]("text").split(" ", -1)
        .distinct.length.toLong,
        row.getAs[String]("lang") == "en"))
    val pos = sig.filter(_._2).map(_._1)
    val neg = sig.filterNot(_._2).map(_._1)
    assert(pos.length.toLong == np && neg.length.toLong == nn)
    val u2 = (for (p <- pos; n <- neg)
      yield if (p > n) 2L else if (p == n) 1L else 0L).sum
    val brute = u2.toDouble / (2.0 * pos.length * neg.length)
    assert(math.abs(auc - brute) <= 1e-6,
      s"rank AUC $auc vs brute-force $brute")
  }

  test("x_calibration_bins: bins partition the corpus, rates in [0,1], " +
      "gap is the |mean_p - frac_pos| of its own row") {
    val rows = run("x_calibration_bins").collect()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    rows.foreach { r =>
      val (mp, fp) = (r.getAs[Double]("mean_p"), r.getAs[Double]("frac_pos"))
      assert(mp >= 0.0 && mp <= 1.0 && fp >= 0.0 && fp <= 1.0)
      assert(math.abs(r.getAs[Double]("gap") - math.abs(mp - fp)) <= 1e-9)
      assert(r.getAs[Long]("n_pos") <= r.getAs[Long]("n_docs"))
    }
  }

  test("x_mutual_information: MI non-negative, NMI within [0, 1] " +
      "(up to quantization)") {
    val r = run("x_mutual_information").collect().head
    assert(r.getAs[Long]("n_cells") >= 1)
    assert(r.getAs[Double]("mi") >= -1e-6)
    val nmi = r.getAs[Double]("nmi")
    assert(nmi >= -1e-6 && nmi <= 1.0 + 1e-6)
  }

  test("x_ndcg_eval: dcg <= idcg, ndcg in [0,1], idcg positive when " +
      "relevant docs exist") {
    val r = run("x_ndcg_eval").collect().head
    val (dcg, idcg, ndcg) = (r.getAs[Double]("dcg10"),
      r.getAs[Double]("idcg10"), r.getAs[Double]("ndcg10"))
    assert(dcg <= idcg + 1e-9)
    assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-9)
    if (r.getAs[Long]("n_rel_docs") > 0) assert(idcg > 0.0)
  }

  test("x_rrf_fusion: 15 dense ranks, scores non-increasing, each row " +
      "carries >=1 leg, score equals its own ranks' RRF") {
    val rows = run("x_rrf_fusion").collect()
    assert(rows.map(_.getAs[Long]("fused_rank")).toSeq == (1L to 15L))
    val scores = rows.map(_.getAs[Double]("rrf_score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      val rb = Option(r.getAs[Any]("rank_bm")).map(_.asInstanceOf[Long])
      val rc = Option(r.getAs[Any]("rank_cos")).map(_.asInstanceOf[Long])
      assert(rb.isDefined || rc.isDefined)
      val expect = rb.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        rc.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(math.abs(r.getAs[Double]("rrf_score") - expect) <= 2e-6)
    }
  }

  test("x_mmr_rerank: 5 queries x 5 steps, selections distinct per " +
      "query, step 1 agrees with the brute-force top-1 neighbor") {
    val rows = run("x_mmr_rerank").collect()
    assert(rows.length == 25)
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet == (0L to 4L).toSet)
    // x_sim_topk's rank-1 neighbor (same corpus, same rounding) must be
    // the pure-relevance first MMR pick
    val top1 = run("x_sim_topk").collect()
      .filter(r => r.getAs[Long]("rank") == 1L &&
        r.getAs[Long]("query_id") < 5L)
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id"))
      .toMap
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Long]("step")).sorted.toSeq == (1L to 5L))
      val ids = rs.map(_.getAs[Long]("vec_id"))
      assert(ids.distinct.length == 5)
      assert(!ids.contains(q))
      val first = rs.find(_.getAs[Long]("step") == 1L).get
        .getAs[Long]("vec_id")
      assert(first == top1(q),
        s"query $q: MMR step 1 $first != brute top-1 ${top1(q)}")
    }
  }

  test("x_classifier_agreement + x_classifier_report: kappa below " +
      "accuracy, report rows consistent with the confusion matrix") {
    val agg = run("x_classifier_agreement").collect().head
    val (acc, pe, kap) = (agg.getAs[Double]("accuracy"),
      agg.getAs[Double]("expected_agreement"), agg.getAs[Double]("kappa"))
    assert(acc >= 0.0 && acc <= 1.0 && pe > 0.0 && pe < 1.0)
    assert(kap <= acc + 1e-9, "kappa must not exceed raw accuracy")
    val rep = run("x_classifier_report").collect()
    assert(rep.map(_.getAs[String]("class")).sorted.toSeq ==
      Seq("de", "en", "es", "fr", "zh"))
    val nDocs = agg.getAs[Long]("n_docs")
    assert(rep.map(_.getAs[Long]("n_true")).sum == nDocs)
    rep.foreach { r =>
      val (p, rc, f1) = (r.getAs[Double]("precision"),
        r.getAs[Double]("recall"), r.getAs[Double]("f1"))
      assert(p >= 0 && p <= 1 && rc >= 0 && rc <= 1 && f1 >= 0 && f1 <= 1)
      assert(r.getAs[Long]("tp") <= r.getAs[Long]("n_true"))
      if (r.getAs[String]("class") == "zh")
        assert(p == 0.0 && rc == 0.0 && f1 == 0.0,
          "zh has no markers — its honest row is 0/0/0")
    }
    // micro accuracy from the report's tp sum must equal the agreement
    // entry's accuracy (same matrix, two formulations)
    val micro = rep.map(_.getAs[Long]("tp")).sum.toDouble / nDocs
    assert(math.abs(micro - acc) <= 1e-6)
  }

  test("x_kcore: core is a fixpoint (a further peel removes nothing) " +
      "and every core degree is >= k") {
    val r = run("x_kcore").collect().head
    assert(r.getAs[Long]("k") == 3L)
    assert(r.getAs[Long]("n_core_nodes") <= r.getAs[Long]("n_nodes_full"))
    assert(r.getAs[Long]("n_core_edges") <= r.getAs[Long]("n_edges_full"))
    // brute-force: rebuild the backbone, peel to exhaustion, compare
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(x => (x.getAs[Long]("l_orderkey"), x.getAs[Long]("l_partkey")))
      .distinct
    var edges = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length)
        yield (ps(i), ps(j))
    }.toSeq.groupBy(identity).filter(_._2.size >= minSup).keys.toSet
    var changed = true
    while (changed) {
      val deg = edges.toSeq.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).map { case (k2, v) => k2 -> v.size }
      val keep = deg.filter(_._2 >= 3).keySet
      val next = edges.filter { case (a, b) =>
        keep.contains(a) && keep.contains(b) }
      changed = next.size != edges.size
      edges = next
    }
    val coreNodes = edges.flatMap { case (a, b) => Seq(a, b) }
    assert(edges.size.toLong == r.getAs[Long]("n_core_edges"),
      "12 fixed peel rounds must reach the true fixpoint at this scale")
    assert(coreNodes.size.toLong == r.getAs[Long]("n_core_nodes"))
  }

  test("x_triangle_count: invariants hold and the oriented-wedge count " +
      "equals a brute-force common-neighbor recomputation") {
    val r = run("x_triangle_count").collect().head
    val (t, w) = (r.getAs[Long]("n_triangles"), r.getAs[Long]("n_wedges"))
    assert(3 * t <= w)
    val cc = r.getAs[Double]("global_cc")
    assert(cc >= 0.0 && cc <= 1.0 + 1e-9)
    // brute force at sf0.001: rebuild the corpus-relative-support
    // co-purchase edge set and count each triangle once per edge via
    // common neighbors
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(x => (x.getAs[Long]("l_orderkey"), x.getAs[Long]("l_partkey")))
      .distinct
    val pairCounts = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length)
        yield (ps(i), ps(j))
    }.toSeq.groupBy(identity).map { case (k, v) => k -> v.size }
    val edges = pairCounts.filter(_._2 >= minSup).keys.toSet
    assert(edges.size.toLong == r.getAs[Long]("n_edges"))
    val nbr = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val tripleCounted = edges.toSeq
      .map { case (a, b) => (nbr(a) & nbr(b)).size.toLong }.sum
    assert(tripleCounted == 3 * t,
      s"distributed $t triangles vs brute ${tripleCounted / 3}")
  }

  test("x_clustering_coeff: bucket profile equals a brute-force " +
      "per-node common-neighbor recomputation") {
    val rows = run("x_clustering_coeff").collect()
      .map(r => r.getAs[Long]("degree_bucket") ->
        (r.getAs[Long]("n_nodes"), r.getAs[Long]("corner_triangles"),
          r.getAs[Double]("avg_local_cc"))).toMap
    // same corpus-relative-support edge rebuild as the triangle test
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(x => (x.getAs[Long]("l_orderkey"), x.getAs[Long]("l_partkey")))
      .distinct
    val edges = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length)
        yield (ps(i), ps(j))
    }.toSeq.groupBy(identity).filter(_._2.size >= minSup).keys.toSet
    val nbr = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val perNode = nbr.filter(_._2.size >= 2).map { case (v, ns) =>
      val nsSeq = ns.toSeq.sorted
      val tv = (for (i <- nsSeq.indices; j <- i + 1 until nsSeq.length
        if edges.contains((nsSeq(i), nsSeq(j)))) yield 1).size.toLong
      (v, ns.size.toLong, tv)
    }
    val buckets = perNode.groupBy { case (_, d, _) => math.min(d, 10L) }
    assert(rows.keySet == buckets.keySet)
    buckets.foreach { case (b, ns) =>
      val (nNodes, corners, avgCc) = rows(b)
      assert(nNodes == ns.size.toLong, s"bucket $b node count")
      assert(corners == ns.map(_._3).sum, s"bucket $b corner sum")
      val brute = ns.map { case (_, d, tv) =>
        2.0 * tv / (d * (d - 1)) }.sum / ns.size
      assert(math.abs(avgCc - brute) < 1e-6,
        s"bucket $b cc $avgCc vs brute $brute")
    }
  }

  test("x_sq_int8_recall: exact rerank dominates pure ADC (a true " +
      "neighbor in the shortlist always survives exact re-scoring)") {
    val rows = run("x_sq_int8_recall").collect()
      .map(r => r.getAs[String]("config") ->
        (r.getAs[Long]("hits"), r.getAs[Long]("n_true"),
          r.getAs[Double]("recall"))).toMap
    assert(rows.keySet == Set("sq8_adc", "sq8_rerank32"))
    val (adcHits, nTrue, adcRec) = rows("sq8_adc")
    val (rrHits, _, rrRec) = rows("sq8_rerank32")
    assert(nTrue == 200L) // 20 queries x 10 true neighbors
    assert(rrHits >= adcHits)
    assert(adcRec >= 0.0 && rrRec <= 1.0)
  }

  test("x_bootstrap_ci: CI brackets the point estimate, replicate count " +
      "full, interval non-degenerate") {
    val r = run("x_bootstrap_ci").collect().head
    assert(r.getAs[Long]("n_replicates") == 32L)
    val (lo, hi, m) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"),
      r.getAs[Double]("mean"))
    assert(lo < hi)
    assert(lo <= m && m <= hi,
      s"point mean $m outside bootstrap CI [$lo, $hi]")
  }

  test("x_anova_oneway: SSB + SSW equals the directly computed total " +
      "sum of squares; F and eta-squared well-formed") {
    import org.apache.spark.sql.functions._
    val r = run("x_anova_oneway").collect().head
    assert(r.getAs[Long]("n_groups") == 5L)
    assert(r.getAs[Double]("f_stat") >= 0.0)
    val eta = r.getAs[Double]("eta_sq")
    assert(eta >= 0.0 && eta <= 1.0)
    // independent total-SS recomputation: SST = Σ(y − ȳ)²
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_totalprice").as("y"))
    val mean = o.agg(avg(col("y"))).first().getDouble(0)
    val sst = o.agg(sum((col("y") - lit(mean)) * (col("y") - lit(mean))))
      .first().getDouble(0)
    val got = r.getAs[Double]("ss_between") + r.getAs[Double]("ss_within")
    assert(math.abs(got - sst) / sst < 1e-9,
      s"SSB+SSW $got vs direct SST $sst")
  }

  test("x_ppmi_embeddings: 15 ordered pairs, cosines in [0,1] and " +
      "non-increasing, pairs canonical (w1 < w2)") {
    val rows = run("x_ppmi_embeddings").collect()
    assert(rows.length == 15)
    val cs = rows.map(_.getAs[Double]("cos_sim"))
    // PPMI vectors are non-negative, so cosines must land in [0, 1]
    assert(cs.forall(c => c >= 0.0 && c <= 1.0 + 1e-9))
    assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    rows.foreach(r =>
      assert(r.getAs[String]("w1") < r.getAs[String]("w2")))
  }

  test("x_event_pattern: automaton counts equal a plain-Scala replay of " +
      "the veto-funnel over every user's ordered history") {
    val rows = run("x_event_pattern").collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_conversions"))).toMap
    val ev = graft.util.Tables.t(spark, sf, "events")
      .selectExpr("user_id", "unix_micros(ts) AS tsm", "event_id",
        "event_type").collect()
      .map(r => (r.getAs[Long]("user_id"),
        (r.getAs[Long]("tsm"),
          r.getAs[Long]("event_id"), r.getAs[String]("event_type"))))
    val brute = ev.groupBy(_._1).map { case (u, es) =>
      var state = 0; var cnt = 0L
      es.map(_._2).sortBy(e => (e._1, e._2)).foreach { e =>
        e._3 match {
          case "error" => state = 0
          case "view" => if (state == 0) state = 1
          case "click" => if (state >= 1) state = 2
          case "purchase" => if (state == 2) { cnt += 1; state = 0 }
          case _ => ()
        }
      }
      u -> (es.length.toLong, cnt)
    }
    val top = brute.filter(_._2._2 > 0).toSeq
      .sortBy { case (u, (_, c)) => (-c, u) }.take(20).toMap
    assert(rows == top,
      s"engine top-20 $rows differs from replay top-20 $top")
  }

  test("x_best_passage: one passage per top-5 BM25 doc, chunks within " +
      "the 50-token window, every passage actually matches the query") {
    val rows = run("x_best_passage").collect()
    assert(rows.length == 5)
    val top5 = run("x_bm25").collect().take(5)
      .map(_.getAs[Long]("doc_id")).toSet
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == top5)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_tokens") >= 1 &&
        r.getAs[Long]("n_tokens") <= 50)
      assert(r.getAs[Long]("n_hits") >= 1)
      assert(r.getAs[Double]("passage_score") > 0.0)
    }
  }

  test("x_span_corruption: splicing the target spans back into the " +
      "input reconstructs every original document exactly") {
    val rows = run("x_span_corruption").collect()
    assert(rows.length == 3)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter("doc_id < 3").select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val sentinel = "<X\\d+>".r
    rows.foreach { r =>
      val target = r.getAs[String]("target_text")
      val spans = scala.collection.mutable.LinkedHashMap[Long, Vector[String]]()
      var cur = -1L
      target.split(" ").filter(_.nonEmpty).foreach { t =>
        if (sentinel.matches(t)) {
          cur = t.stripPrefix("<X").stripSuffix(">").toLong
          spans(cur) = Vector()
        } else spans(cur) = spans(cur) :+ t
      }
      assert(spans.size.toLong == r.getAs[Long]("n_spans"))
      assert(spans.values.map(_.length.toLong).sum ==
        r.getAs[Long]("n_masked"))
      val rebuilt = r.getAs[String]("input_text").split(" ")
        .filter(_.nonEmpty).flatMap { t =>
          if (sentinel.matches(t))
            spans(t.stripPrefix("<X").stripSuffix(">").toLong)
          else Vector(t)
        }.mkString(" ")
      assert(rebuilt == docs(r.getAs[Long]("doc_id")),
        s"doc ${r.getAs[Long]("doc_id")} reconstruction mismatch")
    }
  }

  test("x_prf_expansion: 10 dense ranks, scores non-increasing, 3 novel " +
      "expansion terms disjoint from the original query") {
    val rows = run("x_prf_expansion").collect()
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to 10L))
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    val terms = rows.head.getAs[String]("expansion_terms").split(",")
    assert(terms.length == 3 && terms.distinct.length == 3)
    assert(!terms.exists(Set("spark", "merge", "dup").contains),
      "expansion must not repeat original query terms")
    assert(rows.forall(r => Set(0L, 1L)
      .contains(r.getAs[Long]("in_orig_top10"))))
  }

  test("x_maxscore_prune: pruning is sound (top-10 preserved by " +
      "theorem), counts consistent") {
    val r = run("x_maxscore_prune").collect().head
    assert(r.getAs[Long]("top10_match") == 1L,
      "max-score pruning must never change the top-10")
    val (nm, ns, nsv) = (r.getAs[Long]("n_matched"),
      r.getAs[Long]("n_seed"), r.getAs[Long]("n_survivors"))
    assert(nsv <= nm && ns <= nm)
    if (nm >= 10) assert(nsv >= 10,
      "survivors must retain at least a full top-10")
    val expect = 1.0 - nsv.toDouble / nm
    assert(math.abs(r.getAs[Double]("prune_frac") - expect) <= 1e-6)
  }

  test("x_err_eval: ERR in [0, theoretical max], bounded below by the " +
      "first relevant rank's minimum contribution (cross-checked " +
      "against x_mrr_eval on the same truth), and the relevant-doc " +
      "count matches an independent grade recount") {
    val r = run("x_err_eval").collect().head
    val err = r.getAs[Double]("err10")
    // all-grade-3 ceiling: sum (1/r)(7/8)(1/8)^(r-1)
    val errMax = (1 to 10).map(rk =>
      (1.0 / rk) * (7.0 / 8.0) * math.pow(1.0 / 8.0, rk - 1)).sum
    assert(err >= 0.0 && err <= errMax + 1e-9,
      s"err $err vs ceiling $errMax")
    assert(r.getAs[Long]("n_rel_top10") <= 10L)
    // same graded truth as x_ndcg_eval: recount docs with >= 1 'dup'
    val nRel = graft.util.Tables.t(spark, sf, "documents")
      .filter(org.apache.spark.sql.functions
        .expr("array_contains(split(text, ' '), 'dup')"))
      .count()
    assert(r.getAs[Long]("n_rel_docs") == nRel)
    // cascade floor: ranks before the first relevant doc carry grade 0
    // (stop-probability 1), so ERR >= (1/f) * R_min with R_min = 1/8
    val mrr = run("x_mrr_eval").collect().head
    val f = mrr.getAs[Long]("first_rel_rank")
    if (f >= 1L && f <= 10L)
      assert(err >= (1.0 / f) * (1.0 / 8.0) - 1e-9,
        s"err $err below the rank-$f cascade floor")
  }

  test("x_map_eval: AP and the precision points are consistent exact " +
      "ratios (p_at_10 IS n_rel_top10/10, the prefix counts nest), " +
      "and the highly-relevant truth count matches a recount") {
    val r = run("x_map_eval").collect().head
    val ap = r.getAs[Double]("ap10")
    assert(ap >= 0.0 && ap <= 1.0 + 1e-9)
    val (p5, p10) = (r.getAs[Double]("p_at_5"), r.getAs[Double]("p_at_10"))
    assert(math.abs(p10 - r.getAs[Long]("n_rel_top10") / 10.0) < 1e-9)
    assert(p5 * 5 <= p10 * 10 + 1e-9, "prefix relevant counts must nest")
    assert(r.getAs[Long]("n_rel_top10") <=
      math.min(10L, r.getAs[Long]("n_rel_docs")))
    if (r.getAs[Long]("n_rel_top10") == 0L) assert(ap == 0.0)
    // the >= 2 'dup' tokens threshold, recounted independently
    val nRel = graft.util.Tables.t(spark, sf, "documents")
      .filter(org.apache.spark.sql.functions.expr(
        "size(filter(split(text, ' '), x -> x = 'dup')) >= 2"))
      .count()
    assert(r.getAs[Long]("n_rel_docs") == nRel)
  }

  test("x_mrr_eval: reciprocal-rank consistency and top-10 cap") {
    val r = run("x_mrr_eval").collect().head
    val frr = r.getAs[Long]("first_rel_rank")
    val mrr = r.getAs[Double]("mrr")
    assert(r.getAs[Long]("n_rel_top10") <= 10)
    if (frr > 0) assert(math.abs(mrr - 1.0 / frr) <= 1e-6)
    else assert(mrr == 0.0)
  }

  test("x_hard_negatives: 3 cross-label negatives per anchor, " +
      "similarities non-increasing within anchor") {
    val rows = run("x_hard_negatives").collect()
    val labels = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "label").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == 30)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq == Seq(1L, 2L, 3L))
      rs.foreach { r =>
        assert(labels(r.getAs[Long]("neighbor_id")) != labels(q),
          "hard negative must be cross-label")
        assert(math.abs(r.getAs[Double]("margin") -
          (r.getAs[Double]("pos_sim") - r.getAs[Double]("neg_sim")))
          <= 1e-6)
      }
      val sims = rs.sortBy(_.getAs[Long]("rank"))
        .map(_.getAs[Double]("neg_sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("x_negative_sampling: exactly two negatives per anchor window, " +
      "all sampled tokens drawn from the corpus vocabulary") {
    val rows = run("x_negative_sampling").collect()
    val pos = rows.filter(_.getAs[Long]("label") == 1L)
    val neg = rows.filter(_.getAs[Long]("label") == 0L)
    assert(pos.nonEmpty)
    val anchors = pos.map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Int]("pos"))).distinct.length
    assert(neg.length == 2 * anchors,
      s"${neg.length} negatives for $anchors anchors")
    val vocab = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("explode(split(text, ' ')) AS t").distinct()
      .collect().map(_.getString(0)).toSet
    assert(neg.forall(r => vocab.contains(r.getAs[String]("context"))))
    assert(rows.forall(r => r.getAs[Long]("doc_id") < 3))
  }

  test("x_bootstrap_median_ci: integer CI brackets the rank-selected " +
      "point median, replicates full") {
    val r = run("x_bootstrap_median_ci").collect().head
    assert(r.getAs[Long]("n_replicates") == 32L)
    val (lo, hi, m) = (r.getAs[Long]("ci_lo"), r.getAs[Long]("ci_hi"),
      r.getAs[Long]("median"))
    assert(lo <= hi)
    assert(lo <= m && m <= hi,
      s"point median $m outside bootstrap CI [$lo, $hi]")
    // independent recomputation of the point median
    val lens = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("size(split(text, ' ')) AS l").collect()
      .map(_.getInt(0).toLong).sorted
    assert(m == lens((lens.length + 1) / 2 - 1))
  }

  test("x_psi_drift: shares are smoothed distributions summing to ~1, " +
      "psi_total equals the sum of its own terms") {
    val rows = run("x_psi_drift").collect()
    assert(rows.length == 10)
    def sumOf(c: String) = rows.map(_.getAs[Double](c)).sum
    assert(math.abs(sumOf("ref_share") - 1.0) < 1e-3)
    assert(math.abs(sumOf("cur_share") - 1.0) < 1e-3)
    val total = rows.head.getAs[Double]("psi_total")
    assert(rows.forall(r => r.getAs[Double]("psi_total") == total))
    assert(math.abs(sumOf("psi_term") - total) < 1e-4)
    assert(total >= 0.0, "PSI is a non-negative divergence")
  }

  test("x_recs_holdout_eval: counts nest (hits <= adopters <= targets) " +
      "and the rate is their ratio") {
    val r = run("x_recs_holdout_eval").collect().head
    val (nt, nw, nh, hits) = (r.getAs[Long]("n_targets"),
      r.getAs[Long]("n_with_new"), r.getAs[Long]("n_hit_targets"),
      r.getAs[Long]("n_hits"))
    assert(nh <= nw && nw <= nt)
    assert(hits >= nh, "a hit target has at least one hit")
    assert(hits <= 3 * nh, "top-3 caps hits per target")
    val expect = if (nw == 0) 0.0 else nh.toDouble / nw
    assert(math.abs(r.getAs[Double]("hit_rate") - expect) <= 1e-6)
  }

  test("x_sliding_distinct: bucket-union counts equal a brute-force " +
      "trailing-24h recomputation for every hour") {
    val rows = run("x_sliding_distinct").collect()
      .map(r => r.getAs[String]("hour") ->
        (r.getAs[Long]("n_users_24h"), r.getAs[Long]("n_users_1h")))
    rows.foreach { case (_, (w24, w1)) => assert(w24 >= w1) }
    val ev = graft.util.Tables.t(spark, sf, "events")
      .selectExpr("date_trunc('hour', ts) AS h", "user_id")
      .distinct().collect()
      .map(r => (r.getAs[java.sql.Timestamp]("h").getTime,
        r.getAs[Long]("user_id")))
    val hourMs = 3600L * 1000
    rows.foreach { case (hs, (w24, _)) =>
      val t1 = java.sql.Timestamp.valueOf(hs).getTime
      val brute = ev.filter { case (h, _) =>
        h <= t1 && h > t1 - 24 * hourMs }.map(_._2).distinct.length
      assert(brute.toLong == w24, s"hour $hs: brute $brute vs engine $w24")
    }
  }

  test("x_twap: spans positive, 5 event types, weighted and plain means " +
      "both inside the observed value range") {
    val rows = run("x_twap").collect()
    assert(rows.length == 5)
    val (lo, hi) = {
      val vs = graft.util.Tables.t(spark, sf, "events")
        .select("value").collect().map(_.getDouble(0))
      (vs.min, vs.max)
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("span_micros") > 0L)
      assert(r.getAs[Long]("n_obs") > 0L)
      val (tw, pl) = (r.getAs[Double]("twap"), r.getAs[Double]("plain_avg"))
      assert(tw >= lo - 1e-6 && tw <= hi + 1e-6)
      assert(pl >= lo - 1e-6 && pl <= hi + 1e-6)
    }
  }

  test("x_hll_set_ops: intersection bounded by the smaller set, union " +
      "bounded by the sum, sketch flag green") {
    val rows = run("x_hll_set_ops").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (na, nb, nu, ni) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Long]("n_union"), r.getAs[Long]("n_inter"))
      assert(ni >= 0 && ni <= math.min(na, nb))
      assert(nu <= na + nb && nu >= math.max(na, nb))
      assert(na + nb - nu == ni)
      assert(r.getAs[Long]("hll_inter_within_bound") == 1L)
    }
  }

  test("x_ewma_anomaly: at most 10 rows, |z| non-increasing, forecasts " +
      "positive, days ISO-formatted") {
    val rows = run("x_ewma_anomaly").collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val zs = rows.map(r => math.abs(r.getAs[Double]("z")))
    assert(zs.zip(zs.tail).forall { case (a, b) => a >= b - 1e-9 })
    rows.foreach { r =>
      assert(r.getAs[Double]("ewma") > 0.0)
      assert(r.getAs[Long]("y") >= 1L)
      assert(r.getAs[String]("day").matches("\\d{4}-\\d{2}-\\d{2}"))
    }
  }

  test("x_welch_anova: F and df2 match an unquantized plain-Scala " +
      "Welch recomputation; df1 = k - 1; Welch df2 below the pooled df") {
    val r = run("x_welch_anova").collect().head
    val k = r.getAs[Long]("n_groups")
    assert(k == 5L && r.getAs[Long]("df1") == 4L)
    val f = r.getAs[Double]("f_stat")
    val df2 = r.getAs[Double]("df2")
    assert(f >= 0.0 && df2 > 0.0)
    // brute force, straight doubles (no fixed-point): group stats from
    // the raw rows, Welch 1951 formulas verbatim
    val rows = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderpriority", "o_totalprice").collect()
      .map(x => (x.getString(0), x.getDouble(1)))
    val gs = rows.groupBy(_._1).values.map { ys =>
      val v = ys.map(_._2)
      val n = v.length.toDouble
      val m = v.sum / n
      val vr = v.map(y => (y - m) * (y - m)).sum / (n - 1)
      (n, m, vr)
    }.toSeq
    val w = gs.map { case (n, _, vr) => n / vr }
    val bigW = w.sum
    val mstar = gs.zip(w).map { case ((_, m, _), wi) => wi * m }.sum / bigW
    val kk = gs.length.toDouble
    val a = gs.zip(w).map { case ((_, m, _), wi) =>
      wi * (m - mstar) * (m - mstar) }.sum / (kk - 1)
    val lam = gs.zip(w).map { case ((n, _, _), wi) =>
      val u = 1.0 - wi / bigW; u * u / (n - 1) }.sum
    val fBrute = a / (1.0 + 2.0 * (kk - 2) / (kk * kk - 1) * lam)
    val df2Brute = (kk * kk - 1) / (3.0 * lam)
    assert(math.abs(f - fBrute) <= 1e-4 * math.max(1.0, fBrute),
      s"Welch F $f vs brute $fBrute")
    assert(math.abs(df2 - df2Brute) <= 1e-3 * df2Brute,
      s"Welch df2 $df2 vs brute $df2Brute")
    // Welch df2 can never exceed the pooled-ANOVA within df
    assert(df2 <= r.getAs[Long]("n_obs") - k + 1e-9)
  }

  test("x_holt_winters: 10 rows by |resid|, resid consistent with " +
      "y - forecast, and the seasonal column equals a plain-Scala " +
      "recomputation of the additive day-of-week index") {
    val rows = run("x_holt_winters").collect()
    assert(rows.length == 10)
    // brute-force seasonal indices: s(p, dow) = mean(y | p, dow) −
    // mean(y | p) over the daily series, dow anchored at 1995-01-01
    import org.apache.spark.sql.functions._
    val daily = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy(col("o_orderpriority").as("p"),
        date_trunc("day", col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("y"))
      .collect().map { x =>
        val day = x.getAs[java.sql.Timestamp]("day")
          .toLocalDateTime.toLocalDate
        val dow = java.lang.Math.floorMod(
          java.time.temporal.ChronoUnit.DAYS.between(
            java.time.LocalDate.of(1995, 1, 1), day), 7L)
        (x.getAs[String]("p"), dow, day, x.getAs[Long]("y"))
      }
    val byP = daily.groupBy(_._1)
    def sIdx(p: String, dow: Long): Double = {
      val all = byP(p)
      val dws = all.filter(_._2 == dow)
      dws.map(_._4).sum.toDouble / dws.length -
        all.map(_._4).sum.toDouble / all.length
    }
    rows.foreach { r =>
      val (y, f, resid) = (r.getAs[Long]("y"),
        r.getAs[Double]("forecast"), r.getAs[Double]("resid"))
      // forecast and resid are rounded independently to 1e-6
      assert(math.abs(resid - (y - f)) <= 2e-6,
        s"resid $resid vs y-f ${y - f}")
      val day = java.time.LocalDate.parse(r.getAs[String]("day"))
      val dow = java.lang.Math.floorMod(
        java.time.temporal.ChronoUnit.DAYS.between(
          java.time.LocalDate.of(1995, 1, 1), day), 7L)
      val expect = sIdx(r.getAs[String]("priority"), dow)
      assert(math.abs(r.getAs[Double]("seasonal") - expect) <= 1e-5,
        s"seasonal ${r.getAs[Double]("seasonal")} vs brute $expect")
    }
  }

  test("x_fisher_exact: cells reconstruct the margins and the two-sided " +
      "p equals a plain-Scala hypergeometric enumeration") {
    val r = run("x_fisher_exact").collect().head
    val (a, b, c, dd) = (r.getAs[Long]("n11"), r.getAs[Long]("n12"),
      r.getAs[Long]("n21"), r.getAs[Long]("n22"))
    val rows = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_totalprice", "o_orderpriority").collect()
      .map(x => (x.getDouble(0) > 480000.0,
        x.getString(1) == "1-URGENT" || x.getString(1) == "2-HIGH"))
    assert(a == rows.count(t => t._1 && t._2))
    assert(b == rows.count(t => !t._1 && t._2))
    assert(c == rows.count(t => t._1 && !t._2))
    assert(dd == rows.count(t => !t._1 && !t._2))
    // brute force in log space, straight doubles (no fixed point)
    val (n, c1, r1) = (rows.length.toLong, a + c, a + b)
    val r2 = n - r1
    def lnFacRange(from: Long, to: Long): Double =
      (from to to).map(i => math.log(i.toDouble)).sum
    def lnChoose(nn: Long, kk: Long): Double =
      if (kk == 0 || kk == nn) 0.0
      else lnFacRange(nn - kk + 1, nn) - lnFacRange(1, kk)
    val lps = (0L to math.min(r1, c1)).map(k =>
      lnChoose(r1, k) + lnChoose(r2, c1 - k) - lnChoose(n, c1))
    val lpObs = lps(a.toInt)
    // the engine compares 1e-9-quantized log-probs; mirror that rule
    val brute = lps.filter(lp => math.floor(lp * 1e9 + 0.5) <=
      math.floor(lpObs * 1e9 + 0.5)).map(math.exp).sum
    val p = r.getAs[Double]("p_two_sided")
    assert(p >= 0.0 && p <= 1.0 + 1e-12)
    assert(math.abs(p - brute) <= 1e-5, s"fisher p $p vs brute $brute")
    assert(r.getAs[Long]("n_tables") >= 1L &&
      r.getAs[Long]("n_tables") <= math.min(r1, c1) + 1)
  }

  test("x_friedman_test: Q equals a plain-Scala ranks-within-blocks " +
      "recomputation over complete months") {
    val r = run("x_friedman_test").collect().head
    val rows = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderdate", "o_orderpriority", "o_totalprice").collect()
      .map(x => (x.getAs[java.time.LocalDateTime](0).toLocalDate
        .withDayOfMonth(1),
        x.getString(1),
        BigDecimal(x.getDouble(2)).setScale(4,
          BigDecimal.RoundingMode.HALF_UP)))
    val k = rows.map(_._2).distinct.length
    val cells = rows.groupBy(t => (t._1, t._2))
      .map { case ((m, p), xs) => (m, p, xs.map(_._3).sum) }.toSeq
    val blocks = cells.groupBy(_._1).values.filter(_.length == k).toSeq
    assert(r.getAs[Long]("n_blocks") == blocks.length.toLong)
    assert(r.getAs[Long]("k_treatments") == k.toLong)
    // average ranks within each block (ties averaged), Friedman Q
    val rankSums = scala.collection.mutable.Map.empty[String, Double]
    blocks.foreach { blk =>
      val sorted = blk.sortBy(_._3)
      sorted.zipWithIndex.foreach { case ((_, p, v), i) =>
        val ties = sorted.filter(_._3 == v)
        val first = sorted.indexWhere(_._3 == v)
        val avg = (first + 1 + first + ties.length).toDouble / 2.0
        rankSums(p) = rankSums.getOrElse(p, 0.0) + avg
      }
    }
    val nB = blocks.length.toDouble
    val q = 12.0 / (nB * k * (k + 1)) *
      rankSums.values.map(x => x * x).sum - 3.0 * nB * (k + 1)
    assert(math.abs(r.getAs[Double]("q_stat") - q) <= 1e-3,
      s"friedman Q ${r.getAs[Double]("q_stat")} vs brute $q")
  }

  test("x_jonckheere_terpstra: doubled JT equals a brute-force " +
      "pairwise Mann-Whitney sum over ordered discount levels") {
    val r = run("x_jonckheere_terpstra").collect().head
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_discount", "l_quantity").collect()
      .map(x => (x.getDouble(0), x.getDouble(1).toLong))
    assert(r.getAs[Long]("n_obs") == rows.length.toLong)
    val groups = rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, xs) =>
        xs.map(_._2).groupBy(identity).map { case (v, o) =>
          v -> o.length.toLong }
      }
    assert(r.getAs[Long]("k_levels") == groups.length.toLong)
    // 2*JT = sum over ordered group pairs i < j of (2*wins + ties)
    var jt2 = BigInt(0)
    for (i <- groups.indices; j <- i + 1 until groups.length)
      for ((vi, ci) <- groups(i); (vj, cj) <- groups(j)) {
        if (vj > vi) jt2 += 2L * ci * cj
        else if (vj == vi) jt2 += ci * cj
      }
    val got2 = BigDecimal(r.getAs[Double]("jt_stat")) * 2
    assert(got2 == BigDecimal(jt2), s"2JT: engine $got2 vs brute $jt2")
    // mean sanity: 2*mean = (n^2 - sum ni^2) / 2
    val ns = groups.map(_.values.sum)
    val n = ns.sum
    val mean2 = (BigInt(n) * n - ns.map(x => BigInt(x) * x).sum) / 2
    assert(BigDecimal(r.getAs[Double]("jt_mean")) * 2 == BigDecimal(mean2))
    // brute-force the tie-corrected variance and z (Hollander-Wolfe)
    val tvs = rows.groupBy(_._2).values.map(_.length.toLong).toSeq
    val dn = n.toDouble
    def a(x: Long) = x.toDouble * (x - 1) * (2 * x + 5)
    def b(x: Long) = x.toDouble * (x - 1) * (x - 2)
    def cc(x: Long) = x.toDouble * (x - 1)
    val va = (dn * (dn - 1) * (2 * dn + 5)
      - ns.map(a).sum - tvs.map(a).sum) / 72.0
    val vb = ns.map(b).sum * tvs.map(b).sum /
      (36.0 * dn * (dn - 1) * (dn - 2))
    val vc = ns.map(cc).sum * tvs.map(cc).sum / (8.0 * dn * (dn - 1))
    val zBrute = (jt2.toDouble - mean2.toDouble) /
      (2.0 * math.sqrt(va + vb + vc))
    val z = r.getAs[Double]("z_stat")
    assert(math.abs(z - zBrute) < 1e-5, s"z $z vs brute $zBrute")
    assert(r.getAs[Boolean]("significant_05") == (math.abs(zBrute) > 1.96)
      || math.abs(math.abs(zBrute) - 1.96) < 1e-6)
    // trend is significance-gated (the x_mann_kendall convention)
    val expTrend = if (zBrute > 1.96) "increasing"
      else if (zBrute < -1.96) "decreasing" else "none"
    if (math.abs(math.abs(zBrute) - 1.96) > 1e-6)
      assert(r.getAs[String]("trend") == expTrend)
  }

  test("x_ar2_forecast: Yule-Walker coefficients and forecasts equal a " +
      "plain-Scala recomputation per priority") {
    val got = run("x_ar2_forecast").collect()
      .map(r => r.getAs[String]("priority") -> r).toMap
    val rows = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderdate", "o_orderpriority").collect()
      .map(x => (x.getString(1), x.getAs[java.time.LocalDateTime](0)
        .toLocalDate.withDayOfMonth(1)))
    rows.groupBy(_._1).foreach { case (p, xs) =>
      val ys = xs.groupBy(_._2).view.mapValues(_.length.toDouble)
        .toSeq.sortBy(_._1.toEpochDay).map(_._2)
      val n = ys.length
      val mu = ys.sum / n
      val den = ys.map(y => (y - mu) * (y - mu)).sum
      def acf(kk: Int): Double = (kk until n)
        .map(t => (ys(t) - mu) * (ys(t - kk) - mu)).sum / den
      val (a1, a2) = (acf(1), acf(2))
      val disc = 1.0 - a1 * a1
      val phi1 = a1 * (1.0 - a2) / disc
      val phi2 = (a2 - a1 * a1) / disc
      val f1 = mu + phi1 * (ys(n - 1) - mu) + phi2 * (ys(n - 2) - mu)
      val f2 = mu + phi1 * (f1 - mu) + phi2 * (ys(n - 1) - mu)
      val r = got(p)
      assert(math.abs(r.getAs[Double]("acf_1") - a1) <= 1e-5, s"$p acf1")
      assert(math.abs(r.getAs[Double]("acf_2") - a2) <= 1e-5, s"$p acf2")
      assert(math.abs(r.getAs[Double]("phi_1") - phi1) <= 1e-5, s"$p phi1")
      assert(math.abs(r.getAs[Double]("phi_2") - phi2) <= 1e-5, s"$p phi2")
      assert(math.abs(r.getAs[Double]("forecast_1") - f1) <= 1e-3,
        s"$p f1 ${r.getAs[Double]("forecast_1")} vs $f1")
      assert(math.abs(r.getAs[Double]("forecast_2") - f2) <= 1e-3,
        s"$p f2")
    }
  }
}
