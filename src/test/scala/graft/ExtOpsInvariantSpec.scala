package graft

import org.apache.spark.sql.Row

/** Structural invariants of the r8 extension ops — properties the DuckDB
  * hash-compare cannot express (it proves value equality, not that the
  * values obey the operator's contract). All at sf0.001.
  */
class ExtOpsInvariantSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("x_corpus_mix: weights capped at 1, budgets never upsample, " +
      "shares sum to 1") {
    val rows = run("x_corpus_mix").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTokens, weight, expected) =
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("weight"),
          r.getAs[Long]("expected_tokens"))
      assert(weight > 0.0 && weight <= 1.0)
      assert(expected <= nTokens, "a capped weight must never upsample")
    }
    val shareSum = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"shares sum to $shareSum")
  }

  test("x_source_quality_filter: the mean-of-averages split always " +
      "blocks at least one source and never all of them") {
    val blocked = run("x_source_quality_filter").collect()
      .map(_.getAs[Boolean]("blocked"))
    assert(blocked.count(identity) >= 1)
    assert(blocked.count(!_) >= 1)
  }

  test("x_embedding_outliers: counts bounded, sentinel id consistent " +
      "with the outlier count") {
    run("x_embedding_outliers").collect().foreach { r =>
      val (n, out, id) = (r.getAs[Long]("n_vecs"),
        r.getAs[Long]("n_outliers"), r.getAs[Long]("max_outlier_id"))
      assert(out >= 0 && out <= n)
      assert((out == 0) == (id == -1L),
        s"sentinel/count mismatch: n_outliers=$out max_outlier_id=$id")
    }
  }

  test("x_ngram_novelty: averages in [0, 1] and some phrasing is shared " +
      "(novelty strictly below 1 somewhere)") {
    val avgs = run("x_ngram_novelty").collect()
      .map(_.getAs[Double]("avg_novelty"))
    assert(avgs.nonEmpty)
    avgs.foreach(a => assert(a >= 0.0 && a <= 1.0))
    assert(avgs.exists(_ < 1.0))
  }

  test("x_ann_ivfpq_residual_recall: deeper rerank never loses recall " +
      "(exact top-10 from a shortlist superset is monotone)") {
    val rows = run("x_ann_ivfpq_residual_recall").collect()
      .map(r => r.getAs[String]("config") -> r.getAs[Double]("recall"))
      .toMap
    assert(rows("ivfpq_res_np1_m8k64_rerank128") >=
      rows("ivfpq_res_np1_m8k64_rerank32"))
    rows.values.foreach(v => assert(v >= 0.0 && v <= 1.0))
  }
}
