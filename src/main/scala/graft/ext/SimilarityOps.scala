package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables.t

/** Similarity search over embedding columns (SURVEY.md §2.10 x_sim_topk).
  *
  * Dot products / norms are per-row left folds over the float array computed
  * with SQL higher-order functions (zip_with + aggregate in double), so the
  * summation order is fixed — bit-identical across engines and across
  * partitionings. Scores are rounded to 6 dp and ranked with a total
  * tie-break (neighbor id) for deterministic top-k.
  *
  * Scale posture: brute-force top-k is the correctness baseline (O(Q·N)
  * broadcast nested-loop); `x_ann_lsh` is the scale path — sign-bit LSH
  * bucketing turns the cross join into an equi-join on bucket, which Spark
  * shuffles/hashes normally. At 100 TB you'd raise the hyperplane count and
  * union several bucket tables (multi-probe) — same plan shape.
  */
object SimilarityOps {

  /** Dot product via the native codegen'd GraftDot expression — identical
    * left-fold semantics to `aggregate(zip_with(...))` (ascending index,
    * double accumulator) but inside whole-stage codegen; sessions register
    * it in each query fn (idempotent). */
  private def dotExpr(a: String, b: String): Column =
    expr(s"graft_dot($a, $b)")

  private def dotSql(a: String, b: String): String =
    s"""list_sum(list_transform(range(1, 65),
        i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"""

  /** per-vector L2 norms (vec_id, nrm). */
  private def norms(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      sqrt(dotExpr("embedding", "embedding")).as("nrm"))

  private val normsSql =
    s"""nrm AS (SELECT vec_id, sqrt(${dotSql("embedding", "embedding")}) AS nrm
        FROM embeddings)"""

  /** Score pre-joined (query_id, qe, neighbor_id, ce) pairs: dot, norm
    * joins, deterministic 6-dp cosine. Single definition so the rounding
    * that keeps results oracle-comparable cannot diverge between callers. */
  private def scorePairs(pairs: DataFrame, emb: DataFrame): DataFrame = {
    val n = norms(emb)
    pairs
      .withColumn("dot", dotExpr("qe", "ce"))
      .join(n.select(col("vec_id").as("query_id"), col("nrm").as("nq")), "query_id")
      .join(n.select(col("vec_id").as("neighbor_id"), col("nrm").as("nc")), "neighbor_id")
      .withColumn("cos_sim",
        graft.types.Coercions.detRound(col("dot") / (col("nq") * col("nc")), 6))
  }

  /** all-pairs cosine for (query ⊆, candidate ⊆) with rounded score. */
  private def cosinePairs(emb: DataFrame, q: DataFrame, c: DataFrame): DataFrame =
    scorePairs(q.join(c, col("query_id") =!= col("neighbor_id")), emb)

  /** brute-force top-k per query over all candidates (ground truth). */
  private def bruteTopK(s: SparkSession, d: String, maxQuery: Int,
                        k: Int): DataFrame = {
    val emb = t(s, d, "embeddings")
    val q = emb.filter(col("vec_id") < maxQuery)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val c = emb.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("ce"))
    graft.util.ScaleJoins.topKPerKey(cosinePairs(emb, q, c),
      Seq("query_id"), "cos_sim", "neighbor_id", k)
  }

  /** sign-bit LSH top-k per query, bucket-restricted candidates. */
  private def lshTopK(s: SparkSession, d: String, maxQuery: Int,
                      k: Int): DataFrame = {
    val emb = t(s, d, "embeddings")
    val bucketExpr = expr((0 until 8).map(i =>
      s"CASE WHEN embedding[$i] >= 0 THEN '1' ELSE '0' END")
      .mkString("concat(", ", ", ")"))
    val b = emb.withColumn("bucket", bucketExpr)
    val q = b.filter(col("vec_id") < maxQuery)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
              col("bucket"))
    val c = b.select(col("vec_id").as("neighbor_id"),
                     col("embedding").as("ce"), col("bucket"))
    graft.util.ScaleJoins.topKPerKey(
      scorePairs(q.join(c, Seq("bucket"))
        .filter(col("query_id") =!= col("neighbor_id")), emb),
      Seq("query_id"), "cos_sim", "neighbor_id", k)
  }

  /** Multi-probe sign-bit LSH candidates: each query probes its own
    * bucket PLUS all 8 one-bit-flip neighbor buckets — recall rises
    * toward brute force with NO new index tables (vs x_ann_multitable's
    * extra bucketings). The probe fan-out is an explode on the QUERY
    * side only (9 rows per query); the index side is untouched, so the
    * bucket equi-join — the property that scales — keeps its shape and
    * candidate cost grows by the probe count, not the corpus. The 9
    * probe buckets are pairwise-distinct strings and each index vector
    * lives in exactly one bucket, so no duplicate candidates arise. */
  private def multiprobePairs(s: SparkSession, d: String,
                              maxQuery: Int): DataFrame = {
    val emb = t(s, d, "embeddings")
    val bucketExpr = expr((0 until 8).map(i =>
      s"CASE WHEN embedding[$i] >= 0 THEN '1' ELSE '0' END")
      .mkString("concat(", ", ", ")"))
    val b = emb.withColumn("bucket", bucketExpr)
    val flips = (1 to 8).map(i =>
      s"""concat(substring(bucket, 1, ${i - 1}),
          CASE WHEN substring(bucket, $i, 1) = '1' THEN '0' ELSE '1' END,
          substring(bucket, ${i + 1}))""")
    val q = b.filter(col("vec_id") < maxQuery)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        explode(expr(s"array(bucket, ${flips.mkString(", ")})")).as("bucket"))
    val c = b.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("ce"), col("bucket"))
    q.join(c, Seq("bucket")).filter(col("query_id") =!= col("neighbor_id"))
  }

  /** Argmin cell assignment against a (cell, ce) centroid table — one
    * tiny broadcast + min_by partial aggregate (no window sort). */
  private def assignCells(emb: DataFrame, cents: DataFrame): DataFrame =
    emb.crossJoin(broadcast(cents))
      .withColumn("cdist", expr("graft_l2(embedding, ce)"))
      .groupBy(col("vec_id"))
      .agg(min_by(struct(col("cell"), col("embedding")),
        struct(col("cdist"), col("cell"))).as("w"))
      .select(col("vec_id"), col("w.cell").as("cell"),
        col("w.embedding").as("embedding"))

  /** One Lloyd iteration: assign, then per-dimension fixed-point means
    * (integer partial sums — exact, order-independent, both engines
    * agree bit-wise). Returns (cell, ce, n_members). */
  private def lloydOnce(emb: DataFrame, cents: DataFrame): DataFrame =
    assignCells(emb, cents.select("cell", "ce"))
      .select(col("cell"), posexplode(col("embedding")))
      .groupBy(col("cell"), col("pos"))
      .agg((sum(floor(col("col").cast("double") * 1e6).cast("long"))
              .cast("double") / (lit(1e6) * count(lit(1)))).as("cval"),
           count(lit(1)).as("n"))
      .groupBy(col("cell"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, cval))), x -> x.cval)")
             .as("ce"),
           max(col("n")).as("n_members"))

  /** Deterministic double-typed seed centroids: the first k vectors. */
  private def seedCents(emb: DataFrame, k: Int): DataFrame =
    emb.filter(col("vec_id") < k)
      .select(col("vec_id").as("cell"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("ce"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "x_sim_topk" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val emb = t(s, d, "embeddings")
      val q = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(desc("cos_sim"), asc("neighbor_id"))
      cosinePairs(emb, q, c)
        .withColumn("rank", row_number().over(w).cast("long")) // duckdb BIGINT
        .filter(col("rank") <= 5)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
        .orderBy("query_id", "rank")
    }),

    "x_sim_topk_agg" -> ((s, d) => {
      // the scale path for top-k itself: graft_topk (bounded-heap
      // TypedImperativeAggregate) replaces the rank window. Partial
      // aggregation ships at most k entries per query per map task —
      // shuffle O(P·k), not O(candidates); no per-group sort. Same answer
      // as x_sim_topk (same ordering, same tie-break), same oracle SQL.
      graft.functions.GraftFunctions.register(s)
      bruteTopK(s, d, 20, 5)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
        .orderBy("query_id", "rank")
    }),

    "x_sim_threshold" -> ((s, d) => {
      // embedding-cosine near-dup: all pairs above a similarity floor
      graft.functions.GraftFunctions.register(s)
      val emb = t(s, d, "embeddings")
      val q = emb.filter(col("vec_id") < 100)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      val c = emb.filter(col("vec_id") < 100)
        .select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"))
      cosinePairs(emb, q, c)
        .filter(col("query_id") < col("neighbor_id") && col("cos_sim") >= 0.2)
        .select(col("query_id").as("a"), col("neighbor_id").as("b"), col("cos_sim"))
        .orderBy("a", "b")
    }),

    "x_embedding_centroids" -> ((s, d) => {
      // per-label centroid, dimension-exploded. Float sums are NOT
      // order-deterministic, so each value is scaled to a 1e6-fixed-point
      // BIGINT first — integer addition is associative, the partial
      // aggregation can run in any order, and both engines agree exactly.
      t(s, d, "embeddings")
        .select(col("label"), posexplode(col("embedding")))
        .groupBy(col("label"), col("pos").cast("long").as("dim"))
        .agg(graft.types.Coercions.detRound(
          sum(floor(col("col").cast("double") * 1e6).cast("long"))
            .cast("double") / (lit(1e6) * count(lit(1))), 6).as("centroid"))
        .orderBy("label", "dim")
    }),

    "x_knn_classify" -> ((s, d) => {
      // composed kNN classifier: graft_topk 5 nearest labeled neighbors
      // per query, majority vote via max_by over (votes, -label) — every
      // stage partial-aggregates; no window, no per-group sort.
      graft.functions.GraftFunctions.register(s)
      val emb = t(s, d, "embeddings")
      val q = emb.filter(col("vec_id") < 30)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      val c = emb.filter(col("vec_id") >= 30)
        .select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"),
          col("label"))
      val scored = scorePairs(
        q.join(c, col("query_id") =!= col("neighbor_id")), emb)
      val top = graft.util.ScaleJoins.topKPerKey(
        scored.select("query_id", "neighbor_id", "cos_sim"),
        Seq("query_id"), "cos_sim", "neighbor_id", 5)
      top
        .join(emb.select(col("vec_id").as("neighbor_id"), col("label")),
          "neighbor_id")
        .groupBy(col("query_id"), col("label"))
        .agg(count(lit(1)).as("votes"))
        .groupBy(col("query_id"))
        .agg(max_by(struct(col("label"), col("votes")),
          struct(col("votes"), -col("label"))).as("w"))
        .select(col("query_id"), col("w.label").as("predicted"),
          col("w.votes").as("votes"))
        .orderBy("query_id")
    }),

    "x_ann_ivf" -> ((s, d) => {
      // IVF-style ANN: deterministic "centroids" (the first 8 vectors),
      // every vector assigned to its nearest centroid cell, search within
      // the cell only. At 100 TB: k-means-trained centroids, same plan —
      // one small broadcast (centroids), one equi-join on cell id.
      graft.functions.GraftFunctions.register(s)
      val emb = t(s, d, "embeddings")
      val cent = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("ce"))
      val l2 = expr("graft_l2(embedding, ce)")
      // argmin assignment via min_by (partial-aggregating; replaces the
      // round-1 rn=1 window that sorted every group): struct(cdist, cid)
      // keys the minimum deterministically
      val assigned = emb.crossJoin(broadcast(cent))
        .withColumn("cdist", l2)
        .groupBy(col("vec_id"))
        .agg(min_by(col("cid"), struct(col("cdist"), col("cid"))).as("cell"),
             min_by(col("embedding"), struct(col("cdist"), col("cid")))
               .as("embedding"))
      val q = assigned.filter(col("vec_id") < 30)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
          col("cell"))
      val c = assigned.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("ce2"), col("cell"))
      val pairDist = expr("floor(graft_l2(qe, ce2) * 1e6 + 0.5) / 1e6")
      // top-k by ASCENDING distance through the descending-score heap:
      // negate in, negate back out (exact in IEEE)
      graft.util.ScaleJoins.topKPerKey(
          q.join(c, Seq("cell"))
            .filter(col("query_id") =!= col("neighbor_id"))
            .withColumn("negdist", -pairDist),
          Seq("query_id"), "negdist", "neighbor_id", 3)
        .select(col("query_id"), col("neighbor_id"),
          (-col("negdist")).as("dist"), col("rank"))
        .orderBy("query_id", "rank")
    }),

    "x_ann_ivf_trained" -> ((s, d) => {
      // the composed ANN pipeline: TRAIN (one Lloyd refinement of the
      // seed centroids — x_kmeans_train's step) → INDEX (argmin cell
      // assignment) → SEARCH (within-cell exact rerank). Same plan
      // shapes as x_ann_ivf, but the cells are learned; at 100 TB the
      // train loop runs on a sample while index/search are unchanged.
      graft.functions.GraftFunctions.register(s)
      val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
      val trained = lloydOnce(emb, seedCents(emb, 8))
      val assigned = assignCells(emb, trained.select("cell", "ce"))
      val q = assigned.filter(col("vec_id") < 30)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
          col("cell"))
      val c = assigned.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("ce2"), col("cell"))
      val pairDist = expr("floor(graft_l2(qe, ce2) * 1e6 + 0.5) / 1e6")
      graft.util.ScaleJoins.topKPerKey(
          q.join(c, Seq("cell"))
            .filter(col("query_id") =!= col("neighbor_id"))
            .withColumn("negdist", -pairDist),
          Seq("query_id"), "negdist", "neighbor_id", 3)
        .select(col("query_id"), col("neighbor_id"),
          (-col("negdist")).as("dist"), col("rank"))
        .orderBy("query_id", "rank")
    }),

    "x_ann_ivf_multiprobe" -> ((s, d) => {
      // the IVF probe dial (nprobe=2): each query searches its TWO
      // nearest centroid cells — the standard IVF recall lever, same
      // index, no re-indexing. Probe selection runs on the broadcast
      // centroid table through the graft_topk heap (no window sort); a
      // vector indexes into exactly ONE cell, so multi-cell candidates
      // are disjoint and need no dedup. x_ann_ivf_probe_quality measures
      // the recall this buys on the same fixture.
      graft.functions.GraftFunctions.register(s)
      val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
      val cents = seedCents(emb, 8)
      val assigned = assignCells(emb, cents)
      val probes = graft.util.ScaleJoins.topKPerKey(
          emb.filter(col("vec_id") < 30).crossJoin(broadcast(cents))
            .withColumn("negcdist", -expr("graft_l2(embedding, ce)"))
            .select(col("vec_id"), col("negcdist"), col("cell")),
          Seq("vec_id"), "negcdist", "cell", 2)
        .select(col("vec_id").as("query_id"), col("cell"))
      val q = probes.join(emb.select(col("vec_id").as("query_id"),
        col("embedding").as("qe")), "query_id")
      val c = assigned.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("ce2"), col("cell"))
      val pairDist = expr("floor(graft_l2(qe, ce2) * 1e6 + 0.5) / 1e6")
      graft.util.ScaleJoins.topKPerKey(
          q.join(c, Seq("cell"))
            .filter(col("query_id") =!= col("neighbor_id"))
            .withColumn("negdist", -pairDist),
          Seq("query_id"), "negdist", "neighbor_id", 3)
        .select(col("query_id"), col("neighbor_id"),
          (-col("negdist")).as("dist"), col("rank"))
        .orderBy("query_id", "rank")
    }),

    "x_ann_ivf_probe_quality" -> ((s, d) => {
      // IVF probe-dial gauge: recall@3 (vs brute-force L2 truth) at
      // nprobe=1 vs nprobe=2 on the same seed-centroid index — the
      // probes-vs-tables decision measured in-engine, the IVF twin of
      // x_ann_multiprobe_quality.
      graft.functions.GraftFunctions.register(s)
      val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
      val pairDist = expr("floor(graft_l2(qe, ce2) * 1e6 + 0.5) / 1e6")
      def top3(pairs: DataFrame): DataFrame =
        graft.util.ScaleJoins.topKPerKey(
            pairs.filter(col("query_id") =!= col("neighbor_id"))
              .withColumn("negdist", -pairDist),
            Seq("query_id"), "negdist", "neighbor_id", 3)
          .select("query_id", "neighbor_id")
      val cents = seedCents(emb, 8)
      val assigned = assignCells(emb, cents)
      val c = assigned.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("ce2"), col("cell"))
      val q1 = assigned.filter(col("vec_id") < 30)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
          col("cell"))
      val s1 = top3(q1.join(c, Seq("cell")))
      val probes = graft.util.ScaleJoins.topKPerKey(
          emb.filter(col("vec_id") < 30).crossJoin(broadcast(cents))
            .withColumn("negcdist", -expr("graft_l2(embedding, ce)"))
            .select(col("vec_id"), col("negcdist"), col("cell")),
          Seq("vec_id"), "negcdist", "cell", 2)
        .select(col("vec_id").as("query_id"), col("cell"))
      val q2 = probes.join(emb.select(col("vec_id").as("query_id"),
        col("embedding").as("qe")), "query_id")
      val s2 = top3(q2.join(c, Seq("cell")))
      val qAll = emb.filter(col("vec_id") < 30)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      val cAll = emb.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("ce2"))
      val truth = top3(qAll.join(cAll, lit(true))).localCheckpoint()
      val nT = truth.agg(count(lit(1)).as("n_true"))
      val h1 = s1.join(truth, Seq("query_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("hits_1probe"))
      val h2 = s2.join(truth, Seq("query_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("hits_2probe"))
      nT.crossJoin(h1).crossJoin(h2)
        .select(col("n_true"), col("hits_1probe"), col("hits_2probe"),
          graft.types.Coercions.detRound(
            col("hits_1probe") / col("n_true"), 4).as("recall_1probe"),
          graft.types.Coercions.detRound(
            col("hits_2probe") / col("n_true"), 4).as("recall_2probe"))
    }),

    "x_kmeans_train" -> ((s, d) => {
      // distributed Lloyd's iterations — the trainer behind x_ann_ivf's
      // "k-means-trained centroids at 100 TB" note. Per iteration: one
      // broadcast of the k×64 centroid table (tiny at any data scale),
      // argmin assignment via min_by (partial-aggregating, no window
      // sort), then per-dimension fixed-point means (integer partial
      // sums shuffle O(k × 64), order-independent and exact — the same
      // trick as x_embedding_centroids, so both engines agree bit-wise
      // and the unrolled DuckDB oracle can hash-match the result).
      // Assignment distances stay raw doubles: both engines compute the
      // identical ascending-index left fold (x_ann_ivf precedent).
      graft.functions.GraftFunctions.register(s)
      val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
      var cents = seedCents(emb, 4).withColumn("n_members", lit(0L))
      for (_ <- 1 to 2) cents = lloydOnce(emb, cents)
      cents.select(col("cell"), col("n_members"), posexplode(col("ce")))
        .select(col("cell"), col("pos").cast("long").as("dim"),
          graft.types.Coercions.detRound(col("col"), 6).as("centroid"),
          col("n_members"))
        .orderBy("cell", "dim")
    }),

    "x_ann_multitable" -> ((s, d) => {
      // multi-table LSH: TWO independent sign-bit bucketings (dims 0-7
      // and dims 8-15); candidates = union of both tables' bucket
      // matches, deduplicated, then graft_topk. Each extra table adds
      // one equi-join of the same shape — recall grows, the plan only
      // unions. This is the recall-scaling path x_ann_lsh documents.
      graft.functions.GraftFunctions.register(s)
      val emb = t(s, d, "embeddings")
      def bucketed(lo: Int): DataFrame =
        emb.withColumn("bucket", expr((lo until lo + 8).map(i =>
          s"CASE WHEN embedding[$i] >= 0 THEN '1' ELSE '0' END")
          .mkString("concat(", ", ", ")")))
      def pairsFor(lo: Int): DataFrame = {
        val b = bucketed(lo)
        val q = b.filter(col("vec_id") < 50)
          .select(col("vec_id").as("query_id"), col("bucket"))
        val c = b.select(col("vec_id").as("neighbor_id"), col("bucket"))
        q.join(c, Seq("bucket"))
          .filter(col("query_id") =!= col("neighbor_id"))
          .select("query_id", "neighbor_id")
      }
      val cands = pairsFor(0).unionByName(pairsFor(8)).distinct()
      val scored = scorePairs(
        cands
          .join(emb.select(col("vec_id").as("query_id"),
            col("embedding").as("qe")), "query_id")
          .join(emb.select(col("vec_id").as("neighbor_id"),
            col("embedding").as("ce")), "neighbor_id"), emb)
      graft.util.ScaleJoins.topKPerKey(
          scored.select("query_id", "neighbor_id", "cos_sim"),
          Seq("query_id"), "cos_sim", "neighbor_id", 3)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
        .orderBy("query_id", "rank")
    }),

    "x_ann_lsh" -> ((s, d) => {
      // sign-bit LSH: bucket on the sign pattern of the first 8 dims, then
      // search only within the bucket (the scale path for x_sim_topk)
      // graft_topk heap aggregate instead of the rank window: only k
      // survivors per query leave each map task
      graft.functions.GraftFunctions.register(s)
      lshTopK(s, d, 50, 3)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
        .orderBy("query_id", "rank")
    }),

    "x_ann_trained_quality" -> ((s, d) => {
      // training-impact gauge: recall@3 (vs brute-force L2 truth) of the
      // IVF search under SEED centroids versus k-means-REFINED centroids
      // — the measurement that tells you whether another Lloyd pass is
      // worth the cluster time before re-indexing 100 TB of vectors.
      // Honest finding on THESE fixtures: 44% recall both ways — uniform
      // random embeddings have no cluster structure for Lloyd's to
      // learn, so training is neutral here (real corpora cluster, and
      // the gauge is how you see the lift). Same data-dependence lesson
      // as x_ann_quality.
      graft.functions.GraftFunctions.register(s)
      val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
      val pairDist = expr("floor(graft_l2(qe, ce2) * 1e6 + 0.5) / 1e6")
      def top3(pairs: DataFrame): DataFrame =
        graft.util.ScaleJoins.topKPerKey(
            pairs.filter(col("query_id") =!= col("neighbor_id"))
              .withColumn("negdist", -pairDist),
            Seq("query_id"), "negdist", "neighbor_id", 3)
          .select("query_id", "neighbor_id")
      def searched(cents: DataFrame): DataFrame = {
        val assigned = assignCells(emb, cents)
        val q = assigned.filter(col("vec_id") < 30)
          .select(col("vec_id").as("query_id"),
            col("embedding").as("qe"), col("cell"))
        val c = assigned.select(col("vec_id").as("neighbor_id"),
          col("embedding").as("ce2"), col("cell"))
        top3(q.join(c, Seq("cell")))
      }
      val q = emb.filter(col("vec_id") < 30)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      val c = emb.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("ce2"))
      val truth = top3(q.join(c, lit(true))).localCheckpoint()
      val seeds = seedCents(emb, 8)
      val hitsU = searched(seeds)
        .join(truth, Seq("query_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("hits_untrained"))
      val hitsT = searched(lloydOnce(emb, seeds).select("cell", "ce"))
        .join(truth, Seq("query_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("hits_trained"))
      val nT = truth.agg(count(lit(1)).as("n_true"))
      nT.crossJoin(hitsU).crossJoin(hitsT)
        .select(col("n_true"), col("hits_untrained"), col("hits_trained"),
          graft.types.Coercions.detRound(
            col("hits_untrained") / col("n_true"), 4).as("recall_untrained"),
          graft.types.Coercions.detRound(
            col("hits_trained") / col("n_true"), 4).as("recall_trained"))
    }),

    "x_ann_multiprobe" -> ((s, d) => {
      // multi-probe LSH top-k (see multiprobePairs): the probe dial —
      // the cheapest recall lever on an existing LSH index
      graft.functions.GraftFunctions.register(s)
      val emb = t(s, d, "embeddings")
      graft.util.ScaleJoins.topKPerKey(
          scorePairs(multiprobePairs(s, d, 50), emb),
          Seq("query_id"), "cos_sim", "neighbor_id", 3)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
        .orderBy("query_id", "rank")
    }),

    "x_ann_multiprobe_quality" -> ((s, d) => {
      // probe-dial gauge: recall@3 of single-bucket LSH vs 9-probe
      // multi-probe against brute-force truth on the SAME fixture — the
      // measurement that justifies probing before adding index tables.
      graft.functions.GraftFunctions.register(s)
      val emb = t(s, d, "embeddings")
      val truth = bruteTopK(s, d, 50, 3)
        .select("query_id", "neighbor_id").localCheckpoint()
      val single = lshTopK(s, d, 50, 3).select("query_id", "neighbor_id")
      val multi = graft.util.ScaleJoins.topKPerKey(
          scorePairs(multiprobePairs(s, d, 50), emb),
          Seq("query_id"), "cos_sim", "neighbor_id", 3)
        .select("query_id", "neighbor_id")
      val nT = truth.agg(count(lit(1)).as("n_true"))
      val hS = single.join(truth, Seq("query_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("hits_single"))
      val hM = multi.join(truth, Seq("query_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("hits_multiprobe"))
      nT.crossJoin(hS).crossJoin(hM)
        .select(col("n_true"), col("hits_single"), col("hits_multiprobe"),
          graft.types.Coercions.detRound(
            col("hits_single") / col("n_true"), 4).as("recall_single"),
          graft.types.Coercions.detRound(
            col("hits_multiprobe") / col("n_true"), 4).as("recall_multiprobe"))
    }),

    "x_ann_quality" -> ((s, d) => {
      // ANN quality gauge: recall@3 of the sign-bit LSH against the
      // brute-force ground truth — the x_dedup_quality twin for the
      // similarity subsystem; rerun after changing hyperplanes/probes.
      // Honest finding it surfaces on THESE fixtures: recall ≈ 1% —
      // the embeddings are uniform random, so true nearest neighbors
      // have near-zero cosine margin and almost never share an 8-bit
      // sign bucket. That is the data-dependence every ANN deployment
      // must measure (real embedding corpora cluster, and recall rises
      // with probes/tables) — exactly why the gauge is in the engine.
      graft.functions.GraftFunctions.register(s)
      val truth = bruteTopK(s, d, 50, 3)
        .select("query_id", "neighbor_id").localCheckpoint()
      val approx = lshTopK(s, d, 50, 3).select("query_id", "neighbor_id")
      val nT = truth.agg(count(lit(1)).as("n_true"))
      val nH = approx.join(truth, Seq("query_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
      nT.crossJoin(nH)
        .select(col("n_true"), col("n_hits"),
          graft.types.Coercions.detRound(
            col("n_hits") / col("n_true"), 4).as("recall_at_3"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "x_sim_topk" ->
      s"""WITH $normsSql,
          d AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       ${dotSql("q.embedding", "c.embedding")} AS dot
                FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
                WHERE q.vec_id < 20),
          sc AS (SELECT query_id, neighbor_id,
                        floor((dot / (nq.nrm * nc.nrm)) * 1e6 + 0.5) / 1e6 AS cos_sim
                 FROM d JOIN nrm nq ON nq.vec_id = query_id
                        JOIN nrm nc ON nc.vec_id = neighbor_id),
          r AS (SELECT query_id, neighbor_id, cos_sim,
                       row_number() OVER (PARTITION BY query_id
                         ORDER BY cos_sim DESC, neighbor_id) AS rank
                FROM sc)
          SELECT query_id, neighbor_id, cos_sim, rank FROM r
          WHERE rank <= 5 ORDER BY query_id, rank""",

    // identical answer to x_sim_topk by construction — same oracle text
    "x_sim_topk_agg" ->
      s"""WITH $normsSql,
          d AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       ${dotSql("q.embedding", "c.embedding")} AS dot
                FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
                WHERE q.vec_id < 20),
          sc AS (SELECT query_id, neighbor_id,
                        floor((dot / (nq.nrm * nc.nrm)) * 1e6 + 0.5) / 1e6 AS cos_sim
                 FROM d JOIN nrm nq ON nq.vec_id = query_id
                        JOIN nrm nc ON nc.vec_id = neighbor_id),
          r AS (SELECT query_id, neighbor_id, cos_sim,
                       row_number() OVER (PARTITION BY query_id
                         ORDER BY cos_sim DESC, neighbor_id) AS rank
                FROM sc)
          SELECT query_id, neighbor_id, cos_sim, rank FROM r
          WHERE rank <= 5 ORDER BY query_id, rank""",

    "x_sim_threshold" ->
      s"""WITH $normsSql,
          d AS (SELECT q.vec_id AS a, c.vec_id AS b,
                       ${dotSql("q.embedding", "c.embedding")} AS dot
                FROM embeddings q JOIN embeddings c ON q.vec_id < c.vec_id
                WHERE q.vec_id < 100 AND c.vec_id < 100)
          SELECT a, b, floor((dot / (na.nrm * nb.nrm)) * 1e6 + 0.5) / 1e6 AS cos_sim
          FROM d JOIN nrm na ON na.vec_id = a
                 JOIN nrm nb ON nb.vec_id = b
          WHERE floor((dot / (na.nrm * nb.nrm)) * 1e6 + 0.5) / 1e6 >= 0.2
          ORDER BY a, b""",

    "x_embedding_centroids" ->
      """SELECT label, i AS dim,
         floor((CAST(SUM(CAST(floor(CAST(embedding[i+1] AS DOUBLE) * 1e6)
                              AS BIGINT)) AS DOUBLE)
                / (1e6 * COUNT(*))) * 1e6 + 0.5) / 1e6 AS centroid
         FROM embeddings, range(64) t(i)
         GROUP BY 1, 2 ORDER BY label, dim""",

    "x_knn_classify" ->
      s"""WITH $normsSql,
          d AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       c.label,
                       ${dotSql("q.embedding", "c.embedding")} AS dot
                FROM embeddings q JOIN embeddings c
                  ON c.vec_id >= 30 AND q.vec_id <> c.vec_id
                WHERE q.vec_id < 30),
          sc AS (SELECT query_id, neighbor_id, label,
                        floor((dot / (nq.nrm * nc.nrm)) * 1e6 + 0.5) / 1e6 AS cos_sim
                 FROM d JOIN nrm nq ON nq.vec_id = query_id
                        JOIN nrm nc ON nc.vec_id = neighbor_id),
          r AS (SELECT query_id, label,
                       row_number() OVER (PARTITION BY query_id
                         ORDER BY cos_sim DESC, neighbor_id) AS rank
                FROM sc),
          votes AS (SELECT query_id, label, COUNT(*) AS votes
                    FROM r WHERE rank <= 5 GROUP BY 1, 2),
          best AS (SELECT query_id, label AS predicted, votes,
                          row_number() OVER (PARTITION BY query_id
                            ORDER BY votes DESC, label ASC) AS rn
                   FROM votes)
          SELECT query_id, predicted, votes FROM best
          WHERE rn = 1 ORDER BY query_id""",

    "x_ann_ivf" -> {
      val l2 = (a: String, b: String) =>
        s"""list_sum(list_transform(range(1, 65),
            i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) *
                 (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))))"""
      s"""WITH cent AS (SELECT vec_id AS cid, embedding AS ce
                        FROM embeddings WHERE vec_id < 8),
          adist AS (SELECT e.vec_id, e.embedding, c.cid,
                           ${l2("e.embedding", "c.ce")} AS cdist
                    FROM embeddings e CROSS JOIN cent c),
          assigned AS (SELECT vec_id, embedding, cid AS cell
                       FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                               ORDER BY cdist, cid) AS rn FROM adist)
                       WHERE rn = 1),
          pairs AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                           floor((${l2("q.embedding", "c.embedding")}) * 1e6 + 0.5) / 1e6 AS dist
                    FROM assigned q JOIN assigned c
                      ON q.cell = c.cell AND q.vec_id <> c.vec_id
                    WHERE q.vec_id < 30),
          r AS (SELECT query_id, neighbor_id, dist,
                       row_number() OVER (PARTITION BY query_id
                         ORDER BY dist, neighbor_id) AS rank
                FROM pairs)
          SELECT query_id, neighbor_id, dist, rank FROM r
          WHERE rank <= 3 ORDER BY query_id, rank"""
    },

    "x_ann_ivf_multiprobe" -> {
      val l2 = (a: String, b: String) =>
        s"""list_sum(list_transform(range(1, 65),
            i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) *
                 (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))))"""
      s"""WITH cent AS (SELECT vec_id AS cell, embedding AS ce
                        FROM embeddings WHERE vec_id < 8),
          adist AS (SELECT e.vec_id, e.embedding, c.cell,
                           ${l2("e.embedding", "c.ce")} AS cdist
                    FROM embeddings e CROSS JOIN cent c),
          assigned AS (SELECT vec_id, embedding, cell
                       FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                               ORDER BY cdist, cell) AS rn FROM adist)
                       WHERE rn = 1),
          probes AS (SELECT vec_id AS query_id, cell
                     FROM (SELECT vec_id, cell,
                             row_number() OVER (PARTITION BY vec_id
                               ORDER BY cdist, cell) AS rn
                           FROM adist WHERE vec_id < 30)
                     WHERE rn <= 2),
          pairs AS (SELECT p.query_id, n.vec_id AS neighbor_id,
                           floor((${l2("q.embedding", "n.embedding")})
                                 * 1e6 + 0.5) / 1e6 AS dist
                    FROM probes p
                    JOIN embeddings q ON q.vec_id = p.query_id
                    JOIN assigned n ON n.cell = p.cell
                      AND n.vec_id <> p.query_id),
          r AS (SELECT query_id, neighbor_id, dist,
                       row_number() OVER (PARTITION BY query_id
                         ORDER BY dist, neighbor_id) AS rank
                FROM pairs)
          SELECT query_id, neighbor_id, dist, rank FROM r
          WHERE rank <= 3 ORDER BY query_id, rank"""
    },

    "x_ann_ivf_probe_quality" -> {
      val l2 = (a: String, b: String) =>
        s"""list_sum(list_transform(range(1, 65),
            i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) *
                 (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))))"""
      s"""WITH cent AS (SELECT vec_id AS cell, embedding AS ce
                        FROM embeddings WHERE vec_id < 8),
          adist AS (SELECT e.vec_id, e.embedding, c.cell,
                           ${l2("e.embedding", "c.ce")} AS cdist
                    FROM embeddings e CROSS JOIN cent c),
          assigned AS (SELECT vec_id, embedding, cell
                       FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                               ORDER BY cdist, cell) AS rn FROM adist)
                       WHERE rn = 1),
          s1 AS (SELECT query_id, neighbor_id FROM (
                   SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                          row_number() OVER (PARTITION BY q.vec_id
                            ORDER BY floor((${l2("q.embedding", "n.embedding")})
                                           * 1e6 + 0.5) / 1e6, n.vec_id) AS rank
                   FROM assigned q JOIN assigned n
                     ON q.cell = n.cell AND q.vec_id <> n.vec_id
                   WHERE q.vec_id < 30) WHERE rank <= 3),
          probes AS (SELECT vec_id AS query_id, cell
                     FROM (SELECT vec_id, cell,
                             row_number() OVER (PARTITION BY vec_id
                               ORDER BY cdist, cell) AS rn
                           FROM adist WHERE vec_id < 30)
                     WHERE rn <= 2),
          s2 AS (SELECT query_id, neighbor_id FROM (
                   SELECT p.query_id, n.vec_id AS neighbor_id,
                          row_number() OVER (PARTITION BY p.query_id
                            ORDER BY floor((${l2("q.embedding", "n.embedding")})
                                           * 1e6 + 0.5) / 1e6, n.vec_id) AS rank
                   FROM probes p
                   JOIN embeddings q ON q.vec_id = p.query_id
                   JOIN assigned n ON n.cell = p.cell
                     AND n.vec_id <> p.query_id) WHERE rank <= 3),
          truth AS (SELECT query_id, neighbor_id FROM (
                   SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                          row_number() OVER (PARTITION BY q.vec_id
                            ORDER BY floor((${l2("q.embedding", "n.embedding")})
                                           * 1e6 + 0.5) / 1e6, n.vec_id) AS rank
                   FROM embeddings q JOIN embeddings n ON q.vec_id <> n.vec_id
                   WHERE q.vec_id < 30) WHERE rank <= 3),
          h1 AS (SELECT COUNT(*) AS c FROM s1
                 JOIN truth USING (query_id, neighbor_id)),
          h2 AS (SELECT COUNT(*) AS c FROM s2
                 JOIN truth USING (query_id, neighbor_id))
          SELECT (SELECT COUNT(*) FROM truth) AS n_true,
                 (SELECT c FROM h1) AS hits_1probe,
                 (SELECT c FROM h2) AS hits_2probe,
                 floor(((SELECT c FROM h1) /
                        (SELECT COUNT(*) FROM truth)) * 1e4 + 0.5) / 1e4
                   AS recall_1probe,
                 floor(((SELECT c FROM h2) /
                        (SELECT COUNT(*) FROM truth)) * 1e4 + 0.5) / 1e4
                   AS recall_2probe"""
    },

    "x_ann_ivf_trained" -> {
      val l2 = (e: String, c: String) =>
        s"""list_sum(list_transform(range(1, 65),
            i -> (CAST($e[i] AS DOUBLE) - $c[i]) *
                 (CAST($e[i] AS DOUBLE) - $c[i])))"""
      s"""WITH seeds AS (SELECT vec_id AS cell,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce
              FROM embeddings WHERE vec_id < 8),
          a1 AS (SELECT vec_id, embedding, cell FROM (
                   SELECT e.vec_id, e.embedding, s.cell,
                          row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY ${l2("e.embedding", "s.ce")}, s.cell) AS rn
                   FROM embeddings e CROSS JOIN seeds s) WHERE rn = 1),
          c1d AS (SELECT cell, i AS dim,
                CAST(SUM(CAST(floor(CAST(embedding[i+1] AS DOUBLE) * 1e6)
                              AS BIGINT)) AS DOUBLE) / (1e6 * COUNT(*)) AS cval
              FROM a1, range(64) t(i) GROUP BY 1, 2),
          c1 AS (SELECT cell, list(cval ORDER BY dim) AS ce
                 FROM c1d GROUP BY 1),
          a2 AS (SELECT vec_id, embedding, cell FROM (
                   SELECT e.vec_id, e.embedding, s.cell,
                          row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY ${l2("e.embedding", "s.ce")}, s.cell) AS rn
                   FROM embeddings e CROSS JOIN c1 s) WHERE rn = 1),
          pairs AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                           floor((${l2("q.embedding", "c.embedding")}) * 1e6 + 0.5) / 1e6 AS dist
                    FROM a2 q JOIN a2 c
                      ON q.cell = c.cell AND q.vec_id <> c.vec_id
                    WHERE q.vec_id < 30),
          r AS (SELECT query_id, neighbor_id, dist,
                       row_number() OVER (PARTITION BY query_id
                         ORDER BY dist, neighbor_id) AS rank
                FROM pairs)
          SELECT query_id, neighbor_id, dist, rank FROM r
          WHERE rank <= 3 ORDER BY query_id, rank"""
    },

    "x_kmeans_train" -> {
      // 2 Lloyd iterations unrolled as CTE pairs (assign → recompute);
      // fixed-point integer means keep every centroid value bit-identical
      // across engines, so the raw-double argmin distances agree too
      val l2 = (e: String, c: String) =>
        s"""list_sum(list_transform(range(1, 65),
            i -> (CAST($e[i] AS DOUBLE) - $c[i]) *
                 (CAST($e[i] AS DOUBLE) - $c[i])))"""
      def assign(src: String, out: String) =
        s"""$out AS (SELECT vec_id, embedding, cell FROM (
              SELECT e.vec_id, e.embedding, s.cell,
                     row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY ${l2("e.embedding", "s.ce")}, s.cell) AS rn
              FROM embeddings e CROSS JOIN $src s) WHERE rn = 1)"""
      def recompute(src: String, outd: String, out: String) =
        s"""$outd AS (SELECT cell, i AS dim,
              CAST(SUM(CAST(floor(CAST(embedding[i+1] AS DOUBLE) * 1e6)
                            AS BIGINT)) AS DOUBLE) / (1e6 * COUNT(*)) AS cval,
              COUNT(*) AS n
            FROM $src, range(64) t(i) GROUP BY 1, 2),
            $out AS (SELECT cell, list(cval ORDER BY dim) AS ce
                     FROM $outd GROUP BY 1)"""
      s"""WITH seeds AS (SELECT vec_id AS cell,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce
              FROM embeddings WHERE vec_id < 4),
          ${assign("seeds", "a1")},
          ${recompute("a1", "c1d", "c1")},
          ${assign("c1", "a2")},
          ${recompute("a2", "c2d", "c2")}
          SELECT cell, dim, floor(cval * 1e6 + 0.5) / 1e6 AS centroid,
                 n AS n_members
          FROM c2d ORDER BY cell, dim"""
    },

    "x_ann_multitable" -> {
      def bucketSql(lo: Int) = (lo + 1 to lo + 8).map(i =>
        s"(CASE WHEN embedding[$i] >= 0 THEN '1' ELSE '0' END)")
        .mkString(" || ")
      s"""WITH $normsSql,
          b0 AS (SELECT vec_id, ${bucketSql(0)} AS bucket FROM embeddings),
          b1 AS (SELECT vec_id, ${bucketSql(8)} AS bucket FROM embeddings),
          cands AS (
            SELECT DISTINCT query_id, neighbor_id FROM (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
              FROM b0 q JOIN b0 c
                ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
              WHERE q.vec_id < 50
              UNION ALL
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
              FROM b1 q JOIN b1 c
                ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
              WHERE q.vec_id < 50)),
          d AS (SELECT query_id, neighbor_id,
                       ${dotSql("q.embedding", "c.embedding")} AS dot
                FROM cands
                JOIN embeddings q ON q.vec_id = query_id
                JOIN embeddings c ON c.vec_id = neighbor_id),
          sc AS (SELECT query_id, neighbor_id,
                        floor((dot / (nq.nrm * nc.nrm)) * 1e6 + 0.5) / 1e6 AS cos_sim
                 FROM d JOIN nrm nq ON nq.vec_id = query_id
                        JOIN nrm nc ON nc.vec_id = neighbor_id),
          r AS (SELECT query_id, neighbor_id, cos_sim,
                       row_number() OVER (PARTITION BY query_id
                         ORDER BY cos_sim DESC, neighbor_id) AS rank
                FROM sc)
          SELECT query_id, neighbor_id, cos_sim, rank FROM r
          WHERE rank <= 3 ORDER BY query_id, rank"""
    },

    "x_ann_trained_quality" -> {
      val l2 = (e: String, c: String) =>
        s"""list_sum(list_transform(range(1, 65),
            i -> (CAST($e[i] AS DOUBLE) - $c[i]) *
                 (CAST($e[i] AS DOUBLE) - $c[i])))"""
      def assign(src: String, out: String) =
        s"""$out AS (SELECT vec_id, embedding, cell FROM (
              SELECT e.vec_id, e.embedding, s.cell,
                     row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY ${l2("e.embedding", "s.ce")}, s.cell) AS rn
              FROM embeddings e CROSS JOIN $src s) WHERE rn = 1)"""
      def search(src: String, out: String) =
        s"""$out AS (SELECT query_id, neighbor_id FROM (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     row_number() OVER (PARTITION BY q.vec_id
                       ORDER BY floor((${l2("q.embedding", "c.embedding")})
                                      * 1e6 + 0.5) / 1e6, c.vec_id) AS rank
              FROM $src q JOIN $src c
                ON q.cell = c.cell AND q.vec_id <> c.vec_id
              WHERE q.vec_id < 30) WHERE rank <= 3)"""
      s"""WITH seeds AS (SELECT vec_id AS cell,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce
              FROM embeddings WHERE vec_id < 8),
          ${assign("seeds", "au")},
          c1d AS (SELECT cell, i AS dim,
                CAST(SUM(CAST(floor(CAST(embedding[i+1] AS DOUBLE) * 1e6)
                              AS BIGINT)) AS DOUBLE) / (1e6 * COUNT(*)) AS cval
              FROM au, range(64) t(i) GROUP BY 1, 2),
          c1 AS (SELECT cell, list(cval ORDER BY dim) AS ce
                 FROM c1d GROUP BY 1),
          ${assign("c1", "at")},
          truth AS (SELECT query_id, neighbor_id FROM (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     row_number() OVER (PARTITION BY q.vec_id
                       ORDER BY floor((${l2("q.embedding", "c.embedding")})
                                      * 1e6 + 0.5) / 1e6, c.vec_id) AS rank
              FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
              WHERE q.vec_id < 30) WHERE rank <= 3),
          ${search("au", "su")},
          ${search("at", "st")},
          hu AS (SELECT COUNT(*) AS c FROM su
                 JOIN truth USING (query_id, neighbor_id)),
          ht AS (SELECT COUNT(*) AS c FROM st
                 JOIN truth USING (query_id, neighbor_id))
          SELECT (SELECT COUNT(*) FROM truth) AS n_true,
                 (SELECT c FROM hu) AS hits_untrained,
                 (SELECT c FROM ht) AS hits_trained,
                 floor(((SELECT c FROM hu) /
                        (SELECT COUNT(*) FROM truth)) * 1e4 + 0.5) / 1e4
                   AS recall_untrained,
                 floor(((SELECT c FROM ht) /
                        (SELECT COUNT(*) FROM truth)) * 1e4 + 0.5) / 1e4
                   AS recall_trained"""
    },

    "x_ann_multiprobe" -> {
      val bucketSql = (1 to 8).map(i =>
        s"(CASE WHEN embedding[$i] >= 0 THEN '1' ELSE '0' END)")
        .mkString(" || ")
      val flipSqls = (1 to 8).map(i =>
        s"""substr(bucket, 1, ${i - 1})
            || (CASE WHEN substr(bucket, $i, 1) = '1' THEN '0' ELSE '1' END)
            || substr(bucket, ${i + 1})""")
      s"""WITH $normsSql,
          b AS (SELECT vec_id, embedding, $bucketSql AS bucket
                FROM embeddings),
          qp AS (SELECT vec_id, embedding,
                        unnest([bucket, ${flipSqls.mkString(", ")}]) AS bucket
                 FROM b WHERE vec_id < 50),
          d AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       ${dotSql("q.embedding", "c.embedding")} AS dot
                FROM qp q JOIN b c
                  ON q.bucket = c.bucket AND q.vec_id <> c.vec_id),
          sc AS (SELECT query_id, neighbor_id,
                        floor((dot / (nq.nrm * nc.nrm)) * 1e6 + 0.5) / 1e6 AS cos_sim
                 FROM d JOIN nrm nq ON nq.vec_id = query_id
                        JOIN nrm nc ON nc.vec_id = neighbor_id),
          r AS (SELECT query_id, neighbor_id, cos_sim,
                       row_number() OVER (PARTITION BY query_id
                         ORDER BY cos_sim DESC, neighbor_id) AS rank
                FROM sc)
          SELECT query_id, neighbor_id, cos_sim, rank FROM r
          WHERE rank <= 3 ORDER BY query_id, rank"""
    },

    "x_ann_multiprobe_quality" -> {
      val bucketSql = (1 to 8).map(i =>
        s"(CASE WHEN embedding[$i] >= 0 THEN '1' ELSE '0' END)")
        .mkString(" || ")
      val flipSqls = (1 to 8).map(i =>
        s"""substr(bucket, 1, ${i - 1})
            || (CASE WHEN substr(bucket, $i, 1) = '1' THEN '0' ELSE '1' END)
            || substr(bucket, ${i + 1})""")
      s"""WITH $normsSql,
          bd AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                        ${dotSql("q.embedding", "c.embedding")} AS dot
                 FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
                 WHERE q.vec_id < 50),
          bsc AS (SELECT query_id, neighbor_id,
                         floor((dot / (nq.nrm * nc.nrm)) * 1e6 + 0.5) / 1e6 AS cos_sim
                  FROM bd JOIN nrm nq ON nq.vec_id = query_id
                          JOIN nrm nc ON nc.vec_id = neighbor_id),
          truth AS (SELECT query_id, neighbor_id FROM (
                      SELECT query_id, neighbor_id,
                             row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rank
                      FROM bsc) WHERE rank <= 3),
          bkt AS (SELECT vec_id, embedding, $bucketSql AS bucket
                  FROM embeddings),
          ld AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                        ${dotSql("q.embedding", "c.embedding")} AS dot
                 FROM bkt q JOIN bkt c
                   ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
                 WHERE q.vec_id < 50),
          lsc AS (SELECT query_id, neighbor_id,
                         floor((dot / (nq.nrm * nc.nrm)) * 1e6 + 0.5) / 1e6 AS cos_sim
                  FROM ld JOIN nrm nq ON nq.vec_id = query_id
                          JOIN nrm nc ON nc.vec_id = neighbor_id),
          sapprox AS (SELECT query_id, neighbor_id FROM (
                        SELECT query_id, neighbor_id,
                               row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos_sim DESC, neighbor_id) AS rank
                        FROM lsc) WHERE rank <= 3),
          qp AS (SELECT vec_id, embedding,
                        unnest([bucket, ${flipSqls.mkString(", ")}]) AS bucket
                 FROM bkt WHERE vec_id < 50),
          md AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                        ${dotSql("q.embedding", "c.embedding")} AS dot
                 FROM qp q JOIN bkt c
                   ON q.bucket = c.bucket AND q.vec_id <> c.vec_id),
          msc AS (SELECT query_id, neighbor_id,
                         floor((dot / (nq.nrm * nc.nrm)) * 1e6 + 0.5) / 1e6 AS cos_sim
                  FROM md JOIN nrm nq ON nq.vec_id = query_id
                          JOIN nrm nc ON nc.vec_id = neighbor_id),
          mapprox AS (SELECT query_id, neighbor_id FROM (
                        SELECT query_id, neighbor_id,
                               row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos_sim DESC, neighbor_id) AS rank
                        FROM msc) WHERE rank <= 3),
          shits AS (SELECT a.query_id, a.neighbor_id FROM sapprox a
                    JOIN truth t ON a.query_id = t.query_id
                      AND a.neighbor_id = t.neighbor_id),
          mhits AS (SELECT a.query_id, a.neighbor_id FROM mapprox a
                    JOIN truth t ON a.query_id = t.query_id
                      AND a.neighbor_id = t.neighbor_id)
          SELECT (SELECT COUNT(*) FROM truth) AS n_true,
                 (SELECT COUNT(*) FROM shits) AS hits_single,
                 (SELECT COUNT(*) FROM mhits) AS hits_multiprobe,
                 floor(((SELECT COUNT(*) FROM shits) /
                        (SELECT COUNT(*) FROM truth)) * 1e4 + 0.5) / 1e4
                   AS recall_single,
                 floor(((SELECT COUNT(*) FROM mhits) /
                        (SELECT COUNT(*) FROM truth)) * 1e4 + 0.5) / 1e4
                   AS recall_multiprobe"""
    },

    "x_ann_quality" -> {
      val bucketSql = (1 to 8).map(i =>
        s"(CASE WHEN embedding[$i] >= 0 THEN '1' ELSE '0' END)")
        .mkString(" || ")
      s"""WITH $normsSql,
          bd AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                        ${dotSql("q.embedding", "c.embedding")} AS dot
                 FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
                 WHERE q.vec_id < 50),
          bsc AS (SELECT query_id, neighbor_id,
                         floor((dot / (nq.nrm * nc.nrm)) * 1e6 + 0.5) / 1e6 AS cos_sim
                  FROM bd JOIN nrm nq ON nq.vec_id = query_id
                          JOIN nrm nc ON nc.vec_id = neighbor_id),
          truth AS (SELECT query_id, neighbor_id FROM (
                      SELECT query_id, neighbor_id,
                             row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rank
                      FROM bsc) WHERE rank <= 3),
          bkt AS (SELECT vec_id, embedding, $bucketSql AS bucket
                  FROM embeddings),
          ld AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                        ${dotSql("q.embedding", "c.embedding")} AS dot
                 FROM bkt q JOIN bkt c
                   ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
                 WHERE q.vec_id < 50),
          lsc AS (SELECT query_id, neighbor_id,
                         floor((dot / (nq.nrm * nc.nrm)) * 1e6 + 0.5) / 1e6 AS cos_sim
                  FROM ld JOIN nrm nq ON nq.vec_id = query_id
                          JOIN nrm nc ON nc.vec_id = neighbor_id),
          approx AS (SELECT query_id, neighbor_id FROM (
                       SELECT query_id, neighbor_id,
                              row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rank
                       FROM lsc) WHERE rank <= 3),
          hits AS (SELECT a.query_id, a.neighbor_id FROM approx a
                   JOIN truth t ON a.query_id = t.query_id
                     AND a.neighbor_id = t.neighbor_id)
          SELECT (SELECT COUNT(*) FROM truth) AS n_true,
                 (SELECT COUNT(*) FROM hits) AS n_hits,
                 floor(((SELECT COUNT(*) FROM hits) /
                        (SELECT COUNT(*) FROM truth)) * 1e4 + 0.5) / 1e4
                   AS recall_at_3"""
    },

    "x_ann_lsh" -> {
      // DuckDB lists are 1-based: embedding[1..8] ↔ Spark embedding[0..7]
      val bucketSql = (1 to 8).map(i =>
        s"(CASE WHEN embedding[$i] >= 0 THEN '1' ELSE '0' END)")
        .mkString(" || ")
      s"""WITH $normsSql,
          b AS (SELECT vec_id, embedding, $bucketSql AS bucket FROM embeddings),
          d AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       ${dotSql("q.embedding", "c.embedding")} AS dot
                FROM b q JOIN b c
                  ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
                WHERE q.vec_id < 50),
          sc AS (SELECT query_id, neighbor_id,
                        floor((dot / (nq.nrm * nc.nrm)) * 1e6 + 0.5) / 1e6 AS cos_sim
                 FROM d JOIN nrm nq ON nq.vec_id = query_id
                        JOIN nrm nc ON nc.vec_id = neighbor_id),
          r AS (SELECT query_id, neighbor_id, cos_sim,
                       row_number() OVER (PARTITION BY query_id
                         ORDER BY cos_sim DESC, neighbor_id) AS rank
                FROM sc)
          SELECT query_id, neighbor_id, cos_sim, rank FROM r
          WHERE rank <= 3 ORDER BY query_id, rank"""
    }
  )
}
