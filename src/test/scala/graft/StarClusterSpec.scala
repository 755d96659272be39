package graft

import org.apache.spark.sql.functions._

import graft.ext.DedupOps

/** Large-star/small-star connected components (round 4): correctness vs a
  * brute-force union-find, and the round-count claim that motivated the
  * rewrite — O(log n) fixed-point rounds on a long chain, where min-label
  * propagation needs one round per hop (the r3 implementation capped at 20
  * passes would have returned WRONG labels on a 64-hop chain). */
class StarClusterSpec extends SparkSpec {
  import spark.implicits._

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n.toLong.toInt)(i => i.toLong)
    def find(x: Long): Long = {
      var r = x
      while (parent(r.toInt) != r) r = parent(r.toInt)
      var c = x
      while (parent(c.toInt) != r) {
        val nx = parent(c.toInt); parent(c.toInt) = r; c = nx
      }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb).toInt) = math.min(ra, rb)
    }
    val touched = edges.flatMap(e => Seq(e._1, e._2)).distinct
    touched.map(x => x -> find(x)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): (Map[Long, Long], Int) = {
    val (labels, rounds) =
      DedupOps.connectedComponentsStar(edges.toDF("a", "b"))
    val got = labels.as[(Long, Long)].collect().toMap
    (got, rounds)
  }

  test("100-hop chain: correct components in O(log n) rounds") {
    val chain = (0L until 100L).sliding(2).map(s => (s(0), s(1))).toSeq
    val (got, rounds) = run(chain)
    assert(got.size === 100)
    assert(got.values.toSet === Set(0L), "all chain nodes must label to 0")
    // min-label propagation = one round per hop: 99 passes on this
    // fixture. The contraction must be logarithmic, not linear.
    assert(rounds <= 12, s"expected O(log n) rounds on a chain, got $rounds")
  }

  test("matches brute-force union-find on a mixed random graph") {
    val rnd = new scala.util.Random(42)
    val n = 400
    // mix of chains, stars, triangles, and random cross-links
    val edges = (
      (0L until 50L).sliding(2).map(s => (s(0), s(1))).toSeq ++
      (51L until 80L).map(i => (50L, i)) ++
      Seq((100L, 101L), (101L, 102L), (102L, 100L)) ++
      (0 until 150).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
    ).filter(e => e._1 != e._2).distinct
    val want = unionFind(n, edges)
    val (got, rounds) = run(edges)
    assert(got === want)
    assert(rounds <= 12)
  }

  test("contraction runs ONE Spark action per round (r6 job fusion)") {
    // r5 verdict: per-round scheduling overhead dominated the cluster
    // queries because each round ran two eager checkpoint jobs plus the
    // convergence aggregate. The lazy-checkpoint fusion must keep it to
    // one action per round (+1 setup signature). Raw Spark-job counts are
    // NOT a valid proxy — a single action spawns one job per AQE shuffle
    // stage plus the in-action lazy-checkpoint materializations — so the
    // assertion counts QueryExecutions (1:1 with Dataset actions) via a
    // QueryExecutionListener; a regression to eager per-round checkpoints
    // fails loudly instead of only showing up as bench drift.
    // lazy localCheckpoint registers a QueryExecution too (funcName
    // "localCheckpoint") but launches no jobs — the job-launching actions
    // are the per-round `first()` calls (funcName "head"), so count those.
    val actions = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        if (funcName != "localCheckpoint") { actions.incrementAndGet(): Unit }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val chain = (0L until 100L).sliding(2).map(s => (s(0), s(1))).toSeq
      val (_, rounds) =
        DedupOps.connectedComponentsStar(chain.toDF("a", "b"))
      // the listener is notified asynchronously — poll until stable
      var n = actions.get(); var stable = 0
      while (stable < 3) {
        Thread.sleep(100)
        val m = actions.get()
        if (m == n) stable += 1 else { n = m; stable = 0 }
      }
      assert(rounds >= 5,
        s"chain fixture should need several rounds, got $rounds")
      assert(n <= rounds + 1,
        s"expected one action per round (+setup), got $n actions " +
          s"in $rounds rounds")
    } finally spark.listenerManager.unregister(listener)
  }

  test("orientation and duplicate edges are irrelevant") {
    val edges = Seq((5L, 1L), (1L, 5L), (5L, 1L), (7L, 5L), (2L, 9L))
    val (got, _) = run(edges)
    assert(got === Map(5L -> 1L, 1L -> 1L, 7L -> 1L, 2L -> 2L, 9L -> 2L))
  }
}
