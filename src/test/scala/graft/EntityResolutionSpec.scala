package graft

import org.apache.spark.sql.SaveMode

/** x_er_mutual_best: the sf fixtures are oracle-checked, but the tiny SFs
  * have no suffix collisions, so the DISAMBIGUATION behavior (an impostor
  * candidate losing to the exact match on both sides) needs a hand-built
  * fixture that manufactures one.
  */
class EntityResolutionSpec extends SparkSpec {

  private def name(id: Long) = f"Customer#$id%09d"

  test("mutual-best assignment: impostors lose, unmatched sides counted") {
    import spark.implicits._
    val dir = tmpDir("er")
    // id 1     → left + right, identical (d=0 match)
    // id 10001 → left + right, identical; its name is ALSO distance 1
    //            from id 1's (suffix block "0001" collides, digit 5
    //            differs) — the impostor pairs (1,10001') and (10001,1')
    //            must lose mutual-best to the two exact matches
    // id 7     → left + right, right perturbed (char 10 dropped): d=1 match
    // id 5     → left only (5 % 5 == 0 drops the right copy) → unmatched
    // id 3     → right only (3 % 3 == 0 drops the left copy) → unmatched,
    //            suffix "0003" finds no left candidate
    val ids = Seq(1L, 3L, 5L, 7L, 10001L)
    ids.map(id => (id, name(id), 0, 0.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/customer.parquet")

    val r = SparkEntry.queries("x_er_mutual_best")(spark, dir).collect()(0)
    def g(n: String) = r.getAs[Long](n)
    assert(g("n_left") === 4)       // 1, 5, 7, 10001
    assert(g("n_right") === 4)      // 1, 3, 7(perturbed), 10001
    // candidates: the 2 exact pairs, the 2 impostor directions, 7↔7'
    assert(g("n_candidates") === 5)
    assert(g("n_matched") === 3)
    assert(g("n_exact") === 2)      // 1↔1', 10001↔10001'
    assert(g("n_fuzzy") === 1)      // 7↔7' (head-digit drop, d=1)
    assert(g("n_left_unmatched") === 1)   // id 5
    assert(g("n_right_unmatched") === 1)  // id 3
  }

  test("head-region deletion keeps the suffix block: perturbed pair is " +
      "a candidate") {
    // the recall argument in the scaladoc, pinned: dropping char 10
    // leaves right(name, 4) intact for 9-digit zero-padded keys
    val n = name(7L)
    val perturbed = n.substring(0, 9) + n.substring(10)
    assert(n.takeRight(4) === perturbed.takeRight(4))
    assert(n.length === perturbed.length + 1)
  }
}
