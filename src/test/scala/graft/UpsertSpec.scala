package graft

import graft.etl.Upsert

/** sink_jdbc_upsert semantics: last-writer-wins, idempotence (re-running a
  * page is a no-op — SURVEY.md §7.4), anti/semi decomposition. */
class UpsertSpec extends SparkSpec {

  import org.apache.spark.sql.functions._

  test("merge: updates win, untouched rows survive") {
    import spark.implicits._
    val existing = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    val updates = Seq((2, "B"), (4, "D")).toDF("k", "v")
    val got = Upsert.merge(existing, updates, Seq("k"))
      .orderBy("k").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(got === Seq((1, "a"), (2, "B"), (3, "c"), (4, "D")))
  }

  test("merge is idempotent: applying the same page twice is a no-op") {
    import spark.implicits._
    val existing = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val updates = Seq((2, "B"), (3, "C")).toDF("k", "v")
    val once = Upsert.merge(existing, updates, Seq("k"))
    val twice = Upsert.merge(once, updates, Seq("k"))
    assert(once.orderBy("k").collect().toSeq
      === twice.orderBy("k").collect().toSeq)
  }

  test("merge collapses duplicate-key update rows to one deterministic row") {
    import spark.implicits._
    val existing = Seq((1, "a")).toDF("k", "v")
    val updates = Seq((2, "x"), (2, "z"), (2, "y")).toDF("k", "v")
    val got = Upsert.merge(existing, updates, Seq("k"))
      .orderBy("k").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(got === Seq((1, "a"), (2, "z"))) // max over non-key cols wins
  }

  test("latestPerKey keeps exactly the newest version") {
    import spark.implicits._
    val df = Seq((1, 1, "old"), (1, 3, "new"), (1, 2, "mid"), (2, 1, "only"))
      .toDF("k", "ver", "v")
    val got = Upsert.latestPerKey(df, Seq("k"), Seq("ver"))
      .orderBy("k").collect().map(r => (r.getInt(0), r.getString(2))).toSeq
    assert(got === Seq((1, "new"), (2, "only")))
  }

  test("latestPerKey is idempotent (merge of merges)") {
    import spark.implicits._
    val df = Seq((1, 1, "a"), (1, 2, "b"), (2, 5, "x")).toDF("k", "ver", "v")
    val once = Upsert.latestPerKey(df, Seq("k"), Seq("ver"))
    val twice = Upsert.latestPerKey(once, Seq("k"), Seq("ver"))
    assert(once.orderBy("k").collect().toSeq
      === twice.orderBy("k").collect().toSeq)
  }

  test("newRows / matchedRows decompose an upsert batch") {
    import spark.implicits._
    val source = Seq((1, "s1"), (2, "s2"), (3, "s3")).toDF("k", "v")
    val target = Seq((2, "t2")).toDF("k", "v")
    assert(Upsert.newRows(source, target, Seq("k"))
      .collect().map(_.getInt(0)).sorted.toSeq === Seq(1, 3))
    assert(Upsert.matchedRows(source, target, Seq("k"))
      .collect().map(_.getInt(0)).toSeq === Seq(2))
  }
}
