package graft

import org.apache.spark.sql.functions._

import graft.util.ScaleJoins

/** Scale-join utilities: bucketed co-location must remove the shuffle;
  * salting must preserve join semantics. */
class ScaleJoinsSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = (1 to 1000).map(i => (i.toLong, s"o$i")).toDF("k", "ov")
      val items = (1 to 5000).map(i => ((i % 1000 + 1).toLong, s"i$i")).toDF("k", "iv")
      ScaleJoins.writeBucketed(orders, "b_orders", "k", 8)
      ScaleJoins.writeBucketed(items, "b_items", "k", 8)
      val joined = spark.table("b_orders").join(spark.table("b_items"), "k")
      assert(joined.count() === 5000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange"),
        s"bucketed join still shuffles:\n$plan")

      // control: the same join over plain parquet DOES shuffle
      val plainPlan = orders.join(items, "k")
        .queryExecution.executedPlan.toString
      assert(plainPlan.contains("Exchange"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_items")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("saltedJoin equals the plain join on skewed data") {
    import spark.implicits._
    // 90% of big rows hit one hot key
    val big = (1 to 2000).map(i =>
      (if (i % 10 == 0) i.toLong % 50 else 7L, s"v$i")).toDF("k", "bv")
    val small = (0L to 49L).map(k => (k, s"dim$k")).toDF("k", "sv")
    val plain = big.join(small, "k")
    val salted = ScaleJoins.saltedJoin(big, small, "k", 16)
    assert(salted.count() === plain.count())
    val a = plain.orderBy("k", "bv").collect().map(_.toSeq).toSeq
    val b = salted.select("k", "bv", "sv").orderBy("k", "bv")
      .collect().map(_.toSeq).toSeq
    assert(a === b)
  }
}
