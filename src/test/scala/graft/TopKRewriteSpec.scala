package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{GraftTopK, TopKRewriteRule}

/** TopKRewriteRule: the rank-window top-k pattern is rewritten to the
  * graft_topk aggregate when provably exact, left alone otherwise, and
  * produces identical results either way. */
class TopKRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def data: DataFrame = {
    val rnd = new scala.util.Random(5)
    (0 until 4000).map(i =>
      (rnd.nextInt(23).toLong, rnd.nextInt(40) / 8.0, i.toLong))
      .toDF("g", "score", "id") // primitive cols: non-nullable score
  }

  private def topkQuery(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("g").orderBy(desc("score"), asc("id"))
    df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("g", "id", "score", "rank")
  }

  private def hasTopKAgg(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists {
      case a: Aggregate => a.aggregateExpressions.exists(
        _.exists(_.isInstanceOf[GraftTopK]))
      case _ => false
    }

  private def withRule[A](body: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ TopKRewriteRule
    try body
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq TopKRewriteRule)
  }

  test("pattern is rewritten: no Window node, graft_topk aggregate planned") {
    withRule {
      val q = topkQuery(data)
      assert(hasTopKAgg(q), q.queryExecution.optimizedPlan.toString)
      assert(!q.queryExecution.optimizedPlan.exists(_.isInstanceOf[LWindow]))
    }
  }

  test("rewritten plan returns exactly the window plan's rows") {
    val expected = topkQuery(data).orderBy("g", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    val got = withRule {
      val q = topkQuery(data)
      assert(hasTopKAgg(q))
      q.orderBy("g", "rank").as[(Long, Long, Double, Int)].collect().toSeq
    }
    assert(got === expected)
  }

  test("does NOT fire when extra columns are needed or score is nullable") {
    withRule {
      // payload column beyond (keys, score, id, rank): heap can't carry it
      val w = Window.partitionBy("g").orderBy(desc("score"), asc("id"))
      val q1 = data.withColumn("payload", col("id") * 2)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select("g", "id", "payload", "rank")
      assert(!hasTopKAgg(q1))
      assert(q1.queryExecution.optimizedPlan.exists(_.isInstanceOf[LWindow]))

      // nullable score (when() introduces nullability): NULL ranks last in
      // the window but would be dropped by the heap — must not rewrite
      val q2 = data
        .withColumn("score", when(col("id") =!= -1, col("score")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select("g", "id", "score", "rank")
      assert(!hasTopKAgg(q2))
    }
  }
}
