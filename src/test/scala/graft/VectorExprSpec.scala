package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** GraftDot native expression: bit-identical to the HOF left fold, null
  * handling, and registration paths. */
class VectorExprSpec extends SparkSpec {

  test("graft_dot equals the aggregate(zip_with(...)) fold bit-for-bit") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map(_ =>
      (Array.fill(64)(rnd.nextFloat() * 2 - 1),
       Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b")
      .select(expr("graft_dot(a, b)").as("native"),
        expr("""aggregate(zip_with(a, b,
          (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
          CAST(0 AS DOUBLE), (acc, v) -> acc + v)""").as("hof"))
    assert(df.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("graft_l2 dispatches per-side on float vs double arrays") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(13)
    val rows = (0 until 100).map(_ =>
      (Array.fill(64)(rnd.nextFloat() * 2 - 1),
       Array.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("f", "d")
      .select(expr("graft_l2(f, d)").as("native"),
        expr("""aggregate(zip_with(f, d,
          (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),
          CAST(0 AS DOUBLE), (acc, v) -> acc + v)""").as("hof"))
    assert(df.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("graft_dot propagates nulls") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq((Some(Array(1.0f, 2.0f)), None: Option[Array[Float]]))
      .toDF("a", "b")
      .select(expr("graft_dot(a, b)").as("r"))
    assert(df.collect()(0).isNullAt(0))
  }

  test("registration via SparkSessionExtensions injects the function") {
    val ext = new graft.functions.GraftExtensions
    // a fresh extensions object applies cleanly (full smoke of the inject
    // path; the running shared session already has the temp registration)
    val holder = new org.apache.spark.sql.SparkSessionExtensions
    ext.apply(holder)
  }
}
