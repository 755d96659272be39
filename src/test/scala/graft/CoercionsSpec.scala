package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.types.Coercions

/** Property tests for the scalar coercions (SURVEY.md §5.3):
  * t1 never throws and honors comma/dot equivalence; t2 two-format
  * fallback parses both shapes. Samples drawn from ScalaCheck generators
  * with a fixed seed (no scalatestplus bridge in the offline cache). */
class CoercionsSpec extends SparkSpec {

  private def sample[A](gen: Gen[A], n: Int): List[A] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i))).toList

  private def coerceOne(s: String, default: Double = 0.0): Double = {
    import spark.implicits._
    Seq(s).toDF("v")
      .select(Coercions.coerceBrFloat(col("v"), default).as("r"))
      .collect()(0).getDouble(0)
  }

  test("t1: comma and dot decimals agree; garbage/empty/null hit default") {
    import spark.implicits._
    val rows = Seq("49,90", "49.90", " 49,90 ", "", "abc", null, "-1,5", "0")
    val got = rows.toDF("v")
      .select(Coercions.coerceBrFloat(col("v")).as("r"))
      .collect().map(_.getDouble(0)).toSeq
    assert(got === Seq(49.90, 49.90, 49.90, 0.0, 0.0, 0.0, -1.5, 0.0))
  }

  test("t1: never throws on arbitrary strings (property)") {
    import spark.implicits._
    val ss = sample(Gen.asciiPrintableStr, 300)
    val n = ss.toDF("v")
      .select(Coercions.coerceBrFloat(col("v"), -7.5).as("r"))
      .filter(col("r").isNull).count()
    assert(n === 0)
  }

  test("t1: numeric round-trip via br formatting (property)") {
    import spark.implicits._
    val ds = sample(Gen.chooseNum(-100000.0, 100000.0), 200)
    val got = ds.toDF("d")
      .select(col("d"), Coercions.coerceBrFloat(
        regexp_replace(format_string("%.4f", col("d")), "\\.", ","))
        .as("r"))
      .collect()
    got.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(0)) < 5e-5,
        s"${r.getDouble(0)} -> ${r.getDouble(1)}")
    }
  }

  test("t2: two-format fallback parses datetime and bare date") {
    import spark.implicits._
    val got = Seq("15/03/2024 10:22:01", "15/03/2024", "2024-03-15", "", "x")
      .toDF("v")
      .select(date_format(Coercions.parseBrDate(col("v")),
        "yyyy-MM-dd HH:mm:ss").as("r"))
      .collect().map(r => Option(r.getString(0)))
    assert(got === Seq(Some("2024-03-15 10:22:01"), Some("2024-03-15 00:00:00"),
      None, None, None))
  }

  test("t3/t4: regex gate and nullif-empty") {
    import spark.implicits._
    val got = Seq("01/02/2024", "2024-02-01", "", "31/12/2024 08:00:00")
      .toDF("v")
      .select(Coercions.isBrDateLike(col("v")).as("valid"),
        Coercions.nullIfEmpty(col("v")).as("ne"))
      .collect().map(r => (r.getBoolean(0), Option(r.getString(1))))
    assert(got(0) === (true, Some("01/02/2024")))
    assert(got(1) === (false, Some("2024-02-01")))
    assert(got(2) === (false, None))
    assert(got(3) === (true, Some("31/12/2024 08:00:00")))
  }
}
