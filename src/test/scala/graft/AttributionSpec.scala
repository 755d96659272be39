package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** x_attribution: the fixture run is oracle-checked, but the sf tables
  * cannot pin every credit branch (n=2 split, interior remainder rule,
  * window edges). This spec hand-builds an events table that hits each
  * branch and asserts the exact integer basis-point credits.
  */
class AttributionSpec extends SparkSpec {

  private def ts(ms: Long) = new java.sql.Timestamp(ms)
  private val DAY = 86400000L

  test("position-based credit: every branch exact, 10000 bp per conversion") {
    import spark.implicits._
    val dir = tmpDir("attr")
    // base instant far from epoch so unix_millis is comfortably positive
    val t0 = 1700000000000L
    // user 1: direct (no touches) — 10000 to 'direct'
    // user 2: single view touch — 10000 to view
    // user 3: click then view (n=2) — 5000 each
    // user 4: view, click, view (n=3) — first view 4000, middle click
    //         2000 (floor(2000/1)=2000, rem 0), last view 4000
    // user 5: 5 clicks (n=5) — 4000 + 666 + (666+2) + 666 + 4000;
    //         remainder 2000-3*666=2 goes to the EARLIEST interior touch
    // user 6: one view inside the window, one view 8 days before the
    //         purchase (outside 7d) and one view AFTER it — only the
    //         in-window touch counts → n=1, 10000 to view
    val rows = Seq(
      // (event_id, ts_ms, user_id, event_type)
      (100L, t0 + 10 * DAY, 1L, "purchase"),
      (200L, t0 + 9 * DAY, 2L, "view"),
      (201L, t0 + 10 * DAY, 2L, "purchase"),
      (300L, t0 + 9 * DAY, 3L, "click"),
      (301L, t0 + 9 * DAY + 1000L, 3L, "view"),
      (302L, t0 + 10 * DAY, 3L, "purchase"),
      (400L, t0 + 8 * DAY, 4L, "view"),
      (401L, t0 + 8 * DAY + 1000L, 4L, "click"),
      (402L, t0 + 8 * DAY + 2000L, 4L, "view"),
      (403L, t0 + 10 * DAY, 4L, "purchase"),
      (500L, t0 + 8 * DAY, 5L, "click"),
      (501L, t0 + 8 * DAY + 1000L, 5L, "click"),
      (502L, t0 + 8 * DAY + 2000L, 5L, "click"),
      (503L, t0 + 8 * DAY + 3000L, 5L, "click"),
      (504L, t0 + 8 * DAY + 4000L, 5L, "click"),
      (505L, t0 + 10 * DAY, 5L, "purchase"),
      (600L, t0 + 2 * DAY, 6L, "view"),   // 8d before purchase: outside
      (601L, t0 + 9 * DAY, 6L, "view"),   // inside the 7d lookback
      (602L, t0 + 10 * DAY, 6L, "purchase"),
      (603L, t0 + 11 * DAY, 6L, "view"))  // after the purchase: ignored
    rows.map { case (id, ms, u, et) => (id, ts(ms), u, et, 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/events.parquet")

    val got = SparkEntry.queries("x_attribution")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap

    // click credit: u3 first 5000; u4 middle 2000; u5 all five touches
    //   4000 + 666 + 668 + 666 + 4000 = 10000 — three distinct
    //   conversions carry a click touch (u3, u4, u5)
    assert(got("click") === ((3L, 5000L + 2000L + 10000L)))
    // view credit: u2 10000; u3 last 5000; u4 first+last 8000; u6 10000
    assert(got("view") === ((4L, 10000L + 5000L + 8000L + 10000L)))
    assert(got("direct") === ((1L, 10000L)))
    // conservation: every purchase distributed exactly 10000 bp
    val totalBp = got.values.map(_._2).sum
    assert(totalBp === 6L * 10000L)
  }

  test("fixture-run invariant: credit conserves 10000 bp per conversion") {
    val sf = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("x_attribution")(spark, sf).collect()
    val totalBp = got.map(_.getLong(2)).sum
    val nConv = graft.util.Tables.t(spark, sf, "events")
      .filter(col("event_type") === "purchase").count()
    assert(totalBp === nConv * 10000L)
  }
}
