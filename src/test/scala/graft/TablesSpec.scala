package graft

import org.apache.spark.sql.functions._

/** Fixture-encoding robustness (r7 post-mortem): events.ts regenerated from
  * TIMESTAMP(NANOS) to timestamp[us] (TIMESTAMP_NTZ) and broke x_sessionize
  * at analysis time. Tables.t must normalize EVERY physical encoding the
  * fixture has ever shipped to the same session-TZ TIMESTAMP column, so the
  * next regeneration cannot break any events op again.
  */
class TablesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("events.ts is session-TZ TIMESTAMP regardless of physical encoding") {
    val df = graft.util.Tables.t(spark, sf, "events")
    assert(df.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    // unix_micros was the r7 crash site — it accepts only TIMESTAMP
    assert(df.select(unix_micros(col("ts"))).limit(1).collect().nonEmpty)
  }

  test("a synthesized nanos-long encoding normalizes to the same instants") {
    val fixture = graft.util.Tables.t(spark, sf, "events")
      .orderBy("event_id").limit(100).localCheckpoint()
    // rebuild the OLD encoding: raw nano count as a bare long column
    // (what spark.sql.legacy.parquet.nanosAsLong surfaces for
    // TIMESTAMP(NANOS) parquet), round-tripped through a real parquet file
    val dir = tmpDir("events-nanos")
    fixture
      .withColumn("ts", unix_micros(col("ts")) * 1000L)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val viaNanos = graft.util.Tables.t(spark, dir, "events")
    assert(viaNanos.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    val a = fixture.select("event_id", "ts")
      .orderBy("event_id").collect().toSeq
    val b = viaNanos.select("event_id", "ts")
      .orderBy("event_id").collect().toSeq
    assert(a === b)
  }

  test("non-events tables pass through untouched") {
    val df = graft.util.Tables.t(spark, sf, "orders")
    assert(df.columns.contains("o_orderkey"))
    assert(df.count() > 0)
  }
}
