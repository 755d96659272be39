package graft

import java.time.Instant

import graft.state.{FilterResolver, StateStore}
import graft.state.FilterResolver._
import graft.state.StateStore._

/** Golden tests for the reference's hardest semantics (SURVEY.md §7.4):
  * exclusive +1 s watermark bound, start-time watermark, 60 d clamp,
  * synthetic bootstrap, fixed estoques window, page-checkpoint state
  * machine. */
class StateSpec extends SparkSpec {

  private val now = Instant.parse("2024-06-15T08:00:00Z")

  test("s1: watermark read applies the exclusive +1 s bound") {
    val store = new StateStore(spark, tmpDir("state"))
    store.setWatermark("pedidos", Instant.parse("2024-06-10T12:00:00Z"))
    assert(store.watermarkExclusive("pedidos")
      === Some(Instant.parse("2024-06-10T12:00:01Z")))
    assert(store.rawWatermark("pedidos")
      === Some(Instant.parse("2024-06-10T12:00:00Z")))
  }

  test("s2: watermark upsert is last-writer-wins per process") {
    val store = new StateStore(spark, tmpDir("state"))
    store.setWatermark("a", Instant.parse("2024-01-01T00:00:00Z"))
    store.setWatermark("b", Instant.parse("2024-02-01T00:00:00Z"))
    store.setWatermark("a", Instant.parse("2024-03-01T00:00:00Z"))
    assert(store.rawWatermark("a") === Some(Instant.parse("2024-03-01T00:00:00Z")))
    assert(store.rawWatermark("b") === Some(Instant.parse("2024-02-01T00:00:00Z")))
  }

  test("s4: fresh watermark is used as-is") {
    val wm = Some(Instant.parse("2024-06-10T12:00:01Z"))
    val r = decide(wm, None, now)
    assert(r.filter === wm.get && r.source === FromWatermark
      && r.persistSynthetic.isEmpty)
  }

  test("w3: stale watermark clamps to now - 60 d") {
    val wm = Some(Instant.parse("2023-01-01T00:00:00Z"))
    val r = decide(wm, None, now)
    assert(r.filter === Instant.parse("2024-04-16T08:00:00Z")) // now-60d
    assert(r.source === FromWatermark)
  }

  test("s3: no watermark + data present => synthetic next-midnight, persisted") {
    val maxData = Some(Instant.parse("2024-06-01T17:30:45Z"))
    val r = decide(None, maxData, now)
    assert(r.filter === Instant.parse("2024-06-02T00:00:00Z"))
    assert(r.source === SyntheticFromData)
    assert(r.persistSynthetic === Some(Instant.parse("2024-06-02T00:00:00Z")))
  }

  test("s4: no watermark, no data => now - 60 d default") {
    val r = decide(None, None, now)
    assert(r.filter === Instant.parse("2024-04-16T08:00:00Z"))
    assert(r.source === DefaultWindow)
  }

  test("s4: estoques fixed window ignores watermark entirely") {
    val wm = Some(Instant.parse("2024-06-14T00:00:00Z"))
    val r = decide(wm, None, now, fixedWindowDays = Some(29))
    assert(r.filter === Instant.parse("2024-05-17T08:00:00Z")) // now-29d
    assert(r.source === FixedWindow)
  }

  test("s4 resolve: synthetic watermark is committed to the store") {
    val store = new StateStore(spark, tmpDir("state"))
    val maxData = Some(Instant.parse("2024-06-01T17:30:45Z"))
    val r = FilterResolver.resolve(store, "produtos", maxData, now)
    assert(r.source === SyntheticFromData)
    assert(store.rawWatermark("produtos")
      === Some(Instant.parse("2024-06-02T00:00:00Z")))
  }

  test("s5: progress upsert + state machine fields round-trip") {
    val store = new StateStore(spark, tmpDir("state"))
    store.upsertProgress(Progress("pedidos", "f1", 3, 10, 250L, StatusRunning))
    store.upsertProgress(Progress("produtos", "f1", 1, 2, 100L, StatusDone))
    store.upsertProgress(Progress("pedidos", "f1", 4, 10, 300L, StatusRunning))
    assert(store.getProgress("pedidos")
      === Some(Progress("pedidos", "f1", 4, 10, 300L, StatusRunning)))
    assert(store.getProgress("produtos")
      === Some(Progress("produtos", "f1", 1, 2, 100L, StatusDone)))
    assert(store.getProgress("nope") === None)
  }
}
