package graft

import graft.cdc.CdcController
import graft.cdc.CdcController._
import org.scalatest.funsuite.AnyFunSuite

/** Lifecycle transitions mirroring the reference's controller suite
  * (`src/test/unit/cdcController.test.ts`).
  */
class ControllerSpec extends AnyFunSuite {

  test("enriches emitted events with offsets and tracks metrics") {
    val c = new CdcController[String]("LOG_BASED", Some("cdc.widgets"))
    val enriched = c.emit(Seq("evt-1"))
    assert(enriched.head._1 === 0L, "first offset is 0")
    assert(c.snapshotMetrics === ((1L, 0L, 1L)), "produced 1, backlog 1")

    val drained = c.consume(1)
    assert(drained.map(_._2) === Seq("evt-1"))
    assert(c.snapshotMetrics === ((1L, 1L, 0L)), "consumed 1, backlog 0")

    c.stop()
    assert(c.snapshotMetrics === ((0L, 0L, 0L)), "stop resets counters")
    assert(c.consume(10).isEmpty, "stop resets the topic queue")
  }

  test("handles pause and resume transitions") {
    var snapshotted = 0
    val c = new CdcController[String]("QUERY_BASED", Some("cdc.playground"),
      ModeHandlers[String](
        startSnapshot = (_, emit) => { snapshotted += 1; emit(Seq("seed")) },
        startTailing = _ => ()))

    c.startSnapshot(Seq.empty)
    assert(c.currentState === Snapshotting)
    assert(snapshotted === 1)
    c.startSnapshot(Seq.empty)
    assert(snapshotted === 1, "startSnapshot only fires from IDLE")

    c.startTailing()
    assert(c.currentState === Tailing)

    c.pause()
    assert(c.currentState === Paused)
    assert(!c.gate.isOpen, "pause closes the consumer gate")
    c.pause()
    assert(c.currentState === Paused, "pause is idempotent from PAUSED")

    c.resume()
    assert(c.currentState === Tailing)
    assert(c.gate.isOpen, "resume reopens the gate")

    c.stop()
    assert(c.currentState === Idle)
  }

  test("pause outside TAILING and resume outside PAUSED are no-ops") {
    val c = new CdcController[String]("LOG_BASED")
    assert(c.topicName === "cdc.log_based")
    c.pause()
    assert(c.currentState === Idle, "IDLE cannot pause")
    c.resume()
    assert(c.currentState === Idle, "IDLE cannot resume")
    c.startSnapshot(Seq.empty)
    c.pause()
    assert(c.currentState === Snapshotting, "SNAPSHOTTING cannot pause")
    c.startTailing()
    c.stop()
    assert(c.currentState === Idle, "stop returns to IDLE from any state")
  }

  test("gate guard skips batches while paused") {
    val c = new CdcController[String]("LOG_BASED")
    var applied = 0
    val body: (org.apache.spark.sql.Dataset[String], Long) => Unit = (_, _) => applied += 1
    val guarded = c.gate.guard(body)
    c.startTailing()
    guarded(null, 0L)
    c.pause()
    guarded(null, 1L)
    c.resume()
    guarded(null, 2L)
    assert(applied === 2, "the paused batch was skipped")
  }
}
