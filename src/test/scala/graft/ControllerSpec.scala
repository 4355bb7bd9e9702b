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

  test("controller drives a real StreamingQuery: tail, pause, resume, stop") {
    val spark = SparkSpec.session
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[String]
    val applied = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    var query: org.apache.spark.sql.streaming.StreamingQuery = null
    val c = new CdcController[String]("LOG_BASED", Some("cdc.stream"),
      ModeHandlers[String](
        startTailing = _ => (), // query started below once the gate exists
        stop = () => if (query != null) query.stop()))
    query = input.toDS().writeStream
      .outputMode("append")
      .foreachBatch(c.gate.guard[String]((ds, _) => ds.collect().foreach(applied.add)))
      .start()
    c.startTailing()

    input.addData("a", "b")
    query.processAllAvailable()
    assert(applied.size === 2)

    // pause is LOSSLESS: the gate holds the in-flight batch (offsets not
    // committed) until resume — nothing applies while paused, nothing drops
    c.pause()
    input.addData("c")
    // Observe from the helper thread, assert from the main thread: a failed
    // assert inside the thread would skip c.resume() and leave
    // processAllAvailable() blocked forever (suite hang, not a red test).
    val sizeWhilePaused = new java.util.concurrent.atomic.AtomicInteger(-1)
    val resumer = new Thread(() => {
      try {
        Thread.sleep(400)
        sizeWhilePaused.set(applied.size)
      } finally c.resume()
    })
    resumer.start()
    query.processAllAvailable() // blocks on the held batch until resume
    resumer.join()
    assert(sizeWhilePaused.get === 2, "held batch must not apply while paused")
    assert(applied.toArray.toSet === Set("a", "b", "c"),
      "the paused batch applied after resume — no data lost")

    c.stop()
    assert(!query.isActive, "stop() handler stopped the StreamingQuery")
    assert(c.currentState === Idle)
  }

  test("gate guard holds batches while paused, releases them on resume") {
    val c = new CdcController[String]("LOG_BASED")
    @volatile var applied = 0
    val body: (org.apache.spark.sql.Dataset[String], Long) => Unit = (_, _) => applied += 1
    val guarded = c.gate.guard(body)
    c.startTailing()
    guarded(null, 0L)
    assert(applied === 1)
    c.pause()
    val t = new Thread(() => guarded(null, 1L)) // held, not dropped
    t.start()
    Thread.sleep(200)
    assert(applied === 1, "batch must wait while the gate is closed")
    c.resume()
    t.join(2000)
    assert(applied === 2, "held batch ran after resume")
  }
}
