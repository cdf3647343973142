package graft.catalog

import graft.SparkSpec

class TaskTimersSpec extends SparkSpec {
  import spark.implicits._

  test("timer fold: reset overwrites later, shorten only earlier, cancel " +
    "deletes, durable keys never persist (task_persistence.rs:15-155)") {
    val log = Seq(
      // k1: reset 100 -> shorten 150 ignored -> shorten 80 applies
      ("k1", false, "reset", 100L, 1L),
      ("k1", false, "shorten", 150L, 2L),
      ("k1", false, "shorten", 80L, 3L),
      // k2: reset to a LATER due overwrites
      ("k2", false, "reset", 100L, 1L),
      ("k2", false, "reset", 500L, 2L),
      // k3: cancel wipes everything before it
      ("k3", false, "reset", 100L, 1L),
      ("k3", false, "cancel", 0L, 2L),
      // k4: shorten with nothing stored writes
      ("k4", false, "shorten", 70L, 1L),
      // k5: durable -> reset/shorten never persist
      ("k5", true, "reset", 100L, 1L),
      ("k5", true, "shorten", 50L, 2L),
      // k6: cancel then a new shorten re-creates
      ("k6", false, "reset", 10L, 1L),
      ("k6", false, "cancel", 0L, 2L),
      ("k6", false, "shorten", 99L, 3L)
    ).toDF("key", "durable", "kind", "due_at_ms", "seq")
    val m = TaskTimers.fold(log).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("k1" -> 80L, "k2" -> 500L, "k4" -> 70L, "k6" -> 99L))
  }
}
