package graft.catalog

import graft.SparkSpec

/** Handle-range directory + allocation cursor (reference
  * `core/src/structs/handle_allocation.rs`; arms mirror its own tests at
  * `:167-274`). */
class HandleRangesSpec extends SparkSpec {
  import spark.implicits._

  private def dir(rows: Seq[(Long, String, String, Long, Long)]) =
    HandleRanges.directory(
      rows.toDF("sc_id", "range_id", "owner", "start", "end"))

  test("disjoint grants survive with granted_to positions") {
    // handle_allocation.rs:195-205 disjoint_grants_work
    val out = dir(Seq((1L, "r1", "a", 1L, 1025L), (1L, "r2", "a", 1025L, 2049L)))
      .collect().map(r => r.getString(1) ->
        ((r.getBoolean(6), r.get(7)))).toMap
    assert(out("r1") == ((false, 1L)))
    assert(out("r2") == ((false, 2L)))
  }

  test("overlap fails closed on both ids, order-independent") {
    // handle_allocation.rs:207-217 overlap_fails_closed
    val out = dir(Seq((1L, "r1", "a", 1L, 1025L), (1L, "r2", "a", 512L, 2049L)))
      .collect()
    assert(out.forall(_.getBoolean(6)))
    assert(out.forall(_.isNullAt(7)))
  }

  test("same-id divergence conflicts and still occupies the span") {
    // handle_allocation.rs:219-230 divergence_occupies_span
    val ranges = Seq(
      (1L, "r1", "a", 3L, 1027L), (1L, "r1", "a", 1027L, 2051L),
      (1L, "r2", "a", 1500L, 2500L))
      .toDF("sc_id", "range_id", "owner", "start", "end")
    val d = HandleRanges.directory(ranges).collect()
    assert(d.length == 3 && d.forall(_.getBoolean(6)))
    val spans = Seq((1L, 0L, 3L, 3L + 4 * 1024L))
      .toDF("sc_id", "span_idx", "span_start", "span_end")
    val free = HandleRanges.freeBand(ranges, spans).collect()
    assert(free.head.getLong(1) == 3075L && free.head.getLong(2) == 4099L)
  }

  test("cursor draws skip reserved first handles and empty ranges") {
    // handle_allocation.rs:232-247 cursor_skips_gaps + :262-274 bounded
    val drawn = HandleRanges.draws(Seq(
        (1L, "lo", "a", 3L, 6L), (1L, "hi", "a", 2049L, 2052L),
        (1L, "res", "a", 7L, 8L)) // single-handle: reserved only
      .toDF("sc_id", "range_id", "owner", "start", "end"))
      .orderBy("seq").collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(drawn.toSeq == Seq((1L, 4L), (2L, 5L), (3L, 2050L), (4L, 2051L)))
  }

  test("cursor never draws outside the 20-bit handle space " +
    "(handle_allocation.rs:145 PlacementHandle::new rejection)") {
    val top = BandPools.HandleSpaceEnd // 1048576
    val drawn = HandleRanges.draws(Seq(
        (1L, "straddle", "a", top - 3L, top + 5L), // 2 in-space handles
        (1L, "above", "a", top + 100L, top + 200L)) // none
      .toDF("sc_id", "range_id", "owner", "start", "end"))
      .orderBy("seq").collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(drawn.toSeq == Seq((1L, top - 2L), (2L, top - 1L)))
  }

  test("free band honors span listing order") {
    val ranges = Seq((1L, "r1", "a", 3L, 1027L))
      .toDF("sc_id", "range_id", "owner", "start", "end")
    // upper span listed first and free -> wins over the free lower band
    val spans = Seq((1L, 0L, 2051L, 3075L), (1L, 1L, 1027L, 2051L))
      .toDF("sc_id", "span_idx", "span_start", "span_end")
    val free = HandleRanges.freeBand(ranges, spans).collect()
    assert(free.head.getLong(1) == 2051L)
  }
}
