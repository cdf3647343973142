package graft.crdt

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class OrSetSpec extends SparkSpec {
  import spark.implicits._

  private def ops(rows: (String, String, String, String, String, String, java.lang.Long, Map[String, Long])*): DataFrame =
    rows.toSeq.toDF("graph_iri", "subject", "predicate", "obj", "op", "actor",
      "counter", "witnessed")

  private def present(df: DataFrame): Set[(String, String, String, String)] =
    OrSet.fold(df).as[(String, String, String, String)].collect().toSet

  private val L: Long => java.lang.Long = java.lang.Long.valueOf

  test("remove deletes exactly the witnessed dots") {
    val log = ops(
      ("g", "s", "p", "o", "add", "a1", L(1), null),
      ("g", "s", "p", "o", "remove", null, null, Map("a1" -> 1L)))
    assert(present(log).isEmpty)
  }

  test("concurrent re-add wins over a remove that did not witness it") {
    val log = ops(
      ("g", "s", "p", "o", "add", "a1", L(1), null),
      ("g", "s", "p", "o", "add", "a2", L(1), null), // concurrent, unwitnessed
      ("g", "s", "p", "o", "remove", null, null, Map("a1" -> 1L)))
    assert(present(log) == Set(("g", "s", "p", "o")))
  }

  test("re-add after remove resurrects with a fresh counter") {
    val log = ops(
      ("g", "s", "p", "o", "add", "a1", L(1), null),
      ("g", "s", "p", "o", "remove", null, null, Map("a1" -> 1L)),
      ("g", "s", "p", "o", "add", "a1", L(2), null)) // counter 2 > witnessed 1
    assert(present(log) == Set(("g", "s", "p", "o")))
  }

  test("multi-actor witnessed clock covers all observed dots") {
    val log = ops(
      ("g", "s", "p", "o", "add", "a1", L(3), null),
      ("g", "s", "p", "o", "add", "a2", L(5), null),
      ("g", "s", "p", "o", "remove", null, null, Map("a1" -> 3L, "a2" -> 5L)))
    assert(present(log).isEmpty)
  }

  test("coverage is per-quad: a remove of one quad leaves others intact") {
    val log = ops(
      ("g", "s", "p", "o1", "add", "a1", L(1), null),
      ("g", "s", "p", "o2", "add", "a1", L(2), null),
      ("g", "s", "p", "o1", "remove", null, null, Map("a1" -> 9L)))
    assert(present(log) == Set(("g", "s", "p", "o2")))
  }

  test("replay idempotency: duplicating the whole log changes nothing") {
    val log = ops(
      ("g", "s", "p", "o", "add", "a1", L(1), null),
      ("g", "s", "p", "o", "add", "a2", L(1), null),
      ("g", "s2", "p", "o", "add", "a1", L(2), null),
      ("g", "s", "p", "o", "remove", null, null, Map("a1" -> 1L)))
    assert(present(log.union(log)) == present(log))
    assert(present(log) == Set(("g", "s", "p", "o"), ("g", "s2", "p", "o")))
  }
}
