package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphsSpec extends SparkSpec {
  import spark.implicits._

  test("pagerank: 2-cycle fixed point, mass conserved without dangling nodes") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val pr = Graphs.pageRank(edges, damping = 0.85, iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // the uniform vector is the exact fixed point of a cycle
    assert(math.abs(pr(1L) - 0.5) < 1e-12 && math.abs(pr(2L) - 0.5) < 1e-12,
      s"cycle fixed point: $pr")
    assert(math.abs(pr.values.sum - 1.0) < 1e-9, s"mass leaked: ${pr.values.sum}")
  }

  test("pagerank: hub receives more than spokes, sink-free star closed form") {
    // 1->3, 2->3, 3->1: node 3 is the hub; one iteration from uniform 1/3:
    //   pr(3) = 0.05 + 0.85*(1/3 + 1/3), pr(1) = 0.05 + 0.85/3, pr(2) = 0.05
    val edges = Seq((1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val pr = Graphs.pageRank(edges, damping = 0.85, iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(pr(3L) - (0.05 + 0.85 * 2.0 / 3.0)) < 1e-12, s"hub: $pr")
    assert(math.abs(pr(1L) - (0.05 + 0.85 / 3.0)) < 1e-12, s"spoke-with-in: $pr")
    assert(math.abs(pr(2L) - 0.05) < 1e-12, s"no-in-edge node keeps teleport only: $pr")
    assert(pr(3L) > pr(1L) && pr(1L) > pr(2L), s"authority ordering: $pr")
  }

  test("triangles: direction/duplicates/self-loops ignored, shared edge counts twice") {
    // K3 {1,2,3} plus triangle {2,3,4}: edge 2-3 is shared; noise rows
    // (reverse duplicates, a self-loop, a dangling edge) must not count
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),     // triangle 1
      (3L, 2L),                         // reverse duplicate of 2-3
      (2L, 4L), (4L, 3L),               // triangle 2 via shared 2-3
      (5L, 5L),                         // self-loop
      (1L, 9L))                         // dangling edge, no triangle
      .toDF("src", "dst")
    val got = Graphs.triangleCounts(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L),
      s"triangle counts wrong: $got")
  }

  test("bfs: line graph distances, hop budget cuts, unreachable absent") {
    graft.Caches.release()
    // 0→1→2→…→9 plus an isolated island 100→101
    val edges = ((0L to 8L).map(i => (i, i + 1)) :+ (100L, 101L))
      .toDF("src", "dst")
    val got = Graphs.bfsHops(edges, Seq(0L).toDF("node"), maxDepth = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == (0 to 4).map(i => i.toLong -> i).toMap,
      s"line-graph distances wrong: $got")
  }

  test("bfs: multi-source takes the minimum; direction respected") {
    graft.Caches.release()
    // ring 0→1→2→3→4→0; seeds {0, 3}: node 2 is 2 hops (from 0), not 4
    val edges = (0L to 4L).map(i => (i, (i + 1) % 5)).toDF("src", "dst")
    val got = Graphs.bfsHops(edges, Seq(0L, 3L).toDF("node"), maxDepth = 5)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 0, 4L -> 1),
      s"multi-source min wrong: $got")
    // each node appears exactly once (frontier discovers once)
    val rows = Graphs.bfsHops(edges, Seq(0L, 3L).toDF("node"), maxDepth = 5)
    assert(rows.count() == rows.select("node").distinct().count())
  }

  test("shortest paths: cheaper two-hop beats direct edge; hop bound respects horizon") {
    graft.Caches.release()
    // 0→1 (5), 1→2 (1), 0→2 (7): best path to 2 is 6 via 1, needs 2 rounds
    val edges = Seq((0L, 1L, 5L), (1L, 2L, 1L), (0L, 2L, 7L))
      .toDF("src", "dst", "w")
    def run(r: Int) = Graphs.shortestPaths(edges, Seq(0L).toDF("node"), r)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(run(1) == Map(0L -> 0L, 1L -> 5L, 2L -> 7L),
      "one round sees only the direct edge")
    assert(run(2) == Map(0L -> 0L, 1L -> 5L, 2L -> 6L),
      "two rounds relax through the cheaper two-hop path")
  }
}
