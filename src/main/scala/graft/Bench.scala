package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): one JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * One untimed warm-up sweep first (JIT + codegen + parquet footer caches),
  * then per gate the MINIMUM over `passes` timed samples taken in TWO
  * decorrelated windows: one "scatter" sweep over the whole suite (one
  * sample per gate) followed by one consecutive "floor" visit per gate
  * (the remaining passes-1 samples back-to-back). The minimum is the
  * standard robust estimator for "what the code costs when the machine
  * cooperates" (the steady-state number the reference's gates also
  * measure). Why two windows: purely CONSECUTIVE samples share one noisy
  * scheduling window, so a 100 ms stall poisons every sample of a
  * sub-second gate at once — the mechanism behind round 10's 23 phantom
  * >25% "regressions"; purely SWEPT samples lose the consecutive-visit
  * warmth (page cache / JIT locality) and shifted sub-second gates +40%
  * while ≥5 s gates stayed flat (round-11 A/B, BENCH_NOTES) — a harness
  * artifact, not operator cost. The scatter sample protects against a
  * stalled floor window; the floor pair preserves the warm steady-state
  * metric ten rounds of artifacts are calibrated on.
  */
object Bench {

  val TimedPasses = 3
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // dev-only (scale probes): fewer timed passes; the driver never sets it
    val passes = sys.env.get("SPARK_GRAFT_PASSES").map(_.toInt).getOrElse(TimedPasses)
    // the driver contract is local[32]; the env override exists for dev runs
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      // rank-limit windows (heads, pages, queue probes) must rewrite to
      // map-side WindowGroupLimits; the default threshold (1000) is below
      // the 8192 queue-probe scan cap (QueueLag.PageSize*PageLimit)
      .config("spark.sql.optimizer.windowGroupLimitThreshold", "16384")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // dev-only: SPARK_GRAFT_ONLY=dd2,or1 restricts the suite for iteration,
    // SPARK_GRAFT_SKIP excludes gates (scale probes drop the by-contract
    // quadratics); the driver never sets either, so the official run is
    // always the full set
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val skip = sys.env.get("SPARK_GRAFT_SKIP").map(_.split(",").toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(f => f.exists(n.startsWith)))
      .filter(n => !skip.exists(f => f.exists(n.startsWith)))
    // Round-6 lesson: a gate that THROWS times as a near-zero "fast" gate if
    // the exception is silently swallowed (the regenerated events schema
    // broke all 16 ev* gates and the bench reported them at 0.04 s). Track
    // failures explicitly — they surface on stderr AND in the output JSON.
    val failed = scala.collection.mutable.LinkedHashMap[String, String]()
    // warm-up: run everything once untimed
    names.foreach { name =>
      try { SparkEntry.queries(name)(spark, sfDir).count(); () }
      catch { case e: Throwable =>
        failed(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
      // Round-7 lesson: 290 gates x 4 passes in ONE JVM accumulated every
      // gate's tracked persists/broadcasts (Caches is drained lazily at the
      // next SPARQL/pipeline entry point, which most gate families never
      // hit) — block-manager pressure built up over the 16-minute suite and
      // inflated late-alphabet gates 2-13x vs isolation in the driver's
      // official r7 run. Drain after EVERY invocation (outside the timed
      // region): the one-query-in-flight contract holds here by
      // construction, and a released block recomputes from lineage.
      graft.Caches.release()
    }
    val best = scala.collection.mutable.LinkedHashMap[String, Double]()
    def sample(name: String): Unit = {
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).count(); () }
      catch { case e: Throwable =>
        failed.getOrElseUpdate(name,
          Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
      }
      val dt = (System.nanoTime() - t0) / 1e9
      graft.Caches.release() // untimed: see warm-up note
      best.updateWith(name)(p => Some(p.fold(dt)(math.min(_, dt))))
    }
    // scatter sweep: one decorrelated sample per gate
    names.foreach(sample)
    // floor visit: the remaining passes-1 samples back-to-back per gate
    names.foreach { name => (2 to passes).foreach(_ => sample(name)) }
    val results = names.map(n => n -> best(n))
    failed.foreach { case (n, msg) =>
      System.err.println(s"BENCH QUERY FAILED: $n — $msg")
    }
    def f3(v: Double): String = f"$v%.3f"
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val (worstName, worstSec) = results.maxBy(_._2)
    // Per-query time budgets (sf0.1, 3x headroom over the round-5 numbers,
    // 0.5 s floor): a silent multi-x regression — like round 4's unexplained
    // sp23/24/25 slowdown, which turned out not to reproduce off the shared
    // box — now fails loudly in the bench output instead of surfacing a
    // round later in the judge's diff. Budgets apply at the driver's
    // official sf0.1 scale AND (round 12) at the sf10 100x-scale probe AND
    // (round 13) at the sf1 10x probe via sibling budget files — every
    // scale artifact gets the same ratchet; other SF dirs (dev sf0.01
    // runs) have no calibrated numbers.
    val budgetPath =
      if (sfDir.endsWith("sf0.1")) Some("tools/bench_budget.json")
      else if (sfDir.endsWith("sf10")) Some("tools/bench_budget_sf10.json")
      else if (sfDir.endsWith("sf1")) Some("tools/bench_budget_sf1.json")
      else None
    val suspected: Seq[(String, Double, Double)] =
      if (budgetPath.isEmpty) Nil
      else scala.util.Try {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(budgetPath.get)), "UTF-8")
        val entry = """"([^"]+)"\s*:\s*([0-9.]+)""".r
        entry.findAllMatchIn(txt).map(m => m.group(1) -> m.group(2).toDouble).toMap
      }.toOption.map { budgets =>
        results.collect { case (k, v) if budgets.get(k).exists(v > _) =>
          (k, v, budgets(k))
        }
      }.getOrElse(Nil)
    // Round-8 lesson: a breach on a tight budget can be pure box noise in a
    // single timed window (q9: honest 0.31 s, budget 0.7, one driver sample
    // 1.11 s). Re-measure every suspect at the END of the suite — min of
    // three fresh passes, post-drain, warm JIT — and report only breaches
    // that REPRODUCE. A real regression reproduces; a noise spike does not.
    val overBudget: Seq[(String, Double, Double)] = suspected.flatMap {
      case (k, v, b) =>
        val retest = (1 to math.max(passes, 3)).map { _ =>
          val t0 = System.nanoTime()
          try { SparkEntry.queries(k)(spark, sfDir).count(); () }
          catch { case _: Throwable => () } // already recorded in `failed`
          val dt = (System.nanoTime() - t0) / 1e9
          graft.Caches.release()
          dt
        }.min
        if (retest > b) Some((k, math.min(v, retest), b))
        else {
          System.err.println(
            f"BENCH BUDGET NOISE: $k suite-pass $v%.3f s > budget $b%.2f s, " +
              f"but retest min $retest%.3f s is inside — not a regression")
          None
        }
    }
    overBudget.foreach { case (k, v, b) =>
      System.err.println(f"BENCH BUDGET EXCEEDED: $k took $v%.3f s (budget $b%.2f s)")
    }
    val overJson = overBudget.map { case (k, v, _) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val full =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(full)
    // The harness that records this run keeps only the LAST ~2000 chars of
    // output, and the line above is longer than that — its head (including
    // "value") gets truncated away. Repeat the headline numbers in a short
    // trailing line so the total always survives the tail window, and
    // persist the full JSON to a file in the working directory for
    // offline inspection.
    val failJson = failed.keys.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Per-query visibility inside the ~2000-char tail window (r14,
    // additions-only): the full alphabetical line above is longer than the
    // window, so only the z-end of the suite used to survive into the
    // driver's capture. Emit the HOT gates — sorted by time descending, as
    // many as fit ~1500 chars — right before the headline so the expensive
    // gates (the ones round-over-round comparison cares about) are always
    // in the tail. The full line and bench_local.json keep the complete set.
    val hotBudget = 1500
    val hotEntries = results.sortBy(-_._2).iterator
      .map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .scanLeft(("", 0)) { case ((_, len), e) => (e, len + e.length + 1) }
      .drop(1).takeWhile(_._2 <= hotBudget).map(_._1).toSeq
    println(s"""{"metric":"hot","n":${hotEntries.size},"queries":${hotEntries.mkString("{", ",", "}")}}""")
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","n_queries":${results.size},"n_failed":${failed.size},"failed":$failJson,"worst":{"$worstName":${f3(worstSec)}},"over_budget":$overJson,"sf":"$sfDir","detail":"bench_local.json"}""")
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_local.json"),
      (full + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => } // never fail the run over a local dump
    spark.stop()
  }
}
