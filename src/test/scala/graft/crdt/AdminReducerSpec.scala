package graft.crdt

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

import scala.collection.mutable

/** Pins [[AdminReducer.frontier]] against a literal sequential
  * re-implementation of the reference's `reduce_value` fold
  * (`core/src/admin_document_reducer.rs:1371-1519`) applied in log order,
  * plus hand-built concurrency cases. */
class AdminReducerSpec extends SparkSpec {
  import spark.implicits._

  private case class Dot(pos: Long, oidx: Int, seq: Long)
  private case class AdmEv(pos: Long, doc: Long, path: String, oidx: Int,
      seq: Long, obs: Vector[Long], value: Option[String])

  /** The sequential MV-register fold, one state per (doc, path) — a direct
    * transcription of reduce_value / event_is_stale_for_path /
    * remove_conflict_values_superseded_by. */
  private class SeqDoc {
    val version = mutable.Map[String, Option[(Option[String], Set[Dot])]]()
    val conflicts = mutable.Map[String, mutable.ListBuffer[(Option[String], Dot)]]()

    private def observes(e: AdmEv, d: Dot): Boolean =
      e.obs(d.oidx) >= d.seq || (e.oidx == d.oidx && e.seq > d.seq)

    private def stale(e: AdmEv): Boolean = {
      def sameOriginAtOrAfter(d: Dot) = d.oidx == e.oidx && d.seq >= e.seq
      version.get(e.path).flatten.exists(_._2.exists(sameOriginAtOrAfter)) ||
        conflicts.get(e.path).exists(_.exists(v => sameOriginAtOrAfter(v._2)))
    }

    def apply(e: AdmEv): Unit = {
      val path = e.path
      if (stale(e)) return
      conflicts.get(path).foreach { buf =>
        buf.filterInPlace(v => !observes(e, v._2))
        if (buf.isEmpty) conflicts.remove(path)
      }
      val dot = Dot(e.pos, e.oidx, e.seq)
      if (conflicts.contains(path)) {
        val buf = conflicts(path)
        if (!buf.exists(_._2 == dot)) buf += ((e.value, dot))
        val sorted = buf.sortBy(_._2.pos); buf.clear(); buf ++= sorted
        if (buf.forall(_._1 == e.value)) {
          version(path) = Some((e.value, buf.map(_._2).toSet))
          conflicts.remove(path)
        } else version(path) = None
      } else version.get(path).flatten match {
        case None => version(path) = Some((e.value, Set(dot)))
        case Some((cur, dots)) =>
          val unobserved = dots.filter(d => !observes(e, d))
          if (unobserved.isEmpty) version(path) = Some((e.value, Set(dot)))
          else if (cur != e.value) {
            val buf = conflicts.getOrElseUpdate(path, mutable.ListBuffer())
            unobserved.foreach(d => if (!buf.exists(_._2 == d)) buf += ((cur, d)))
            if (!buf.exists(_._2 == dot)) buf += ((e.value, dot))
            val sorted = buf.sortBy(_._2.pos); buf.clear(); buf ++= sorted
            version(path) = None
          } else version(path) = Some((e.value, unobserved + dot))
      }
    }
  }

  private val Removed = "<removed>"

  /** (doc, path) -> (conflicted, n, value, repPos, candidates) */
  private def seqFold(log: Seq[AdmEv]): Map[(Long, String), (Boolean, Long, Option[String], Option[Long], Option[String])] = {
    val docs = mutable.Map[Long, SeqDoc]()
    log.foreach(e => docs.getOrElseUpdate(e.doc, new SeqDoc).apply(e))
    docs.flatMap { case (doc, st) =>
      val conv = st.version.collect { case (path, Some((v, dots))) =>
        (doc, path) -> ((false, dots.size.toLong, v, Some(dots.map(_.pos).min), Option.empty[String]))
      }
      val conf = st.conflicts.map { case (path, buf) =>
        (doc, path) -> ((true, buf.size.toLong, Option.empty[String], Option.empty[Long],
          Some(buf.map(v => s"${v._2.pos}:${v._2.oidx}:${v._2.seq}:${v._1.getOrElse(Removed)}")
            .mkString(","))))
      }
      conv ++ conf
    }.toMap
  }

  private def toDf(log: Seq[AdmEv]): DataFrame =
    log.map(e => (e.pos, e.doc, e.path, e.oidx, e.seq,
        e.obs(0), e.obs(1), e.obs(2), e.value.orNull))
      .toDF("pos", "doc", "path", "oidx", "seq", "obs0", "obs1", "obs2", "value")

  private def run(log: Seq[AdmEv]): Map[(Long, String), (Boolean, Long, Option[String], Option[Long], Option[String])] =
    AdminReducer.frontier(toDf(log)).collect().map { r =>
      (r.getLong(0), r.getString(1)) ->
        ((r.getBoolean(2), r.getLong(3), Option(r.getString(4)),
          if (r.isNullAt(5)) None else Some(r.getLong(5)), Option(r.getString(6))))
    }.toMap

  /** Causally-consistent generated log: clocks are strictly-prior applied
    * counts minus a 0..2 hold-back, so observed never covers the future. */
  private def genLog(n: Int): Seq[AdmEv] = {
    val cnt = mutable.Map[(Long, Int), Long]().withDefaultValue(0L)
    val seq = mutable.Map[(Long, Int), Long]().withDefaultValue(0L)
    (0 until n).map { i =>
      val doc = (i * 7L + 3) % 5
      val path = "p" + (i % 3)
      val oidx = (i / 3) % 3 // decorrelated from path = i % 3
      val obs = Vector.tabulate(3)(j => math.max(0L, cnt((doc, j)) - (i + j) % 7))
      val s = seq((doc, oidx)) + 1
      seq((doc, oidx)) = s
      cnt((doc, oidx)) = cnt((doc, oidx)) + 1
      val value = if (i % 7 == 0) None else Some("v" + ((i / 2) % 2))
      AdmEv(i.toLong, doc, path, oidx, s, obs, value)
    }
  }

  test("frontier equals the sequential reduce_value fold on a causal log") {
    val log = genLog(600)
    val expected = seqFold(log)
    val got = run(log)
    assert(got == expected)
    // the fixture actually exercises both arms
    assert(expected.values.exists(_._1), "no conflicts generated")
    assert(expected.values.exists(v => !v._1 && v._2 > 1),
      "no equal-value merges generated")
    assert(expected.values.exists(v => !v._1 && v._3.isEmpty),
      "no converged removals generated")
  }

  test("concurrent differing writes surface a dot-sorted conflict") {
    val log = Seq(
      AdmEv(1, 0, "p", 0, 1, Vector(0, 0, 0), Some("a")),
      AdmEv(2, 0, "p", 1, 1, Vector(0, 0, 0), Some("b")))
    assert(run(log) == Map((0L, "p") ->
      ((true, 2L, None, None, Some("1:0:1:a,2:1:1:b")))))
  }

  test("concurrent equal writes merge dots; representative is the min dot") {
    val log = Seq(
      AdmEv(1, 0, "p", 0, 1, Vector(0, 0, 0), Some("a")),
      AdmEv(2, 0, "p", 1, 1, Vector(0, 0, 0), Some("a")))
    assert(run(log) == Map((0L, "p") -> ((false, 2L, Some("a"), Some(1L), None))))
  }

  test("an observer that covers both sides resolves the conflict") {
    val log = Seq(
      AdmEv(1, 0, "p", 0, 1, Vector(0, 0, 0), Some("a")),
      AdmEv(2, 0, "p", 1, 1, Vector(0, 0, 0), None), // concurrent removal
      AdmEv(3, 0, "p", 2, 1, Vector(1, 1, 0), Some("c")))
    assert(run(log) == Map((0L, "p") -> ((false, 1L, Some("c"), Some(3L), None))))
  }

  test("a converged removal reports a null value, not a missing row") {
    val log = Seq(
      AdmEv(1, 0, "p", 0, 1, Vector(0, 0, 0), Some("a")),
      AdmEv(2, 0, "p", 1, 1, Vector(1, 0, 0), None))
    assert(run(log) == Map((0L, "p") -> ((false, 1L, None, Some(2L), None))))
  }
}
