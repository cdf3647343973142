package graft.sparql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Property-path evaluation (`GraphPattern::Path`, reference handle.rs:4893).
  *
  * Paths evaluate over an edge DataFrame of ENCODED terms — each endpoint is
  * one string `kindvaluelangdatatype` — so closure rounds
  * join on flat string keys (cheap shuffles, simple plans) and only the
  * final variable binding decodes back to term structs.
  *
  *  - link: predicate scan; inverse: swap; sequence: midpoint join;
  *    alternation: union-distinct.
  *  - `p+`: transitive closure — path *doubling* (⌈log₂ d⌉ rounds) while the
  *    accumulated pair set is small, falling back to frontier⋈base rounds
  *    (which shuffle only novel pairs) once it grows; a driver-side fixpoint
  *    producing DataFrames (SURVEY §4, the GraphFrames approach). Rounds are
  *    capped to bound adversarial cycles.
  *  - `p*`/`p?` add reflexive pairs over the path's own node domain (SPARQL's
  *    zero-length path over all graph terms, narrowed to connected nodes).
  */
object PathCompiler {

  val MaxClosureRounds = 64

  /** Above this pair count, stop doubling (acc⋈acc intermediate can blow up
    * cubically on long chains) and extend one hop at a time instead. */
  val DoublingMaxPairs = 100000L

  private val Sep = ""

  private def enc(kind: Column, value: Column, lang: Column, dt: Column): Column =
    concat_ws(Sep, kind.cast("string"), value, coalesce(lang, lit("")), coalesce(dt, lit("")))

  private def encTerm(t: Term): String =
    Seq(t.kind.toString, t.value, t.lang, t.datatype).mkString(Sep)

  private def decode(c: Column): Column = {
    val parts = split(c, Sep, 4)
    struct(element_at(parts, 1).cast("int").as("kind"),
      element_at(parts, 2).as("value"),
      element_at(parts, 3).as("lang"),
      element_at(parts, 4).as("datatype"))
  }

  /** Compile a path to an edge DF with encoded string columns (s, o). */
  def edges(quads: DataFrame, path: PathExpr,
      graph: Option[TermPattern]): DataFrame = path match {
    case PLink(iri) =>
      var df = quads.filter(col("predicate") === iri)
      graph match {
        case Some(TConst(c)) => df = df.filter(col("graph_iri") === c.value)
        case _ =>
      }
      val out = df.select(
        enc(col("subject_kind"), col("subject"), lit(""), lit("")).as("s"),
        enc(col("obj_kind"), col("obj_value"), col("obj_lang"), col("obj_datatype")).as("o"))
      if (graph.isEmpty) out.dropDuplicates() else out
    case PInverse(p) =>
      edges(quads, p, graph).select(col("o").as("s"), col("s").as("o"))
    case PSeq(l, r) =>
      val a = edges(quads, l, graph).select(col("s"), col("o").as("m"))
      val b = edges(quads, r, graph).select(col("s").as("m2"), col("o"))
      a.join(b, a("m") === b("m2")).select(col("s"), col("o")).dropDuplicates()
    case PAlt(l, r) =>
      edges(quads, l, graph).toDF("s", "o")
        .union(edges(quads, r, graph).toDF("s", "o")).dropDuplicates()
    case POneOrMore(p) => closure(edges(quads, p, graph))
    case PZeroOrMore(p) =>
      val base = edges(quads, p, graph)
      closure(base).toDF("s", "o")
        .union(reflexive(base).toDF("s", "o")).dropDuplicates()
    case PZeroOrOne(p) =>
      val base = edges(quads, p, graph)
      base.toDF("s", "o").union(reflexive(base).toDF("s", "o")).dropDuplicates()
  }

  /** zero-length pairs over the path's node domain. */
  private def reflexive(base: DataFrame): DataFrame =
    base.select(col("s").as("n"))
      .union(base.select(col("o").as("n")))
      .dropDuplicates()
      .select(col("n").as("s"), col("n").as("o"))

  /** lineage barrier: a fresh LogicalRDD with no inherited constraints
    * (localCheckpoint carries origin constraints that break Union's
    * constraint rewrite in Spark 4.1). The RDD is cached since each round
    * reuses it; the caller unpersists superseded rounds. */
  private def barrier(df: DataFrame): (DataFrame, org.apache.spark.rdd.RDD[_]) = {
    val rdd = df.rdd.cache()
    (df.sparkSession.createDataFrame(rdd, df.schema), rdd)
  }

  /** transitive closure fixpoint. Doubling phase: after k rounds `acc` holds
    * every path of length ≤ 2^k — ⌈log₂ d⌉ rounds for diameter d, ideal for
    * small/medium pair sets where per-job overhead dominates. Past
    * [[DoublingMaxPairs]] the acc⋈acc intermediate (Σ indeg·outdeg over
    * midpoints) can dwarf the closure itself, so large sets extend one hop
    * per round (frontier⋈base, shuffling only novel pairs). */
  def closure(base0: DataFrame,
      doublingMaxPairs: Long = DoublingMaxPairs): DataFrame = {
    var (acc, accRdd) = barrier(base0.dropDuplicates())
    val base = acc
    val baseRdd = accRdd
    var count = acc.count()
    var frontier = acc
    var frontierRdd: org.apache.spark.rdd.RDD[_] = null
    var rounds = 0
    var done = count == 0
    while (!done && rounds < MaxClosureRounds) {
      val extended =
        if (count <= doublingMaxPairs)
          acc.as("a").join(acc.as("b"), col("a.o") === col("b.s"))
            .select(col("a.s").as("s"), col("b.o").as("o"))
        else
          frontier.as("f").join(base.as("b"), col("f.o") === col("b.s"))
            .select(col("f.s").as("s"), col("b.o").as("o"))
      val (next, nextRdd) = barrier(acc.union(extended).dropDuplicates())
      val nextCount = next.count()
      if (nextCount == count) {
        nextRdd.unpersist(blocking = false)
        done = true
      } else {
        val (novel, novelRdd) = barrier(next.join(acc, Seq("s", "o"), "left_anti"))
        if (frontierRdd != null) frontierRdd.unpersist(blocking = false)
        if (accRdd ne baseRdd) accRdd.unpersist(blocking = false)
        frontier = novel
        frontierRdd = novelRdd
        acc = next
        accRdd = nextRdd
        count = nextCount
        rounds += 1
      }
    }
    if (frontierRdd != null) frontierRdd.unpersist(blocking = false)
    acc
  }

  /** Bind a compiled path into a solution DataFrame for (s, path, o). */
  def compile(quads: DataFrame, s: TermPattern, path: PathExpr, o: TermPattern,
      graph: Option[TermPattern]): DataFrame = {
    val e = edges(quads, path, graph)
    (s, o) match {
      case (TVar(vs), TVar(vo)) if vs == vo =>
        e.filter(col("s") === col("o")).select(decode(col("s")).as(vs))
      case (TVar(vs), TVar(vo)) =>
        e.select(decode(col("s")).as(vs), decode(col("o")).as(vo))
      case (TConst(ts), TVar(vo)) =>
        e.filter(col("s") === encTerm(ts)).select(decode(col("o")).as(vo))
      case (TVar(vs), TConst(to)) =>
        e.filter(col("o") === encTerm(to)).select(decode(col("s")).as(vs))
      case (TConst(ts), TConst(to)) =>
        // boolean existence: empty or single-row unit solution
        e.filter(col("s") === encTerm(ts) && col("o") === encTerm(to))
          .limit(1).select(lit(1).as("__unit"))
    }
  }
}
