package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DotI64Spec extends SparkSpec {
  import spark.implicits._

  private def hofDot = aggregate(
    zip_with(col("a"), col("b"), (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  test("dot_i64 ≡ the HOF form on random vectors, including negatives and zeros") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(200) {
      val n = 1 + rnd.nextInt(64)
      (Seq.fill(n)(rnd.nextLong() % 1000), Seq.fill(n)(rnd.nextLong() % 1000))
    }
    val df = rows.toDF("a", "b")
      .select(DotI64(col("a"), col("b")).as("native"), hofDot.as("hof"))
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
    assert(df.filter(col("native").isNull).count() == 0)
  }

  test("dot_i64 null semantics: null array or null element poisons, like the HOF") {
    val df = Seq(
      (Some(Seq(Some(1L), Some(2L))), Some(Seq(Some(3L), Some(4L)))),   // 11
      (None, Some(Seq(Some(1L)))),                                      // null array
      (Some(Seq(Some(1L), None)), Some(Seq(Some(3L), Some(4L)))))       // null elem
      .toDF("a", "b")
      .select(DotI64(col("a"), col("b")).as("native"), hofDot.as("hof"))
    val got = df.collect().map(r =>
      (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        if (r.isNullAt(1)) None else Some(r.getLong(1))))
    assert(got(0) == (Some(11L), Some(11L)))
    assert(got(1) == (None, None), s"null array must yield null: ${got(1)}")
    assert(got(2) == (None, None), s"null element must poison: ${got(2)}")
  }

  test("dot_i64 length mismatch yields null, exactly like the HOF form") {
    // zip_with pads the shorter array with nulls, which poisons the HOF
    // sum to null — the kernel must agree or the session-wide RewriteHofDot
    // silently changes results for mismatched vectors (round-4 advice)
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L)),      // left longer
      (Seq(1L), Seq(2L, 3L)),              // right longer
      (Seq.empty[Long], Seq(7L)),          // empty vs non-empty
      (Seq(2L, 3L), Seq(4L, 5L)))          // equal: 23
      .toDF("a", "b")
      .select(DotI64(col("a"), col("b")).as("native"), hofDot.as("hof"))
    val got = df.collect().map(r =>
      (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        if (r.isNullAt(1)) None else Some(r.getLong(1))))
    assert(got(0) == (None, None), s"mismatch must be null: ${got(0)}")
    assert(got(1) == (None, None), s"mismatch must be null: ${got(1)}")
    assert(got(2) == (None, None), s"mismatch must be null: ${got(2)}")
    assert(got(3) == (Some(23L), Some(23L)))
  }

  test("dot_i64 stays inside whole-stage codegen (no fallback compile)") {
    // spark.range, not a local Seq: ConvertToLocalRelation would fold a
    // tiny local relation at optimization time and leave no codegen stage
    val df = spark.range(4)
      .select(array(col("id"), col("id") + 1).as("a"),
        array(col("id") * 2, col("id")).as("b"))
      .select(DotI64(col("a"), col("b")).as("d"))
    // [id, id+1]·[2id, id] = 3id² + id
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(0L, 4L, 14L, 30L))
    // the generated stage must contain the primitive loop this expression
    // emits (an interpreted fallback would reference nullSafeEval instead)
    val cg = org.apache.spark.sql.execution.debug.codegenString(
      df.queryExecution.executedPlan)
    assert(cg.contains("getLong("), s"native loop missing from codegen:\n$cg")
    assert(!cg.contains("nullSafeEval"), "expression fell back to interpreted eval")
  }

  test("extensions: dot_i64 is a SQL function; the HOF dot form rewrites to it") {
    // SQL registration via GraftExtensions.injectFunction
    val viaSql = spark.sql(
      "SELECT dot_i64(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d").head().getLong(0)
    assert(viaSql == 32L)
    // optimizer rewrite: the functions-composed HOF dot becomes DotI64
    val hof = spark.range(8)
      .select(array(col("id"), col("id") + 1).as("a"),
        array(col("id") * 2, col("id")).as("b"))
      .select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, x) => acc + x).as("d"))
    assert(hof.queryExecution.optimizedPlan.toString.contains("dot_i64"),
      s"HOF dot not rewritten:\n${hof.queryExecution.optimizedPlan}")
    assert(hof.collect().map(_.getLong(0)).toSeq ==
      (0 until 8).map(i => 3L * i * i + i))
    // a non-dot aggregate (different combine op) must NOT rewrite
    val maxAgg = spark.range(2)
      .select(array(col("id")).as("a"), array(col("id")).as("b"))
      .select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, x) => greatest(acc, x)).as("d"))
    assert(!maxAgg.queryExecution.optimizedPlan.toString.contains("dot_i64"),
      "non-sum aggregate must keep the HOF plan")
  }

  test("dot_i64 rejects non-array<bigint> inputs at analysis time") {
    val err = intercept[Exception] {
      Seq((1, 2)).toDF("a", "b").select(DotI64(col("a"), col("b"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("dot_i64") ||
      err.getMessage.toLowerCase.contains("data type mismatch"), err.getMessage)
  }
}
