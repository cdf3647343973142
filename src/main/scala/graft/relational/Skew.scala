package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot-key joins at scale.
  *
  * AQE's skew-join handles most cases at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`); explicit salting remains the
  * tool when one side must be replicated deterministically — e.g. a
  * usage-rebuild join where a handful of content hashes own most object
  * versions, or a postings join on stopword-grade tokens.
  *
  * [[saltedJoin]] splits the skewed (probe) side's key space with a random
  * salt and replicates the build side across all salt values: correctness is
  * unchanged (each probe row meets exactly the one matching build replica),
  * while the hot key's rows spread over `salts` reducers.
  */
object Skew {

  /** Inner equi-join `probe.key == build.key` with the probe side salted.
    * `build` is replicated `salts`× — keep it the smaller side. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    // salt must be DETERMINISTIC per row content: a nondeterministic salt
    // (e.g. monotonically_increasing_id) re-salts rows differently on stage
    // retry, silently dropping/duplicating join output
    val saltedProbe = probe.withColumn("__salt",
      pmod(xxhash64(struct(probe.columns.map(col): _*)), lit(salts)).cast("int"))
    val replicatedBuild = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedProbe
      .join(replicatedBuild,
        saltedProbe(key) === replicatedBuild(key) &&
          saltedProbe("__salt") === replicatedBuild("__salt"))
      .drop(replicatedBuild(key))
      .drop("__salt")
  }

  /** Top-N heaviest keys of a column — the input to targeted salting
    * decisions (salt only keys above a frequency threshold). */
  def hotKeys(df: DataFrame, key: String, topN: Int): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key))
      .limit(topN)
}
