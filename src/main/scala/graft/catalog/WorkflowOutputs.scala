package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Workflow output capture planning (reference
  * `operations/src/jobs/workflow/workspace.rs:500-535,967-1062`;
  * `core/src/compute.rs:510-515` `output_suffix`,
  * `compute.rs:23` MAX_OUTPUT_MATCHES = 1024).
  *
  * Wildcard expansion (`expand_selection`): a wildcard output needs a
  * `path_prefix`; more than 1024 matches is a permanent error; every
  * matched path must live UNDER the prefix (component-wise, non-empty
  * suffix) — one stray path fails the whole selection; survivors land at
  * `trim_end('/', dest_key) + "/" + suffix`. Wildcard-free selections
  * pass through verbatim.
  *
  * Manifest merge (`merge_outputs`/`insert_output`): a retried finalize
  * inventories objects a previous export already wrote — the EXPORT row
  * wins its (bucket, key) because it names a container path inventory
  * cannot know; survivors dedup first-wins; a manifest past
  * MAX_OUTPUT_MANIFEST_OBJECTS (10 000) is a permanent error, reported
  * here as the `manifest_overflow` trailer.
  *
  * Scale: expansion is per-selection column logic plus one selection-keyed
  * window; the merge is one anti-join + one dedup window, both keyed on
  * (bucket, key). */
object WorkflowOutputs {

  val MaxOutputMatches = 1024L        // core/src/compute.rs:23
  val MaxManifestObjects = 10000L     // workspace.rs:39

  /** `selections(sel_id, container_path, wildcard, path_prefix,
    * dest_bucket, dest_key)`; `matches(sel_id, path)` — wildcard hits.
    * Returns one row per expanded output — or one error row per failed
    * selection: `(sel_id, container_path_out, dest_bucket, dest_key_out,
    * verdict)` with verdict ∈ ok | missing_prefix | too_many_matches |
    * outside_prefix. */
  def expand(selections: DataFrame, matches: DataFrame,
      maxMatches: Long = MaxOutputMatches): DataFrame = {
    val m = matches.select(col("sel_id"), col("path"))
    val wSel = Window.partitionBy("sel_id")
    val expanded = selections.filter(col("wildcard"))
      .join(m, Seq("sel_id"), "left_outer")
      .withColumn("n_matches", count(col("path")).over(wSel))
      .withColumn("suffix",
        when(col("path_prefix").isNotNull &&
          col("path").startsWith(concat(col("path_prefix"), lit("/"))),
          expr("substring(path, length(path_prefix) + 2)")))
      // one path outside the prefix fails the WHOLE selection (the
      // reference's collect() propagates the first Err)
      .withColumn("sel_verdict",
        when(col("path_prefix").isNull, "missing_prefix")
          .when(col("n_matches") > maxMatches, "too_many_matches")
          .when(max(when(col("path").isNotNull && col("suffix").isNull,
            1L).otherwise(0L)).over(wSel) === 1L, "outside_prefix")
          .otherwise("ok"))
    val okRows = expanded.filter(col("sel_verdict") === "ok" &&
      col("path").isNotNull)
      .select(col("sel_id"), col("path").as("container_path_out"),
        col("dest_bucket"),
        concat(regexp_replace(col("dest_key"), "/+$", ""), lit("/"),
          col("suffix")).as("dest_key_out"),
        lit("ok").as("verdict"))
    val errRows = expanded.filter(col("sel_verdict") =!= "ok")
      .select(col("sel_id"), col("sel_verdict")).distinct()
      .select(col("sel_id"), lit(null).cast("string")
        .as("container_path_out"), lit(null).cast("string")
        .as("dest_bucket"), lit(null).cast("string").as("dest_key_out"),
        col("sel_verdict").as("verdict"))
    val literal = selections.filter(!col("wildcard"))
      .select(col("sel_id"), col("container_path")
        .as("container_path_out"), col("dest_bucket"),
        col("dest_key").as("dest_key_out"), lit("ok").as("verdict"))
    okRows.unionByName(errRows).unionByName(literal)
  }

  /** `inventoried(bucket, key, size, seq)`; `captured(bucket, key,
    * container_path, size, seq)`. Returns the merged manifest
    * `(bucket, key, source, container_path, size, manifest_overflow)` —
    * export rows win their key, first-wins dedup, overflow trailer past
    * `maxObjects`. */
  def merge(inventoried: DataFrame, captured: DataFrame,
      maxObjects: Long = MaxManifestObjects): DataFrame = {
    val cap = captured.select(col("bucket"), col("key"),
      col("container_path"), col("size"), col("seq"),
      lit("export").as("source"))
    val inv = inventoried
      .join(cap.select("bucket", "key").distinct(), Seq("bucket", "key"),
        "left_anti")
      .select(col("bucket"), col("key"),
        lit(null).cast("string").as("container_path"), col("size"),
        col("seq"), lit("inventory").as("source"))
    val all = inv.unionByName(cap)
      .withColumn("__rn", row_number().over(Window
        .partitionBy("bucket", "key")
        // retained inventory rows precede captured ones in the chain
        .orderBy(when(col("source") === "inventory", 0L).otherwise(1L),
          col("seq"))))
      .filter(col("__rn") === 1)
    val n = all.agg(count(lit(1)).as("__n"))
    all.crossJoin(broadcast(n))
      .select(col("bucket"), col("key"), col("source"),
        col("container_path"), col("size"),
        (col("__n") > maxObjects).as("manifest_overflow"))
  }
}
