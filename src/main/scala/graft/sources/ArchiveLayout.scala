package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RO-Crate import-archive layout inspection and entry-path safety
  * (reference `operations/src/jobs/import/archive.rs:615-689`
  * `inspect_layout`, `:679-706` `normalize_entry_path`,
  * `:713-733` `validate_relative_path`).
  *
  * Layout ladder: an archive carries its `ro-crate-metadata.json` either
  * at the ROOT or inside exactly one single-level WRAPPER directory
  * (`split_once('/')` — deeper copies do not count as descriptors):
  *
  *  - one root descriptor: fine for a plain crate, but an .eln archive
  *    REQUIRES the wrapper ("ELN archive requires a single wrapper
  *    directory");
  *  - one wrapper descriptor: every other entry must live under that
  *    wrapper (a same-named FILE at top level, or any stray top-level
  *    entry, rejects); the wrapper prefix is stripped from all entries
  *    and the wrapper's own directory row dropped;
  *  - neither → no descriptor; any other combination (two roots, two
  *    wrappers, root + wrapper) → ambiguous.
  *
  * Path safety (applied to every entry on extraction): backslash or NUL
  * rejects; trailing slashes trim; leading `./` strips repeatedly; the
  * result must be non-empty, relative (no leading `/`, no `X:` drive),
  * contain no empty/`.`/`..` components, and no control characters.
  *
  * Scale: per-archive aggregations over the entry relation (archive
  * listing sized) and pure per-row column logic for the path rules. */
object ArchiveLayout {

  val MetadataPath = "ro-crate-metadata.json"   // archive.rs:19
  val SignaturePath = "ro-crate-metadata.json.minisig"

  /** `entries(arc_id, eln, path, directory)` → one row per archive:
    * `(arc_id, verdict, wrapper, n_payload, has_signature)` with verdict ∈
    * ok_root | ok_wrapper | eln_needs_wrapper | stray_top_level |
    * no_metadata | ambiguous. */
  def inspect(entries: DataFrame): DataFrame = {
    val w = Window.partitionBy("arc_id")
    val ann = entries
      .withColumn("is_root_meta", col("path") === MetadataPath)
      .withColumn("is_wrapper_meta",
        col("path").rlike("^[^/]+/ro-crate-metadata\\.json$"))
      .withColumn("wrap_name", when(col("is_wrapper_meta"),
        substring_index(col("path"), "/", 1)))
      .withColumn("root_cnt",
        sum(when(col("is_root_meta"), 1L).otherwise(0L)).over(w))
      .withColumn("wrap_cnt",
        sum(when(col("is_wrapper_meta"), 1L).otherwise(0L)).over(w))
      .withColumn("wrapper", max(col("wrap_name")).over(w))
      .withColumn("stray", max(when(col("wrap_cnt") === 1 && (
        (col("path") === col("wrapper") && !col("directory")) ||
          (col("path") =!= col("wrapper") &&
            !col("path").startsWith(concat(col("wrapper"), lit("/"))))),
        1L).otherwise(0L)).over(w))
      .withColumn("verdict",
        when(col("root_cnt") === 1 && col("wrap_cnt") === 0,
          when(col("eln"), "eln_needs_wrapper").otherwise("ok_root"))
          .when(col("root_cnt") === 0 && col("wrap_cnt") === 1,
            when(col("stray") === 1, "stray_top_level")
              .otherwise("ok_wrapper"))
          .when(col("root_cnt") === 0 && col("wrap_cnt") === 0,
            "no_metadata")
          .otherwise("ambiguous"))
      // the post-strip entry path (wrapper layouts drop the wrapper's own
      // directory row and strip the prefix everywhere else)
      .withColumn("eff_path", when(col("verdict") === "ok_root",
        col("path"))
        .when(col("verdict") === "ok_wrapper" &&
          col("path") =!= col("wrapper"),
          expr("substring(path, length(wrapper) + 2)")))
      .withColumn("is_payload", col("eff_path").isNotNull &&
        !col("directory") && col("eff_path") =!= MetadataPath &&
        col("eff_path") =!= SignaturePath)
      .withColumn("is_sig", col("eff_path") === SignaturePath)
    ann.groupBy("arc_id").agg(
      first(col("verdict")).as("verdict"),
      max(when(col("verdict") === "ok_wrapper", col("wrapper")))
        .as("wrapper"),
      when(first(col("verdict")).isin("ok_root", "ok_wrapper"),
        sum(when(col("is_payload"), 1L).otherwise(0L))).as("n_payload"),
      when(first(col("verdict")).isin("ok_root", "ok_wrapper"),
        max(when(col("is_sig"), true).otherwise(false)))
        .as("has_signature"))
  }

  /** `paths(p_id, raw)` → `(p_id, verdict, normalized)` with verdict ∈
    * ok | unsafe_path | empty_path | unsafe_relative | control_char. */
  def normalizePaths(paths: DataFrame): DataFrame = paths
    .withColumn("t1", regexp_replace(col("raw"), "/+$", ""))
    .withColumn("t2", regexp_replace(col("t1"), "^(\\./)+", ""))
    .withColumn("t3", regexp_replace(col("t2"), "/+", "/"))
    .withColumn("verdict",
      when(col("raw").contains("\\") || col("raw").contains("\u0000"),
        "unsafe_path")
        .when(col("t2") === "", "empty_path")
        .when(col("t2").startsWith("/"), "unsafe_relative")
        .when(col("t3").rlike("^[A-Za-z]:"), "unsafe_relative")
        .when(col("t3").rlike("(^|/)\\.\\.?(/|$)"), "unsafe_relative")
        .when(col("t3").rlike("\\p{Cntrl}"), "control_char")
        .otherwise("ok"))
    .select(col("p_id"), col("verdict"),
      when(col("verdict") === "ok", col("t3")).as("normalized"))
}
