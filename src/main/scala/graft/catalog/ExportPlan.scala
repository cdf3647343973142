package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RO-Crate export planning (reference `operations/src/jobs/export.rs`:
  * `recognize_entities` `:1086-1181`, `plan_export` `:986-1085`,
  * `safe_zip_path` `:1313-1336`, `synthesized_path` `:1353-1356`).
  *
  * Per File entity:
  *  - identity omission first: an entity with NO exact Aruna URL and NO
  *    content hash is EXTERNAL ("external File entity was not fetched");
  *    one whose exact URL or hash-bound realm belongs to another realm is
  *    UNSUPPORTED;
  *  - the archive path prefers the entity's raw JSON-LD `localPath` but
  *    only when the expanded quads CONFIRM it; otherwise the first
  *    quad-level localPath (`:1145-1148`);
  *  - `safe_zip_path`: leading `./` strips; empty, trailing-slash,
  *    backslash, encoded separators (%2f/%5c, case-insensitive) and
  *    empty/`.`/`..` components all disqualify — as do the two reserved
  *    names (`ro-crate-metadata.json`, `aruna-export-report.json`); a
  *    disqualified or absent path synthesizes
  *    `data/{blake3(content)}-{blake3(entity_id)[..12]}` instead
  *    (`path_synthesized` in the export report);
  *  - a path over the key-bytes limit or claimed by two entities is a
  *    permanent export failure (the reference aborts the whole plan; the
  *    per-entity verdict here is observability, the rejected set is
  *    identical).
  *
  * Scale: per-entity column logic plus one dedup window over the planned
  * paths — crate-manifest sized. */
object ExportPlan {

  private def safeZip(c: Column): Column = {
    val s = regexp_replace(c, "^(\\./)+", "")
    when(c.isNull, lit(null).cast("string"))
      .when(s === "" || s.endsWith("/") || s.contains("\\") ||
        lower(s).contains("%2f") || lower(s).contains("%5c") ||
        s.startsWith("/") || s.contains("//") ||
        s.rlike("(^|/)\\.\\.?(/|$)"), lit(null).cast("string"))
      .otherwise(s)
  }

  /** `entities(ent_id, is_file, exact_realm, has_hash, hash_realm,
    * raw_path, qp1, qp2, hash_hex)`; `localRealm`; `keyBytes` — the ZIP
    * path length limit. Returns `(ent_id, verdict, local_path, zip_path,
    * path_synthesized)` with verdict ∈ not_file | omitted_external |
    * omitted_unsupported | path_too_long | dup_path | planned. */
  def plan(entities: DataFrame, localRealm: String,
      keyBytes: Long): DataFrame = {
    val confirmed = col("raw_path").isNotNull &&
      (col("raw_path") === col("qp1") || col("raw_path") === col("qp2"))
    val ann = entities
      .withColumn("external", col("exact_realm").isNull && !col("has_hash"))
      .withColumn("supported",
        coalesce(col("exact_realm") === localRealm, lit(false)) ||
          (col("has_hash") && (col("hash_realm").isNull ||
            col("hash_realm") === localRealm)))
      .withColumn("local_path",
        when(confirmed, col("raw_path")).otherwise(col("qp1")))
      .withColumn("explicit", {
        val p = safeZip(col("local_path"))
        when(p.isin(ArchiveLayoutNames.Metadata, ArchiveLayoutNames.Report),
          lit(null).cast("string")).otherwise(p)
      })
      .withColumn("synth", concat(lit("data/"), col("hash_hex"), lit("-"),
        substring(graft.functions.Hashes.blake3Udf(
          encode(col("ent_id"), "UTF-8")), 1, 12)))
      .withColumn("path0",
        coalesce(col("explicit"), col("synth")))
      .withColumn("eligible", col("is_file") && !col("external") &&
        col("supported"))
      .withColumn("too_long", col("eligible") &&
        length(col("path0")) > keyBytes)
    val wPath = Window.partitionBy(
      when(col("eligible") && !col("too_long"), col("path0")))
    ann
      .withColumn("dup", col("eligible") && !col("too_long") &&
        count(lit(1)).over(wPath) > 1)
      .withColumn("verdict",
        when(!col("is_file"), "not_file")
          .when(col("external"), "omitted_external")
          .when(!col("supported"), "omitted_unsupported")
          .when(col("too_long"), "path_too_long")
          .when(col("dup"), "dup_path")
          .otherwise("planned"))
      .withColumn("path_synthesized",
        when(col("verdict") === "planned", col("explicit").isNull))
      .select(col("ent_id"), col("verdict"),
        when(col("eligible"), col("local_path")).as("local_path"),
        when(col("verdict") === "planned" && col("explicit").isNotNull,
          col("path0")).as("zip_path"),
        col("path_synthesized"))
  }
}

private object ArchiveLayoutNames {
  val Metadata = "ro-crate-metadata.json"      // export.rs:54
  val Report = "aruna-export-report.json"      // export.rs:55
}
