package graft.index

import graft.sparql.Kind
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reverse-reference (backlink) index on (predicate, object IRI) → subjects
  * (reference `operations/src/metadata/iri_index.rs:48-73`; canonical
  * predicate is dcterms:conformsTo, `iri_index.rs:28`).
  *
  * `references_metadata` (`api.rs:1300-1330`) = index rows joined to the
  * registry, auth-filtered — compiled here as index ⋈ broadcast(registry).
  */
object IriIndex {

  /** iri_index(predicate_iri, object_iri, document_id, subjects) — subjects
    * joined sorted for deterministic comparison (document_id = the graph's
    * doc, derived from registry join at call sites when needed). */
  def build(quads: DataFrame): DataFrame =
    quads
      .filter(col("obj_kind") === Kind.Iri)
      .groupBy(col("predicate").as("predicate_iri"),
        col("obj_value").as("object_iri"), col("graph_iri"))
      .agg(array_join(array_sort(collect_set(col("subject"))), ",").as("subjects"))

  /** Backlink lookup: documents whose graphs reference `objectIri` through
    * `predicateIri`, restricted to caller-visible registry records. */
  def references(iriIndex: DataFrame, registry: DataFrame,
      predicateIri: String, objectIri: String): DataFrame =
    iriIndex
      .filter(col("predicate_iri") === predicateIri && col("object_iri") === objectIri)
      .join(registry, Seq("graph_iri"), "inner")
      .select(col("document_id"), col("graph_iri"), col("document_path"), col("subjects"))
      .orderBy(col("document_id"))
}
