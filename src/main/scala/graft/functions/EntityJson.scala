package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Entity-payload JSON-LD validation (reference
  * `operations/src/update_metadata_document.rs:292-345`
  * `validate_entity_jsonld`): the upsert mutations accept ONE JSON-LD
  * entity object —
  *
  *  - it must parse to a JSON OBJECT (no arrays, no scalars);
  *  - it must not carry `@graph`/`graph` ("send a single JSON-LD entity
  *    object");
  *  - `@id` (or `id`) must be a non-blank STRING — a numeric id fails;
  *  - `@type` (or `type`) must be a non-blank string or a non-empty array
  *    of non-blank strings;
  *  - `name` must be a non-blank string.
  *
  * Scale: a per-row codegen-adjacent UDF over Jackson (already on
  * Spark's classpath); validation is upsert-request-sized, never
  * corpus-sized. */
object EntityJson {

  private val mapper = new ObjectMapper()

  def verdict(jsonld: String): String = {
    val node: JsonNode =
      try mapper.readTree(jsonld)
      catch { case _: Exception => return "not_json" }
    if (node == null || !node.isObject) return "not_object"
    if (node.has("@graph") || node.has("graph")) return "has_graph"
    val id = Option(node.get("@id")).orElse(Option(node.get("id")))
    val idOk = id.exists(v => v.isTextual && v.asText.trim.nonEmpty)
    if (!idOk) return "missing_id"
    Option(node.get("@type")).orElse(Option(node.get("type"))) match {
      case None => "missing_type"
      case Some(t) =>
        val typeOk =
          if (t.isTextual) t.asText.trim.nonEmpty
          else if (t.isArray)
            t.size > 0 && (0 until t.size).forall { i =>
              val e = t.get(i); e.isTextual && e.asText.trim.nonEmpty
            }
          else false
        if (!typeOk) "bad_type"
        else {
          val name = Option(node.get("name"))
          if (name.exists(v => v.isTextual && v.asText.trim.nonEmpty)) "ok"
          else "missing_name"
        }
    }
  }

  val verdictUdf: UserDefinedFunction = udf((s: String) => verdict(s))
}
