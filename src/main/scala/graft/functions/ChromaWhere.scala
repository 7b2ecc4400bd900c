package graft.functions

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** chromadb `where` / `where_document` dict → Spark `Column`
  * translator — a permissive SUPERSET of the query-filter grammar of
  * the reference's engine (chromadb 0.4.x `Collection.query(where=...,
  * where_document=...)`, `get`, `delete`), so a chroma caller's
  * filter dicts run unchanged against every `where:`-carrying path in
  * [[graft.sources.IndexStore]] and [[graft.sources.LexicalStore]].
  * Superset, not the literal 0.4.6 contract: chromadb 0.4.x's
  * `validate_where` REJECTS multi-key dicts ("Expected where to have
  * exactly one operator") where we accept them as implicit AND, and
  * the list operators (`$in` / `$nin`, added to chromadb together
  * after 0.4.6) and `$not_contains` post-date the pinned release —
  * every dict 0.4.6 accepts translates here with identical
  * semantics, plus those extensions. The search/get/delete paths themselves take a `Column`
  * (V9) — this is the adapter from chroma's wire format to that
  * surface, kept separate so the engine never depends on a
  * serialization format.
  *
  * Metadata `where` grammar (superset of chromadb 0.4.6):
  *   {"f": v}                          equality shorthand
  *   {"f": {"$eq"|"$ne"|"$gt"|"$gte"|"$lt"|"$lte": v}}
  *   {"$and"|"$or": [w, ...]}          boolean composition
  *   {"f": {"$in"|"$nin": [v, ...]}}   extension (post-0.4.6 chroma)
  *   multiple keys in one object       implicit AND (our extension —
  *                                     chroma 0.4.x rejects these)
  *
  * Document `where_document` grammar:
  *   {"$contains": "s"} | {"$not_contains": "s"}
  *   {"$and"|"$or": [w, ...]}
  *
  * Comparisons translate to plain Spark comparisons, so they inherit
  * Spark SQL's three-valued NULL logic (chroma metadata keys always
  * exist; our layouts' columns are non-null, so the semantics agree)
  * and — the point of the Column surface — push into parquet scans
  * and partition pruning exactly like a hand-written predicate
  * (q104's PlanAuditSpec pins apply unchanged; q116 gates a dict-built
  * filter end-to-end). Unknown operators and malformed shapes throw
  * `IllegalArgumentException` eagerly at translation time.
  */
object ChromaWhere {

  private val mapper = new ObjectMapper()

  /** Metadata filter: chroma `where=` dict (JSON text) → Column. */
  def where(json: String): Column =
    whereNode(parse(json))

  /** Document filter: chroma `where_document=` dict → Column over the
    * document-text column (`chunk` in the IndexStore layouts). */
  def whereDocument(json: String, doc: Column): Column =
    docNode(parse(json), doc)

  private def parse(json: String): JsonNode = {
    val n = mapper.readTree(json)
    require(n != null && n.isObject, s"where must be a JSON object: $json")
    n
  }

  private def scalar(v: JsonNode): Column = v match {
    case t if t.isTextual        => lit(t.asText)
    case i if i.isIntegralNumber => lit(i.asLong)
    case f if f.isNumber         => lit(f.asDouble)
    case b if b.isBoolean        => lit(b.asBoolean)
    case other => throw new IllegalArgumentException(
      s"unsupported literal in where: $other")
  }

  private def children(v: JsonNode, op: String): Seq[JsonNode] = {
    require(v.isArray && v.size > 0, s"$op needs a non-empty array, got $v")
    v.elements.asScala.toSeq
  }

  private def whereNode(n: JsonNode): Column = {
    require(n.isObject && n.size > 0, s"where clause must be a non-empty object: $n")
    n.properties.asScala.toSeq.map { e =>
      (e.getKey, e.getValue) match {
        case ("$and", v) => children(v, "$and").map(whereNode).reduce(_ && _)
        case ("$or", v)  => children(v, "$or").map(whereNode).reduce(_ || _)
        case (op, _) if op.startsWith("$") =>
          throw new IllegalArgumentException(s"unknown where operator: $op")
        case (field, v) if v.isObject =>
          require(v.size == 1, s"field filter needs exactly one operator: $v")
          val e2 = v.properties.asScala.head
          (e2.getKey, e2.getValue) match {
            case ("$eq", x)  => col(field) === scalar(x)
            case ("$ne", x)  => col(field) =!= scalar(x)
            case ("$gt", x)  => col(field) > scalar(x)
            case ("$gte", x) => col(field) >= scalar(x)
            case ("$lt", x)  => col(field) < scalar(x)
            case ("$lte", x) => col(field) <= scalar(x)
            case ("$in", x)  => col(field).isin(children(x, "$in").map(scalar): _*)
            case ("$nin", x) => !col(field).isin(children(x, "$nin").map(scalar): _*)
            case (op, _) => throw new IllegalArgumentException(
              s"unknown comparison operator: $op")
          }
        case (field, v) => col(field) === scalar(v) // equality shorthand
      }
    }.reduce(_ && _) // chroma: sibling keys are an implicit AND
  }

  private def docNode(n: JsonNode, doc: Column): Column = {
    require(n.isObject && n.size > 0,
      s"where_document clause must be a non-empty object: $n")
    n.properties.asScala.toSeq.map { e =>
      (e.getKey, e.getValue) match {
        case ("$and", v) => children(v, "$and").map(docNode(_, doc)).reduce(_ && _)
        case ("$or", v)  => children(v, "$or").map(docNode(_, doc)).reduce(_ || _)
        case ("$contains", v) if v.isTextual     => doc.contains(lit(v.asText))
        case ("$not_contains", v) if v.isTextual => !doc.contains(lit(v.asText))
        case (op, v) => throw new IllegalArgumentException(
          s"unknown where_document operator: $op ($v)")
      }
    }.reduce(_ && _)
  }
}
