package graft.spec

import org.json4s._
import org.json4s.jackson.JsonMethods

/** One column mapping — mirrors the reference's 6-field element
  * (mapping_parser.py:8-10), snake_case JSON keys kept byte-compatible.
  *
  * - `columnType ∈ {regular, src_id, dst_id}`: `src_id` marks the
  *   destination column that holds the *source* record's old ID (the
  *   write-back join key, mapping_parser.py:98-99,130-132).
  * - `operation = upd_src` marks the source column to be overwritten with
  *   the newly created destination ID (mapping_parser.py:127-129,139-147).
  * - `tableSrc != sourceObject` ⇒ relationship-path (parent-join) column
  *   (mapping_parser.py:34-38).
  */
final case class MappingElement(
    tableSrc: String,
    columnSrc: String,
    tableDst: String,
    columnDst: String,
    operation: String,
    columnType: String)

object ColumnType {
  val Regular = "regular"
  val SrcId = "src_id"
  val DstId = "dst_id"
}

object Operation {
  val UpdSrc = "upd_src"
}

/** A full mapping spec (one element of the reference's JSON array —
  * mapping_parser.py:14-28, mriya.py:20).
  *
  * `constants` is our replacement for the reference's hard-coded
  * enrichment (migration_engine.py:39-41): destination column →
  * constant value applied after the rename projection.
  *
  * `whereCondition` is a boolean SQL expression over source columns; a
  * leading `WHERE ` keyword (the reference embeds it in the raw string —
  * mapping_parser.py:39-40) is tolerated and stripped.
  */
final case class MappingSpec(
    sourceObject: String,
    destinationObject: String,
    whereCondition: String,
    mapping: Seq[MappingElement],
    constants: Map[String, String] = Map.empty) {

  require(mapping.nonEmpty,
    "There are no elements in mapping. Nothing to process") // mapping_parser.py:15-17

  /** Normalized filter expression, None when blank. */
  def whereExpr: Option[String] = {
    val w = whereCondition.trim.replaceAll("(?i)^where\\s+", "")
    if (w.isEmpty) None else Some(w)
  }

  /** dst column → src column, over ALL elements, last-wins like the
    * reference's dict build (mapping_parser.py:114-121). */
  def dstUpdateRelations: Map[String, String] =
    mapping.map(m => m.columnDst -> m.columnSrc).toMap

  /** src column → dst column restricted to write-back elements
    * (mapping_parser.py:124-136). */
  def srcUpdateRelations: Map[String, String] = {
    val upd = mapping.filter(_.operation == Operation.UpdSrc)
      .map(m => m.columnSrc -> m.columnDst)
    val srcIds = mapping.filter(m => m.columnType == ColumnType.SrcId)
      .map(m => m.columnSrc -> m.columnDst)
    // upd_src entries first; src_id only fills columns not already present
    (srcIds.toMap ++ upd.toMap)
  }

  /** The source column marked for write-back (mapping_parser.py:139-142). */
  def srcOldIdColumn: Option[String] =
    mapping.find(_.operation == Operation.UpdSrc).map(_.columnSrc)

  /** The destination column that stores the old source ID. */
  def dstSrcIdColumn: Option[String] =
    mapping.find(_.columnType == ColumnType.SrcId).map(_.columnDst)

  /** Non-regular (ID-carrying) destination columns — the projection of the
    * created-records lookup (mapping_parser.py:90-97). */
  def dstIdColumns: Seq[String] =
    mapping.filter(_.columnType != ColumnType.Regular).map(_.columnDst)

  /** All source columns in mapping order (mapping_parser.py:150-154). */
  def srcColumns: Seq[String] = mapping.map(_.columnSrc)
}

object MappingSpec {
  implicit private val formats: Formats = DefaultFormats

  private def elem(v: JValue): MappingElement = MappingElement(
    tableSrc = (v \ "table_src").extract[String],
    columnSrc = (v \ "column_src").extract[String],
    tableDst = (v \ "table_dst").extract[String],
    columnDst = (v \ "column_dst").extract[String],
    operation = (v \ "operation").extract[String],
    columnType = (v \ "column_type").extract[String])

  private def one(v: JValue): MappingSpec = MappingSpec(
    sourceObject = (v \ "source_object").extract[String],
    destinationObject = (v \ "destination_object").extract[String],
    whereCondition = (v \ "where_condition").extractOrElse[String](""),
    mapping = (v \ "mapping") match {
      case JArray(xs) => xs.map(elem)
      case _ => Nil
    },
    constants = (v \ "constants") match {
      case JObject(fields) => fields.map { case (k, jv) =>
        k -> jv.extract[String]
      }.toMap
      case _ => Map.empty
    })

  /** Parses the reference's JSON format: an array of spec objects
    * (mriya.py:20 takes element [0]); a bare object is also accepted. */
  def fromJson(json: String): Seq[MappingSpec] =
    JsonMethods.parse(json) match {
      case JArray(xs) => xs.map(one)
      case obj: JObject => Seq(one(obj))
      case other =>
        throw new IllegalArgumentException(s"unexpected mapping JSON: $other")
    }
}
