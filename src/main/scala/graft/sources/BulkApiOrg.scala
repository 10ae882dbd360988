package graft.sources

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** [[RemoteOrg]] over the public Bulk REST job lifecycle — the
  * HTTP-shaped production implementation the connector stack binds to
  * (the in-memory org is the test sim). Every verb follows the
  * reference's connector flow (data_connector.py:246-368):
  *
  *   create job → add batch → close job → poll until Completed →
  *   stream result
  *
  * with JSON content type throughout. `describe` uses the REST
  * `/sobjects/{name}/describe` surface and drives result-type coercion,
  * so CSV/JSON wire values land as the schema's JVM types.
  *
  * Entirely offline-testable: HTTP is injected behind
  * [[HttpTransport.send]], polling sleeps through an injectable
  * `sleeper`, and session expiry (401 / INVALID_SESSION_ID) surfaces as
  * [[SessionExpiredException]] so [[AuthRetryOrg]] + [[TokenProvider]]
  * give the fetch-cache-invalidate-replay-once policy
  * (data_connector.py:240-252).
  *
  * PK chunking: a production deployment enables the
  * `Sforce-Enable-PKChunking` header and reads the spawned batch ranges;
  * this client keeps the trait default (single cursor) — the connector's
  * range parallelism comes from [[RemoteOrg.pkChunkBoundaries]] when the
  * org provides it.
  */
final class BulkApiOrg(
    token: AuthToken,
    http: HttpTransport,
    apiVersion: String = "47.0",
    maxPolls: Int = 60,
    pollDelayMs: Long = 1000L,
    sleeper: Long => Unit = Thread.sleep) extends RemoteOrg {

  private val asyncBase = s"${token.instanceUrl}/services/async/$apiVersion"
  private val restBase = s"${token.instanceUrl}/services/data/v$apiVersion"

  private def headers(contentType: Option[String]): Map[String, String] =
    Map("X-SFDC-Session" -> token.accessToken) ++
      contentType.map("Content-Type" -> _)

  /** One request with session-expiry detection: the retry policy itself
    * lives in [[AuthRetryOrg]], which replays the whole org call. */
  private def request(method: String, url: String, body: String = "",
      contentType: Option[String] = Some("application/json")): JValue = {
    val (status, respBody) = http.send(method, url, headers(contentType), body)
    if (status == 401 || respBody.contains("INVALID_SESSION_ID"))
      throw new SessionExpiredException(s"$method $url -> $status")
    if (status / 100 != 2)
      throw new RuntimeException(s"$method $url -> $status: $respBody")
    if (respBody.isBlank) JNothing else JsonMethods.parse(respBody)
  }

  private def str(j: JValue): String = j match {
    case JString(s) => s
    case other => throw new RuntimeException(s"expected string, got $other")
  }

  // ---- job lifecycle ------------------------------------------------------

  private def createJob(operation: String, sObject: String,
      externalIdField: Option[String] = None): String = {
    val fields: List[(String, JValue)] = List(
      "operation" -> JString(operation),
      "object" -> JString(sObject),
      "contentType" -> JString("JSON")) ++
      externalIdField.map(f => "externalIdFieldName" -> JString(f))
    str(request("POST", s"$asyncBase/job",
      JsonMethods.compact(JsonMethods.render(JObject(fields)))) \ "id")
  }

  private def addBatch(jobId: String, body: String): String =
    str(request("POST", s"$asyncBase/job/$jobId/batch", body) \ "id")

  private def closeJob(jobId: String): Unit =
    request("POST", s"$asyncBase/job/$jobId", """{"state": "Closed"}""")

  /** Polls the batch until Completed; Failed / Not Processed and poll
    * exhaustion are errors (the reference loops on check_batch_status,
    * data_connector.py:342-349). */
  private def awaitBatch(jobId: String, batchId: String): Unit = {
    var polls = 0
    while (polls < maxPolls) {
      val state = str(
        request("GET", s"$asyncBase/job/$jobId/batch/$batchId") \ "state")
      state match {
        case "Completed" => return
        case "Failed" | "Not Processed" =>
          throw new RuntimeException(s"batch $batchId ended in state $state")
        case _ => // Queued | InProgress
          polls += 1
          if (polls < maxPolls) sleeper(pollDelayMs)
      }
    }
    throw new RuntimeException(s"batch $batchId not Completed after $maxPolls polls")
  }

  private def batchResult(jobId: String, batchId: String): JValue =
    request("GET", s"$asyncBase/job/$jobId/batch/$batchId/result")

  /** create → batch → close → poll → result for one payload. */
  private def runJob(operation: String, sObject: String, payload: String,
      externalIdField: Option[String] = None): (String, String, JValue) = {
    val jobId = createJob(operation, sObject, externalIdField)
    val batchId = addBatch(jobId, payload)
    closeJob(jobId)
    awaitBatch(jobId, batchId)
    (jobId, batchId, batchResult(jobId, batchId))
  }

  // ---- schema / coercion --------------------------------------------------

  private val describeCache =
    scala.collection.concurrent.TrieMap.empty[String, StructType]

  override def describe(sObject: String): StructType =
    describeCache.getOrElseUpdate(sObject, {
      val fields = request("GET", s"$restBase/sobjects/$sObject/describe",
        contentType = None) \ "fields" match {
        case JArray(fs) => fs.map { f =>
          val name = str(f \ "name")
          val tpe = str(f \ "type") match {
            case "int" => LongType // SOAP int is widened; Bulk JSON numbers
            case "double" | "currency" | "percent" => DoubleType
            case "boolean" => BooleanType
            case "date" => DateType
            case "datetime" => TimestampType
            case _ => StringType // id, string, reference, picklist, ...
          }
          StructField(name, tpe)
        }
        case other => throw new RuntimeException(s"bad describe response: $other")
      }
      StructType(fields)
    })

  private def coerce(j: JValue, dt: DataType): Any = (j, dt) match {
    case (JNull | JNothing, _) => null
    case (JInt(v), LongType) => v.toLong
    case (JLong(v), LongType) => v
    case (JString(v), LongType) => v.toLong
    case (JInt(v), DoubleType) => v.toDouble
    case (JLong(v), DoubleType) => v.toDouble
    case (JDouble(v), DoubleType) => v
    case (JDecimal(v), DoubleType) => v.toDouble
    case (JString(v), DoubleType) => v.toDouble
    case (JBool(v), BooleanType) => v
    case (JString(v), BooleanType) => v.toBoolean
    case (JString(v), DateType) => java.sql.Date.valueOf(v)
    case (JString(v), TimestampType) =>
      java.sql.Timestamp.from(java.time.Instant.parse(v))
    case (JString(v), _) => v
    case (JInt(v), _) => v.toLong
    case (JLong(v), _) => v
    case (JDouble(v), _) => v
    case (JBool(v), _) => v
    case (other, _) => throw new RuntimeException(s"cannot coerce $other to $dt")
  }

  private def toJson(rows: Seq[Row], schema: StructType): String = {
    val recs = rows.map { r =>
      JObject(schema.fields.zipWithIndex.collect {
        case (f, i) if !r.isNullAt(i) =>
          f.name -> (r.get(i) match {
            case s: String => JString(s)
            case n: Long => JLong(n)
            case n: Int => JLong(n.toLong)
            case n: Double => JDouble(n)
            case b: Boolean => JBool(b)
            case d: java.sql.Date => JString(d.toString)
            case t: java.sql.Timestamp => JString(t.toInstant.toString)
            case other => JString(other.toString)
          })
      }.toList)
    }
    JsonMethods.compact(JsonMethods.render(JArray(recs.toList)))
  }

  // ---- RemoteOrg ----------------------------------------------------------

  /** Bulk query: the batch payload is the SOQL string; results arrive as
    * one or more result ids, each streaming a JSON record array
    * (data_connector.py:246-268). Values coerce to the described field
    * types; non-column select items (pushed aggregates) fall back to the
    * JSON value's own type. */
  override def query(soql: String): Iterator[Row] = {
    val sel = soql.stripPrefix("SELECT ")
    val fromIdx = sel.indexOf(" FROM ")
    if (fromIdx < 0)
      throw new IllegalArgumentException(s"no FROM clause in: $soql")
    val obj = sel.substring(fromIdx + 6).split("\\s+").head
    val items = sel.substring(0, fromIdx).split(",").map(_.trim).toSeq
    val schema = describe(obj)
    val fieldType: Map[String, DataType] =
      schema.fields.map(f => f.name -> f.dataType).toMap
    val (jobId, batchId, resultList) = runJob("query", obj, soql)
    val resultIds = resultList match {
      case JArray(ids) => ids.map(str)
      case other => throw new RuntimeException(s"bad result list: $other")
    }
    resultIds.iterator.flatMap { rid =>
      request("GET", s"$asyncBase/job/$jobId/batch/$batchId/result/$rid") match {
        case JArray(recs) => recs.iterator.map { rec =>
          Row.fromSeq(items.map { item =>
            // relationship-path items (Parent.Name) arrive as nested
            // objects in Bulk JSON — traverse each dotted segment; a null
            // parent short-circuits to JNull (left-join semantics)
            val v = item.split("\\.").foldLeft(rec: JValue)(_ \ _)
            fieldType.get(item) match {
              case Some(dt) => coerce(v, dt)
              case None => coerce(v, NullType) // aggregate/expression/dotted item
            }
          })
        }
        case other => throw new RuntimeException(s"bad result payload: $other")
      }
    }
  }

  /** Shared mutation path: run the job, return per-record results. */
  private def mutate(operation: String, sObject: String, rows: Seq[Row],
      schema: StructType, externalIdField: Option[String] = None): List[JValue] =
    runJob(operation, sObject, toJson(rows, schema), externalIdField)._3 match {
      case JArray(rs) => rs
      case other => throw new RuntimeException(s"bad mutation result: $other")
    }

  override def insert(sObject: String, rows: Seq[Row],
      schema: StructType): Seq[String] =
    mutate("insert", sObject, rows, schema).map(r => str(r \ "id"))

  override def update(sObject: String, rows: Seq[Row],
      schema: StructType): (Int, Int) = {
    val rs = mutate("update", sObject, rows, schema)
    val ok = rs.count(r => r \ "success" == JBool(true))
    (ok, rs.size - ok)
  }

  override def upsert(sObject: String, externalIdField: String, rows: Seq[Row],
      schema: StructType): (Int, Int) = {
    val rs = mutate("upsert", sObject, rows, schema, Some(externalIdField))
    val created = rs.count(r => r \ "created" == JBool(true))
    val updated = rs.count(r =>
      r \ "success" == JBool(true) && r \ "created" != JBool(true))
    (created, updated)
  }

  override def delete(sObject: String, ids: Seq[String]): Int = {
    val schema = StructType(Seq(StructField("Id", StringType)))
    val rs = mutate("delete", sObject, ids.map(Row(_)), schema)
    rs.count(r => r \ "success" == JBool(true))
  }

  /** Predicate delete: the WHERE runs org-side in a Bulk query that
    * returns only Ids; the matching records are then bulk-deleted —
    * bulk_delete(object, where) semantics (data_connector.py:294-298)
    * with only the Id stream crossing the client. */
  override def deleteWhere(sObject: String, predicates: Seq[String]): Int = {
    val ids = query(Soql.render(sObject, Seq("Id"), predicates, None))
      .map(_.getString(0)).toSeq
    if (ids.isEmpty) 0 else delete(sObject, ids)
  }
}
