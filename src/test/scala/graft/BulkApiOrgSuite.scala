package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.sources._
import graft.spec.ConnectorParam

/** The HTTP-shaped [[BulkApiOrg]] driven entirely offline through a
  * scripted transport: every verb is asserted as the exact Bulk REST
  * request sequence (create job → add batch → close → poll → result),
  * including poll-until-Completed and the retry-once-on-expired-session
  * policy when wrapped in [[AuthRetryOrg]]. */
class BulkApiOrgSuite extends AnyFunSuite {

  private val tok = AuthToken("TOK1", "https://na1.example.org")
  private val async = "https://na1.example.org/services/async/47.0"
  private val rest = "https://na1.example.org/services/data/v47.0"

  private val accountDescribe =
    """{"fields": [
      {"name": "Id", "type": "id"},
      {"name": "Name", "type": "string"},
      {"name": "Amount", "type": "int"},
      {"name": "Closed", "type": "boolean"},
      {"name": "CloseDate", "type": "date"}]}"""

  /** Scripted transport: routes by (method, url suffix), records calls. */
  private class ScriptedHttp(
      script: PartialFunction[(String, String), (Int, String)])
      extends HttpTransport {
    val calls = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    override def postForm(url: String, params: Map[String, String]): (Int, String) =
      (200, s"""{"access_token": "TOK${calls.size}", "instance_url": "https://na1.example.org"}""")
    override def send(method: String, url: String,
        headers: Map[String, String], body: String): (Int, String) = {
      calls += ((method, url, body))
      assert(headers.contains("X-SFDC-Session"), s"missing session header on $url")
      script.applyOrElse((method, url),
        (k: (String, String)) => fail(s"unexpected request $k"))
    }
  }

  test("query resolves dotted relationship-path items through nested JSON") {
    val http = new ScriptedHttp({
      case ("GET", u) if u == s"$rest/sobjects/Contact/describe" =>
        (200, """{"fields": [
          {"name": "Id", "type": "id"},
          {"name": "AccountId", "type": "id"}]}""")
      case ("POST", u) if u == s"$async/job" => (201, """{"id": "J9"}""")
      case ("POST", u) if u == s"$async/job/J9/batch" => (201, """{"id": "B9"}""")
      case ("POST", u) if u == s"$async/job/J9" => (200, """{"state": "Closed"}""")
      case ("GET", u) if u == s"$async/job/J9/batch/B9" =>
        (200, """{"state": "Completed"}""")
      case ("GET", u) if u == s"$async/job/J9/batch/B9/result" =>
        (200, """["R1"]""")
      case ("GET", u) if u == s"$async/job/J9/batch/B9/result/R1" =>
        // real Bulk JSON nests relationship paths as child objects; a
        // row with no parent carries null, not a missing key
        (200, """[
          {"Id": "C1", "Account": {"Name": "acme"}},
          {"Id": "C2", "Account": null}]""")
    })
    val org = new BulkApiOrg(tok, http, sleeper = _ => ())
    val rows = org.query("SELECT Id, Account.Name FROM Contact").toSeq
    assert(rows == Seq(Row("C1", "acme"), Row("C2", null)))
  }

  test("query runs the full job lifecycle and coerces described types") {
    var polls = 0
    val http = new ScriptedHttp({
      case ("GET", u) if u == s"$rest/sobjects/Account/describe" =>
        (200, accountDescribe)
      case ("POST", u) if u == s"$async/job" => (201, """{"id": "J1"}""")
      case ("POST", u) if u == s"$async/job/J1/batch" => (201, """{"id": "B1"}""")
      case ("POST", u) if u == s"$async/job/J1" => (200, """{"state": "Closed"}""")
      case ("GET", u) if u == s"$async/job/J1/batch/B1" =>
        polls += 1
        if (polls < 3) (200, s"""{"state": "${if (polls == 1) "Queued" else "InProgress"}"}""")
        else (200, """{"state": "Completed"}""")
      case ("GET", u) if u == s"$async/job/J1/batch/B1/result" =>
        (200, """["R1"]""")
      case ("GET", u) if u == s"$async/job/J1/batch/B1/result/R1" =>
        (200, """[
          {"Id": "A1", "Name": "acme", "Amount": 10, "Closed": false, "CloseDate": "2024-02-03"},
          {"Id": "A2", "Name": "zorg", "Amount": null, "Closed": true, "CloseDate": null}]""")
    })
    var slept = 0
    val org = new BulkApiOrg(tok, http, sleeper = _ => slept += 1)
    val rows = org.query(
      "SELECT Id, Name, Amount, Closed, CloseDate FROM Account").toSeq

    assert(rows == Seq(
      Row("A1", "acme", 10L, false, java.sql.Date.valueOf("2024-02-03")),
      Row("A2", "zorg", null, true, null)))
    assert(polls == 3, "must poll until Completed")
    assert(slept == 2, "must sleep between pending polls")
    // exact lifecycle order after the describe
    val seq = http.calls.toSeq.map(c => (c._1, c._2.stripPrefix(async)))
    assert(seq.drop(1) == Seq(
      ("POST", "/job"), ("POST", "/job/J1/batch"), ("POST", "/job/J1"),
      ("GET", "/job/J1/batch/B1"), ("GET", "/job/J1/batch/B1"),
      ("GET", "/job/J1/batch/B1"), ("GET", "/job/J1/batch/B1/result"),
      ("GET", "/job/J1/batch/B1/result/R1")), seq.mkString("\n"))
    // the SOQL itself is the batch payload; the job asked for a JSON query job
    assert(http.calls(1)._3.contains(""""operation":"query""""))
    assert(http.calls(2)._3 == "SELECT Id, Name, Amount, Closed, CloseDate FROM Account")
  }

  private val writeSchema = StructType(Seq(
    StructField("Name", StringType), StructField("Amount", LongType)))

  private def mutationHttp(op: String, result: String): ScriptedHttp =
    new ScriptedHttp({
      case ("POST", u) if u == s"$async/job" => (201, """{"id": "J1"}""")
      case ("POST", u) if u == s"$async/job/J1/batch" => (201, """{"id": "B1"}""")
      case ("POST", u) if u == s"$async/job/J1" => (200, """{"state": "Closed"}""")
      case ("GET", u) if u == s"$async/job/J1/batch/B1" =>
        (200, """{"state": "Completed"}""")
      case ("GET", u) if u == s"$async/job/J1/batch/B1/result" => (200, result)
    })

  test("insert posts JSON records and returns created ids in order") {
    val http = mutationHttp("insert",
      """[{"id": "A1", "success": true, "created": true},
         {"id": "A2", "success": true, "created": true}]""")
    val org = new BulkApiOrg(tok, http, sleeper = _ => ())
    val ids = org.insert("Account",
      Seq(Row("acme", 10L), Row("zorg", null)), writeSchema)
    assert(ids == Seq("A1", "A2"))
    assert(http.calls.head._3.contains(""""operation":"insert""""))
    // null columns are omitted from the record JSON, not sent as null
    assert(http.calls(1)._3 ==
      """[{"Name":"acme","Amount":10},{"Name":"zorg"}]""")
  }

  test("update counts successes and failures from batch results") {
    val http = mutationHttp("update",
      """[{"id": "A1", "success": true, "created": false},
         {"id": null, "success": false, "created": false}]""")
    val org = new BulkApiOrg(tok, http, sleeper = _ => ())
    assert(org.update("Account", Seq(Row("a", 1L), Row("b", 2L)), writeSchema)
      == ((1, 1)))
  }

  test("upsert splits created vs updated and sends the external id field") {
    val http = mutationHttp("upsert",
      """[{"id": "A1", "success": true, "created": true},
         {"id": "A2", "success": true, "created": false}]""")
    val org = new BulkApiOrg(tok, http, sleeper = _ => ())
    assert(org.upsert("Account", "Ext__c",
      Seq(Row("a", 1L), Row("b", 2L)), writeSchema) == ((1, 1)))
    assert(http.calls.head._3.contains(""""externalIdFieldName":"Ext__c""""))
  }

  test("delete posts Id records and counts successes") {
    val http = mutationHttp("delete",
      """[{"id": "A1", "success": true}, {"id": "A2", "success": true}]""")
    val org = new BulkApiOrg(tok, http, sleeper = _ => ())
    assert(org.delete("Account", Seq("A1", "A2")) == 2)
    assert(http.calls(1)._3 == """[{"Id":"A1"},{"Id":"A2"}]""")
  }

  test("failed batch state surfaces as an error, not an empty result") {
    val http = new ScriptedHttp({
      case ("POST", u) if u == s"$async/job" => (201, """{"id": "J1"}""")
      case ("POST", u) if u == s"$async/job/J1/batch" => (201, """{"id": "B1"}""")
      case ("POST", u) if u == s"$async/job/J1" => (200, """{"state": "Closed"}""")
      case ("GET", u) if u == s"$async/job/J1/batch/B1" =>
        (200, """{"state": "Failed"}""")
    })
    val org = new BulkApiOrg(tok, http, sleeper = _ => ())
    val e = intercept[RuntimeException] {
      org.insert("Account", Seq(Row("a", 1L)), writeSchema)
    }
    assert(e.getMessage.contains("Failed"))
  }

  test("expired session replays the whole org call once on a fresh token") {
    // first job creation under TOK-old dies with INVALID_SESSION_ID; the
    // AuthRetryOrg stack re-authenticates and replays against TOK-new
    val script: PartialFunction[(String, String), (Int, String)] = {
      case ("POST", u) if u == s"$async/job" => (201, """{"id": "J1"}""")
      case ("POST", u) if u == s"$async/job/J1/batch" => (201, """{"id": "B1"}""")
      case ("POST", u) if u == s"$async/job/J1" => (200, """{"state": "Closed"}""")
      case ("GET", u) if u == s"$async/job/J1/batch/B1" =>
        (200, """{"state": "Completed"}""")
      case ("GET", u) if u == s"$async/job/J1/batch/B1/result" =>
        (200, """[{"id": "A1", "success": true, "created": true}]""")
    }
    val http = new ScriptedHttp(script) {
      private var first = true
      override def send(method: String, url: String,
          headers: Map[String, String], body: String): (Int, String) = {
        if (first && url.endsWith("/job") && method == "POST") {
          first = false
          calls += ((method, url, body))
          return (401, """[{"errorCode": "INVALID_SESSION_ID"}]""")
        }
        super.send(method, url, headers, body)
      }
    }
    val provider = new TokenProvider(
      ConnectorParam("u@example.org", "pw", "https://login.example.org", "ck", "cs"),
      http)
    val org = new AuthRetryOrg(provider,
      t => new BulkApiOrg(t, http, sleeper = _ => ()))
    val ids = org.insert("Account", Seq(Row("a", 1L)), writeSchema)
    assert(ids == Seq("A1"))
    // the dead call burned one job POST, then the replay ran the full
    // lifecycle: 1 failed + 5 successful requests
    val jobPosts = http.calls.count(c => c._1 == "POST" && c._2 == s"$async/job")
    assert(jobPosts == 2, http.calls.mkString("\n"))
  }

  test("deleteWhere queries matching ids org-side then bulk-deletes them") {
    var jobN = 0
    val http = new ScriptedHttp({
      case ("GET", u) if u == s"$rest/sobjects/Account/describe" =>
        (200, accountDescribe)
      case ("POST", u) if u == s"$async/job" =>
        jobN += 1; (201, s"""{"id": "J$jobN"}""")
      case ("POST", u) if u.endsWith("/batch") =>
        (201, s"""{"id": "B$jobN"}""")
      case ("POST", u) if u.matches(s"$async/job/J\\d+") =>
        (200, """{"state": "Closed"}""")
      case ("GET", u) if u.matches(s"$async/job/J\\d+/batch/B\\d+") =>
        (200, """{"state": "Completed"}""")
      case ("GET", u) if u == s"$async/job/J1/batch/B1/result" =>
        (200, """["R1"]""")
      case ("GET", u) if u == s"$async/job/J1/batch/B1/result/R1" =>
        (200, """[{"Id": "A1"}, {"Id": "A3"}]""")
      case ("GET", u) if u == s"$async/job/J2/batch/B2/result" =>
        (200, """[{"id": "A1", "success": true}, {"id": "A3", "success": true}]""")
    })
    val org = new BulkApiOrg(tok, http, sleeper = _ => ())
    assert(org.deleteWhere("Account", Seq("Amount > 5")) == 2)
    // the predicate shipped inside the query batch payload
    assert(http.calls.exists(c =>
      c._3.contains("SELECT Id FROM Account WHERE (Amount > 5)")),
      http.calls.mkString("\n"))
  }
}
