package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.sources._

/** The SOAP Partner-API fallback driven entirely offline: login
  * round-trip, the query → queryMore cursor loop, xsi:nil nulls,
  * described-type coercion, aggregate expr resolution, the 200-record
  * mutation contract, and session-expiry surfacing. */
class SoapOrgSuite extends AnyFunSuite {

  private val server = "https://na1.example.org/services/Soap/u/47.0"

  private def env(body: String): (Int, String) =
    (200, "<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
      "<soapenv:Envelope xmlns:soapenv=\"http://schemas.xmlsoap.org/soap/envelope/\" " +
      "xmlns:xsi=\"http://www.w3.org/2001/XMLSchema-instance\" " +
      "xmlns:sf=\"urn:partner.soap.sforce.com\">" +
      s"<soapenv:Body>$body</soapenv:Body></soapenv:Envelope>")

  private val accountDescribe = env("""<describeSObjectResponse><result>
    <name>Account</name>
    <fields><name>Id</name><type>id</type></fields>
    <fields><name>Name</name><type>string</type></fields>
    <fields><name>Amount</name><type>int</type></fields>
    <fields><name>Closed</name><type>boolean</type></fields>
    </result></describeSObjectResponse>""")

  /** Records calls; routes on envelope content. */
  private class SoapHttp(script: PartialFunction[String, (Int, String)])
      extends HttpTransport {
    val bodies = scala.collection.mutable.ArrayBuffer.empty[String]
    override def postForm(url: String, params: Map[String, String]) =
      fail("SOAP org must not use form posts")
    override def send(method: String, url: String,
        headers: Map[String, String], body: String): (Int, String) = {
      assert(method == "POST" && url == server, s"$method $url")
      assert(headers.get("Content-Type").exists(_.startsWith("text/xml")),
        "SOAP calls must be text/xml")
      bodies += body
      script.applyOrElse(body, (b: String) => fail(s"unexpected envelope: $b"))
    }
  }

  test("login posts a sessionless envelope and binds to the returned serverUrl") {
    val http = new HttpTransport {
      val urls = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      override def postForm(url: String, params: Map[String, String]) = fail("no form posts")
      override def send(method: String, url: String,
          headers: Map[String, String], body: String): (Int, String) = {
        urls += ((url, body))
        assert(body.contains("<urn:username>user@example.org</urn:username>"))
        assert(body.contains("<urn:password>pw&amp;1</urn:password>"),
          "credentials must be XML-escaped")
        assert(!body.contains("SessionHeader"), "login is sessionless")
        env(s"""<loginResponse><result>
          <serverUrl>$server</serverUrl>
          <sessionId>SID-9</sessionId></result></loginResponse>""")
      }
    }
    val org = SoapOrg.login(http, "https://login.example.org/services/Soap/u/47.0",
      "user@example.org", "pw&1")
    assert(http.urls.head._1 == "https://login.example.org/services/Soap/u/47.0")
    assert(org != null)
  }

  test("query pages through the queryMore cursor until done, coercing types") {
    val rec1 = """<records xsi:type="sf:sObject"><sf:type>Account</sf:type>
      <sf:Id>A1</sf:Id><sf:Name>acme</sf:Name><sf:Amount>10</sf:Amount>
      <sf:Closed>false</sf:Closed></records>
      <records xsi:type="sf:sObject"><sf:type>Account</sf:type>
      <sf:Id>A2</sf:Id><sf:Name xsi:nil="true"/><sf:Amount>20</sf:Amount>
      <sf:Closed>true</sf:Closed></records>"""
    val rec2 = """<records xsi:type="sf:sObject"><sf:type>Account</sf:type>
      <sf:Id>A3</sf:Id><sf:Name>zorg</sf:Name><sf:Amount xsi:nil="true"/>
      <sf:Closed>false</sf:Closed></records>"""
    val http = new SoapHttp({
      case b if b.contains("describeSObject") => accountDescribe
      case b if b.contains("<urn:queryString>") =>
        assert(b.contains("<urn:batchSize>500</urn:batchSize>"),
          "query must negotiate the page size")
        env(s"""<queryResponse><result xsi:type="QueryResult">
          <done>false</done><queryLocator>LOC-1</queryLocator>
          $rec1<size>3</size></result></queryResponse>""")
      case b if b.contains("<urn:queryLocator>LOC-1</urn:queryLocator>") =>
        env(s"""<queryMoreResponse><result xsi:type="QueryResult">
          <done>true</done><queryLocator></queryLocator>
          $rec2<size>3</size></result></queryMoreResponse>""")
    })
    val org = new SoapOrg("SID", server, http)
    val rows = org.query("SELECT Id, Name, Amount, Closed FROM Account").toSeq
    assert(rows == Seq(
      Row("A1", "acme", 10L, false),
      Row("A2", null, 20L, true),
      Row("A3", "zorg", null, false)))
    // wire sequence: describe, query, exactly one queryMore with the locator
    assert(http.bodies.count(_.contains("queryMore")) == 1)
    assert(http.bodies.last.contains("LOC-1"))
    // every sessioned call carried the SessionHeader
    assert(http.bodies.forall(b =>
      b.contains("<urn:sessionId>SID</urn:sessionId>")))
  }

  test("a record field literally named done/queryLocator can't fake the cursor") {
    // the QueryResult metadata (<done>false</done>, LOC-1) comes AFTER
    // the records; a first-match regex over the whole response would read
    // the record's own <sf:done>true</sf:done> as the cursor state and
    // stop after page one, silently dropping rows
    val describe = env("""<describeSObjectResponse><result>
      <name>Task</name>
      <fields><name>Id</name><type>id</type></fields>
      <fields><name>done</name><type>boolean</type></fields>
      <fields><name>queryLocator</name><type>string</type></fields>
      </result></describeSObjectResponse>""")
    val http = new SoapHttp({
      case b if b.contains("describeSObject") => describe
      case b if b.contains("<urn:queryString>") =>
        env("""<queryResponse><result xsi:type="QueryResult">
          <records xsi:type="sf:sObject"><sf:type>Task</sf:type>
            <sf:Id>T1</sf:Id><sf:done>true</sf:done>
            <sf:queryLocator>FAKE-LOC</sf:queryLocator></records>
          <done>false</done><queryLocator>LOC-1</queryLocator>
          <size>2</size></result></queryResponse>""")
      case b if b.contains("<urn:queryLocator>LOC-1</urn:queryLocator>") =>
        env("""<queryMoreResponse><result xsi:type="QueryResult">
          <records xsi:type="sf:sObject"><sf:type>Task</sf:type>
            <sf:Id>T2</sf:Id><sf:done>false</sf:done>
            <sf:queryLocator xsi:nil="true"/></records>
          <done>true</done><queryLocator></queryLocator>
          <size>2</size></result></queryMoreResponse>""")
    })
    val org = new SoapOrg("SID", server, http)
    val rows = org.query("SELECT Id, done, queryLocator FROM Task").toSeq
    assert(rows == Seq(Row("T1", true, "FAKE-LOC"), Row("T2", false, null)))
    assert(http.bodies.count(_.contains("queryMore")) == 1,
      "the real metadata cursor must drive pagination, not record content")
  }

  test("a non-XML-safe field name is rejected before it corrupts an envelope") {
    val http = new SoapHttp(PartialFunction.empty)
    val org = new SoapOrg("SID", server, http)
    val bad = StructType(Seq(StructField("Bad Name<x>", StringType)))
    val e = intercept[IllegalArgumentException](
      org.insert("Account", Seq(Row("v")), bad))
    assert(e.getMessage.contains("XML-safe"))
    assert(http.bodies.isEmpty, "nothing may reach the wire")
  }

  test("dotted relationship items traverse the NESTED record form") {
    val http = new SoapHttp({
      case b if b.contains("describeSObject") => accountDescribe
      case b if b.contains("<urn:queryString>") =>
        env("""<queryResponse><result xsi:type="QueryResult">
          <done>true</done><queryLocator></queryLocator>
          <records xsi:type="sf:sObject"><sf:type>Contact</sf:type>
            <sf:Id>C1</sf:Id>
            <sf:Account><sf:Name>acme &amp; co</sf:Name></sf:Account>
          </records>
          <records xsi:type="sf:sObject"><sf:type>Contact</sf:type>
            <sf:Id>C2</sf:Id>
            <sf:Account xsi:nil="true"/>
          </records><size>2</size></result></queryResponse>""")
    })
    val org = new SoapOrg("SID", server, http)
    val rows = org.query("SELECT Id, Account.Name FROM Account").toSeq
    // nested traversal + leaf-only unescape; a nil parent short-circuits
    assert(rows == Seq(Row("C1", "acme & co"), Row("C2", null)))
  }

  test("a faultless 500 is a transport error; session data can't fake expiry") {
    val http = new SoapHttp({
      case b if b.contains("describeSObject") => accountDescribe
      case b if b.contains("<urn:queryString>") && b.contains("Amount") =>
        (500, "<html>bad gateway</html>") // proxy error, no SOAP fault
      case b if b.contains("<urn:queryString>") =>
        // record DATA containing the magic string must NOT raise expiry
        env("""<queryResponse><result xsi:type="QueryResult">
          <done>true</done><queryLocator></queryLocator>
          <records><sf:type>Account</sf:type><sf:Id>A1</sf:Id>
            <sf:Name>log: INVALID_SESSION_ID seen at 10:00</sf:Name>
          </records><size>1</size></result></queryResponse>""")
    })
    val org = new SoapOrg("SID", server, http)
    val ex = intercept[RuntimeException](
      org.query("SELECT Id, Amount FROM Account").toSeq)
    assert(!ex.isInstanceOf[SessionExpiredException] &&
      ex.getMessage.contains("500"), ex.getMessage)
    val rows = org.query("SELECT Id, Name FROM Account").toSeq
    assert(rows == Seq(Row("A1", "log: INVALID_SESSION_ID seen at 10:00")))
  }

  test("aggregate select items resolve positionally from AggregateResult") {
    val http = new SoapHttp({
      case b if b.contains("describeSObject") => accountDescribe
      case b if b.contains("<urn:queryString>") =>
        env("""<queryResponse><result xsi:type="QueryResult">
          <done>true</done><queryLocator></queryLocator>
          <records xsi:type="sf:AggregateResult">
            <sf:type>AggregateResult</sf:type><sf:expr0>A7</sf:expr0>
          </records><size>1</size></result></queryResponse>""")
    })
    val org = new SoapOrg("SID", server, http)
    val rows = org.query("SELECT MAX(Id) FROM Account").toSeq
    assert(rows == Seq(Row("A7")))
  }

  test("mutations round-trip sObject envelopes and honor the 200-row chunk") {
    val schema = StructType(Seq(
      StructField("Name", StringType), StructField("Amount", LongType)))
    val http = new SoapHttp({
      case b if b.contains("<urn:create>") =>
        assert(b.contains("<urn:type>Account</urn:type>"))
        assert(b.contains("<Name>acme &amp; co</Name>"), "values must escape")
        assert(b.contains("<urn:fieldsToNull>Amount</urn:fieldsToNull>"),
          "null columns must travel as fieldsToNull")
        env("""<createResponse>
          <result><id>N1</id><success>true</success></result>
          <result><id>N2</id><success>true</success></result>
          </createResponse>""")
      case b if b.contains("<urn:update>") =>
        env("""<updateResponse>
          <result><id>N1</id><success>true</success></result>
          <result><success>false</success></result>
          </updateResponse>""")
      case b if b.contains("<urn:upsert>") =>
        assert(b.contains("<urn:externalIDFieldName>Ext__c</urn:externalIDFieldName>"))
        env("""<upsertResponse>
          <result><id>N3</id><success>true</success><created>true</created></result>
          <result><id>N1</id><success>true</success><created>false</created></result>
          </upsertResponse>""")
      case b if b.contains("<urn:delete>") =>
        assert(b.contains("<urn:ids>N1</urn:ids>") && b.contains("<urn:ids>N2</urn:ids>"))
        env("""<deleteResponse>
          <result><id>N1</id><success>true</success></result>
          <result><id>N2</id><success>true</success></result>
          </deleteResponse>""")
    })
    val org = new SoapOrg("SID", server, http)
    assert(org.insert("Account",
      Seq(Row("acme & co", null), Row("zorg", 5L)), schema) == Seq("N1", "N2"))
    assert(org.update("Account",
      Seq(Row("a", 1L), Row("b", 2L)), schema) == ((1, 1)))
    assert(org.upsert("Account", "Ext__c",
      Seq(Row("a", 1L), Row("b", 2L)), schema) == ((1, 1)))
    assert(org.delete("Account", Seq("N1", "N2")) == 2)
    // the 200-row SOAP contract is require()d at this boundary
    val big = (1 to 201).map(i => Row(s"r$i", i.toLong))
    intercept[IllegalArgumentException](org.insert("Account", big, schema))
    intercept[IllegalArgumentException](org.delete("Account",
      (1 to 201).map(i => s"I$i")))
  }

  test("INVALID_SESSION_ID surfaces as SessionExpiredException for AuthRetryOrg") {
    val http = new SoapHttp({
      case b if b.contains("describeSObject") =>
        (500, """<soapenv:Envelope><soapenv:Body><soapenv:Fault>
          <faultcode>sf:INVALID_SESSION_ID</faultcode>
          <faultstring>Invalid Session ID</faultstring>
          </soapenv:Fault></soapenv:Body></soapenv:Envelope>""")
    })
    val org = new SoapOrg("STALE", server, http)
    intercept[SessionExpiredException](org.describe("Account"))
  }

  test("deleteWhere resolves the predicate org-side and deletes in chunks") {
    var deleteCalls = 0
    val http = new SoapHttp({
      case b if b.contains("describeSObject") => accountDescribe
      case b if b.contains("<urn:queryString>") =>
        assert(b.contains("WHERE (Amount &gt; 5)"), "predicate must push org-side")
        val recs = (1 to 250).map(i =>
          s"""<records><sf:type>Account</sf:type><sf:Id>D$i</sf:Id></records>""").mkString
        env(s"""<queryResponse><result><done>true</done>
          <queryLocator></queryLocator>$recs<size>250</size></result></queryResponse>""")
      case b if b.contains("<urn:delete>") =>
        deleteCalls += 1
        val n = "<urn:ids>".r.findAllIn(b).size
        assert(n <= 200, s"delete chunk of $n exceeds the SOAP contract")
        val rs = (1 to n).map(_ =>
          "<result><success>true</success></result>").mkString
        env(s"<deleteResponse>$rs</deleteResponse>")
    })
    val org = new SoapOrg("SID", server, http)
    assert(org.deleteWhere("Account", Seq("Amount > 5")) == 250)
    assert(deleteCalls == 2, "250 ids must split into 200 + 50")
  }
}
