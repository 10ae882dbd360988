package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.spec.ConnectorConfig

class ConnectorConfigSuite extends AnyFunSuite {

  private val ini = """
    |# migration config
    |[src]
    |username = alice@example.com
    |password = s3cret
    |url = https://login.example.com
    |consumer_key = ck
    |consumer_secret = cs
    |sandbox = true
    |
    |[dst]
    |username = bob@example.com
    |password = hunter2
    |url = https://test.example.com
    |production = TRUE
    |""".stripMargin

  test("parses sections, keys, comments, blank lines") {
    val parsed = ConnectorConfig.parseIni(ini)
    assert(parsed.keySet == Set("src", "dst"))
    assert(parsed("src")("username") == "alice@example.com")
  }

  test("builds ConnectorParam per section with defaults") {
    val p = ConnectorConfig.connParam(ConnectorConfig.parseIni(ini), "src")
    assert(p.username == "alice@example.com" && p.sandbox && !p.production)
    val d = ConnectorConfig.connParam(ConnectorConfig.parseIni(ini), "dst")
    assert(d.production && d.consumerKey == "")
  }

  test("missing section or key fails loud") {
    val parsed = ConnectorConfig.parseIni(ini)
    assertThrows[IllegalArgumentException] {
      ConnectorConfig.connParam(parsed, "nope")
    }
    assertThrows[IllegalArgumentException] {
      ConnectorConfig.connParam(
        ConnectorConfig.parseIni("[src]\nusername = x"), "src")
    }
  }

  test("values may contain '='; garbage lines rejected") {
    val p = ConnectorConfig.parseIni("[s]\nurl = https://x.com/?a=b=c")
    assert(p("s")("url") == "https://x.com/?a=b=c")
    assertThrows[IllegalArgumentException] {
      ConnectorConfig.parseIni("[s]\nthis is not a pair")
    }
  }

  test("OrgFactory: the INI protocol key picks the wire, auth shared") {
    import graft.sources._
    import org.apache.spark.sql.Row
    // one transport serving the OAuth token POST and both wires,
    // recording which endpoints each stack actually hits
    class WireProbe extends HttpTransport {
      val urls = scala.collection.mutable.ArrayBuffer.empty[String]
      override def postForm(url: String, params: Map[String, String]) = {
        urls += url
        (200, """{"access_token": "TOK-F", "instance_url": "https://inst.example.org"}""")
      }
      override def send(method: String, url: String,
          headers: Map[String, String], body: String): (Int, String) = {
        urls += url
        if (url.contains("/services/Soap/")) {
          assert(body.contains("<urn:sessionId>TOK-F</urn:sessionId>"),
            "SOAP stack must reuse the OAuth access token as session id")
          if (body.contains("describeSObject"))
            (200, """<e><describeSObjectResponse><result><name>A</name>
              <fields><name>Id</name><type>id</type></fields>
              </result></describeSObjectResponse></e>""")
          else
            (200, """<e><queryResponse><result><done>true</done>
              <queryLocator></queryLocator>
              <records><sf:type>A</sf:type><sf:Id>S1</sf:Id></records>
              <size>1</size></result></queryResponse></e>""")
        } else {
          assert(headers("X-SFDC-Session") == "TOK-F")
          val async = "https://inst.example.org/services/async/47.0"
          url match {
            case u if u.endsWith("/sobjects/A/describe") =>
              (200, """{"fields": [{"name": "Id", "type": "id"}]}""")
            case u if u == s"$async/job" => (201, """{"id": "J1"}""")
            case u if u == s"$async/job/J1/batch" => (201, """{"id": "B1"}""")
            case u if u == s"$async/job/J1" => (200, """{"state": "Closed"}""")
            case u if u == s"$async/job/J1/batch/B1" =>
              (200, """{"state": "Completed"}""")
            case u if u == s"$async/job/J1/batch/B1/result" => (200, """["R1"]""")
            case u if u.endsWith("/result/R1") =>
              (200, """[{"Id": "B9"}]""")
            case u => fail(s"unexpected bulk request $u")
          }
        }
      }
    }
    val iniTxt = """
      [soap_org]
      username = u@example.org
      password = pw
      url = https://login.example.org
      protocol = soap
      [bulk_org]
      username = u@example.org
      password = pw
      url = https://login.example.org
    """
    val parsed = ConnectorConfig.parseIni(iniTxt)
    val probeS = new WireProbe
    val soap = OrgFactory.fromConfig(parsed, "soap_org", probeS)
    assert(soap.query("SELECT Id FROM A").toSeq == Seq(Row("S1")))
    assert(probeS.urls.exists(_.contains("/services/oauth2/token")))
    assert(probeS.urls.count(_.contains("/services/Soap/u/47.0")) >= 2,
      s"SOAP stack never hit the SOAP endpoint: ${probeS.urls}")
    val probeB = new WireProbe
    val bulk = OrgFactory.fromConfig(parsed, "bulk_org", probeB) // default
    assert(bulk.query("SELECT Id FROM A").toSeq == Seq(Row("B9")))
    assert(probeB.urls.exists(_.contains("/services/async/47.0/job")),
      s"bulk stack never hit the Bulk endpoint: ${probeB.urls}")
    assertThrows[IllegalArgumentException] {
      OrgFactory.fromConfig(ConnectorConfig.parseIni(
        iniTxt.replace("protocol = soap", "protocol = carrier-pigeon")),
        "soap_org", new WireProbe).query("SELECT Id FROM A")
    }
  }
}
