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
}
