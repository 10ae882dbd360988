package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.sources._
import graft.spec.ConnectorParam

/** The token lifecycle (fetch / cache / invalidate-and-retry-once /
  * failed-refresh), driven entirely through the injectable HTTP boundary —
  * data_connector.py:164-252 behavior with zero network egress. */
class AuthSuite extends AnyFunSuite {

  private val creds = ConnectorParam(
    username = "u@example.org", password = "pw+sectoken",
    url = "https://login.example.org",
    consumerKey = "ck", consumerSecret = "cs")

  /** Scripted transport: returns canned responses, records every call. */
  private final class FakeHttp(responses: Iterator[(Int, String)])
      extends HttpTransport {
    val calls = scala.collection.mutable.ArrayBuffer.empty[(String, Map[String, String])]
    override def postForm(url: String, params: Map[String, String]): (Int, String) = {
      calls += ((url, params))
      responses.next()
    }
  }

  private def ok(token: String): (Int, String) =
    (200, s"""{"access_token": "$token", "instance_url": "https://na1.example.org"}""")

  test("fresh token: fetched via password grant and cached") {
    val http = new FakeHttp(Iterator(ok("T1")))
    val p = new TokenProvider(creds, http)
    assert(p.token() == AuthToken("T1", "https://na1.example.org"))
    // grant parameters match the reference's get_oauth2_token form
    val (url, params) = http.calls.head
    assert(url == "https://login.example.org/services/oauth2/token")
    assert(params("grant_type") == "password" && params("username") == creds.username)
    // second call is served from cache — no second HTTP round trip
    assert(p.token().accessToken == "T1")
    assert(http.calls.size == 1)
  }

  test("JWT bearer grant: signed assertion verifies and fetches a token") {
    val kpg = java.security.KeyPairGenerator.getInstance("RSA")
    kpg.initialize(2048, new java.security.SecureRandom(Array[Byte](42)))
    val kp = kpg.generateKeyPair()
    val grant = new JwtBearerGrant(
      clientId = "ck", username = "u@example.org",
      audience = "https://login.example.org", key = kp.getPrivate,
      now = () => 1700000000000L)
    val http = new FakeHttp(Iterator(ok("JWT_TOK")))
    val p = new TokenProvider(creds, http, grant = Some(grant))
    assert(p.token() == AuthToken("JWT_TOK", "https://na1.example.org"))

    val (_, params) = http.calls.head
    assert(params("grant_type") == "urn:ietf:params:oauth:grant-type:jwt-bearer")
    val assertion = params("assertion")
    val Array(h, c, s) = assertion.split('.')
    // the signature must verify against the public key over header.claims
    val sig = java.security.Signature.getInstance("SHA256withRSA")
    sig.initVerify(kp.getPublic)
    sig.update(s"$h.$c".getBytes("UTF-8"))
    assert(sig.verify(java.util.Base64.getUrlDecoder.decode(s)),
      "assertion signature must verify")
    val claims = new String(java.util.Base64.getUrlDecoder.decode(c), "UTF-8")
    assert(claims.contains(""""iss":"ck"""") &&
      claims.contains(""""sub":"u@example.org"""") &&
      claims.contains(""""aud":"https://login.example.org"""") &&
      claims.contains(""""exp":1700000180"""), claims)
  }

  test("expired session: invalidate, re-auth, replay exactly once") {
    val http = new FakeHttp(Iterator(ok("T1"), ok("T2")))
    val p = new TokenProvider(creds, http)
    var attempts = 0
    val out = p.withAuthRetry { t =>
      attempts += 1
      if (t.accessToken == "T1") throw new SessionExpiredException("INVALID_SESSION_ID")
      s"ran with ${t.accessToken}"
    }
    assert(out == "ran with T2")
    assert(attempts == 2, "must replay exactly once")
    assert(http.calls.size == 2, "second attempt must re-authenticate")
  }

  test("persistently expired session fails after the single retry") {
    val http = new FakeHttp(Iterator(ok("T1"), ok("T2")))
    val p = new TokenProvider(creds, http)
    intercept[SessionExpiredException] {
      p.withAuthRetry { _ => throw new SessionExpiredException("still dead") }
    }
    assert(http.calls.size == 2)
  }

  test("failed refresh propagates AuthFailedException, not a retry loop") {
    val http = new FakeHttp(Iterator((400, """{"error": "invalid_grant"}""")))
    val p = new TokenProvider(creds, http)
    intercept[AuthFailedException] { p.token() }
    assert(http.calls.size == 1)
  }

  test("malformed token response is an auth failure") {
    val http = new FakeHttp(Iterator((200, """{"unexpected": true}""")))
    val p = new TokenProvider(creds, new FakeHttp(Iterator((200, "{}"))))
    intercept[AuthFailedException] { p.token() }
  }

  test("file token cache round-trips and survives invalidation") {
    val f = java.nio.file.Files.createTempFile("graft-sessions", ".ini")
    try {
      val cache = new FileTokenCache(f)
      assert(cache.get("u@example.org").isEmpty)
      cache.put("u@example.org", AuthToken("TOK", "https://na1.example.org"))
      cache.put("v@example.org", AuthToken("TOK2", "https://na2.example.org"))
      // a NEW cache instance reads the same file (persistence, sessions.ini)
      assert(new FileTokenCache(f).get("u@example.org")
        .contains(AuthToken("TOK", "https://na1.example.org")))
      cache.remove("u@example.org")
      assert(cache.get("u@example.org").isEmpty)
      assert(cache.get("v@example.org").nonEmpty)
    } finally java.nio.file.Files.deleteIfExists(f)
  }

  test("AuthRetryOrg replays an org call on a fresh session") {
    val http = new FakeHttp(Iterator(ok("T1"), ok("T2")))
    val provider = new TokenProvider(creds, http)
    val schema = StructType(Seq(StructField("Id", StringType)))
    val real = new InMemoryOrg
    real.createTable("Account", schema, Seq(Row("A1")))
    // sessions bound to T1 are expired; T2 works
    def open(t: AuthToken): RemoteOrg =
      if (t.accessToken == "T1") new RemoteOrg {
        private def dead = throw new SessionExpiredException("INVALID_SESSION_ID")
        override def describe(s: String) = dead
        override def query(soql: String) = dead
        override def insert(s: String, r: Seq[Row], sc: StructType) = dead
        override def update(s: String, r: Seq[Row], sc: StructType) = dead
        override def upsert(s: String, e: String, r: Seq[Row], sc: StructType) = dead
        override def delete(s: String, ids: Seq[String]) = dead
        override def deleteWhere(s: String, p: Seq[String]) = dead
      } else real
    val org = new AuthRetryOrg(provider, open)
    assert(org.query("SELECT Id FROM Account").toSeq == Seq(Row("A1")))
    assert(http.calls.size == 2)
  }
}
