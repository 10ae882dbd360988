package graft.sources

import java.util.concurrent.ConcurrentHashMap
import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.spec.ConnectorParam

/** OAuth2 token lifecycle for the remote-org connector — the Spark-native
  * form of the reference's auth surface (data_connector.py:164-252):
  *
  *   - fetch: password-grant POST to `/services/oauth2/token`
  *     (get_oauth2_token, data_connector.py:200-216)
  *   - cache: tokens keyed by username survive across connector calls
  *     (get_cached_token/save_token, data_connector.py:219-237; the
  *     reference persists to sessions.ini — [[FileTokenCache]] mirrors it)
  *   - invalidate + retry once: an expired session drops the cached token,
  *     re-authenticates, and replays the call exactly once
  *     (remove_token + the job-creation retry, data_connector.py:240-252)
  *
  * HTTP is injected behind [[HttpTransport]] so every path — fresh token,
  * cached token, expired-session retry, failed refresh — is testable with
  * zero network egress.
  */
final case class AuthToken(accessToken: String, instanceUrl: String)

/** Thrown by org calls when the remote session is no longer valid — the
  * sim of the INVALID_SESSION_ID fault the reference's retry path keys on
  * (data_connector.py:246-252). */
final class SessionExpiredException(msg: String) extends RuntimeException(msg)

/** Thrown when authentication itself fails (bad credentials / org down). */
final class AuthFailedException(msg: String) extends RuntimeException(msg)

/** Minimal injectable HTTP boundary: a form POST returning (status, body),
  * plus a raw request method for REST/Bulk-API clients ([[BulkApiOrg]]).
  * The default implementation throws so form-only fakes stay valid. */
trait HttpTransport {
  def postForm(url: String, params: Map[String, String]): (Int, String)
  /** Raw request: (status, body). `body` is empty for GET. */
  def send(method: String, url: String, headers: Map[String, String],
      body: String): (Int, String) =
    throw new UnsupportedOperationException(
      "this transport only supports form POSTs")
  /** Release pooled connections/threads. No-op default: plain
    * URLConnection-style transports hold nothing, but a pooled client
    * leaks its pool on every recipe change unless the displaced org's
    * transport is released ([[graft.sources.RemoteOrgRegistry.resolve]]
    * closes displaced orgs). */
  def close(): Unit = ()
}

/** Serializable factory from which a recipe-rebuilt wire org
  * ([[BulkApiOrgRecipe]]/[[SoapOrgRecipe]]) constructs its HTTP
  * transport inside whatever executor JVM a scan partition lands in.
  * A production factory holds only plain connection config (proxy
  * host, timeouts) and `new`s a real HTTP client per JVM — it must
  * NOT capture the driver's live client or any other non-serializable
  * state. Implement as a case class: [[RemoteOrgRegistry.resolve]]
  * caches rebuilt orgs keyed on recipe EQUALITY, and the factory is
  * part of the recipe. */
trait TransportFactory extends Serializable {
  def transport(): HttpTransport
}

/** Token storage boundary; keyed by username like sessions.ini. */
trait TokenCache {
  def get(username: String): Option[AuthToken]
  def put(username: String, token: AuthToken): Unit
  def remove(username: String): Unit
}

final class InMemoryTokenCache extends TokenCache {
  private val m = new ConcurrentHashMap[String, AuthToken]()
  override def get(username: String): Option[AuthToken] = Option(m.get(username))
  override def put(username: String, token: AuthToken): Unit = m.put(username, token)
  override def remove(username: String): Unit = m.remove(username)
}

/** File-backed cache mirroring the reference's session file
  * (data_connector.py:24,230-237 — a JSON dict json.load/json.dump'd):
  * `{"username": {"token": "...", "url": "..."}}`. JSON keeps the file
  * plain text and delimiter-safe regardless of token contents. */
final class FileTokenCache(path: java.nio.file.Path) extends TokenCache {
  private def load(): Map[String, AuthToken] = {
    if (!java.nio.file.Files.exists(path)) return Map.empty
    val txt = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
    if (txt.isBlank) return Map.empty
    JsonMethods.parse(txt) match {
      case JObject(fields) => fields.flatMap {
        case (u, o: JObject) =>
          (o \ "token", o \ "url") match {
            case (JString(tok), JString(url)) => Some(u -> AuthToken(tok, url))
            case _ => None
          }
        case _ => None
      }.toMap
      case _ => Map.empty
    }
  }

  private def store(m: Map[String, AuthToken]): Unit = {
    val body = JsonMethods.compact(JsonMethods.render(
      JObject(m.toList.map { case (u, t) =>
        u -> (JObject("token" -> JString(t.accessToken),
                      "url" -> JString(t.instanceUrl)): JValue)
      })))
    java.nio.file.Files.write(path, body.getBytes("UTF-8"))
  }

  override def get(username: String): Option[AuthToken] = synchronized {
    load().get(username)
  }
  override def put(username: String, token: AuthToken): Unit = synchronized {
    store(load() + (username -> token))
  }
  override def remove(username: String): Unit = synchronized {
    store(load() - username)
  }
}

/** An OAuth2 grant: the form parameters POSTed to the token endpoint.
  * [[TokenProvider]] is grant-agnostic — caching, invalidation and the
  * retry-once policy are identical for every flow. */
trait OAuthGrant {
  def params(): Map[String, String]
}

/** The reference's flow: username-password grant
  * (get_oauth2_token, data_connector.py:200-216). */
final case class PasswordGrant(creds: ConnectorParam) extends OAuthGrant {
  override def params(): Map[String, String] = Map(
    "grant_type" -> "password",
    "client_id" -> creds.consumerKey,
    "client_secret" -> creds.consumerSecret,
    "username" -> creds.username,
    "password" -> creds.password)
}

/** JWT bearer grant (RFC 7523) — the modern server-to-server flow: a
  * short-lived RS256-signed assertion (iss=consumer key, sub=user,
  * aud=login host) replaces the password entirely. The assertion is
  * minted fresh per fetch; `now` is injectable for tests. */
final class JwtBearerGrant(
    clientId: String, username: String, audience: String,
    key: java.security.PrivateKey,
    validitySec: Long = 180L,
    now: () => Long = System.currentTimeMillis) extends OAuthGrant {

  private def b64url(bytes: Array[Byte]): String =
    java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(bytes)
  private def b64url(s: String): String =
    b64url(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** header.claims.signature — visible for test-side verification. */
  def assertion(): String = {
    val header = b64url("""{"alg":"RS256"}""")
    val exp = now() / 1000L + validitySec
    val claims = b64url(
      s"""{"iss":"$clientId","sub":"$username","aud":"$audience","exp":$exp}""")
    val signingInput = s"$header.$claims"
    val sig = java.security.Signature.getInstance("SHA256withRSA")
    sig.initSign(key)
    sig.update(signingInput.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    s"$signingInput.${b64url(sig.sign())}"
  }

  override def params(): Map[String, String] = Map(
    "grant_type" -> "urn:ietf:params:oauth:grant-type:jwt-bearer",
    "assertion" -> assertion())
}

/** Fetches, caches and refreshes org tokens; [[withAuthRetry]] is the
  * retry-once-on-expiry policy every connector call should run under. */
final class TokenProvider(
    creds: ConnectorParam,
    http: HttpTransport,
    cache: TokenCache = new InMemoryTokenCache,
    grant: Option[OAuthGrant] = None) {

  private val flow: OAuthGrant = grant.getOrElse(PasswordGrant(creds))

  private def fetch(): AuthToken = {
    val (status, body) =
      http.postForm(s"${creds.url}/services/oauth2/token", flow.params())
    if (status != 200)
      throw new AuthFailedException(s"token endpoint returned $status")
    val json = JsonMethods.parse(body)
    (json \ "access_token", json \ "instance_url") match {
      case (JString(tok), JString(url)) => AuthToken(tok, url)
      case _ => throw new AuthFailedException(s"malformed token response")
    }
  }

  /** The cached token if present — NO fetch: close/release paths must
    * not mint a session just to release one. */
  def cachedToken(): Option[AuthToken] = synchronized {
    cache.get(creds.username)
  }

  /** Cached token if present, else a fresh fetch (get_token,
    * data_connector.py:186-197). */
  def token(): AuthToken = synchronized {
    cache.get(creds.username).getOrElse {
      val t = fetch()
      cache.put(creds.username, t)
      t
    }
  }

  /** Drops the cached token so the next call re-authenticates
    * (remove_token, data_connector.py:240-243). */
  def invalidate(): Unit = synchronized { cache.remove(creds.username) }

  /** Runs `f` with a valid token; on [[SessionExpiredException]] the token
    * is invalidated and `f` replayed exactly once with a fresh one
    * (data_connector.py:246-252). Auth failures propagate — retrying a
    * bad password is pointless. */
  def withAuthRetry[A](f: AuthToken => A): A =
    try f(token())
    catch {
      case _: SessionExpiredException =>
        invalidate()
        f(token())
    }
}

/** [[RemoteOrg]] decorator applying the retry-once policy to every org
  * call: `open` builds the session-bound client for a token (the sim of
  * binding a SOAP/REST client to an access token), and any call that
  * throws [[SessionExpiredException]] is replayed on a fresh session. */
final class AuthRetryOrg(provider: TokenProvider, open: AuthToken => RemoteOrg)
    extends RemoteOrg {
  private def run[A](f: RemoteOrg => A): A =
    provider.withAuthRetry(t => f(open(t)))

  override def describe(sObject: String) = run(_.describe(sObject))
  override def query(soql: String) = run(_.query(soql))
  override def insert(sObject: String, rows: Seq[org.apache.spark.sql.Row],
      schema: org.apache.spark.sql.types.StructType) =
    run(_.insert(sObject, rows, schema))
  override def update(sObject: String, rows: Seq[org.apache.spark.sql.Row],
      schema: org.apache.spark.sql.types.StructType) =
    run(_.update(sObject, rows, schema))
  override def upsert(sObject: String, externalIdField: String,
      rows: Seq[org.apache.spark.sql.Row],
      schema: org.apache.spark.sql.types.StructType) =
    run(_.upsert(sObject, externalIdField, rows, schema))
  override def delete(sObject: String, ids: Seq[String]) = run(_.delete(sObject, ids))
  override def deleteWhere(sObject: String, predicates: Seq[String]) =
    run(_.deleteWhere(sObject, predicates))
  override def pkChunkBoundaries(sObject: String, desiredChunks: Int) =
    run(_.pkChunkBoundaries(sObject, desiredChunks))
  /** Plan-time capture delegates to the session-bound client, so scan
    * partitions ship the wire org's own recipe (current token baked
    * in). The retry-once policy itself stays driver-side: an
    * executor-side expiry fails the task, and the NEXT planned batch
    * re-captures a recipe under a fresh token via this very call. */
  override def recipe = run(_.recipe)
  /** Release the transport (no auth retry — closing must not mint a
    * token). `open` is expected to be a pure constructor over a SHARED
    * transport (the pattern that actually leaks); closing the org it
    * builds releases that transport. With no cached token — exactly
    * the expiry/auth-failure paths, where the pool must still be
    * released (code-review finding) — a sentinel token is used: the
    * construction never touches the wire. A factory that news a
    * transport per org has nothing shared to leak, and this closes the
    * fresh one. Failures PROPAGATE (a construction-throwing factory
    * means the release did not happen — swallowing it here would hide
    * the leak); registry-side displacement closes wrap their own
    * catch. A later call simply reopens under [[run]]. */
  override def close(): Unit =
    open(provider.cachedToken().getOrElse(AuthToken("", ""))).close()
}
