package graft.sources

import graft.spec.{ConnectorConfig, ConnectorParam}

/** Builds the production org stack from connector config — the single
  * switch a user flips to run against a Bulk-forbidden org: the INI
  * section's `protocol` key picks the wire (`bulk` default — the Bulk
  * REST job lifecycle; `soap` — the Partner-API `query`/`queryMore`
  * fallback), and either stack runs under the same
  * [[TokenProvider]]/[[AuthRetryOrg]] retry-once session policy.
  *
  * One token serves both wires: the OAuth access token doubles as the
  * SOAP session id (both protocols authenticate the same session), so
  * switching protocol changes no auth configuration. `content_type`
  * (`JSON` default | `CSV`) and `pk_chunk_size` tune the Bulk wire;
  * they are ignored under SOAP.
  */
object OrgFactory {

  def fromConfig(ini: Map[String, Map[String, String]], section: String,
      http: HttpTransport, cache: TokenCache = new InMemoryTokenCache,
      apiVersion: String = "47.0"): RemoteOrg = {
    val param: ConnectorParam = ConnectorConfig.connParam(ini, section)
    val opts = ini(section)
    val protocol = opts.getOrElse("protocol", "bulk").toLowerCase
    val provider = new TokenProvider(param, http, cache)
    val open: AuthToken => RemoteOrg = protocol match {
      case "bulk" =>
        val contentType = opts.getOrElse("content_type", "JSON").toUpperCase
        val pkChunk = opts.get("pk_chunk_size").map(_.toInt)
        t => new BulkApiOrg(t, http, apiVersion,
          contentType = contentType, pkChunkSize = pkChunk)
      case "soap" =>
        t => new SoapOrg(t.accessToken,
          s"${t.instanceUrl}/services/Soap/u/$apiVersion", http)
      case other => throw new IllegalArgumentException(
        s"[$section] unknown protocol '$other' (expected bulk|soap)")
    }
    new AuthRetryOrg(provider, open)
  }
}
