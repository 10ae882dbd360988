package graft.spec

/** Connection parameters — the reference's 7-field ConnectorParam
  * namedtuple built from INI `[src]`/`[dst]` sections
  * (data_connector.py:18-34, fields documented README.md:3-11). */
final case class ConnectorParam(
    username: String,
    password: String,
    url: String,
    consumerKey: String = "",
    consumerSecret: String = "",
    production: Boolean = false,
    sandbox: Boolean = false) {
  // never leak secrets into logs/plans
  override def toString: String =
    s"ConnectorParam($username, ***, $url, production=$production, sandbox=$sandbox)"
}

/** Minimal INI parser for the reference's config format (mriya.py:13-18):
  * `[section]` headers, `key = value` pairs, `#`/`;` comments. No
  * interpolation — values are taken verbatim. */
object ConnectorConfig {

  def parseIni(text: String): Map[String, Map[String, String]] = {
    val sections = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.LinkedHashMap[String, String]]
    var current: Option[String] = None
    text.linesIterator.map(_.trim).foreach {
      case l if l.isEmpty || l.startsWith("#") || l.startsWith(";") => ()
      case l if l.startsWith("[") && l.endsWith("]") =>
        val name = l.substring(1, l.length - 1).trim
        current = Some(name)
        sections.getOrElseUpdate(name, scala.collection.mutable.LinkedHashMap.empty)
      case l if l.contains("=") =>
        val Array(k, v) = l.split("=", 2)
        current match {
          case Some(s) => sections(s).put(k.trim, v.trim)
          case None => throw new IllegalArgumentException(
            s"key-value pair outside any [section]: $l")
        }
      case l => throw new IllegalArgumentException(s"unparseable INI line: $l")
    }
    sections.map { case (k, v) => k -> v.toMap }.toMap
  }

  /** Builds a [[ConnectorParam]] from a named section (get_conn_param,
    * data_connector.py:26-34). */
  def connParam(ini: Map[String, Map[String, String]], section: String): ConnectorParam = {
    val s = ini.getOrElse(section,
      throw new IllegalArgumentException(s"missing [$section] section"))
    def req(k: String): String = s.getOrElse(k,
      throw new IllegalArgumentException(s"[$section] missing required key '$k'"))
    ConnectorParam(
      username = req("username"),
      password = req("password"),
      url = req("url"),
      consumerKey = s.getOrElse("consumer_key", ""),
      consumerSecret = s.getOrElse("consumer_secret", ""),
      production = s.get("production").exists(_.equalsIgnoreCase("true")),
      sandbox = s.get("sandbox").exists(_.equalsIgnoreCase("true")))
  }
}
