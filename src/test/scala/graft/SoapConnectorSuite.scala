package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.sources.{InMemoryOrg, RemoteOrgRegistry, SoapOrg}

/** The connector stack end-to-end over the SOAP fallback: a DSv2 batch
  * scan (pushdown SOQL + queryMore pagination) and the checkpointed
  * cursor stream (MAX(Id) marks via AggregateResult, admission pages,
  * range scans) all arrive as SOAP envelopes — proving a Bulk-forbidden
  * org loses no connector capability. */
class SoapConnectorSuite extends SparkSuite {
  import spark.implicits._

  private val server = "https://na9.example.org/services/Soap/u/47.0"

  test("DSv2 batch scan + cursor stream run entirely over SOAP envelopes") {
    val sch = StructType(Seq(
      StructField("Id", StringType), StructField("Payload", StringType)))
    val inner = new InMemoryOrg
    inner.createTable("Event__c", sch)
    val sim = new SoapWireSim(inner,
      Map("Event__c" -> Seq("Id" -> "id", "Payload" -> "string")),
      pageSize = 2)
    val soapOrg = new SoapOrg("SID-C", server, sim)
    RemoteOrgRegistry.register("soap_src", soapOrg)
    inner.insert("Event__c", (1 to 5).map(i => Row(null, s"p$i")), sch)

    // ---- batch scan: pushdown SOQL + queryMore pagination ----
    val got = spark.read.format("salesforce-sim")
      .option("org", "soap_src").option("sObject", "Event__c")
      .load()
      .where($"Payload" =!= "p3")
      .select("Payload").as[String].collect().sorted.toSeq
    assert(got == Seq("p1", "p2", "p4", "p5"))
    assert(sim.queryStrings.exists(_.contains("FROM Event__c")),
      s"scan never hit the SOAP wire: ${sim.queryStrings}")
    // pageSize=2 forces the queryMore cursor on every multi-page result
    assert(sim.queryMoreCount > 0, "no queryMore pagination happened")

    // ---- cursor stream: MAX(Id) marks + admission pages + range scans ----
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val q = spark.readStream.format("salesforce-sim")
      .option("org", "soap_src").option("sObject", "Event__c")
      .option("maxRecordsPerBatch", "2").load()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val ps = batch.select("Payload").collect().map(_.getString(0))
        seen.synchronized { seen ++= ps }
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      assert(seen.sorted.toSeq == (1 to 5).map(i => s"p$i"),
        s"backfill not exactly-once over SOAP: $seen")
      inner.insert("Event__c", Seq(Row(null, "p6"), Row(null, "p7")), sch)
      q.processAllAvailable()
      assert(seen.sorted.toSeq == (1 to 7).map(i => s"p$i"),
        s"incremental ingest not exactly-once over SOAP: $seen")
    } finally q.stop()
    // the stream's high-water mark rode the AggregateResult expr path
    assert(sim.queryStrings.exists(_.startsWith("SELECT MAX(Id)")),
      s"no SOAP MAX(Id) cursor mark in: ${sim.queryStrings}")
    assert(sim.queryStrings.exists(s =>
      s.contains("ORDER BY Id") && s.contains("LIMIT 2")),
      s"no SOAP admission page in: ${sim.queryStrings}")
    assert(sim.queryStrings.exists(_.contains("Id > '")),
      s"no SOAP cursor range in: ${sim.queryStrings}")
  }
}

/** Stateful SOAP Partner-API wire sim: answers describeSObject, query
  * and queryMore envelopes by evaluating the SOQL against a backing
  * [[InMemoryOrg]], paging results `pageSize` records per response with
  * a queryLocator — so [[SoapOrg]]'s cursor loop is exercised on every
  * multi-page result. Aggregate select items serialize as
  * `AggregateResult` `expr{i}` elements, exactly like the real API. */
private[graft] class SoapWireSim(
    inner: InMemoryOrg,
    describes: Map[String, Seq[(String, String)]],
    pageSize: Int = 2) extends graft.sources.HttpTransport {

  val queryStrings = scala.collection.mutable.ArrayBuffer.empty[String]
  var queryMoreCount = 0
  // locator -> (select items, remaining rows)
  private val cursors =
    scala.collection.mutable.Map.empty[String, (Seq[String], List[Row])]
  private var locSeq = 0

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
  private def unesc(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")
  private def tag(xml: String, t: String): Option[String] =
    s"(?s)<(?:\\w+:)?$t(?:\\s[^>]*)?>(.*?)</(?:\\w+:)?$t>".r
      .findFirstMatchIn(xml).map(m => unesc(m.group(1).trim))

  private def env(body: String): (Int, String) =
    (200, "<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
      "<soapenv:Envelope xmlns:soapenv=\"http://schemas.xmlsoap.org/soap/envelope/\" " +
      "xmlns:xsi=\"http://www.w3.org/2001/XMLSchema-instance\" " +
      "xmlns:sf=\"urn:partner.soap.sforce.com\">" +
      s"<soapenv:Body>$body</soapenv:Body></soapenv:Envelope>")

  private def recordXml(items: Seq[String], r: Row): String = {
    val isAgg = items.exists(i => !i.matches("[A-Za-z0-9_.]+"))
    val fields = items.zipWithIndex.map { case (item, i) =>
      val t = if (isAgg) s"expr$i" else item
      // dotted relationship items NEST on the real wire
      // (<sf:Parent><sf:Name>v</sf:Name></sf:Parent>); a null rides as a
      // nil'd outermost element
      val segs = t.split("\\.")
      if (r.isNullAt(i)) s"""<sf:${segs.head} xsi:nil="true"/>"""
      else segs.reverse.foldLeft(esc(r.get(i).toString)) {
        (inner, seg) => s"<sf:$seg>$inner</sf:$seg>"
      }
    }.mkString
    val tpe = if (isAgg) "AggregateResult" else "sObject"
    s"""<records xsi:type="sf:$tpe"><sf:type>$tpe</sf:type>$fields</records>"""
  }

  private def queryResult(wrapper: String, items: Seq[String],
      rows: List[Row]): (Int, String) = {
    val (page, rest) = rows.splitAt(pageSize)
    val (done, loc) =
      if (rest.isEmpty) (true, "")
      else {
        locSeq += 1
        val l = s"LOC-$locSeq"
        cursors(l) = (items, rest)
        (false, l)
      }
    env(s"""<$wrapper><result xsi:type="QueryResult">
      <done>$done</done><queryLocator>$loc</queryLocator>
      ${page.map(recordXml(items, _)).mkString}
      <size>${rows.size}</size></result></$wrapper>""")
  }

  override def postForm(url: String, params: Map[String, String]): (Int, String) =
    sys.error("SOAP sim takes no form posts")

  override def send(method: String, url: String,
      headers: Map[String, String], body: String): (Int, String) = synchronized {
    require(method == "POST", s"SOAP is POST-only, got $method $url")
    if (body.contains("describeSObject")) {
      val obj = tag(body, "sObjectType").getOrElse(sys.error(s"no sObjectType: $body"))
      val fs = describes.getOrElse(obj, sys.error(s"no describe for $obj"))
        .map { case (n, t) => s"<fields><name>$n</name><type>$t</type></fields>" }
        .mkString
      env(s"<describeSObjectResponse><result><name>$obj</name>$fs</result></describeSObjectResponse>")
    } else if (body.contains("<urn:queryString>")) {
      require(body.contains("<urn:sessionId>"), "query without SessionHeader")
      val soql = tag(body, "queryString").getOrElse(sys.error(s"no queryString: $body"))
      queryStrings += soql
      val sel = soql.stripPrefix("SELECT ")
      val items = sel.substring(0, sel.indexOf(" FROM "))
        .split(",").map(_.trim).toSeq
      queryResult("queryResponse", items, inner.query(soql).toList)
    } else if (body.contains("<urn:queryLocator>")) {
      queryMoreCount += 1
      val loc = tag(body, "queryLocator").getOrElse(sys.error(s"no locator: $body"))
      val (items, rest) = cursors.remove(loc)
        .getOrElse(sys.error(s"unknown/consumed locator $loc"))
      queryResult("queryMoreResponse", items, rest)
    } else sys.error(s"unexpected SOAP envelope: $body")
  }
}
