package graft.config

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** River-config JSON ingestion + the reference's small config scalar
  * functions (SURVEY.md §2.6 F4/F5/F6), driver-side only.
  *
  * The accepted JSON shape is the reference's river settings blob
  * (persisted by JPA, parsed key-by-key in Indexer.addHarvesterSettings,
  * Indexer.java:350-463; shape documented in FIXTURES.md §1):
  * `{"config": {"eeaRDF": {proplist, listtype, normProp, normObj,
  * normMissing, blackMap, whiteMap, language, uriDescription,
  * syncOldData, ...}}}` — unknown keys ignored, missing keys defaulted,
  * exactly like the reference's fluent setters.
  */
object ConfigParsing {

  private val mapper = new ObjectMapper()

  /** F6: bracket-list parsing `"[a,b,c]"` -> Seq("a","b","c")
    * (Harvester.rdfUris, Harvester.java:210-214 — substring + split).
    * The reference substrings BLINDLY, which mangles a bare unbracketed
    * value ("http://x" would become "ttp://"); silently corrupted
    * predicates are strictly worse than bug-compatibility here, so a
    * value without the bracket form is split as-is. */
  def parseBracketList(s: String): Seq[String] = {
    val t = s.trim
    val inner =
      if (t.startsWith("[") && t.endsWith("]")) t.substring(1, t.length - 1)
      else t
    if (inner.trim.isEmpty) Seq.empty
    else inner.split(",").toSeq.map(_.trim)
  }

  /** F5: endpoint IDN/ASCII normalization (Harvester.rdfEndpoint,
    * Harvester.java:222-235) — host punycoded, rest preserved; the
    * original string on malformed input, like the reference's catch. */
  def normalizeEndpoint(endpoint: String): String =
    try {
      val url = new java.net.URL(endpoint)
      val host = java.net.IDN.toASCII(url.getHost)
      new java.net.URL(url.getProtocol, host, url.getPort, url.getFile).toString
    } catch { case _: java.net.MalformedURLException => endpoint }

  /** F4: duration pretty-print (Harvester.java:719-728 — exact algorithm:
    * ms, then s/m/h/days prepended while nonzero). */
  def formatDuration(millis: Long): String = {
    var duration = millis
    var time = s"${duration % 1000}ms"
    duration /= 1000
    if (duration > 0) { time = s"${duration % 60}s " + time; duration /= 60 } else return time
    if (duration > 0) { time = s"${duration % 60}m " + time; duration /= 60 } else return time
    if (duration > 0) { time = s"${duration % 24}h " + time; duration /= 24 } else return time
    if (duration > 0) time = s"${duration}days " + time
    time
  }

  /** F9: index-pattern -> regex (ConfigManager.convertPatternToRegex,
    * ConfigManager.java:257-259 — dots escaped, `*` -> `.*`, anchored at the
    * start only, exactly like the reference). */
  def patternToRegex(pattern: String): String =
    "^" + pattern.replace(".", "\\.").replace("*", ".*")

  private def strings(n: JsonNode): Seq[String] =
    if (n == null) Seq.empty
    else if (n.isArray) n.elements().asScala.map(_.asText()).toSeq
    else Seq(n.asText())

  private def stringMap(n: JsonNode): Map[String, String] =
    if (n == null) Map.empty
    else n.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap

  private def multiMap(n: JsonNode): Map[String, Seq[String]] =
    if (n == null) Map.empty
    else n.properties().asScala.map(e => e.getKey -> strings(e.getValue)).toMap

  def fromJson(json: String): PipelineConfig = {
    val root = mapper.readTree(json)
    val rdf = Option(root.path("config").path("eeaRDF"))
      .filter(!_.isMissingNode).getOrElse(root)
    def node(k: String): JsonNode = {
      val n = rdf.path(k)
      if (n.isMissingNode) null else n
    }
    PipelineConfig(
      proplist = strings(node("proplist")).toSet,
      listType = Option(node("listtype")).map(_.asText()).getOrElse("white"),
      normProp = multiMap(node("normProp")),
      normObj = stringMap(node("normObj")),
      normMissing = multiMap(node("normMissing")),
      whiteMap = multiMap(node("whiteMap")).map { case (k, v) => k -> v.toSet },
      blackMap = multiMap(node("blackMap")).map { case (k, v) => k -> v.toSet },
      language = Option(node("language")).map(_.asText()).getOrElse("en"),
      addLanguage = Option(node("addLanguage")).forall(_.asBoolean(true)),
      // absent key falls back to the SAME default as PipelineConfig() — the
      // two default paths must never diverge (full predicate IRIs first)
      uriDescription = Option(node("uriDescription")).map {
        case n if n.isTextual => parseBracketList(n.asText())
        case n => strings(n)
      }.getOrElse(PipelineConfig().uriDescription),
      includeResourceURI =
        Option(node("includeResourceURI")).exists(_.asBoolean(false)),
      syncOldData = Option(node("syncOldData")).exists(_.asBoolean(false)),
      // the river config's SPARQL text(s) (Indexer.java:350-463 reads
      // `query[]`); executed by `KgMain query` via graft.sparql
      queries = strings(node("query")),
      // {"serviceGraphs": {"<iri>": "<path>"}} — SERVICE federation
      // resolved against pre-materialized local graphs
      serviceGraphs = Option(node("serviceGraphs")).map { n =>
        import scala.jdk.CollectionConverters._
        n.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
      }.getOrElse(Map.empty))
  }
}
