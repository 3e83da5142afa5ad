package graft.sources

import scala.collection.mutable.ArrayBuffer

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.schema.Triple

/** S5 (completion): RDF/XML dump ingestion — the serialization the reference
  * actually harvests (`RDFDataMgr.read(model, uri, Lang.RDFXML)`,
  * Harvester.java:1711-1716). RDF/XML is a document-level format: unlike
  * N-Triples it cannot be line-split, so each FILE is one parse unit and
  * scan parallelism equals the file count. That matches the reference's own
  * granularity (one Jena Model per dump URI) and is the honest Spark
  * contract at 100 TB: a dump corpus should arrive as many files; a single
  * multi-TB RDF/XML file is unparallelizable in ANY engine and should be
  * converted to N-Triples ([[NTriplesSource]]) out of band.
  *
  * Grammar subset (W3C RDF/XML, the shapes Jena emits for real dumps):
  *  - `rdf:RDF` root or a single node element root
  *  - node elements: `rdf:Description` / typed nodes (emit `rdf:type`), with
  *    `rdf:about`, `rdf:nodeID`, `rdf:ID` (resolved against `xml:base`) or
  *    fresh blanks; property ATTRIBUTES on node elements as literals
  *  - property elements: text literals with inherited `xml:lang` or
  *    `rdf:datatype`, `rdf:resource` / `rdf:nodeID` objects, nested node
  *    elements, `rdf:li` counters, `rdf:parseType="Resource"`,
  *    `rdf:parseType="Collection"` (first/rest/nil list) and
  *    `rdf:parseType="Literal"` (XML-literal objects, typed
  *    `rdf:XMLLiteral`; event re-serialization, not exclusive-c14n — a
  *    prefix declared outside the literal rejects the file rather than
  *    re-serializing unbound)
  *  - NOT supported (documented): unknown parse types (file rejected rather
  *    than mis-parsed) and reification attributes (`rdf:ID` on property
  *    elements is ignored)
  *
  * Failure semantics mirror the reference: a malformed dump is skipped WHOLE
  * (`RiotException` catch, Harvester.java:1723-1725) — here per file, with
  * [[parseFile]] returning `Left(reason)` so a quarantine sink can keep
  * lineage of rejects. DTDs and external entities are disabled (XXE): a
  * `<!DOCTYPE ...>` rejects the file.
  *
  * Blank-node labels are namespaced by a hash of the file id so labels from
  * different files can never collide when dumps union into one model
  * (`model.add` bag-union semantics, Harvester.java:1640-1659).
  */
object RdfXmlSource {

  val RdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  val XmlNs = "http://www.w3.org/XML/1998/namespace"

  /** Distributed read: one task per file (binaryFile source), malformed
    * files dropped whole. Pair with [[parseFile]] over the same listing when
    * rejects need a quarantine table. */
  def read(spark: SparkSession, path: String): Dataset[Triple] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) => parseBytes(p, bytes).getOrElse(Seq.empty) }
  }

  /** Kind-preserving SPARQL frame read: (s, p, o, ol, dt, tk) — the
    * RDF/XML twin of [[NTriplesSource.readWithKind]], same full optional-
    * column contract for [[graft.sparql.SparqlCompiler]]. Malformed files
    * are dropped whole, like [[read]]. */
  def readWithKind(spark: SparkSession,
      path: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        parseBytesWithKind(p, bytes).getOrElse(Seq.empty).map { case (t, k) =>
          (t.subj, t.pred, t.obj, t.objLang, t.objType, k)
        }
      }
      .toDF("s", "p", "o", "ol", "dt", "tk")
  }

  /** Per-file parse result for the reject-surfacing read: `reason` is set
    * exactly when the file was rejected (then `triples` is empty). */
  final case class ParsedFile(path: String, reason: Option[String],
                              triples: Seq[graft.schema.Triple])

  /** One-parse variant that ALSO surfaces rejected files instead of
    * dropping them silently (the reference logs each RiotException,
    * Harvester.java:1723-1725; we go further and table them). Each file is
    * parsed ONCE into a [[ParsedFile]] row; the caller splits triples from
    * rejects and should `persist` the dataset when consuming both (parsing
    * dominates the scan — two unpersisted actions would parse twice). */
  def readParsed(spark: SparkSession, path: String): Dataset[ParsedFile] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .map { case (p, bytes) =>
        parseBytes(p, bytes) match {
          case Right(ts) => ParsedFile(p, None, ts)
          case Left(r)   => ParsedFile(p, Some(r), Seq.empty)
        }
      }
  }

  /** Render triples as ONE complete RDF/XML document — the export direction,
    * mirroring [[NTriplesSource.render]] (pair with per-partition rendering
    * for a many-file corpus, one document per partition, as the bench's
    * ingest section does). Not every triple is XML-representable:
    * XML 1.0 cannot carry control characters (other than TAB/LF/CR) at all,
    * and a predicate IRI must end in an NCName local part to become an
    * element name — render throws on either, because silently dropping or
    * mangling would corrupt an export. N-Triples is the lossless
    * serialization; use it when fidelity beats interop.
    *
    * CR survives round-trips by numeric escape (an XML parser line-end-
    * normalizes a raw CR to LF); blank-node labels survive structurally but
    * not literally (the parser re-namespaces them per file). */
  def render(triples: Seq[Triple]): String = {
    val sb = new java.lang.StringBuilder(triples.size * 96 + 64)
    sb.append("<rdf:RDF xmlns:rdf=\"").append(RdfNs).append("\">")
    triples.foreach { t =>
      val (ns, local) = splitPred(t.pred)
      sb.append("<rdf:Description ")
      if (t.subj.startsWith("_:"))
        sb.append("rdf:nodeID=\"").append(ncName(t.subj.drop(2), "blank label"))
      else sb.append("rdf:about=\"").append(escAttr(t.subj))
      sb.append("\"><n:").append(local)
        .append(" xmlns:n=\"").append(escAttr(ns)).append('"')
      if (t.objType.nonEmpty)
        sb.append(" rdf:datatype=\"").append(escAttr(t.objType)).append("\">")
          .append(escText(t.obj)).append("</n:").append(local).append('>')
      else if (t.objLang.nonEmpty)
        sb.append(" xml:lang=\"").append(escAttr(t.objLang)).append("\">")
          .append(escText(t.obj)).append("</n:").append(local).append('>')
      else if (t.obj.startsWith("_:"))
        sb.append(" rdf:nodeID=\"").append(ncName(t.obj.drop(2), "blank label"))
          .append("\"/>")
      else if (NTriplesSource.isIriLike(t.obj))
        sb.append(" rdf:resource=\"").append(escAttr(t.obj)).append("\"/>")
      else
        sb.append('>').append(escText(t.obj)).append("</n:").append(local)
          .append('>')
      sb.append("</rdf:Description>")
    }
    sb.append("</rdf:RDF>")
    sb.toString
  }

  /** Split a predicate IRI into (namespace, NCName local part) for element
    * rendering: the longest IRI suffix of name chars that starts with a
    * letter or underscore. */
  private def splitPred(pred: String): (String, String) = {
    var i = pred.length
    while (i > 0 && isNameChar(pred.charAt(i - 1))) i -= 1
    // the local part must START with a letter/underscore: shrink from the
    // left until it does
    while (i < pred.length && !isNameStart(pred.charAt(i))) i += 1
    require(i > 0 && i < pred.length,
      s"predicate IRI <$pred> has no NCName local part — not RDF/XML-" +
        "renderable (export as N-Triples instead)")
    (pred.substring(0, i), pred.substring(i))
  }

  private def isNameStart(c: Char): Boolean =
    Character.isLetter(c) || c == '_'
  private def isNameChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_' || c == '-' || c == '.'

  private def ncName(s: String, what: String): String = {
    require(s.nonEmpty && isNameStart(s.charAt(0)) && s.forall(isNameChar),
      s"$what '$s' is not an XML NCName — not RDF/XML-renderable")
    s
  }

  /** XML 1.0 Char production: TAB/LF/CR, #x20-#xD7FF, #xE000-#xFFFD, and
    * properly-paired supplementary code points. Everything else (C0
    * controls, unpaired surrogates, U+FFFE/U+FFFF) has NO representation in
    * an XML document — a renderer that emitted it would produce a file the
    * parser must reject whole. */
  private def checkXmlChars(s: String): String = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isHighSurrogate(c)) {
        require(i + 1 < s.length && Character.isLowSurrogate(s.charAt(i + 1)),
          f"unpaired surrogate U+${c.toInt}%04X is not an XML character — " +
            "export as N-Triples instead")
        i += 2
      } else {
        require(!Character.isLowSurrogate(c) && c != 0xFFFE.toChar && c != 0xFFFF.toChar &&
            (c >= ' ' || c == '\t' || c == '\n' || c == '\r'),
          f"U+${c.toInt}%04X cannot appear in an XML 1.0 document at all — " +
            "export as N-Triples instead")
        i += 1
      }
    }
    s
  }

  /** Text content: markup escapes; CR numerically (raw CR would be line-end-
    * normalized to LF on parse). */
  private def escText(s: String): String =
    checkXmlChars(s).replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;").replace("\r", "&#13;")

  /** Attribute values: additionally quote and whitespace escapes (raw
    * TAB/LF/CR in an attribute are normalized to spaces on parse). */
  private def escAttr(s: String): String =
    checkXmlChars(s).replace("&", "&amp;").replace("<", "&lt;")
      .replace("\"", "&quot;").replace("\t", "&#9;")
      .replace("\n", "&#10;").replace("\r", "&#13;")

  /** Parse raw file bytes: the StAX reader sniffs the encoding from the XML
    * declaration / BOM (a hardcoded UTF-8 decode would silently corrupt
    * ISO-8859-1 dumps into U+FFFD literals — the reference honors the
    * declaration via Jena). */
  def parseBytes(fileId: String, bytes: Array[Byte]): Either[String, Seq[Triple]] =
    parseBytesWithKind(fileId, bytes).map(_.map(_._1))

  /** Like [[parseBytes]] but keeps each object's term KIND ("i" IRI / "l"
    * literal / "b" blank) — the SPARQL frame contract's `tk` stamp, which
    * the parse knows exactly and [[Triple]] erases. */
  def parseBytesWithKind(fileId: String,
      bytes: Array[Byte]): Either[String, Seq[(Triple, String)]] =
    parseWith(fileId,
      f => f.createXMLStreamReader(new java.io.ByteArrayInputStream(bytes)))

  /** Parse one complete RDF/XML document already decoded to characters.
    * `fileId` namespaces blank-node labels (any stable per-file string:
    * path, URI). */
  def parseFile(fileId: String, xml: String): Either[String, Seq[Triple]] =
    parseWith(fileId,
      f => f.createXMLStreamReader(new java.io.StringReader(xml)))
      .map(_.map(_._1))

  private def parseWith(fileId: String,
      mk: XMLInputFactory => XMLStreamReader): Either[String, Seq[(Triple, String)]] = {
    val factory = XMLInputFactory.newInstance()
    factory.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    factory.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
      java.lang.Boolean.FALSE)
    factory.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
    val reader = mk(factory)
    try {
      val ctx = new Ctx(fileId)
      // advance to the root element
      while (reader.hasNext && reader.getEventType != XMLStreamConstants.START_ELEMENT)
        reader.next()
      if (reader.getEventType != XMLStreamConstants.START_ELEMENT)
        return Left("no root element")
      if (reader.getNamespaceURI == RdfNs && reader.getLocalName == "RDF") {
        val lang = attr(reader, XmlNs, "lang").getOrElse("")
        val base = attr(reader, XmlNs, "base").getOrElse("")
        var done = false
        while (!done && reader.hasNext) {
          reader.next() match {
            case XMLStreamConstants.START_ELEMENT =>
              parseNodeElement(reader, ctx, lang, base)
            case XMLStreamConstants.END_ELEMENT => done = true
            case _ => ()
          }
        }
      } else parseNodeElement(reader, ctx, "", "")
      Right(ctx.out.toSeq.zip(ctx.kinds))
    } catch {
      case e: Exception => Left(Option(e.getMessage).getOrElse(e.toString))
    } finally reader.close()
  }

  private def attr(r: XMLStreamReader, ns: String, local: String): Option[String] = {
    var i = 0
    while (i < r.getAttributeCount) {
      if (r.getAttributeLocalName(i) == local &&
          r.getAttributeNamespace(i) == ns) return Some(r.getAttributeValue(i))
      i += 1
    }
    None
  }

  private final class Ctx(fileId: String) {
    val out = new ArrayBuffer[Triple]()
    /** parallel to [[out]]: the object's term kind ("i"/"l"/"b") — the
      * parse knows the form exactly where the kind-erased [[Triple]]
      * cannot recover it (a literal may LOOK like an IRI) */
    val kinds = new ArrayBuffer[String]()
    private val prefix = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(fileId.getBytes("UTF-8"))
      d.take(4).map(b => f"${b & 0xff}%02x").mkString
    }
    private var n = 0
    def fresh(): String = { n += 1; s"_:g${prefix}b$n" }
    def mapNodeId(label: String): String = s"_:g${prefix}n$label"
    /** literal-object emission */
    def emit(s: String, p: String, o: String, lang: String = "",
             dtype: String = ""): Unit = {
      out += Triple(s, p, o, lang, dtype)
      kinds += "l"
    }
    /** IRI-or-blank TERM emission: within this parser every blank node is
      * "_:"-prefixed (fresh/mapNodeId) and subjects/objects of node
      * elements are IRIs otherwise, so the prefix decides the kind */
    def emitTerm(s: String, p: String, o: String): Unit = {
      out += Triple(s, p, o, "", "")
      kinds += (if (o.startsWith("_:")) "b" else "i")
    }
  }

  /** Resolve `ref` against `base` per RFC 3986; a missing base or an opaque
    * ref falls back to the raw string (absolute IRIs pass through either
    * way). */
  private def resolve(base: String, ref: String): String =
    if (base.isEmpty) ref
    else try new java.net.URI(base).resolve(ref).toString
    catch { case _: Exception => ref }

  /** Parse a node element (reader at its START_ELEMENT; consumes through the
    * matching END_ELEMENT) and return its subject term. */
  private def parseNodeElement(r: XMLStreamReader, ctx: Ctx,
                               inLang: String, inBase: String): String = {
    val ns = Option(r.getNamespaceURI).getOrElse("")
    val local = r.getLocalName
    val lang = attr(r, XmlNs, "lang").getOrElse(inLang)
    val base = attr(r, XmlNs, "base").getOrElse(inBase)
    val subj =
      attr(r, RdfNs, "about").map(resolve(base, _))
        .orElse(attr(r, RdfNs, "ID").map(id => resolve(base, "#" + id)))
        .orElse(attr(r, RdfNs, "nodeID").map(ctx.mapNodeId))
        .getOrElse(ctx.fresh())
    if (!(ns == RdfNs && local == "Description"))
      ctx.emitTerm(subj, RdfNs + "type", ns + local)
    // property attributes: every non-rdf/xml attribute is a literal statement
    var i = 0
    while (i < r.getAttributeCount) {
      val ans = Option(r.getAttributeNamespace(i)).getOrElse("")
      if (ans != RdfNs && ans != XmlNs && !ans.isEmpty)
        ctx.emit(subj, ans + r.getAttributeLocalName(i),
          r.getAttributeValue(i), lang)
      else if (ans == RdfNs && r.getAttributeLocalName(i) == "type")
        // rdf:type as an attribute takes an IRI object, not a literal
        ctx.emitTerm(subj, RdfNs + "type", resolve(base, r.getAttributeValue(i)))
      i += 1
    }
    // the container-membership ordinal counts ONLY rdf:li children (W3C
    // RDF/XML 7.4 / Jena): an interleaved ordinary property must not shift
    // the numbering
    var li = 0
    var done = false
    while (!done && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          if (r.getNamespaceURI == RdfNs && r.getLocalName == "li") li += 1
          parsePropertyElement(r, ctx, subj, lang, base, li)
        case XMLStreamConstants.END_ELEMENT => done = true
        case _ => ()
      }
    }
    subj
  }

  /** Parse one property element of `subj` (reader at its START_ELEMENT;
    * consumes through the matching END_ELEMENT). `liOrdinal` numbers
    * `rdf:li` as `rdf:_n` per the container-membership rule. */
  private def parsePropertyElement(r: XMLStreamReader, ctx: Ctx, subj: String,
                                   inLang: String, base: String,
                                   liOrdinal: Int): Unit = {
    val ns = Option(r.getNamespaceURI).getOrElse("")
    val local = r.getLocalName
    val pred =
      if (ns == RdfNs && local == "li") RdfNs + "_" + liOrdinal
      else ns + local
    val lang = attr(r, XmlNs, "lang").getOrElse(inLang)
    val resource = attr(r, RdfNs, "resource")
    val nodeId = attr(r, RdfNs, "nodeID")
    val datatype = attr(r, RdfNs, "datatype")
    val parseType = attr(r, RdfNs, "parseType")
    // property attributes on an (empty) property element — W3C RDF/XML
    // 2.12: each asserts a triple about the OBJECT (rdf:resource/rdf:nodeID
    // target, or an implicit blank node when neither is given)
    val propAttrs: Seq[(String, String)] = {
      val b = Seq.newBuilder[(String, String)]
      var i = 0
      while (i < r.getAttributeCount) {
        val ans = Option(r.getAttributeNamespace(i)).getOrElse("")
        val ln = r.getAttributeLocalName(i)
        if (ans == RdfNs && ln == "type")
          b += ((RdfNs + "type", r.getAttributeValue(i)))
        else if (ans != RdfNs && ans != XmlNs && ans.nonEmpty)
          b += ((ans + ln, r.getAttributeValue(i)))
        i += 1
      }
      b.result()
    }
    def emitPropAttrs(obj: String): Unit = propAttrs.foreach { case (p, v) =>
      if (p == RdfNs + "type") ctx.emitTerm(obj, p, resolve(base, v))
      else ctx.emit(obj, p, v, lang)
    }

    def consumeEmpty(): Unit = {
      var done = false
      while (!done && r.hasNext) {
        r.next() match {
          case XMLStreamConstants.END_ELEMENT => done = true
          case XMLStreamConstants.START_ELEMENT =>
            throw new IllegalStateException(
              s"unexpected child element under resource-valued property $pred")
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA
              if r.getText.trim.nonEmpty =>
            // reject-don't-misparse: text alongside rdf:resource/nodeID/
            // property attributes has no RDF meaning — dropping it would
            // silently lose a literal
            throw new IllegalStateException(
              s"unexpected text content under resource-valued property $pred")
          case _ => ()
        }
      }
    }

    parseType match {
      case Some("Resource") =>
        // implicit blank node whose property elements are this element's
        // children
        val b = ctx.fresh()
        ctx.emitTerm(subj, pred, b)
        var li = 0
        var done = false
        while (!done && r.hasNext) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT =>
              if (r.getNamespaceURI == RdfNs && r.getLocalName == "li") li += 1
              parsePropertyElement(r, ctx, b, lang, base, li)
            case XMLStreamConstants.END_ELEMENT => done = true
            case _ => ()
          }
        }
      case Some("Collection") =>
        // rdf:first/rdf:rest chain over the child node elements, nil-closed
        var head = ""
        var tail = ""
        var done = false
        while (!done && r.hasNext) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT =>
              val cell = ctx.fresh()
              if (head.isEmpty) { head = cell; ctx.emitTerm(subj, pred, cell) }
              else ctx.emitTerm(tail, RdfNs + "rest", cell)
              val item = parseNodeElement(r, ctx, lang, base)
              ctx.emitTerm(cell, RdfNs + "first", item)
              tail = cell
            case XMLStreamConstants.END_ELEMENT => done = true
            case _ => ()
          }
        }
        if (head.isEmpty) ctx.emitTerm(subj, pred, RdfNs + "nil")
        else ctx.emitTerm(tail, RdfNs + "rest", RdfNs + "nil")
      case Some("Literal") =>
        // XML literal (W3C RDF/XML 7.2.17; the reference accepts these via
        // Jena, Harvester.java:1711-1716): the object is the element
        // content re-serialized as XML, typed rdf:XMLLiteral.
        //
        // Canonicalization status (round-5): within the subset the
        // serialization follows Canonical XML's node rules — namespace
        // declarations sorted by prefix, attributes sorted by (namespace
        // URI, local name), C14N-exact escaping (&<> + #xD in text;
        // &<" + #x9/#xA/#xD in attributes), empty elements as start+end
        // tags — so two subset inputs differing only in attribute/xmlns
        // order hash identically, matching Jena's canonical form for
        // literals whose declarations are minimal and local. REMAINING
        // divergences, all documented: comments and PIs are dropped (C14N
        // keeps PIs), and ancestor-inherited namespace prefixes used inside
        // the literal without a redeclaration are out of the subset —
        // surfaced as an unbound-prefix reject rather than a silently
        // wrong literal.
        val sb = new java.lang.StringBuilder()
        def qn(prefix: String, local: String): String =
          if (prefix == null || prefix.isEmpty) local else s"$prefix:$local"
        // prefix scopes nest with elements: a child's declaration must not
        // leak to its siblings
        var scopes: List[Set[String]] = Nil
        // 'xml' (xml:lang, xml:space) is implicitly bound by Namespaces in
        // XML §3 — it never appears in an xmlns declaration yet
        // re-serializes correctly without one, so it is always in scope
        def inScope(p: String): Boolean =
          p == "xml" || scopes.exists(_.contains(p))
        var depth = 1
        while (depth > 0 && r.hasNext) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT =>
              depth += 1
              sb.append('<').append(qn(r.getPrefix, r.getLocalName))
              var here = Set.empty[String]
              // canonical-XML node ordering (round-5; closes most of the
              // exc-c14n hash gap vs Jena within the subset): namespace
              // declarations sorted by prefix (default first), then
              var nsDecls = List.empty[(String, String)]
              var i = 0
              while (i < r.getNamespaceCount) {
                val p = Option(r.getNamespacePrefix(i)).getOrElse("")
                here += p
                nsDecls ::= (p, r.getNamespaceURI(i))
                i += 1
              }
              nsDecls.sortBy(_._1).foreach { case (p, uri) =>
                sb.append(" xmlns").append(if (p.isEmpty) "" else ":" + p)
                  .append("=\"").append(escAttr(uri)).append('"')
              }
              scopes = here :: scopes
              // a prefixed name whose declaration lives OUTSIDE the literal
              // would re-serialize unbound — reject, don't corrupt
              val ep = Option(r.getPrefix).getOrElse("")
              if (ep.nonEmpty && !inScope(ep))
                throw new IllegalStateException(
                  s"XML literal uses prefix '$ep' declared outside the " +
                    "literal (out of the supported subset)")
              // same for the DEFAULT namespace: an unprefixed element that
              // is namespaced (getNamespaceURI non-empty) but whose xmlns
              // declaration sits outside the captured content would
              // re-serialize with NO xmlns — silently dropping it out of
              // its namespace (the canonical case: xmlns=xhtml declared on
              // the property element, <p> inside the literal)
              if (ep.isEmpty && Option(r.getNamespaceURI).exists(_.nonEmpty)
                  && !inScope(""))
                throw new IllegalStateException(
                  "XML literal element inherits a default namespace " +
                    "declared outside the literal (out of the supported " +
                    "subset)")
              // ...then attributes sorted by (namespace URI, local name) —
              // the C14N attribute order (unprefixed attrs have the empty
              // URI and sort first)
              var attrs = List.empty[((String, String), String, String)]
              i = 0
              while (i < r.getAttributeCount) {
                val ap = Option(r.getAttributePrefix(i)).getOrElse("")
                if (ap.nonEmpty && !inScope(ap))
                  throw new IllegalStateException(
                    s"XML literal uses prefix '$ap' declared outside the " +
                      "literal (out of the supported subset)")
                val uri = Option(r.getAttributeNamespace(i)).getOrElse("")
                attrs ::= ((uri, r.getAttributeLocalName(i)),
                  qn(ap, r.getAttributeLocalName(i)), r.getAttributeValue(i))
                i += 1
              }
              attrs.sortBy(_._1).foreach { case (_, name, value) =>
                sb.append(' ').append(name)
                  .append("=\"").append(escAttr(value)).append('"')
              }
              sb.append('>')
            case XMLStreamConstants.END_ELEMENT =>
              depth -= 1
              if (depth > 0) {
                sb.append("</").append(qn(r.getPrefix, r.getLocalName))
                  .append('>')
                scopes = scopes.tail
              }
            case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
              sb.append(escText(r.getText))
            case _ => () // comments/PIs: dropped (documented subset)
          }
        }
        ctx.emit(subj, pred, sb.toString, "", RdfNs + "XMLLiteral")
      case Some(other) =>
        // unknown parse types: reject the file rather than silently
        // mis-parse — the NT path is the documented escape hatch
        throw new IllegalStateException(s"unsupported rdf:parseType=$other")
      case None if resource.isDefined =>
        val obj = resolve(base, resource.get)
        ctx.emitTerm(subj, pred, obj)
        emitPropAttrs(obj)
        consumeEmpty()
      case None if nodeId.isDefined =>
        val obj = ctx.mapNodeId(nodeId.get)
        ctx.emitTerm(subj, pred, obj)
        emitPropAttrs(obj)
        consumeEmpty()
      case None if propAttrs.nonEmpty =>
        // attrs-only empty property element: the object is an implicit
        // blank node carrying the attribute statements
        val b = ctx.fresh()
        ctx.emitTerm(subj, pred, b)
        emitPropAttrs(b)
        consumeEmpty()
      case None =>
        // literal text OR one nested node element
        val text = new java.lang.StringBuilder()
        var nested: Option[String] = None
        var done = false
        while (!done && r.hasNext) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT =>
              if (nested.isDefined)
                throw new IllegalStateException(
                  s"multiple node elements under property $pred")
              nested = Some(parseNodeElement(r, ctx, lang, base))
            case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
              text.append(r.getText)
            case XMLStreamConstants.END_ELEMENT => done = true
            case _ => ()
          }
        }
        nested match {
          case Some(objSubj) =>
            if (text.toString.trim.nonEmpty)
              throw new IllegalStateException(
                s"mixed text and node element under property $pred")
            ctx.emitTerm(subj, pred, objSubj)
          case None =>
            if (datatype.isDefined)
              // rdf:datatype overrides any in-scope xml:lang (typed literals
              // carry no language per the RDF abstract syntax)
              ctx.emit(subj, pred, text.toString, "", datatype.get)
            else ctx.emit(subj, pred, text.toString, lang)
        }
    }
  }
}
