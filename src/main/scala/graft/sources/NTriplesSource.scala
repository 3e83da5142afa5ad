package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.schema.Triple

/** S5: RDF dump ingestion (the reference reads RDF serializations into its
  * Model via RDFDataMgr, Harvester.java:1702-1730). The Spark-native choice
  * is N-Triples: one triple per line makes the format trivially splittable —
  * a 100 TB dump scans as ordinary partitioned text with no cross-record
  * state, unlike RDF/XML which needs a document-level parser.
  *
  * Grammar (W3C N-Triples): `<subj-iri|_:blank> <pred-iri> <iri|"literal">`
  * with optional `@lang` or `^^<datatype>` on literals, terminated by `.`;
  * `#` comments and blank lines skipped. Literal escapes `\\ \" \n \r \t
  * \uXXXX \UXXXXXXXX` are decoded. Malformed lines are dropped (the
  * reference skips the whole dump on a RiotException, Harvester.java:1723 —
  * per-line skipping is the finer-grained analogue; pair with
  * `parseLineEither` + a quarantine sink when lineage of rejects matters).
  *
  * Language tags land in `objLang` and datatypes in `objType` — the columns
  * that drive per-value language routing in doc assembly
  * (ESNormalizer.java:190-194) and typed-literal dispatch
  * (ESNormalizer.java:349-393).
  */
object NTriplesSource {

  def read(spark: SparkSession, path: String): Dataset[Triple] =
    parse(spark.read.textFile(path))

  def parse(lines: Dataset[String]): Dataset[Triple] = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines.flatMap(parseLine(_))
  }

  /** Render one triple as an N-Triples line — the export direction (the
    * reference's sink is ES bulk JSON; a splittable text serialization is
    * the Spark-native interchange equivalent). `parseLine(render(t)) == t`
    * for every triple whose fields are free of raw control characters
    * (property-tested in MultiFormatSourceSpec). */
  def render(t: Triple): String = {
    def esc(s: String): String = {
      val sb = new java.lang.StringBuilder(s.length + 8)
      var i = 0
      while (i < s.length) {
        s.charAt(i) match {
          case '\\' => sb.append("\\\\")
          case '"' => sb.append("\\\"")
          case '\n' => sb.append("\\n")
          case '\r' => sb.append("\\r")
          case '\t' => sb.append("\\t")
          case c if c < ' ' => sb.append(f"\\u${c.toInt}%04X")
          case c => sb.append(c)
        }
        i += 1
      }
      sb.toString
    }
    val subj = if (t.subj.startsWith("_:")) t.subj else s"<${t.subj}>"
    val obj =
      if (t.objType.nonEmpty) s""""${esc(t.obj)}"^^<${t.objType}>"""
      else if (t.objLang.nonEmpty) s""""${esc(t.obj)}"@${t.objLang}"""
      else if (t.obj.startsWith("_:")) t.obj
      else if (isIriLike(t.obj)) s"<${t.obj}>"
      else s""""${esc(t.obj)}""""
    s"$subj <${t.pred}> $obj ."
  }

  /** Heuristic used only by the renderer to decide IRI-vs-literal form for
    * untyped objects: a scheme prefix and no characters illegal in an IRI
    * ref. Parsing is unambiguous either way (the form is explicit). */
  private[sources] def isIriLike(s: String): Boolean =
    s.matches("[A-Za-z][A-Za-z0-9+.-]*:[^\\s<>\"{}|^`]*")

  /** Parse one N-Triples line; None for blank/comment/malformed lines. */
  def parseLine(raw: String): Option[Triple] =
    parseLineWithKind(raw).map(_._1)

  /** Like [[parseLine]] but keeps the object term's KIND, which the parse
    * knows exactly and [[Triple]] deliberately erases (the engine's
    * string-term model): "i" IRI / "l" literal / "b" blank — the SPARQL
    * frame contract's `tk` stamp. */
  def parseLineWithKind(raw: String): Option[(Triple, String)] = {
    val p = new Parser(raw)
    p.ws()
    if (p.atEnd || p.peek == '#') return None
    for {
      subj <- p.iriOrBlank()
      _ = p.ws()
      pred <- p.iri()
      _ = p.ws()
      // the object's first char decides its kind — the same dispatch
      // objectTerm() is about to take, captured before the form is erased
      kind = if (p.atEnd) "l"
             else if (p.peek == '<') "i"
             else if (p.peek == '_') "b"
             else "l"
      obj <- p.objectTerm()
      _ = p.ws()
      _ <- if (p.consume('.')) Some(()) else None
      _ = p.ws()
      _ <- if (p.atEnd || p.peek == '#') Some(()) else None
    } yield (Triple(subj, pred, obj._1, obj._2, obj._3), kind)
  }

  /** Kind-preserving SPARQL frame read: (s, p, o, ol, dt, tk) with the
    * full optional-column contract of [[graft.sparql.SparqlCompiler]] —
    * lang()/langMatches() (ol), datatype()/numeric comparisons (dt), AND
    * isIRI()/isLiteral()/isBlank() plus spec-exact negative lang()/
    * datatype() (tk). [[read]]'s [[Triple]] surface stays kind-erased for
    * the pipeline; this reader is for frame producers (e.g. SERVICE graph
    * registration). */
  def readWithKind(spark: SparkSession, path: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    spark.read.textFile(path)
      .flatMap(l => parseLineWithKind(l).map { case (t, k) =>
        (t.subj, t.pred, t.obj, t.objLang, t.objType, k) })
      .toDF("s", "p", "o", "ol", "dt", "tk")
  }

  /** Value of `n` hex digits at `from`, or -1 when any char is not [0-9a-fA-F]
    * (never overflows: max 8 digits <= 0xFFFFFFFF handled in Long). */
  private def hexValue(s: String, from: Int, n: Int): Int = {
    var v = 0L
    var j = 0
    while (j < n) {
      val c = s.charAt(from + j)
      val d =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else return -1
      v = v * 16 + d
      j += 1
    }
    if (v > Int.MaxValue) -1 else v.toInt
  }

  private final class Parser(s: String) {
    private var i = 0
    def atEnd: Boolean = i >= s.length
    def peek: Char = s.charAt(i)
    def ws(): Unit =
      while (!atEnd && (peek == ' ' || peek == '\t' || peek == '\r')) i += 1
    def consume(c: Char): Boolean =
      if (!atEnd && peek == c) { i += 1; true } else false

    def iri(): Option[String] = {
      if (!consume('<')) return None
      val start = i
      while (!atEnd && peek != '>') i += 1
      if (atEnd) None else { val r = s.substring(start, i); i += 1; Some(r) }
    }

    def blank(): Option[String] = {
      if (!(i + 1 < s.length && peek == '_' && s.charAt(i + 1) == ':')) return None
      val start = i
      i += 2
      // label chars can include '.', but never '<'/'"' (term starters) or
      // whitespace
      while (!atEnd && peek != ' ' && peek != '\t' && peek != '<' && peek != '"')
        i += 1
      // the grammar forbids a label ENDING in '.': trailing dots belong to
      // the statement terminator (whitespace before '.' is optional, so
      // `_:b0.` is a valid line ending)
      while (i > start + 2 && s.charAt(i - 1) == '.') i -= 1
      if (i == start + 2) None else Some(s.substring(start, i))
    }

    def iriOrBlank(): Option[String] =
      if (!atEnd && peek == '<') iri() else blank()

    /** @return (lexical-or-iri, lang, datatype) */
    def objectTerm(): Option[(String, String, String)] =
      if (atEnd) None
      else if (peek == '<') iri().map(u => (u, "", ""))
      else if (peek == '_') blank().map(b => (b, "", ""))
      else if (peek == '"') literal()
      else None

    private def literal(): Option[(String, String, String)] = {
      i += 1 // opening quote
      val sb = new java.lang.StringBuilder()
      while (!atEnd && peek != '"') {
        val c = peek
        if (c == '\\') {
          if (i + 1 >= s.length) return None
          val e = s.charAt(i + 1)
          e match {
            case 't' => sb.append('\t'); i += 2
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case '"' => sb.append('"'); i += 2
            case '\\' => sb.append('\\'); i += 2
            // strict hex only: Integer.parseInt would accept signs ("\u-123")
            // and \U can exceed the Unicode range — both must reject the
            // line, not crash the ingest (appendCodePoint throws
            // IllegalArgumentException past 0x10FFFF)
            case 'u' =>
              if (i + 5 >= s.length) return None
              val v = hexValue(s, i + 2, 4)
              if (v < 0) return None
              sb.append(v.toChar); i += 6
            case 'U' =>
              if (i + 9 >= s.length) return None
              val v = hexValue(s, i + 2, 8)
              if (v < 0 || v > 0x10FFFF) return None
              sb.appendCodePoint(v); i += 10
            case _ => return None
          }
        } else { sb.append(c); i += 1 }
      }
      if (atEnd) return None
      i += 1 // closing quote
      // suffix: @lang or ^^<datatype>
      if (!atEnd && peek == '@') {
        i += 1
        val start = i
        while (!atEnd && (peek.isLetterOrDigit || peek == '-')) i += 1
        if (i == start) None else Some((sb.toString, s.substring(start, i), ""))
      } else if (i + 1 < s.length && peek == '^' && s.charAt(i + 1) == '^') {
        i += 2
        iri().map(dt => (sb.toString, "", dt))
      } else Some((sb.toString, "", ""))
    }
  }
}
