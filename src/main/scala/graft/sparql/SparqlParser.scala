package graft.sparql

import SparqlAst._

/** Recursive-descent parser for the SPARQL subset in [[SparqlAst]].
  *
  * Design rules:
  *  - REJECT, never mis-parse: anything outside the subset raises
  *    [[SparqlParseException]] with the offending position (same contract
  *    as RdfXmlSource — a wrong answer at 100 TB is worse than an error).
  *  - Keywords are case-insensitive; `a` in predicate position expands to
  *    rdf:type; PREFIX declarations expand prefixed names at parse time.
  *  - Literal language tags (@cs) and datatype suffixes (^^<iri>) are
  *    accepted and erased (the triple frame is plain strings; the reference
  *    erases them too via str(), Harvester.java:1005-1013).
  *  - `<` starts an IRI only if a matching `>` appears before whitespace;
  *    otherwise it is the less-than operator.
  */
final class SparqlParseException(msg: String, val pos: Int)
  extends IllegalArgumentException(s"$msg (at offset $pos)")

object SparqlParser {

  private val RdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

  // ---- tokens ---------------------------------------------------------------

  private sealed trait Tok { def pos: Int }
  private case class TIri(v: String, pos: Int) extends Tok
  private case class TVar(v: String, pos: Int) extends Tok
  private case class TLit(v: String, pos: Int) extends Tok
  private case class TNum(v: String, pos: Int) extends Tok
  /** bare name or prefixed name (may contain one ':') */
  private case class TName(v: String, pos: Int) extends Tok
  private case class TPunct(v: String, pos: Int) extends Tok
  private case class TEof(pos: Int) extends Tok

  private def fail(msg: String, pos: Int): Nothing =
    throw new SparqlParseException(msg, pos)

  private def tokenize(q: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = q.length
    while (i < n) {
      val c = q.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '#') { while (i < n && q.charAt(i) != '\n') i += 1 }
      else if (c == '<') {
        // IRI iff a '>' closes it before any whitespace
        var j = i + 1
        while (j < n && !q.charAt(j).isWhitespace && q.charAt(j) != '>') j += 1
        if (j < n && q.charAt(j) == '>') {
          out += TIri(q.substring(i + 1, j), i); i = j + 1
        } else if (i + 1 < n && q.charAt(i + 1) == '=') {
          out += TPunct("<=", i); i += 2
        } else { out += TPunct("<", i); i += 1 }
      }
      else if (c == '?' || c == '$') {
        var j = i + 1
        while (j < n && (q.charAt(j).isLetterOrDigit || q.charAt(j) == '_')) j += 1
        if (j == i + 1) {
          // a bare '?' is the zero-or-one path modifier, not a variable
          if (c == '?') { out += TPunct("?", i); i += 1 }
          else fail("empty variable name", i)
        } else { out += TVar(q.substring(i + 1, j), i); i = j }
      }
      else if (c == '"' || c == '\'') {
        val quote = c
        val sb = new StringBuilder
        var j = i + 1
        var closed = false
        while (j < n && !closed) {
          val d = q.charAt(j)
          if (d == '\\') {
            if (j + 1 >= n) fail("dangling escape in literal", j)
            val e = q.charAt(j + 1)
            sb += (e match {
              case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
              case '\\' => '\\'; case '"' => '"'; case '\'' => '\''
              case other => fail(s"unsupported escape \\$other in literal", j)
            })
            j += 2
          } else if (d == quote) { closed = true; j += 1 }
          else { sb += d; j += 1 }
        }
        if (!closed) fail("unterminated string literal", i)
        // erase optional @lang / ^^datatype suffix
        if (j < n && q.charAt(j) == '@') {
          j += 1
          while (j < n && (q.charAt(j).isLetterOrDigit || q.charAt(j) == '-')) j += 1
        } else if (j + 1 < n && q.charAt(j) == '^' && q.charAt(j + 1) == '^') {
          j += 2
          if (j < n && q.charAt(j) == '<') {
            while (j < n && q.charAt(j) != '>') j += 1
            if (j >= n) fail("unterminated datatype IRI", i)
            j += 1
          } else {
            while (j < n && (q.charAt(j).isLetterOrDigit ||
              q.charAt(j) == ':' || q.charAt(j) == '_')) j += 1
          }
        }
        out += TLit(sb.toString, i); i = j
      }
      else if (c.isDigit || ((c == '-' || c == '+') && i + 1 < n && q.charAt(i + 1).isDigit)) {
        var j = i + 1
        while (j < n && (q.charAt(j).isDigit || q.charAt(j) == '.')) j += 1
        // a trailing '.' is the triple terminator, not a decimal point
        // ("5." = INTEGER 5 then DOT) — same rule as the name tokenizer
        while (j > i && q.charAt(j - 1) == '.') j -= 1
        out += TNum(q.substring(i, j), i); i = j
      }
      else if (c.isLetter || c == '_' || c == ':') {
        var j = i
        while (j < n && (q.charAt(j).isLetterOrDigit || q.charAt(j) == '_' ||
          q.charAt(j) == '-' || q.charAt(j) == ':' || q.charAt(j) == '.')) j += 1
        // a trailing '.' is the triple terminator, not part of the name
        while (j > i && q.charAt(j - 1) == '.') j -= 1
        out += TName(q.substring(i, j), i); i = j
      }
      else c match {
        case '{' | '}' | '(' | ')' | '.' | ';' | ',' | '*' | '/' | '^' | '+' =>
          out += TPunct(c.toString, i); i += 1
        case '=' => out += TPunct("=", i); i += 1
        case '!' =>
          if (i + 1 < n && q.charAt(i + 1) == '=') { out += TPunct("!=", i); i += 2 }
          else { out += TPunct("!", i); i += 1 }
        case '>' =>
          if (i + 1 < n && q.charAt(i + 1) == '=') { out += TPunct(">=", i); i += 2 }
          else { out += TPunct(">", i); i += 1 }
        case '&' =>
          if (i + 1 < n && q.charAt(i + 1) == '&') { out += TPunct("&&", i); i += 2 }
          else fail("single '&' is not an operator", i)
        case '|' =>
          // '||' is boolean OR in filters; a single '|' is path alternation
          if (i + 1 < n && q.charAt(i + 1) == '|') { out += TPunct("||", i); i += 2 }
          else { out += TPunct("|", i); i += 1 }
        case other => fail(s"unexpected character '$other'", i)
      }
    }
    out += TEof(n)
    out.result()
  }

  // ---- parser state ----------------------------------------------------------

  private final class P(toks: Vector[Tok]) {
    var i = 0
    var prefixes = Map.empty[String, String]
    def peek: Tok = toks(i)
    def next(): Tok = { val t = toks(i); i += 1; t }
    def isName(kw: String): Boolean = peek match {
      case TName(v, _) => v.equalsIgnoreCase(kw)
      case _ => false
    }
    def eatName(kw: String): Unit =
      if (isName(kw)) { i += 1 }
      else fail(s"expected $kw, got ${describe(peek)}", peek.pos)
    def isPunct(p: String): Boolean = peek match {
      case TPunct(v, _) => v == p
      case _ => false
    }
    def eatPunct(p: String): Unit =
      if (isPunct(p)) { i += 1 }
      else fail(s"expected '$p', got ${describe(peek)}", peek.pos)
    def expand(name: String, pos: Int): String = {
      val idx = name.indexOf(':')
      if (idx < 0) fail(s"bare name '$name' (not a keyword, not prefixed)", pos)
      val (pre, local) = (name.substring(0, idx), name.substring(idx + 1))
      prefixes.get(pre) match {
        case Some(base) => base + local
        case None => fail(s"undeclared prefix '$pre:'", pos)
      }
    }
  }

  private def describe(t: Tok): String = t match {
    case TIri(v, _) => s"<$v>"
    case TVar(v, _) => s"?$v"
    case TLit(v, _) => s""""$v""""
    case TNum(v, _) => v
    case TName(v, _) => v
    case TPunct(v, _) => s"'$v'"
    case TEof(_) => "end of query"
  }

  // ---- entry point -------------------------------------------------------------

  def parse(query: String): SparqlQuery = {
    val p = new P(tokenize(query))
    while (p.isName("PREFIX")) {
      p.next()
      val name = p.next() match {
        case TName(v, pos) =>
          if (!v.endsWith(":")) fail(s"prefix '$v' must end with ':'", pos)
          v.dropRight(1)
        case TPunct(":", _) => ""
        case other => fail(s"expected prefix name, got ${describe(other)}", other.pos)
      }
      val iri = p.next() match {
        case TIri(v, _) => v
        case other => fail(s"expected <iri> after PREFIX, got ${describe(other)}", other.pos)
      }
      p.prefixes += (name -> iri)
    }
    val q =
      if (p.isName("SELECT")) parseSelect(p)
      else if (p.isName("CONSTRUCT")) parseConstruct(p)
      else if (p.isName("DESCRIBE")) parseDescribe(p)
      else if (p.isName("ASK")) parseAsk(p)
      else fail(s"expected SELECT/CONSTRUCT/DESCRIBE/ASK, got ${describe(p.peek)}",
        p.peek.pos)
    p.peek match {
      case TEof(_) => q
      case other => fail(s"trailing content after query: ${describe(other)}", other.pos)
    }
  }

  // ---- query forms ---------------------------------------------------------------

  private def parseSelect(p: P): SelectQ = {
    p.eatName("SELECT")
    val distinct = if (p.isName("DISTINCT")) { p.next(); true } else false
    val projs = parseProjection(p)
    if (p.isName("WHERE")) p.next()
    val where = parseGroup(p)
    val groupBy =
      if (p.isName("GROUP")) {
        p.next(); p.eatName("BY")
        val vs = Seq.newBuilder[String]
        var done = false
        while (!done) p.peek match {
          case TVar(v, _) => p.next(); vs += v
          case TPunct("(", pos) =>
            fail("GROUP BY expressions are not supported (group by plain " +
              "variables; BIND the expression first)", pos)
          case _ => done = true
        }
        val r = vs.result()
        if (r.isEmpty) fail("GROUP BY needs at least one ?var", p.peek.pos)
        if (r.distinct.size != r.size) fail("duplicate GROUP BY variable", p.peek.pos)
        r
      } else Seq.empty
    val having =
      if (p.isName("HAVING")) { p.next(); parseHaving(p) } else Seq.empty
    parseModifiers(p, allowOrder = true) match {
      case (order, limit, offset) =>
        SelectQ(distinct, projs, where, groupBy, having, order, limit, offset)
    }
  }

  private val aggNames =
    Set("COUNT", "MIN", "MAX", "SAMPLE", "GROUP_CONCAT", "SUM", "AVG")

  private def isAggName(p: P): Boolean = p.peek match {
    case TName(v, _) => aggNames(v.toUpperCase)
    case _ => false
  }

  /** aggregate call, keyword not yet consumed:
    * COUNT([DISTINCT] * | ?v) | MIN/MAX/SAMPLE([DISTINCT] ?v) |
    * GROUP_CONCAT([DISTINCT] ?v [; SEPARATOR="s"]) | SUM/AVG([DISTINCT] ?v).
    * SUM/AVG parse here; the COMPILER refuses them unless the argument is
    * provably numeric (see SparqlAst.Agg) — summing lexical forms would
    * silently diverge from SPARQL numeric semantics. */
  private def parseAggCall(p: P): Agg = {
    val (fn, fnPos) = p.next() match {
      case TName(v, pos) => (v.toUpperCase, pos)
      case other => fail(s"expected aggregate, got ${describe(other)}", other.pos)
    }
    if (!aggNames(fn)) fail(s"unsupported aggregate $fn", fnPos)
    p.eatPunct("(")
    val distinct = if (p.isName("DISTINCT")) { p.next(); true } else false
    val arg: Option[String] = p.peek match {
      case TPunct("*", pos) =>
        if (fn != "COUNT") fail(s"$fn(*) is not valid SPARQL", pos)
        p.next(); None
      case TVar(v, _) => p.next(); Some(v)
      case other => fail(s"aggregate argument must be ?var" +
        (if (fn == "COUNT") " or *" else "") + s", got ${describe(other)}", other.pos)
    }
    if (fn == "COUNT" && distinct && arg.isEmpty)
      fail("COUNT(DISTINCT *) is not supported (DISTINCT over full solutions: " +
        "wrap the pattern in SELECT DISTINCT instead)", fnPos)
    var sep: Option[String] = None
    if (p.isPunct(";")) {
      if (fn != "GROUP_CONCAT") fail("only GROUP_CONCAT takes a SEPARATOR", p.peek.pos)
      p.next(); p.eatName("SEPARATOR"); p.eatPunct("=")
      sep = Some(p.next() match {
        case TLit(v, _) => v
        case other => fail(s"SEPARATOR takes a string literal, got ${describe(other)}", other.pos)
      })
    }
    p.eatPunct(")")
    Agg(fn, arg, distinct, sep)
  }

  /** HAVING '(' agg op rhs ('&&' agg op rhs)* ')' — a conjunction of
    * aggregate comparisons. */
  private def parseHaving(p: P): Seq[HCmp] = {
    p.eatPunct("(")
    val out = Seq.newBuilder[HCmp]
    var more = true
    while (more) {
      if (!isAggName(p))
        fail(s"HAVING condition must start with an aggregate, got ${describe(p.peek)}",
          p.peek.pos)
      val agg = parseAggCall(p)
      val opPos = p.peek.pos
      val op = p.peek match {
        case TPunct(o, _) if Set("=", "!=", "<", "<=", ">", ">=")(o) => p.next(); o
        case other => fail(s"expected comparison in HAVING, got ${describe(other)}", other.pos)
      }
      val rhs = p.next() match {
        case TNum(v, pos) =>
          if (agg.fn != "COUNT" && agg.fn != "SUM" && agg.fn != "AVG")
            fail(s"${agg.fn} is string-valued: comparing it to a number would " +
              "be lexicographic, not numeric", pos)
          // COUNT is integral: a decimal rhs is refused HERE (positioned)
          // rather than crashing the compiler's toLong with a raw
          // NumberFormatException; SUM/AVG rhs may be decimal
          if (agg.fn == "COUNT" && v.contains("."))
            fail("COUNT compares to an integer", pos)
          v
        case TLit(v, pos) =>
          if (agg.fn == "COUNT" || agg.fn == "SUM" || agg.fn == "AVG")
            fail(s"${agg.fn} compares to a number", pos)
          if (op != "=" && op != "!=")
            fail("numeric ordering comparisons are not supported over string " +
              "aggregates (lexicographic '<' would silently diverge)", opPos)
          v
        case other => fail(s"HAVING compares to a literal, got ${describe(other)}", other.pos)
      }
      out += HCmp(agg, op, rhs)
      if (p.isPunct("&&")) p.next() else more = false
    }
    p.eatPunct(")")
    out.result()
  }

  /** projection list: '*' | (?v | '(' (?x | STR(?x) | aggregate) AS ?v ')')+ */
  private def parseProjection(p: P): Seq[Proj] = {
    if (p.isPunct("*")) { p.next(); return Seq.empty }
    val out = Seq.newBuilder[Proj]
    var seen = false
    var done = false
    while (!done) {
      p.peek match {
        case TVar(v, _) => p.next(); out += Proj(v, PVarRef(v)); seen = true
        case TPunct("(", _) =>
          p.next()
          val expr: PExpr = p.peek match {
            case TVar(v, _) => p.next(); PVarRef(v)
            case TName(f, _) if f.equalsIgnoreCase("STR") =>
              p.next(); p.eatPunct("(")
              val inner = p.next() match {
                case TVar(v, _) => v
                case other => fail(s"STR() takes a variable, got ${describe(other)}", other.pos)
              }
              p.eatPunct(")")
              PVarRef(inner)
            case TName(_, _) if isAggName(p) => PAggRef(parseAggCall(p))
            case other => fail(s"unsupported projection expression ${describe(other)}", other.pos)
          }
          p.eatName("AS")
          val name = p.next() match {
            case TVar(v, _) => v
            case other => fail(s"expected ?var after AS, got ${describe(other)}", other.pos)
          }
          p.eatPunct(")")
          out += Proj(name, expr); seen = true
        case _ => done = true
      }
    }
    val r = out.result()
    if (!seen) fail("SELECT needs '*' or at least one projection", p.peek.pos)
    val dup = r.groupBy(_.name).collectFirst { case (n, g) if g.size > 1 => n }
    dup.foreach(n => fail(s"duplicate projection ?$n", p.peek.pos))
    r
  }

  private def parseConstruct(p: P): ConstructQ = {
    p.eatName("CONSTRUCT")
    p.eatPunct("{")
    val template = Seq.newBuilder[TP]
    while (!p.isPunct("}")) {
      val at = p.peek.pos
      template ++= parseTriplesSameSubject(p).map {
        case GTriple(tp) => tp
        case _: GPath => fail("property paths are not allowed in a CONSTRUCT " +
          "template (a template instantiates triples, not path matches)", at)
        case other => fail(s"unexpected $other in CONSTRUCT template", at)
      }
      if (p.isPunct(".")) p.next()
    }
    p.eatPunct("}")
    if (p.isName("WHERE")) p.next()
    val where = parseGroup(p)
    val (_, limit, offset) = parseModifiers(p, allowOrder = false)
    if (offset.isDefined)
      fail("OFFSET on CONSTRUCT is not supported (unordered solutions make " +
        "the skipped prefix meaningless)", p.peek.pos)
    ConstructQ(template.result(), where, limit)
  }

  private def parseDescribe(p: P): DescribeQ = {
    p.eatName("DESCRIBE")
    val terms = Seq.newBuilder[Term]
    var done = false
    while (!done) {
      p.peek match {
        case TIri(v, _) => p.next(); terms += I(v)
        case TVar(v, _) => p.next(); terms += V(v)
        case TName(v, pos) if !v.equalsIgnoreCase("WHERE") =>
          p.next(); terms += I(p.expand(v, pos))
        case _ => done = true
      }
    }
    val ts = terms.result()
    if (ts.isEmpty) fail("DESCRIBE needs at least one resource or variable", p.peek.pos)
    val where =
      if (p.isName("WHERE")) { p.next(); Some(parseGroup(p)) }
      else if (p.isPunct("{")) Some(parseGroup(p))
      else None
    if (ts.exists(_.isInstanceOf[V]) && where.isEmpty)
      fail("DESCRIBE ?var requires a WHERE group to bind it", p.peek.pos)
    DescribeQ(ts, where)
  }

  private def parseAsk(p: P): AskQ = {
    p.eatName("ASK")
    AskQ(parseGroup(p))
  }

  private def parseModifiers(p: P, allowOrder: Boolean)
      : (Seq[(String, Boolean)], Option[Long], Option[Long]) = {
    var order = Seq.empty[(String, Boolean)]
    var limit: Option[Long] = None
    var offset: Option[Long] = None
    if (p.isName("ORDER")) {
      if (!allowOrder) fail("ORDER BY is not valid here", p.peek.pos)
      p.next(); p.eatName("BY")
      val ob = Seq.newBuilder[(String, Boolean)]
      var done = false
      while (!done) {
        p.peek match {
          case TVar(v, _) => p.next(); ob += ((v, true))
          case TName(d, _) if d.equalsIgnoreCase("ASC") || d.equalsIgnoreCase("DESC") =>
            p.next(); p.eatPunct("(")
            val v = p.next() match {
              case TVar(x, _) => x
              case other => fail(s"expected ?var in ${d.toUpperCase}(), got ${describe(other)}", other.pos)
            }
            p.eatPunct(")")
            ob += ((v, d.equalsIgnoreCase("ASC")))
          case _ => done = true
        }
      }
      order = ob.result()
      if (order.isEmpty) fail("ORDER BY needs at least one sort key", p.peek.pos)
    }
    def num(kw: String): Long = {
      p.eatName(kw)
      p.next() match {
        case TNum(v, pos) =>
          if (v.contains(".")) fail(s"$kw takes an integer", pos)
          v.toLong
        case other => fail(s"expected integer after $kw, got ${describe(other)}", other.pos)
      }
    }
    // LIMIT/OFFSET in either order, each at most once
    while (p.isName("LIMIT") || p.isName("OFFSET")) {
      if (p.isName("LIMIT")) {
        if (limit.isDefined) fail("duplicate LIMIT", p.peek.pos)
        limit = Some(num("LIMIT"))
      } else {
        if (offset.isDefined) fail("duplicate OFFSET", p.peek.pos)
        offset = Some(num("OFFSET"))
      }
    }
    (order, limit, offset)
  }

  // ---- group graph patterns --------------------------------------------------------

  private def parseGroup(p: P): Group = {
    p.eatPunct("{")
    val elems = Seq.newBuilder[GElem]
    while (!p.isPunct("}")) {
      if (p.isName("FILTER")) {
        p.next()
        // FILTER [NOT] EXISTS { group } is a join-shaped filter, not a
        // boolean expression (the subset does not allow EXISTS nested
        // inside && / || / ! — it would not compile to a column)
        if (p.isName("EXISTS")) {
          p.next(); elems += GExists(parseGroup(p), positive = true)
        } else if (p.isName("NOT")) {
          p.next(); p.eatName("EXISTS")
          elems += GExists(parseGroup(p), positive = false)
        } else {
          elems += GFilter(parseFilterExpr(p))
        }
      } else if (p.isName("SERVICE")) {
        p.next()
        val silent = if (p.isName("SILENT")) { p.next(); true } else false
        val iri = p.peek match {
          case TIri(u, _) => p.next(); u
          case TVar(_, pos) => fail("SERVICE ?var is not compiled (the " +
            "endpoint set cannot be resolved at plan time) — name the " +
            "service IRI", pos)
          case TName(n, pos) => p.next(); p.expand(n, pos)
          case other => fail(s"SERVICE takes an IRI, got ${describe(other)}", other.pos)
        }
        elems += GService(iri, parseGroup(p), silent)
      } else if (p.isName("GRAPH")) {
        p.next()
        val t = p.peek match {
          case TVar(v, _) => p.next(); V(v)
          case TIri(u, _) => p.next(); I(u)
          case TName(n, pos) => p.next(); I(p.expand(n, pos))
          case other => fail(s"GRAPH takes an IRI or ?variable, got ${describe(other)}",
            other.pos)
        }
        elems += GGraph(t, parseGroup(p))
      } else if (p.isName("VALUES")) {
        p.next()
        elems += parseValues(p)
      } else if (p.isName("MINUS")) {
        p.next()
        elems += GMinus(parseGroup(p))
      } else if (p.isName("OPTIONAL")) {
        p.next()
        elems += GOptional(parseGroup(p))
      } else if (p.isName("BIND")) {
        p.next(); p.eatPunct("(")
        val e = parseBindExpr(p)
        p.eatName("AS")
        val name = p.next() match {
          case TVar(v, _) => v
          case other => fail(s"expected ?var after AS in BIND, got ${describe(other)}", other.pos)
        }
        p.eatPunct(")")
        elems += GBind(e, name)
      } else if (p.isPunct("{")) {
        // nested group, sub-select, or a UNION chain
        elems += parseGroupOrUnionOrSub(p)
      } else if (p.isPunct(".")) {
        p.next() // stray separators are fine anywhere in a group
      } else {
        elems ++= parseTriplesSameSubject(p)
        if (p.isPunct(".")) p.next()
      }
    }
    p.eatPunct("}")
    Group(elems.result())
  }

  private def parseGroupOrUnionOrSub(p: P): GElem = {
    // one UNION branch: either a sub-select (lookahead past '{' for SELECT,
    // the Virtuoso BIND idiom) or a plain nested group — symmetric in every
    // branch position, first included
    def branch(): Group = {
      val start = p.i
      p.eatPunct("{")
      if (p.isName("SELECT")) {
        val sub = parseSelect(p)
        p.eatPunct("}")
        Group(Seq(GSub(sub)))
      } else { p.i = start; parseGroup(p) }
    }
    val first = branch()
    if (!p.isName("UNION")) {
      first.elems match {
        case Seq(one: GSub) => one // a lone sub-select joins as a pattern
        case _ => GUnion(Seq(first)) // a nested group is a 1-branch union
      }
    } else {
      val branches = Seq.newBuilder[Group]
      branches += first
      while (p.isName("UNION")) { p.next(); branches += branch() }
      GUnion(branches.result())
    }
  }

  /** VALUES ?v { t1 t2 ... } | VALUES (?a ?b) { (t1 t2) (UNDEF t3) ... } */
  private def parseValues(p: P): GValues = {
    def undef(): Boolean = p.peek match {
      case TName(v, _) if v.equalsIgnoreCase("UNDEF") => p.next(); true
      case _ => false
    }
    def cell(): Option[Term] =
      if (undef()) None else Some(parseTerm(p, "VALUES entry"))
    val vars: Seq[String] = p.peek match {
      case TVar(v, _) => p.next(); Seq(v)
      case TPunct("(", _) =>
        p.next()
        val vs = Seq.newBuilder[String]
        while (!p.isPunct(")")) p.next() match {
          case TVar(v, _) => vs += v
          case other => fail(s"expected ?var in VALUES header, got ${describe(other)}", other.pos)
        }
        p.eatPunct(")")
        val r = vs.result()
        if (r.isEmpty) fail("VALUES () with no variables", p.peek.pos)
        if (r.distinct.size != r.size) fail("duplicate variable in VALUES header", p.peek.pos)
        r
      case other => fail(s"expected ?var or (?vars) after VALUES, got ${describe(other)}", other.pos)
    }
    p.eatPunct("{")
    val rows = Seq.newBuilder[Seq[Option[Term]]]
    if (vars.length == 1) {
      while (!p.isPunct("}")) rows += Seq(cell())
    } else {
      while (!p.isPunct("}")) {
        p.eatPunct("(")
        val row = Seq.newBuilder[Option[Term]]
        while (!p.isPunct(")")) row += cell()
        p.eatPunct(")")
        val r = row.result()
        if (r.length != vars.length)
          fail(s"VALUES row has ${r.length} entries for ${vars.length} variables", p.peek.pos)
        rows += r
      }
    }
    p.eatPunct("}")
    val rs = rows.result()
    if (rs.isEmpty) fail("VALUES with no rows", p.peek.pos)
    rs.flatten.flatten.foreach {
      case V(n) => fail(s"?$n cannot appear in a VALUES row (terms only)", p.peek.pos)
      case _ => ()
    }
    GValues(vars, rs)
  }

  /** term [p o (',' o)* (';' p o (',' o)*)*] — the standard same-subject
    * shorthand; each predicate position may be a property path. Returns
    * GTriple elems for plain predicates and GPath for non-trivial paths. */
  private def parseTriplesSameSubject(p: P): Seq[GElem] = {
    val subj = parseTerm(p, "subject")
    val out = Seq.newBuilder[GElem]
    var morePreds = true
    while (morePreds) {
      val pred = parsePredicateOrPath(p)
      var moreObjs = true
      while (moreObjs) {
        val obj = parseTerm(p, "object")
        out += (pred match {
          case Left(t) => GTriple(TP(subj, t, obj))
          case Right(path) => GPath(subj, path, obj)
        })
        if (p.isPunct(",")) p.next() else moreObjs = false
      }
      if (p.isPunct(";")) p.next() else morePreds = false
    }
    out.result()
  }

  /** predicate position: a variable, or a property path (a path that is a
    * single plain IRI collapses to a Left term). */
  private def parsePredicateOrPath(p: P): Either[Term, Path] = p.peek match {
    case TVar(v, _) => p.next(); Left(V(v))
    case _ => parsePath(p) match {
      case PLink(iri) => Left(I(iri))
      case path => Right(path)
    }
  }

  // ---- property paths ---------------------------------------------------------

  /** SPARQL 1.1 path grammar subset: alternation '|' (lowest), sequence
    * '/', inverse '^' (prefix), modifiers + * ? (postfix), negated
    * property set !iri / !(iri|...) (forward members only), parens.
    * Per the grammar, '^elt+' parses as '^(elt+)'. */
  private def parsePath(p: P): Path = {
    var e = parsePathSeq(p)
    while (p.isPunct("|")) { p.next(); e = PAlt(e, parsePathSeq(p)) }
    e
  }

  private def parsePathSeq(p: P): Path = {
    var e = parsePathElt(p)
    while (p.isPunct("/")) { p.next(); e = PSeq(e, parsePathElt(p)) }
    e
  }

  private def parsePathElt(p: P): Path = {
    val inv = if (p.isPunct("^")) { p.next(); true } else false
    val prim = parsePathPrimary(p)
    val modded = p.peek match {
      case TPunct("+", _) => p.next(); PPlus(prim)
      case TPunct("*", _) => p.next(); PStar(prim)
      case TPunct("?", _) => p.next(); POpt(prim)
      case _ => prim
    }
    if (inv) PInv(modded) else modded
  }

  private def parsePathPrimary(p: P): Path = p.peek match {
    case TIri(v, _) => p.next(); PLink(v)
    case TName(v, pos) =>
      p.next()
      PLink(if (v == "a") RdfType else p.expand(v, pos))
    case TPunct("!", _) =>
      p.next()
      val iris = Seq.newBuilder[String]
      def one(): Unit = p.next() match {
        case TIri(v, _) => iris += v
        case TName(v, pos) => iris += (if (v == "a") RdfType else p.expand(v, pos))
        case TPunct("^", pos) =>
          fail("inverse members in a negated property set are not supported", pos)
        case other => fail(s"expected IRI in negated property set, got ${describe(other)}",
          other.pos)
      }
      if (p.isPunct("(")) {
        p.next(); one()
        while (p.isPunct("|")) { p.next(); one() }
        p.eatPunct(")")
      } else one()
      PNeg(iris.result())
    case TPunct("(", _) =>
      p.next(); val e = parsePath(p); p.eatPunct(")"); e
    case other => fail(s"expected path element, got ${describe(other)}", other.pos)
  }

  // ---- BIND expressions ---------------------------------------------------------

  /** BIND expr subset over string terms: ?v, constants, CONCAT(...);
    * STR() and IRI()/URI() are identity wrappers. */
  private def parseBindExpr(p: P): BExpr = p.peek match {
    case TVar(v, _) => p.next(); BVar(v)
    case TIri(v, _) => p.next(); BConst(v)
    case TLit(v, _) => p.next(); BConst(v)
    case TNum(v, _) => p.next(); BConst(v)
    case TName(f, _) if f.equalsIgnoreCase("STR") || f.equalsIgnoreCase("IRI") ||
        f.equalsIgnoreCase("URI") =>
      p.next(); p.eatPunct("("); val e = parseBindExpr(p); p.eatPunct(")"); e
    case TName(f, _) if f.equalsIgnoreCase("CONCAT") =>
      p.next(); p.eatPunct("(")
      val parts = Seq.newBuilder[BExpr]
      parts += parseBindExpr(p)
      while (p.isPunct(",")) { p.next(); parts += parseBindExpr(p) }
      p.eatPunct(")")
      BConcat(parts.result())
    case TName(f, _) if f.equalsIgnoreCase("UCASE") || f.equalsIgnoreCase("LCASE") =>
      val upper = f.equalsIgnoreCase("UCASE")
      p.next(); p.eatPunct("("); val e = parseBindExpr(p); p.eatPunct(")")
      BCase(upper, e)
    case TName(f, _) if f.equalsIgnoreCase("SUBSTR") =>
      p.next(); p.eatPunct("("); val e = parseBindExpr(p); p.eatPunct(",")
      def intArg(what: String, min: Long): Long = p.next() match {
        case TNum(v, pos) =>
          if (v.contains(".")) fail(s"SUBSTR $what must be an integer", pos)
          val n = try v.toLong catch { case _: NumberFormatException =>
            fail(s"SUBSTR $what out of range", pos) }
          if (n < min) fail(s"SUBSTR $what must be >= $min (1-based, XPath " +
            "zero/negative-index edge semantics are out of the subset)", pos)
          // the compiler lowers through Int (Column#substr): a literal above
          // Int.MaxValue would silently TRUNCATE there (e.g. 4294967297
          // becoming 1) — refuse with a position instead of miscompiling
          if (n > Int.MaxValue) fail(
            s"SUBSTR $what exceeds Int.MaxValue (unsupported)", pos)
          n
        case other => fail(s"SUBSTR $what must be an integer literal " +
          s"(expression arguments are out of the subset), got ${describe(other)}",
          other.pos)
      }
      val start = intArg("start", 1L)
      val len = if (p.isPunct(",")) { p.next(); Some(intArg("length", 0L)) } else None
      p.eatPunct(")")
      BSubstr(e, start, len)
    case TName(f, _) if f.equalsIgnoreCase("REPLACE") =>
      p.next(); p.eatPunct("("); val e = parseBindExpr(p); p.eatPunct(",")
      def litArg(what: String): String = p.next() match {
        case TLit(v, _) => v
        case other => fail(s"REPLACE $what must be a string literal, got " +
          describe(other), other.pos)
      }
      val patPos = p.peek.pos
      val pat = litArg("pattern")
      // validate HERE so a bad pattern is a positioned parse error, not a
      // task-time Spark exception
      try java.util.regex.Pattern.compile(pat)
      catch { case ex: java.util.regex.PatternSyntaxException =>
        fail(s"REPLACE pattern does not compile: ${ex.getDescription}", patPos) }
      p.eatPunct(",")
      val repPos = p.peek.pos
      val rep = litArg("replacement")
      // validate the REPLACEMENT too (fn:replace FORX0004 family): Spark's
      // regexp_replace feeds it to java.util.regex.Matcher group
      // references, where a '$' not followed by a digit or a dangling '\'
      // throws an UNPOSITIONED IllegalArgumentException at task time —
      // outside the positioned parse-error contract the mutation sweep
      // enforces. '$<digit>' backrefs would additionally diverge from the
      // DuckDB oracle dialect (which spells them '\\1'). Both characters
      // are therefore out of the subset: refused HERE with a position,
      // never miscompiled or thrown mid-task.
      if (rep.contains('$') || rep.contains('\\'))
        fail("REPLACE replacement must not contain '$' or '\\' (group " +
          "references and escapes are out of the subset — their semantics " +
          "differ between engines and invalid forms throw at task time)",
          repPos)
      if (p.isPunct(","))
        fail("REPLACE flags are not supported (REGEX parity)", p.peek.pos)
      p.eatPunct(")")
      BReplace(e, pat, rep)
    case TName(f, _) if f.equalsIgnoreCase("STRBEFORE") || f.equalsIgnoreCase("STRAFTER") =>
      val before = f.equalsIgnoreCase("STRBEFORE")
      p.next(); p.eatPunct("("); val e = parseBindExpr(p); p.eatPunct(",")
      val sep = p.next() match {
        case TLit(v, _) => v
        case other => fail(s"$f separator must be a string literal, got " +
          describe(other), other.pos)
      }
      p.eatPunct(")")
      BStrSide(before, e, sep)
    case TName(f, _) if f.equalsIgnoreCase("IF") =>
      p.next(); p.eatPunct("(")
      val cond = parseOr(p)
      p.eatPunct(",")
      val t = parseBindExpr(p); p.eatPunct(",")
      val fb = parseBindExpr(p); p.eatPunct(")")
      BIf(cond, t, fb)
    case TName(f, _) if f.equalsIgnoreCase("MD5") || f.equalsIgnoreCase("SHA256") =>
      val bits = if (f.equalsIgnoreCase("MD5")) 128 else 256
      p.next(); p.eatPunct("("); val e = parseBindExpr(p); p.eatPunct(")")
      BHash(bits, e)
    case TName(f, _) if f.equalsIgnoreCase("SHA1") || f.equalsIgnoreCase("SHA384") ||
        f.equalsIgnoreCase("SHA512") =>
      fail(s"only MD5 and SHA256 digests are supported (${f.toUpperCase} is " +
        "out of the subset)", p.peek.pos)
    case TName(f, _) if f.equalsIgnoreCase("COALESCE") =>
      p.next(); p.eatPunct("(")
      val parts = Seq.newBuilder[BExpr]
      parts += parseBindExpr(p)
      while (p.isPunct(",")) { p.next(); parts += parseBindExpr(p) }
      p.eatPunct(")")
      BCoalesce(parts.result())
    case TName(v, pos) => p.next(); BConst(p.expand(v, pos))
    case other => fail(s"unsupported BIND expression ${describe(other)}", other.pos)
  }

  private def parseTerm(p: P, role: String): Term = p.next() match {
    case TIri(v, _) => I(v)
    case TVar(v, _) => V(v)
    case TLit(v, _) => L(v)
    case TNum(v, _) => L(v)
    case TName(v, pos) => I(p.expand(v, pos))
    case other => fail(s"expected $role term, got ${describe(other)}", other.pos)
  }

  // ---- filter expressions -------------------------------------------------------------

  /** FILTER body: either a parenthesized expression or a bare builtin call
    * (both appear in the wild; the reference template uses both forms). */
  private def parseFilterExpr(p: P): FExpr =
    if (p.isPunct("(")) { p.eatPunct("("); val e = parseOr(p); p.eatPunct(")"); e }
    else parseUnary(p)

  private def parseOr(p: P): FExpr = {
    var e = parseAnd(p)
    while (p.isPunct("||")) { p.next(); e = FOr(e, parseAnd(p)) }
    e
  }

  private def parseAnd(p: P): FExpr = {
    var e = parseUnary(p)
    while (p.isPunct("&&")) { p.next(); e = FAnd(e, parseUnary(p)) }
    e
  }

  private def parseUnary(p: P): FExpr =
    if (p.isPunct("!")) {
      p.next()
      parseUnary(p) match {
        // term-kind checks are TOTAL booleans (no type error), so the
        // negation folds into the node — the compiler's scan pushdown then
        // sees one shape for both polarities
        case FTermKind(v, k, pos) => FTermKind(v, k, !pos)
        case FIsNumeric(v, pos) => FIsNumeric(v, !pos)
        case e => FNot(e)
      }
    }
    else if (p.isPunct("(")) { p.eatPunct("("); val e = parseOr(p); p.eatPunct(")"); e }
    else parsePrimary(p)

  private def parsePrimary(p: P): FExpr = {
    if (p.isName("LANG")) {
      val v = parseLangOf(p)
      val opPos = p.peek.pos
      val eq = p.peek match {
        case TPunct("=", _) => p.next(); true
        case TPunct("!=", _) => p.next(); false
        case _ => fail("lang() supports = and != against a string literal " +
          "(ordering over language tags has no meaning)", opPos)
      }
      val tag = p.next() match {
        case TLit(t, _) => t
        case other => fail(s"lang() compares to a string literal, got ${describe(other)}",
          other.pos)
      }
      return FLangCmp(v, eq, tag)
    }
    if (p.isName("DATATYPE")) {
      p.next(); p.eatPunct("(")
      val v = p.next() match {
        case TVar(x, _) => x
        case other => fail(s"datatype() takes a variable, got ${describe(other)}", other.pos)
      }
      p.eatPunct(")")
      val eq = p.peek match {
        case TPunct("=", _) => p.next(); true
        case TPunct("!=", _) => p.next(); false
        case other => fail("datatype() supports = and != against an IRI", other.pos)
      }
      val iri = p.next() match {
        case TIri(u, _) => u
        case TName(n, pos) => p.expand(n, pos)
        case other => fail(s"datatype() compares to an IRI, got ${describe(other)}",
          other.pos)
      }
      return FDtCmp(v, eq, iri)
    }
    if (p.isName("LANGMATCHES")) {
      p.next(); p.eatPunct("(")
      if (!p.isName("LANG"))
        fail("langMatches() is supported as langMatches(lang(?v), \"range\")", p.peek.pos)
      val v = parseLangOf(p)
      p.eatPunct(",")
      val range = p.next() match {
        case TLit(t, _) => t
        case other => fail(s"langMatches() range must be a string literal, got " +
          describe(other), other.pos)
      }
      p.eatPunct(")")
      return FLangMatches(v, range)
    }
    if (p.isName("BOUND")) {
      p.next(); p.eatPunct("(")
      val v = p.next() match {
        case TVar(x, _) => V(x)
        case other => fail(s"BOUND() takes a variable, got ${describe(other)}", other.pos)
      }
      p.eatPunct(")")
      return FBound(v)
    }
    val kindFns = Seq("ISIRI" -> 'i', "ISURI" -> 'i', "ISLITERAL" -> 'l',
      "ISBLANK" -> 'b')
    kindFns.find { case (fn, _) => p.isName(fn) } match {
      case Some((fn, kind)) =>
        p.next(); p.eatPunct("(")
        val v = p.next() match {
          case TVar(x, _) => x
          case other => fail(s"$fn() takes a variable (constant-term kind " +
            s"checks fold at write time), got ${describe(other)}", other.pos)
        }
        p.eatPunct(")")
        return FTermKind(v, kind, pos = true)
      case None => ()
    }
    if (p.isName("ISNUMERIC")) {
      p.next(); p.eatPunct("(")
      val v = p.next() match {
        case TVar(x, _) => x
        case other => fail(s"isNumeric() takes a variable, got ${describe(other)}",
          other.pos)
      }
      p.eatPunct(")")
      return FIsNumeric(v, pos = true)
    }
    val strFns = Seq("STRSTARTS", "STRENDS", "CONTAINS")
    strFns.find(p.isName) match {
      case Some(fn) =>
        p.next(); p.eatPunct("(")
        val t = parseOperand(p)
        p.eatPunct(",")
        val arg = p.next() match {
          case TLit(v, _) => v
          case other => fail(s"$fn() takes a string literal argument, got " +
            describe(other), other.pos)
        }
        p.eatPunct(")")
        return FStrFn(fn, t, arg)
      case None => ()
    }
    if (p.isName("STRLEN")) {
      p.next(); p.eatPunct("(")
      val v = p.next() match {
        case TVar(x, _) => x
        case other => fail(s"STRLEN() takes a variable, got ${describe(other)}", other.pos)
      }
      p.eatPunct(")")
      val op = p.peek match {
        case TPunct(o, _) if Set("=", "!=", "<", "<=", ">", ">=")(o) => p.next(); o
        case other => fail(s"expected comparison after STRLEN(), got ${describe(other)}",
          other.pos)
      }
      val n = p.next() match {
        case TNum(x, pos) =>
          if (x.contains(".")) fail("STRLEN compares to an integer", pos)
          x.toLong
        case other => fail(s"STRLEN compares to an integer, got ${describe(other)}",
          other.pos)
      }
      return FStrLenCmp(v, op, n)
    }
    if (p.isName("REGEX")) {
      p.next(); p.eatPunct("(")
      val t = parseOperand(p)
      p.eatPunct(",")
      val pat = p.next() match {
        case TLit(v, _) => v
        case other => fail(s"REGEX pattern must be a string literal, got ${describe(other)}", other.pos)
      }
      if (p.isPunct(","))
        fail("REGEX flags are not supported", p.peek.pos)
      p.eatPunct(")")
      return FRegex(t, pat)
    }
    val (l, lNum, _) = parseOperandN(p)
    if (p.isName("IN")) {
      p.next(); p.eatPunct("(")
      val vals = Seq.newBuilder[Term]
      if (!p.isPunct(")")) {
        vals += parseOperand(p)
        while (p.isPunct(",")) { p.next(); vals += parseOperand(p) }
      }
      p.eatPunct(")")
      val vs = vals.result()
      if (vs.isEmpty) fail("IN () with no values", p.peek.pos)
      FIn(l, vs)
    } else {
      val opPos = p.peek.pos
      val op = p.peek match {
        case TPunct(o, _) if Set("=", "!=", "<", "<=", ">", ">=")(o) => p.next(); o
        case other => fail(s"expected comparison/IN after operand, got ${describe(other)}", other.pos)
      }
      val (r, rNum, _) = parseOperandN(p)
      // Ordering against a NUMERIC literal is a VALUE-space comparison:
      // ?v op number parses to FNumCmp (normalized var-on-left) and the
      // compiler proves numeric-ness or refuses. Any other numeric-ordering
      // shape (two constants, number vs string literal) is refused —
      // lexicographic "10" < "9" would silently diverge. Equality keeps
      // the lexical-form compare, and string-literal ordering stays
      // allowed — that is what makes the reference's xsd:dateTime
      // watermark compare work: its fixed ISO layout is ordered
      // lexicographically == chronologically.
      if ((lNum || rNum) && op != "=" && op != "!=") {
        def flip(o: String): String = o match {
          case "<" => ">"; case "<=" => ">="; case ">" => "<"; case ">=" => "<="
        }
        (l, r) match {
          case (V(n), L(lex)) if rNum => FNumCmp(n, op, lex)
          case (L(lex), V(n)) if lNum => FNumCmp(n, flip(op), lex)
          case _ =>
            fail("numeric ordering comparisons need a variable on one side " +
              "and the numeric literal on the other (two constants, or a " +
              "number against a string literal, would silently diverge " +
              "from SPARQL numeric semantics)", opPos)
        }
      } else FCmp(op, l, r)
    }
  }

  /** LANG '(' ?v ')' — the LANG keyword not yet consumed. */
  private def parseLangOf(p: P): String = {
    p.eatName("LANG"); p.eatPunct("(")
    val v = p.next() match {
      case TVar(x, _) => x
      case other => fail(s"lang() takes a variable, got ${describe(other)}", other.pos)
    }
    p.eatPunct(")")
    v
  }

  private def parseOperand(p: P): Term = parseOperandN(p)._1

  /** filter operand: ?v | STR(?v) (identity) | <iri> | "lit" | number |
    * prefixed name | xsd:dateTime("lit"); booleans mark (numeric literal,
    * temporal cast) */
  private def parseOperandN(p: P): (Term, Boolean, Boolean) = p.peek match {
    case TName(f, _) if f.equalsIgnoreCase("STR") =>
      p.next(); p.eatPunct("(")
      val t = p.next() match {
        case TVar(v, _) => V(v)
        case other => fail(s"STR() takes a variable, got ${describe(other)}", other.pos)
      }
      p.eatPunct(")")
      (t, false, false)
    // xsd:dateTime("...") — the reference's change-detection template casts
    // its watermark literal (Harvester.java:1204-1215, fixed
    // yyyy-MM-dd'T'HH:mm:ss layout). The cast is an identity over the
    // lexical form; its REAL effect is unlocking ordering comparisons,
    // which are exact for the fixed-width ISO layout (lexicographic ==
    // chronological) — unlike free-form strings, which stay refused.
    case TName(f, pos) if f.contains(":") && {
        val i = f.indexOf(':'); f.substring(i + 1) == "dateTime"
      } =>
      p.next()
      // the cast path fires only on a CALL — `?x = xsd:dateTime` (the IRI
      // as a plain term) and `?x = ex:dateTime` (any prefixed name whose
      // local part happens to be "dateTime") are ordinary operands
      if (!p.isPunct("(")) (I(p.expand(f, pos)), false, false)
      else {
        if (p.expand(f, pos) != "http://www.w3.org/2001/XMLSchema#dateTime")
          fail(s"only xsd:dateTime casts are supported, got $f", pos)
        p.eatPunct("(")
        val v = p.next() match {
          case TLit(x, _) => x
          case other => fail(s"xsd:dateTime() takes a string literal, got ${describe(other)}",
            other.pos)
        }
        p.eatPunct(")")
        (L(v), false, true)
      }
    case TNum(_, _) => (parseTerm(p, "filter operand"), true, false)
    case _ => (parseTerm(p, "filter operand"), false, false)
  }
}
