package graft.sparql

/** AST for the SPARQL subset the reference actually emits and consumes.
  *
  * The reference's entire query surface is SPARQL: river configs carry
  * user-written SELECT/CONSTRUCT/DESCRIBE queries (Harvester.java:82,
  * 1516-1659) and the sync path GENERATES queries from a template
  * (Harvester.java:963-1032) using exactly: CONSTRUCT, basic graph
  * patterns, FILTER(?s IN (...)), OPTIONAL + FILTER(!BOUND(?v)), UNION, a
  * constant "redundant clause" pattern, and a sub-SELECT projecting
  * (str(?label) AS ?o). This AST covers that subset plus the solution
  * modifiers (DISTINCT, ORDER BY, LIMIT, OFFSET) and ASK.
  *
  * Everything is strings: the engine's triple frame is (s, p, o) string
  * columns, so literals fold their language/datatype tags at parse time
  * (the reference does the same erasure with str(?label),
  * Harvester.java:1005-1013).
  */
object SparqlAst {

  /** A term in a triple pattern or filter expression. */
  sealed trait Term
  /** ?name */
  final case class V(name: String) extends Term
  /** <iri> or an expanded prefixed name */
  final case class I(iri: String) extends Term
  /** "literal" (language / datatype tag erased) or a numeric literal,
    * kept as its lexical form */
  final case class L(lex: String) extends Term

  /** One triple pattern. */
  final case class TP(s: Term, p: Term, o: Term)

  // ---- property paths --------------------------------------------------------

  /** SPARQL 1.1 property path between two terms. Paths never contain
    * variables (grammar-level: a path element is an IRI). Sequence and
    * alternation keep BAG semantics (each derivation is one solution);
    * the closure forms (+ * ?) are solution SETS per the spec's
    * ArbitraryLengthPath / ZeroOrOnePath definitions. */
  sealed trait Path
  /** a single predicate step */
  final case class PLink(iri: String) extends Path
  /** negated property set !(iri1|iri2|...) — any predicate NOT listed
    * (forward direction only) */
  final case class PNeg(iris: Seq[String]) extends Path
  /** ^p — inverse */
  final case class PInv(p: Path) extends Path
  /** p1 / p2 — sequence */
  final case class PSeq(a: Path, b: Path) extends Path
  /** p1 | p2 — alternation */
  final case class PAlt(a: Path, b: Path) extends Path
  /** p+ — one or more */
  final case class PPlus(p: Path) extends Path
  /** p* — zero or more */
  final case class PStar(p: Path) extends Path
  /** p? — zero or one */
  final case class POpt(p: Path) extends Path

  // ---- FILTER expressions --------------------------------------------------

  sealed trait FExpr
  /** ?v IN (t1, t2, ...) */
  final case class FIn(t: Term, vals: Seq[Term]) extends FExpr
  /** binary comparison; op is one of = != < <= > >= (string collation) */
  final case class FCmp(op: String, l: Term, r: Term) extends FExpr
  /** BOUND(?v) */
  final case class FBound(v: V) extends FExpr
  /** REGEX(?v, "pattern") */
  final case class FRegex(t: Term, pattern: String) extends FExpr
  /** STRSTARTS / STRENDS / CONTAINS(term, "literal") — boolean string
    * builtins over the lexical form; fully composable (plain columns,
    * unlike lang()) */
  final case class FStrFn(fn: String, t: Term, arg: String) extends FExpr
  /** STRLEN(?v) op integer — lengths are genuine numbers in both engines
    * (codepoint counts), so numeric ordering is exact here */
  final case class FStrLenCmp(v: String, op: String, n: Long) extends FExpr
  /** lang(?v) = "tag" (eq) or lang(?v) != "tag"; compiled by pushing the
    * tag condition into the ONE pattern that binds ?v in object position
    * (the term model is a string, so the tag lives in the frame's `ol`
    * column, not in the term) — see SparqlCompiler's lang scaladoc */
  final case class FLangCmp(v: String, eq: Boolean, value: String) extends FExpr
  /** langMatches(lang(?v), "range") — RFC 4647 basic filtering: range "*"
    * matches any nonempty tag; otherwise case-insensitive equality or a
    * "range-" prefix ("en" matches "en-US") */
  final case class FLangMatches(v: String, range: String) extends FExpr
  /** datatype(?v) = <iri> / != <iri> — same pushdown contract as lang(),
    * over the frame's `dt` column (the typed-literal datatype IRI, ''/null
    * for plain literals and resources) */
  final case class FDtCmp(v: String, eq: Boolean, iri: String) extends FExpr
  /** ?v op numeric-literal with an ORDERING op (< <= > >=), normalized
    * var-on-left at parse time. Value-space comparison: compiles either
    * against a genuine numeric column (an aggregate output) or — like
    * lang()/datatype() — as a scan condition at the ONE object-position
    * pattern binding ?v, requiring the frame's `dt` column: rows whose dt
    * is not a numeric XSD type are removed (the spec's type-error-removes-
    * row), the rest compare as numbers. Equality (=/!=) deliberately stays
    * [[FCmp]]'s lexical-form compare (the documented string-term model). */
  final case class FNumCmp(v: String, op: String, lex: String) extends FExpr
  /** isIRI/isURI (kind 'i') / isLiteral ('l') / isBlank ('b') over ?v;
    * pos=false is the !-negated form (normalized at parse). Unlike lang()/
    * datatype(), these are total booleans over ANY term (SPARQL 17.4.2.1-3
    * — no type error), so the negation simply retains the other two kinds.
    * Same pushdown contract as lang(): the kind lives in the frame's `tk`
    * column ('i'/'l'/'b', non-null), read at the ONE pattern binding ?v in
    * object position. */
  final case class FTermKind(v: String, kind: Char, pos: Boolean) extends FExpr
  /** isNumeric(?v) — true iff ?v is a literal with a numeric XSD datatype
    * (SPARQL 17.4.2.4). Total boolean like the term-kind checks (false for
    * IRIs/blanks/plain literals — no type error), so BOTH polarities are
    * dt-exact on any dt-bearing frame, tk not required: a null dt (plain
    * literal, IRI, blank) is simply false.
    *
    * DOCUMENTED DIVERGENCE (datatype- vs value-space): the spec's
    * fn:isNumeric is true only for a literal whose LEXICAL FORM is a valid
    * numeric (an ill-formed "abc"^^xsd:integer is false per XPath
    * semantics); the dt-membership compile returns true for it, and a
    * positive pin can then feed try_cast-null rows into downstream numeric
    * aggregates (cf. the try_cast note in the numeric-proof machinery).
    * Well-formed data — everything this engine's own exporters emit — is
    * unaffected; conjoin an explicit REGEX guard in the query when
    * consuming foreign dumps with unvalidated typed literals. Same scan
    * pushdown contract as the term-kind checks. */
  final case class FIsNumeric(v: String, pos: Boolean) extends FExpr
  final case class FAnd(a: FExpr, b: FExpr) extends FExpr
  final case class FOr(a: FExpr, b: FExpr) extends FExpr
  final case class FNot(a: FExpr) extends FExpr

  // ---- group graph patterns ------------------------------------------------

  /** An element of a group graph pattern, in source order (order matters:
    * OPTIONAL applies to everything joined so far). */
  sealed trait GElem
  final case class GTriple(tp: TP) extends GElem
  final case class GFilter(e: FExpr) extends GElem
  final case class GOptional(g: Group) extends GElem
  /** { SELECT ... { ... } } nested as a pattern (the Virtuoso-compatible
    * BIND substitute the reference's template uses, Harvester.java:1014-1017) */
  final case class GSub(q: SelectQ) extends GElem
  /** { g1 } UNION { g2 } UNION ... ; a single-branch instance is a plain
    * nested group */
  final case class GUnion(branches: Seq[Group]) extends GElem
  /** VALUES (?a ?b) { ("x" <y>) (UNDEF "z") } — inline bindings; None is
    * UNDEF */
  final case class GValues(vars: Seq[String], rows: Seq[Seq[Option[Term]]]) extends GElem
  /** FILTER EXISTS { g } (positive) / FILTER NOT EXISTS { g } */
  final case class GExists(g: Group, positive: Boolean) extends GElem
  /** MINUS { g } — set-difference on compatible solutions sharing >=1 var;
    * unlike NOT EXISTS there are NO substitute semantics, and a pattern
    * sharing no variable removes NOTHING (the SPARQL-spec pitfall) */
  final case class GMinus(g: Group) extends GElem
  /** a triple pattern whose predicate position is a non-trivial property
    * path (a trivial single-IRI path parses as a plain GTriple) */
  final case class GPath(s: Term, path: Path, o: Term) extends GElem
  /** GRAPH <iri> { P } or GRAPH ?g { P } — the reference's change-detection
    * template wraps its sync conditions in GRAPH ?graph
    * (Harvester.java:1204-1215); needs a quad frame with a `g` column
    * (convention: g = '' or null marks the default graph).
    *
    * Dataset semantics, deliberately Virtuoso-style: patterns OUTSIDE any
    * GRAPH block match the UNION of all graphs (named + default) — the
    * behavior the reference's endpoint gives its templates, where graph
    * metadata lives in the default graph and content in named graphs
    * (Harvester.java:1204-1215 joins across that boundary). GRAPH ?g
    * itself ranges over NAMED graphs only, per the SPARQL spec: rows with
    * g = ''/null never bind ?g. */
  final case class GGraph(g: Term, group: Group) extends GElem
  /** BIND(expr AS ?v) — extends each solution-so-far with ?v; per the
    * spec, ?v must not already be bound at this point in the group */
  final case class GBind(expr: BExpr, name: String) extends GElem
  /** SERVICE [SILENT] <iri> { P } — federation, resolved LOCALLY: the
    * engine has no remote endpoint, but a pre-materialized graph (the
    * engine ingests dumps — S5) can be REGISTERED for the service IRI, and
    * P then compiles against that frame and joins like a nested group.
    * An unregistered IRI refuses loudly — except under SILENT, where the
    * spec's failure behavior (the unit solution) makes the clause a no-op.
    * This is exactly what the reference's own Wikidata test query needs
    * (SparqlSelectTest.java:19 carries a decorative wikibase:label
    * SERVICE). */
  final case class GService(iri: String, group: Group, silent: Boolean) extends GElem

  final case class Group(elems: Seq[GElem])

  // ---- BIND expressions ------------------------------------------------------

  /** BIND expression subset over the string-term model: variables,
    * constants, and CONCAT; STR()/IRI() are identity wrappers (terms are
    * strings end-to-end). */
  sealed trait BExpr
  final case class BVar(name: String) extends BExpr
  final case class BConst(value: String) extends BExpr
  final case class BConcat(parts: Seq[BExpr]) extends BExpr
  /** UCASE / LCASE wrapper (ASCII-stable case mapping on both engines) */
  final case class BCase(upper: Boolean, e: BExpr) extends BExpr
  /** SUBSTR(e, start [, len]) — start/len are INTEGER LITERALS (1-based,
    * start >= 1, len >= 0; expression arguments are out of the subset).
    * Counting is by Unicode code point on both engines. */
  final case class BSubstr(e: BExpr, start: Long, len: Option[Long]) extends BExpr
  /** REPLACE(e, "pattern", "replacement") — global regex replace (XPath
    * fn:replace semantics: ALL matches). Pattern/replacement are literals;
    * the flags argument is out of the subset (REGEX parity). */
  final case class BReplace(e: BExpr, pattern: String, replacement: String) extends BExpr
  /** STRBEFORE / STRAFTER with a LITERAL separator: the slice before/after
    * the FIRST occurrence; "" when absent (SPARQL 17.4.3.4/5). */
  final case class BStrSide(before: Boolean, e: BExpr, sep: String) extends BExpr
  /** IF(cond, then, else) — cond uses the FILTER grammar; an ERROR cond
    * (e.g. an unbound var) makes the whole IF an error (BIND leaves the
    * target unbound), per SPARQL's three-valued semantics. */
  final case class BIf(cond: FExpr, t: BExpr, f: BExpr) extends BExpr
  /** COALESCE(e1, ..., en) — the first argument that evaluates without
    * error (an unbound variable is an error and is skipped). */
  final case class BCoalesce(parts: Seq[BExpr]) extends BExpr
  /** MD5 / SHA256 (SPARQL 17.4.4.x) — lowercase-hex digest of the UTF-8
    * lexical form; cross-engine exact (Spark md5/sha2 == DuckDB md5/
    * sha256). The KG-construction workhorse: content-addressed IRI minting
    * via IRI(CONCAT("urn:x:", MD5(?text))). */
  final case class BHash(bits: Int, e: BExpr) extends BExpr

  // ---- projections ----------------------------------------------------------

  /** An aggregate call: fn is COUNT | MIN | MAX | SAMPLE | GROUP_CONCAT |
    * SUM | AVG; arg None means COUNT(*); sep is GROUP_CONCAT's SEPARATOR
    * (default " " per spec). SUM/AVG parse but compile ONLY when the
    * argument variable is provably numeric — a genuine numeric column (a
    * COUNT output) or a string term whose single binding pattern carries a
    * numeric-datatype proof (a datatype()=<numeric xsd type> or numeric-
    * comparison conjunct pushed to its scan); anything unproven is refused
    * at compile time rather than silently summing lexical forms. */
  final case class Agg(fn: String, arg: Option[String], distinct: Boolean,
      sep: Option[String])

  sealed trait PExpr
  /** ?x or str(?x) (identity over string terms) */
  final case class PVarRef(src: String) extends PExpr
  final case class PAggRef(agg: Agg) extends PExpr

  /** One SELECT projection: plain ?v, (expr AS ?v), or (aggregate AS ?v). */
  final case class Proj(name: String, expr: PExpr)

  /** HAVING condition: aggregate `op` constant. Numeric ordering ops are
    * only meaningful for COUNT (a genuine numeric); for the string-valued
    * aggregates only = and != are accepted. */
  final case class HCmp(agg: Agg, op: String, rhs: String)

  // ---- query forms ----------------------------------------------------------

  sealed trait SparqlQuery

  /** SELECT [DISTINCT] (?v | (expr AS ?v))+ | * WHERE? { ... } modifiers.
    * projs == Nil means SELECT * (all vars in first-bound order).
    * groupBy lists plain grouping variables; an aggregate projection with
    * an empty groupBy is the spec's implicit single-group aggregation. */
  final case class SelectQ(
      distinct: Boolean,
      projs: Seq[Proj],
      where: Group,
      groupBy: Seq[String],
      having: Seq[HCmp],
      orderBy: Seq[(String, Boolean)],
      limit: Option[Long],
      offset: Option[Long]) extends SparqlQuery

  /** CONSTRUCT { template } WHERE { ... } [LIMIT n]; output is a triple
    * SET (RDF graph semantics: duplicates collapse). */
  final case class ConstructQ(
      template: Seq[TP],
      where: Group,
      limit: Option[Long]) extends SparqlQuery

  /** DESCRIBE <iri>+ | DESCRIBE ?v+ WHERE { ... } — simple subject-based
    * describe (all triples whose subject is a described resource), the
    * semantics the reference relies on (Harvester.java:1529-1540). */
  final case class DescribeQ(
      terms: Seq[Term],
      where: Option[Group]) extends SparqlQuery

  /** ASK { ... } */
  final case class AskQ(where: Group) extends SparqlQuery
}
