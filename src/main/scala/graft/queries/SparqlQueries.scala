package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sparql.SparqlCompiler
import graft.text.TextNorm

/** The reference's QUERY LANGUAGE, run on Spark: river configs carry
  * user-written SPARQL (Indexer.java:350-463 parses `query[]` straight out
  * of the config; Harvester.java:1516-1659 executes SELECT / CONSTRUCT /
  * DESCRIBE), and the sync path GENERATES SPARQL from a template
  * (Harvester.java:963-1032). graft.sparql compiles that subset into
  * Catalyst plans over a (s, p, o) triple frame — so a reference user's
  * queries run verbatim, but as hash-join DAGs instead of a remote
  * triplestore call.
  *
  * The triple frame here is derived deterministically from `documents`
  * (token/predicate-cue extraction — the same family as kg_triples_full)
  * plus a constant ontology slice (class labels, one DELIBERATELY
  * unlabeled class to exercise the !BOUND anti-join, and the rdfs:Class
  * gate triple the reference's "redundant clause" needs,
  * Harvester.java:1020-1024), so the DuckDB oracle can re-derive the
  * identical graph.
  */
object SparqlQueries {

  private val RdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
  private val RdfsClass = "http://www.w3.org/2000/01/rdf-schema#Class"

  /** term -> predicate cues (subset of the kg extraction dictionary). */
  private val preds = Seq(
    ("spark", "urn:p:tech"), ("table", "urn:p:artifact"), ("query", "urn:p:op"),
    ("join", "urn:p:op"), ("stream", "urn:p:artifact"))

  private val predsSql: String =
    preds.map { case (t, p) => s"('$t','$p')" }.mkString(", ")

  /** Constant ontology slice: labels for classes 0 and 1; class 2 is
    * deliberately unlabeled (the reference sync query's OPTIONAL/!BOUND
    * keeps exactly the objects WITHOUT a label); plus the rdfs:Class gate
    * triple (always present in a real triplestore, which is why the
    * reference calls its clause "redundant"), and a skos:broader-style
    * class hierarchy CHAIN (depth 3, so a one-round doubling closure would
    * be caught) for the property-path queries. The broader rows have class
    * subjects, so no pre-existing query's filters (doc-subject sync sets,
    * label/type/op predicates) can see them. */
  private val ontology = Seq(
    ("urn:c:0", "urn:p:label", "Batch Class"),
    ("urn:c:1", "urn:p:label", "Stream Class"),
    ("urn:c:0", "urn:p:broader", "urn:c:root"),
    ("urn:c:1", "urn:p:broader", "urn:c:0"),
    ("urn:c:2", "urn:p:broader", "urn:c:1"),
    (RdfsClass, RdfType, RdfsClass))

  private val ontologySql: String =
    ontology.map { case (s, p, o) => s"('$s','$p','$o')" }.mkString(", ")

  /** Subjects the sync fixture re-harvests (the reference builds the same
    * IN-set from its changed-URI list, Harvester.java:963-979). */
  private val syncSubjects: Seq[String] = (3L to 12L).map(i => s"urn:doc:$i")

  private val syncSet: String = syncSubjects.map(u => s"<$u>").mkString("(", ", ", ")")
  private val syncSetSql: String = syncSubjects.map(u => s"'$u'").mkString(", ")

  /** The triple frame: doc-token triples + per-doc type triples + the
    * ontology constants; a DISTINCT set, like an RDF graph. */
  private[graft] def tripleFrame(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val toks = docs
      .select(col("doc_id"), explode(TextNorm.tokensCol(col("text"))).as("tok"))
      .distinct()
    val cues = toks.join(broadcast(preds.toDF("term", "pred")), col("tok") === col("term"))
      .select(concat(lit("urn:doc:"), col("doc_id").cast("string")).as("s"),
        col("pred").as("p"), col("tok").as("o"))
    val types = docs.select(
      concat(lit("urn:doc:"), col("doc_id").cast("string")).as("s"),
      lit("urn:p:type").as("p"),
      concat(lit("urn:c:"), (col("doc_id") % 3).cast("string")).as("o"))
    cues.unionAll(types).unionAll(ontology.toDF("s", "p", "o")).distinct()
  }

  /** The same derivation in DuckDB SQL (CTE body producing table `tr`). */
  private val tripleFrameSql: String =
    s"""toks AS (SELECT DISTINCT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> length(x) > 0)) AS tok FROM documents),
       |preds(term, pred) AS (VALUES $predsSql),
       |onto(s, p, o) AS (VALUES $ontologySql),
       |tr AS (
       |  SELECT DISTINCT s, p, o FROM (
       |    SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR) AS s, pred AS p, tok AS o
       |    FROM toks JOIN preds ON toks.tok = preds.term
       |    UNION ALL
       |    SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR), 'urn:p:type',
       |           'urn:c:' || CAST(doc_id % 3 AS VARCHAR)
       |    FROM documents
       |    UNION ALL
       |    SELECT s, p, o FROM onto))""".stripMargin

  /** Language-TAGGED labels for the lang()/langMatches() queries —
    * ol = the object's language tag, '' when untagged (IRIs, plain
    * literals). Mirrors the reference's home domain: Czech open-data
    * vocabularies carry skos labels in several languages. */
  private val langOntology = Seq(
    ("urn:c:0", "urn:p:label", "Batch Class", "en"),
    ("urn:c:0", "urn:p:label", "Trida davky", "cs"),
    ("urn:c:1", "urn:p:label", "Stream Class", "en-US"),
    ("urn:c:2", "urn:p:label", "Clase flujo", "es"))

  private val langOntologySql: String =
    langOntology.map { case (s, p, o, l) => s"('$s','$p','$o','$l')" }.mkString(", ")

  /** A tagged triple frame (s, p, o, ol): per-doc title literals tagged
    * with the document's lang column, untagged type triples, and the
    * multilingual ontology labels. */
  private[graft] def langFrame(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val titles = docs.select(
      concat(lit("urn:doc:"), col("doc_id").cast("string")).as("s"),
      lit("urn:p:title").as("p"),
      substring(lower(col("text")), 1, 12).as("o"),
      col("lang").as("ol"))
    val types = docs.select(
      concat(lit("urn:doc:"), col("doc_id").cast("string")).as("s"),
      lit("urn:p:type").as("p"),
      concat(lit("urn:c:"), (col("doc_id") % 3).cast("string")).as("o"),
      lit("").as("ol"))
    titles.unionAll(types)
      .unionAll(langOntology.toDF("s", "p", "o", "ol")).distinct()
  }

  /** The same derivation in DuckDB SQL (CTE body producing table `ltr`). */
  private val langFrameSql: String =
    s"""lonto(s, p, o, ol) AS (VALUES $langOntologySql),
       |ltr AS (
       |  SELECT DISTINCT s, p, o, ol FROM (
       |    SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR) AS s,
       |           'urn:p:title' AS p, substr(lower(text), 1, 12) AS o,
       |           lang AS ol
       |    FROM documents
       |    UNION ALL
       |    SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR), 'urn:p:type',
       |           'urn:c:' || CAST(doc_id % 3 AS VARCHAR), ''
       |    FROM documents
       |    UNION ALL
       |    SELECT s, p, o, ol FROM lonto))""".stripMargin

  /** A QUAD frame (s, p, o, g) for the GRAPH queries: each doc's type
    * triple lives in graph urn:g:(doc_id % 10); each graph's
    * modified-time triple lives in the default graph (g = '') with a
    * deterministic ISO timestamp — the reference's fixed
    * yyyy-MM-dd'T'HH:mm:ss layout (Harvester.java:1246). */
  private[graft] def quadFrame(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val types = docs.select(
      concat(lit("urn:doc:"), col("doc_id").cast("string")).as("s"),
      lit("urn:p:type").as("p"),
      concat(lit("urn:c:"), (col("doc_id") % 3).cast("string")).as("o"),
      concat(lit("urn:g:"), (col("doc_id") % 10).cast("string")).as("g"))
    val modified = docs.select((col("doc_id") % 10).as("k")).distinct().select(
      concat(lit("urn:g:"), col("k").cast("string")).as("s"),
      lit("urn:p:modified").as("p"),
      concat(lit("2024-01-"), lpad((col("k") + 1).cast("string"), 2, "0"),
        lit("T00:00:00")).as("o"),
      lit("").as("g"))
    types.unionAll(modified).distinct()
  }

  /** The same derivation in DuckDB SQL (CTE body producing table `qr`). */
  private val quadFrameSql: String =
    """qr AS (
      |  SELECT DISTINCT s, p, o, g FROM (
      |    SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR) AS s, 'urn:p:type' AS p,
      |           'urn:c:' || CAST(doc_id % 3 AS VARCHAR) AS o,
      |           'urn:g:' || CAST(doc_id % 10 AS VARCHAR) AS g
      |    FROM documents
      |    UNION ALL
      |    SELECT DISTINCT 'urn:g:' || CAST(doc_id % 10 AS VARCHAR),
      |           'urn:p:modified',
      |           '2024-01-' || lpad(CAST(doc_id % 10 + 1 AS VARCHAR), 2, '0') || 'T00:00:00',
      |           ''
      |    FROM documents))""".stripMargin

  /** A datatype-TYPED frame (s, p, o, dt) for the numeric queries: each
    * doc's n_chars as an xsd:integer literal, its class membership and a
    * title literal as untyped rows (dt = '', the plain-literal/resource
    * convention) — so numeric filters must genuinely discriminate on dt,
    * not ride a frame that is all-numeric anyway. */
  private[graft] def dtFrame(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val subj = concat(lit("urn:doc:"), col("doc_id").cast("string"))
    val nchars = docs.select(subj.as("s"), lit("urn:p:nchars").as("p"),
      col("n_chars").cast("string").as("o"),
      lit("http://www.w3.org/2001/XMLSchema#integer").as("dt"))
    val types = docs.select(subj.as("s"), lit("urn:p:type").as("p"),
      concat(lit("urn:c:"), (col("doc_id") % 3).cast("string")).as("o"),
      lit("").as("dt"))
    val titles = docs.select(subj.as("s"), lit("urn:p:title").as("p"),
      substring(lower(col("text")), 1, 12).as("o"), lit("").as("dt"))
    nchars.unionAll(types).unionAll(titles).distinct()
  }

  /** The same derivation in DuckDB SQL (CTE body producing table `dtr`). */
  private val dtFrameSql: String =
    """dtr AS (
      |  SELECT DISTINCT s, p, o, dt FROM (
      |    SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR) AS s,
      |           'urn:p:nchars' AS p, CAST(n_chars AS VARCHAR) AS o,
      |           'http://www.w3.org/2001/XMLSchema#integer' AS dt
      |    FROM documents
      |    UNION ALL
      |    SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR), 'urn:p:type',
      |           'urn:c:' || CAST(doc_id % 3 AS VARCHAR), ''
      |    FROM documents
      |    UNION ALL
      |    SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR), 'urn:p:title',
      |           substr(lower(text), 1, 12), ''
      |    FROM documents))""".stripMargin

  /** A TERM-KIND frame (s, p, o, dt, tk): the dt frame's rows plus a
    * blank-node provenance triple per doc — tk stamps the object's kind
    * ('i' resource, 'l' literal, 'b' blank), the column that makes
    * isIRI()/isLiteral()/isBlank() and SPEC-exact negative datatype()/
    * lang() comparisons compilable (a non-literal under those is a type
    * error, not an untagged literal). */
  private[graft] def tkFrame(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val subj = concat(lit("urn:doc:"), col("doc_id").cast("string"))
    val nchars = docs.select(subj.as("s"), lit("urn:p:nchars").as("p"),
      col("n_chars").cast("string").as("o"),
      lit("http://www.w3.org/2001/XMLSchema#integer").as("dt"),
      lit("l").as("tk"))
    val types = docs.select(subj.as("s"), lit("urn:p:type").as("p"),
      concat(lit("urn:c:"), (col("doc_id") % 3).cast("string")).as("o"),
      lit("").as("dt"), lit("i").as("tk"))
    val titles = docs.select(subj.as("s"), lit("urn:p:title").as("p"),
      substring(lower(col("text")), 1, 12).as("o"), lit("").as("dt"),
      lit("l").as("tk"))
    val provs = docs.select(subj.as("s"), lit("urn:p:prov").as("p"),
      concat(lit("_:prov"), (col("doc_id") % 5).cast("string")).as("o"),
      lit("").as("dt"), lit("b").as("tk"))
    nchars.unionAll(types).unionAll(titles).unionAll(provs).distinct()
  }

  /** The same derivation in DuckDB SQL (CTE body producing table `tkr`). */
  private val tkFrameSql: String =
    """tkr AS (
      |  SELECT DISTINCT s, p, o, dt, tk FROM (
      |    SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR) AS s,
      |           'urn:p:nchars' AS p, CAST(n_chars AS VARCHAR) AS o,
      |           'http://www.w3.org/2001/XMLSchema#integer' AS dt, 'l' AS tk
      |    FROM documents
      |    UNION ALL
      |    SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR), 'urn:p:type',
      |           'urn:c:' || CAST(doc_id % 3 AS VARCHAR), '', 'i'
      |    FROM documents
      |    UNION ALL
      |    SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR), 'urn:p:title',
      |           substr(lower(text), 1, 12), '', 'l'
      |    FROM documents
      |    UNION ALL
      |    SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR), 'urn:p:prov',
      |           '_:prov' || CAST(doc_id % 5 AS VARCHAR), '', 'b'
      |    FROM documents))""".stripMargin

  val all: Map[String, Q] = Map(

    // ---- the reference's CHANGE-DETECTION query (Harvester.java:1204-1215
    // rdfQueryTemplate): GRAPH ?graph { conditions } + the graph's
    // modified-time triple + the xsd:dateTime watermark filter. GRAPH ?g
    // binds the quad frame's g column on every inner pattern (one graph per
    // solution); the watermark ordering is exact because the reference's
    // fixed ISO layout orders lexicographically == chronologically. The
    // template's only addition here is ORDER BY for the driver compare.
    "sparql_graph_sync" -> Q(
      s"""WITH $quadFrameSql
         |SELECT DISTINCT q.s AS resource
         |FROM qr q
         |JOIN qr t ON t.s = q.g AND t.p = 'urn:p:modified'
         |WHERE q.p = 'urn:p:type' AND t.o > '2024-01-05T00:00:00'
         |ORDER BY 1""".stripMargin) { (s, d) =>
      SparqlCompiler.compile(
        """PREFIX xsd:<http://www.w3.org/2001/XMLSchema#>
          |SELECT DISTINCT ?resource WHERE {
          |  GRAPH ?graph { ?resource <urn:p:type> ?o . }
          |  ?graph <urn:p:modified> ?time .
          |  FILTER (?time > xsd:dateTime("2024-01-05T00:00:00")) }
          |ORDER BY ?resource""".stripMargin,
        quadFrame(s, d))
    },

    // ---- a user-written SELECT: 3-pattern BGP chain (cue -> doc type ->
    // class label) + inequality FILTER. Compiles to two hash joins whose
    // constant predicate positions land in PushedFilters at the scan.
    "sparql_select_bgp" -> Q(
      s"""WITH $tripleFrameSql
         |SELECT a.s AS s, a.o AS o, lbl.o AS lbl
         |FROM tr a
         |JOIN tr ty ON ty.s = a.s AND ty.p = 'urn:p:type'
         |JOIN tr lbl ON lbl.s = ty.o AND lbl.p = 'urn:p:label'
         |WHERE a.p = 'urn:p:op' AND a.o <> 'join'
         |ORDER BY s, o, lbl""".stripMargin) { (s, d) =>
      SparqlCompiler.compile(
        """SELECT ?s ?o ?lbl WHERE {
          |  ?s <urn:p:op> ?o .
          |  ?s <urn:p:type> ?c .
          |  ?c <urn:p:label> ?lbl .
          |  FILTER(?o != "join")
          |} ORDER BY ?s ?o ?lbl""".stripMargin,
        tripleFrame(s, d))
    },

    // ---- the reference sync query's CORE shape (Harvester.java:978-991):
    // CONSTRUCT over the changed-subject set, keeping only objects WITHOUT
    // a label. OPTIONAL + FILTER(!BOUND) compiles to LeftOuter + IsNull,
    // which Catalyst rewrites to a LEFT ANTI hash join — the plan you'd
    // hand-write for a 100 TB has-no-label check.
    "sparql_construct_sync" -> Q(
      s"""WITH $tripleFrameSql
         |SELECT DISTINCT t.s AS s, t.p AS p, t.o AS o
         |FROM tr t
         |LEFT JOIN tr l ON l.s = t.o AND l.p = 'urn:p:label'
         |WHERE t.s IN ($syncSetSql) AND l.o IS NULL
         |ORDER BY 1, 2, 3""".stripMargin) { (s, d) =>
      SparqlCompiler.compile(
        s"""CONSTRUCT { ?s ?p ?o } WHERE {
           |  ?s ?p ?o
           |  . FILTER (?s in $syncSet )
           |  . OPTIONAL { ?o <urn:p:label> ?o1 }
           |  . FILTER(!BOUND(?o1))
           |}""".stripMargin,
        tripleFrame(s, d))
        .orderBy("s", "p", "o")
    },

    // ---- the FULL generated sync query, template-identical to
    // Harvester.java:963-1032 (getSyncQueryStr with one uriDescription
    // property): branch 1 keeps triples whose object has no label; branch 2
    // is the Virtuoso-safe label-resolution idiom — the constant "redundant
    // clause" gating a sub-SELECT that rebinds ?o to str(?label). The gate
    // compiles to a 1-row constant-key broadcast HASH join, the sub-select
    // to an inner hash-join chain.
    "sparql_sync_query" -> Q(
      s"""WITH $tripleFrameSql,
         |base AS (
         |  SELECT t.s, t.p, t.o FROM tr t
         |  LEFT JOIN tr l ON l.s = t.o AND l.p = 'urn:p:label'
         |  WHERE t.s IN ($syncSetSql) AND l.o IS NULL),
         |lab AS (
         |  SELECT t.s, t.p, l.o FROM tr t
         |  JOIN tr l ON l.s = t.o AND l.p = 'urn:p:label'
         |  WHERE t.s IN ($syncSetSql)
         |    AND EXISTS (SELECT 1 FROM tr
         |                WHERE s = '$RdfsClass' AND p = '$RdfType' AND o = '$RdfsClass'))
         |SELECT DISTINCT s, p, o
         |FROM (SELECT * FROM base UNION ALL SELECT * FROM lab)
         |ORDER BY s, p, o""".stripMargin) { (s, d) =>
      SparqlCompiler.compile(
        s"""CONSTRUCT { ?s ?p ?o } WHERE {
           |  { ?s ?p ?o
           |    . FILTER (?s in $syncSet )
           |    . OPTIONAL { ?o <urn:p:label> ?o1 }
           |    . FILTER(!BOUND(?o1)) }
           |  UNION
           |  { <$RdfsClass> a <$RdfsClass> .
           |    { SELECT ?s ?p (str(?label) as ?o) {
           |        ?s ?p ?res
           |        . FILTER (?s in $syncSet )
           |        . ?res <urn:p:label> ?label }}}
           |}""".stripMargin,
        tripleFrame(s, d))
        .orderBy("s", "p", "o")
    },

    // ---- VALUES: inline bindings joined as a broadcast relation — the
    // scalable form of the changed-set idiom (a 10k-subject sync would
    // VALUES-join where FILTER(?s IN ...) bloats the predicate tree).
    "sparql_values_bind" -> Q(
      s"""WITH $tripleFrameSql,
         |vals(c, tier) AS (VALUES ('urn:c:0', 'gold'), ('urn:c:1', 'silver'))
         |SELECT t.s AS s, v.c AS c, v.tier AS tier
         |FROM tr t JOIN vals v ON t.o = v.c
         |WHERE t.p = 'urn:p:type'
         |ORDER BY 1, 2, 3""".stripMargin) { (s, d) =>
      SparqlCompiler.compile(
        """SELECT ?s ?c ?tier WHERE {
          |  VALUES (?c ?tier) { (<urn:c:0> "gold") (<urn:c:1> "silver") }
          |  ?s <urn:p:type> ?c .
          |} ORDER BY ?s ?c ?tier""".stripMargin,
        tripleFrame(s, d))
    },

    // ---- FILTER NOT EXISTS: the modern SPARQL spelling of the reference
    // template's OPTIONAL+!BOUND has-no-label idiom, compiled DIRECTLY to
    // the LEFT ANTI hash join the optimizer only derives for the old form.
    "sparql_not_exists" -> Q(
      s"""WITH $tripleFrameSql
         |SELECT t.s AS s, t.p AS p, t.o AS o
         |FROM tr t
         |WHERE t.s IN ($syncSetSql)
         |  AND NOT EXISTS (SELECT 1 FROM tr l
         |                  WHERE l.s = t.o AND l.p = 'urn:p:label')
         |ORDER BY 1, 2, 3""".stripMargin) { (s, d) =>
      SparqlCompiler.compile(
        s"""SELECT ?s ?p ?o WHERE {
           |  ?s ?p ?o
           |  . FILTER (?s in $syncSet )
           |  . FILTER NOT EXISTS { ?o <urn:p:label> ?l }
           |} ORDER BY ?s ?p ?o""".stripMargin,
        tripleFrame(s, d))
    },

    // ---- MINUS: solution set-difference on the shared variable — one
    // LEFT ANTI hash join (docs with an op cue, minus the class-2 docs).
    "sparql_minus" -> Q(
      s"""WITH $tripleFrameSql
         |SELECT t.s AS s, t.o AS o FROM tr t
         |WHERE t.p = 'urn:p:op'
         |  AND NOT EXISTS (SELECT 1 FROM tr m
         |                  WHERE m.s = t.s AND m.p = 'urn:p:type' AND m.o = 'urn:c:2')
         |ORDER BY 1, 2""".stripMargin) { (s, d) =>
      SparqlCompiler.compile(
        """SELECT ?s ?o WHERE {
          |  ?s <urn:p:op> ?o .
          |  MINUS { ?s <urn:p:type> <urn:c:2> }
          |} ORDER BY ?s ?o""".stripMargin,
        tripleFrame(s, d))
    },

    // ---- aggregates: GROUP BY + COUNT / COUNT DISTINCT + HAVING — one
    // map-side-combinable hash aggregate over the joined pattern (SUM/AVG
    // are refused over string terms; COUNT outputs are genuine BIGINTs on
    // both engines, so the type-sensitive driver hash agrees).
    "sparql_agg_count" -> Q(
      s"""WITH $tripleFrameSql
         |SELECT ty.o AS c, CAST(COUNT(a.s) AS BIGINT) AS n,
         |       CAST(COUNT(DISTINCT a.o) AS BIGINT) AS cues
         |FROM tr ty JOIN tr a ON a.s = ty.s AND a.p = 'urn:p:op'
         |WHERE ty.p = 'urn:p:type'
         |GROUP BY ty.o HAVING COUNT(a.s) >= 2
         |ORDER BY c""".stripMargin) { (s, d) =>
      SparqlCompiler.compile(
        """SELECT ?c (COUNT(?s) AS ?n) (COUNT(DISTINCT ?o) AS ?cues) WHERE {
          |  ?s <urn:p:type> ?c .
          |  ?s <urn:p:op> ?o .
          |} GROUP BY ?c HAVING(COUNT(?s) >= 2) ORDER BY ?c""".stripMargin,
        tripleFrame(s, d))
    },

    // ---- aggregates: GROUP_CONCAT + MIN. The spec leaves GROUP_CONCAT
    // order undefined; the compiler SORTS values per group so both engines
    // agree bit-for-bit (DuckDB: string_agg(... ORDER BY ...)).
    "sparql_agg_concat" -> Q(
      s"""WITH $tripleFrameSql
         |SELECT s, string_agg(o, '|' ORDER BY o) AS ops, MIN(o) AS first
         |FROM tr WHERE p = 'urn:p:op'
         |GROUP BY s ORDER BY s""".stripMargin) { (s, d) =>
      SparqlCompiler.compile(
        """SELECT ?s (GROUP_CONCAT(?o; SEPARATOR="|") AS ?ops) (MIN(?o) AS ?first)
          |WHERE { ?s <urn:p:op> ?o } GROUP BY ?s ORDER BY ?s""".stripMargin,
        tripleFrame(s, d))
    },

    // ---- property paths, join shapes: sequence '/' compiles to one hash
    // join per step, alternation '|' to a union — each step's constant
    // predicate lands in PushedFilters at the scan.
    "sparql_path_seq" -> Q(
      s"""WITH $tripleFrameSql
         |SELECT cue.s AS d, cue.o AS cue, b.o AS anc
         |FROM tr cue
         |JOIN tr ty ON ty.s = cue.s AND ty.p = 'urn:p:type'
         |JOIN tr b ON b.s = ty.o AND b.p = 'urn:p:broader'
         |WHERE cue.p IN ('urn:p:op', 'urn:p:tech')
         |ORDER BY 1, 2, 3""".stripMargin) { (s, d) =>
      SparqlCompiler.compile(
        """SELECT ?d ?cue ?anc WHERE {
          |  ?d (<urn:p:op>|<urn:p:tech>) ?cue .
          |  ?d <urn:p:type>/<urn:p:broader> ?anc .
          |} ORDER BY ?d ?cue ?anc""".stripMargin,
        tripleFrame(s, d))
    },

    // ---- property paths, transitive closure: '+' runs iterative doubling
    // P <- P ∪ (P ∘ P) to the FIXPOINT over the predicate's own edge slice
    // (O(log depth) self-join rounds; the 3-deep broader chain needs two
    // rounds, so a single-round bug cannot pass). DuckDB: recursive CTE.
    "sparql_path_closure" -> Q(
      s"""WITH RECURSIVE $tripleFrameSql,
         |bro AS (SELECT s, o FROM tr WHERE p = 'urn:p:broader'),
         |anc(c, a) AS (
         |  SELECT s, o FROM bro
         |  UNION
         |  SELECT anc.c, bro.o FROM anc JOIN bro ON bro.s = anc.a
         |)
         |SELECT ty.s AS d, anc.a AS anc
         |FROM tr ty JOIN anc ON anc.c = ty.o
         |WHERE ty.p = 'urn:p:type'
         |ORDER BY 1, 2""".stripMargin) { (s, d) =>
      SparqlCompiler.compile(
        """SELECT ?d ?anc WHERE {
          |  ?d <urn:p:type>/<urn:p:broader>+ ?anc .
          |} ORDER BY ?d ?anc""".stripMargin,
        tripleFrame(s, d))
    },

    // ---- property paths, '*': the closure PLUS the spec's zero-length
    // solutions (terms occurring in the graph related to themselves) — a
    // labeled class reaches its ancestors AND itself.
    "sparql_path_star" -> Q(
      s"""WITH RECURSIVE $tripleFrameSql,
         |bro AS (SELECT s, o FROM tr WHERE p = 'urn:p:broader'),
         |anc(c, a) AS (
         |  SELECT s, o FROM bro
         |  UNION
         |  SELECT anc.c, bro.o FROM anc JOIN bro ON bro.s = anc.a
         |),
         |nodes AS (SELECT DISTINCT n FROM
         |  (SELECT s AS n FROM tr UNION ALL SELECT o FROM tr)),
         |star AS (SELECT DISTINCT c, a FROM
         |  (SELECT c, a FROM anc UNION ALL SELECT n, n AS a FROM nodes))
         |SELECT lbl.s AS c, star.a AS anc
         |FROM tr lbl JOIN star ON star.c = lbl.s
         |WHERE lbl.p = 'urn:p:label'
         |ORDER BY 1, 2""".stripMargin) { (s, d) =>
      SparqlCompiler.compile(
        """SELECT ?c ?anc WHERE {
          |  ?c <urn:p:label> ?lbl .
          |  ?c <urn:p:broader>* ?anc .
          |} ORDER BY ?c ?anc""".stripMargin,
        tripleFrame(s, d))
    },

    // ---- BIND: computed extension column (CONCAT over the string-term
    // model), a pure projection — no shuffle.
    "sparql_bind_concat" -> Q(
      s"""WITH $tripleFrameSql
         |SELECT s, o || '#v1' AS tag FROM tr
         |WHERE p = 'urn:p:type'
         |ORDER BY 1, 2""".stripMargin) { (s, d) =>
      SparqlCompiler.compile(
        """SELECT ?s ?tag WHERE {
          |  ?s <urn:p:type> ?c .
          |  BIND(CONCAT(?c, "#v1") AS ?tag) .
          |} ORDER BY ?s ?tag""".stripMargin,
        tripleFrame(s, d))
    },

    // ---- BIND string-function surface (r5): SUBSTR (1-based, code-point),
    // REPLACE (GLOBAL regex replace — DuckDB needs the explicit 'g' flag to
    // match fn:replace), STRBEFORE (first occurrence, '' when absent). All
    // compile to codegen'd Column functions — zero shuffles added.
    "sparql_bind_strfns" -> Q(
      s"""WITH $dtFrameSql
         |SELECT s, substr(o, 1, 5) AS pre,
         |       regexp_replace(o, '[aeiou]', '_', 'g') AS msk,
         |       CASE WHEN strpos(o, ' ') > 0
         |            THEN substr(o, 1, strpos(o, ' ') - 1) ELSE '' END AS w1
         |FROM dtr WHERE p = 'urn:p:title'
         |ORDER BY 1, 2, 3, 4""".stripMargin) { (s, d) =>
      SparqlCompiler.compile(
        """SELECT ?s ?pre ?msk ?w1 WHERE {
          |  ?s <urn:p:title> ?t .
          |  BIND(SUBSTR(?t, 1, 5) AS ?pre)
          |  BIND(REPLACE(?t, "[aeiou]", "_") AS ?msk)
          |  BIND(STRBEFORE(?t, " ") AS ?w1)
          |} ORDER BY ?s ?pre ?msk ?w1""".stripMargin,
        dtFrame(s, d))
    },

    // ---- IF over the filter grammar + COALESCE over an optionally-bound
    // var (r5): the OPTIONAL's in-group filter rides as the LeftJoin
    // condition; BOUND dispatches on the null slot; COALESCE's constant
    // fallback makes ?cls structurally never-null.
    "sparql_bind_if_coalesce" -> Q(
      s"""WITH $dtFrameSql
         |SELECT n.s AS s,
         |       CASE WHEN ty.o IS NOT NULL THEN 'class0'
         |            ELSE coalesce(ty.o, 'other') END AS cls
         |FROM dtr n
         |LEFT JOIN dtr ty ON ty.s = n.s AND ty.p = 'urn:p:type'
         |  AND ty.o = 'urn:c:0'
         |WHERE n.p = 'urn:p:nchars'
         |ORDER BY 1, 2""".stripMargin) { (s, d) =>
      SparqlCompiler.compile(
        """SELECT ?s ?cls WHERE {
          |  ?s <urn:p:nchars> ?n .
          |  OPTIONAL { ?s <urn:p:type> ?ty . FILTER(?ty = <urn:c:0>) }
          |  BIND(IF(BOUND(?ty), "class0", COALESCE(?ty, "other")) AS ?cls)
          |} ORDER BY ?s ?cls""".stripMargin,
        dtFrame(s, d))
    },

    // ---- term-kind filters (r5): isIRI/isLiteral/isBlank over the tk
    // frame column — both polarities convert to data-source filters at the
    // binding pattern's scan. !isLiteral retains the OTHER two kinds
    // (total boolean, no type error).
    "sparql_term_kind" -> Q(
      s"""WITH $tkFrameSql
         |SELECT s, o FROM tkr WHERE tk <> 'l'
         |ORDER BY 1, 2""".stripMargin) { (s, d) =>
      SparqlCompiler.compile(
        """SELECT ?s ?o WHERE {
          |  ?s ?p ?o . FILTER(!isLiteral(?o))
          |} ORDER BY ?s ?o""".stripMargin,
        tkFrame(s, d))
    },

    // ---- SPEC-exact negative datatype() on a tk frame (r5): datatype()
    // over a non-literal is a type error that REMOVES the row, so the
    // result is the literal-only non-integer slice — on tk-less frames the
    // same query keeps the documented union divergence (resources
    // retained), which sparql_datatype_filter pins from the positive side.
    "sparql_neg_datatype" -> Q(
      s"""WITH $tkFrameSql
         |SELECT s, o FROM tkr
         |WHERE tk = 'l' AND dt <> 'http://www.w3.org/2001/XMLSchema#integer'
         |ORDER BY 1, 2""".stripMargin) { (s, d) =>
      SparqlCompiler.compile(
        """SELECT ?s ?o WHERE {
          |  ?s ?p ?o .
          |  FILTER(datatype(?o) != <http://www.w3.org/2001/XMLSchema#integer>)
          |} ORDER BY ?s ?o""".stripMargin,
        tkFrame(s, d))
    },

    // ---- MD5/SHA256 BIND digests (r5): lowercase-hex UTF-8 on both
    // engines — the content-addressed IRI-minting idiom a KG-construction
    // pipeline lives on (IRI(CONCAT("urn:h:", MD5(?text)))).
    "sparql_bind_hash" -> Q(
      s"""WITH $dtFrameSql
         |SELECT s, 'urn:h:' || md5(o) AS h, sha256(o) AS h2
         |FROM dtr WHERE p = 'urn:p:title'
         |ORDER BY 1, 2, 3""".stripMargin) { (s, d) =>
      SparqlCompiler.compile(
        """SELECT ?s ?h ?h2 WHERE {
          |  ?s <urn:p:title> ?t .
          |  BIND(CONCAT("urn:h:", MD5(?t)) AS ?h)
          |  BIND(SHA256(?t) AS ?h2)
          |} ORDER BY ?s ?h ?h2""".stripMargin,
        dtFrame(s, d))
    },

    // ---- isNumeric (r5): total boolean over the dt column — spec-exact
    // in BOTH polarities on any dt frame, no tk needed (a null/'' dt is
    // simply false, per 17.4.2.4). The negative polarity keeps resources
    // AND untyped literals — exactly the slice negative datatype() must
    // NOT return on tk frames (sparql_neg_datatype pins that contrast).
    "sparql_isnumeric" -> Q(
      s"""WITH $dtFrameSql
         |SELECT s, o FROM dtr
         |WHERE dt <> 'http://www.w3.org/2001/XMLSchema#integer'
         |ORDER BY 1, 2""".stripMargin) { (s, d) =>
      SparqlCompiler.compile(
        """SELECT ?s ?o WHERE {
          |  ?s ?p ?o . FILTER(!isNumeric(?o))
          |} ORDER BY ?s ?o""".stripMargin,
        dtFrame(s, d))
    },

    // ---- join over a branch-ASYMMETRIC union (the reference's own
    // SparqlSelectTest.java:19 shape): branch 1 shares ?d with the outer
    // pattern, branch 2 shares ?c. The compiler distributes —
    // Join(A, Union(B1,B2)) = Union(Join(A,B1), Join(A,B2)) — so each
    // branch joins as an equality HASH join on the vars it really binds
    // (a combined union column would put SQL NULLs in the join keys,
    // which never match, while SPARQL unbound matches anything).
    "sparql_union_join" -> Q(
      s"""WITH $tripleFrameSql
         |SELECT * FROM (
         |  SELECT ty.s AS d, ty.o AS c, a.o AS cue
         |  FROM tr ty JOIN tr a ON a.s = ty.s AND a.p = 'urn:p:op'
         |  WHERE ty.p = 'urn:p:type'
         |  UNION ALL
         |  SELECT ty.s, ty.o, l.o
         |  FROM tr ty JOIN tr l ON l.s = ty.o AND l.p = 'urn:p:label'
         |  WHERE ty.p = 'urn:p:type')
         |ORDER BY 1, 2, 3""".stripMargin) { (s, d) =>
      SparqlCompiler.compile(
        """SELECT ?d ?c ?cue WHERE {
          |  ?d <urn:p:type> ?c .
          |  { ?d <urn:p:op> ?cue } UNION { ?c <urn:p:label> ?cue }
          |} ORDER BY ?d ?c ?cue""".stripMargin,
        tripleFrame(s, d))
    },

    // ---- lang()/langMatches() over a language-TAGGED frame: the tag
    // rides an `ol` column (the term model stays a string), and the
    // filter compiles INTO the binding pattern's scan. langMatches uses
    // RFC 4647 basic filtering ("en" also matches "en-US").
    "sparql_lang_filter" -> Q(
      s"""WITH $langFrameSql
         |SELECT ty.s AS d, ti.o AS t, lbl.o AS lbl
         |FROM ltr ty
         |JOIN ltr ti ON ti.s = ty.s AND ti.p = 'urn:p:title' AND ti.ol = 'fr'
         |JOIN ltr lbl ON lbl.s = ty.o AND lbl.p = 'urn:p:label'
         |  AND (lower(lbl.ol) = 'en' OR lower(lbl.ol) LIKE 'en-%')
         |WHERE ty.p = 'urn:p:type'
         |ORDER BY 1, 2, 3""".stripMargin) { (s, d) =>
      SparqlCompiler.compile(
        """SELECT ?d ?t ?lbl WHERE {
          |  ?d <urn:p:type> ?c .
          |  ?d <urn:p:title> ?t . FILTER(lang(?t) = "fr")
          |  ?c <urn:p:label> ?lbl . FILTER(langMatches(lang(?lbl), "en"))
          |} ORDER BY ?d ?t ?lbl""".stripMargin,
        langFrame(s, d))
    },

    // ---- aggregate SUB-SELECT joined into an outer pattern — the
    // Virtuoso idiom the reference's generated queries use for scoped
    // work (Harvester.java:1009-1016). The inner hash aggregate's COUNT
    // column is tracked numeric per-variable, joins the outer pattern on
    // the shared ?d, and orders NUMERICALLY on both engines (a BIGINT on
    // both; DuckDB COUNT is already BIGINT, no HUGEINT width trap).
    "sparql_agg_subselect" -> Q(
      s"""WITH $tripleFrameSql
         |SELECT ty.o AS c, cnt.n AS n
         |FROM tr ty
         |JOIN (SELECT s, CAST(COUNT(o) AS BIGINT) AS n FROM tr
         |      WHERE p = 'urn:p:op' GROUP BY s) cnt ON cnt.s = ty.s
         |WHERE ty.p = 'urn:p:type'
         |ORDER BY 1, 2""".stripMargin) { (s, d) =>
      SparqlCompiler.compile(
        """SELECT ?c ?n WHERE {
          |  ?d <urn:p:type> ?c .
          |  { SELECT ?d (COUNT(?o) AS ?n) WHERE { ?d <urn:p:op> ?o } GROUP BY ?d }
          |} ORDER BY ?c ?n""".stripMargin,
        tripleFrame(s, d))
    },

    // ---- string builtins: STRSTARTS/CONTAINS/STRLEN compose freely in
    // the boolean tree (plain codegen'd columns), UCASE rides BIND — all
    // stay inside the scan's WholeStageCodegen span.
    "sparql_str_builtins" -> Q(
      s"""WITH $tripleFrameSql
         |SELECT s, o, upper(o) AS u FROM tr
         |WHERE p = 'urn:p:op'
         |  AND (starts_with(o, 'j') OR contains(o, 'ue')) AND length(o) >= 4
         |ORDER BY 1, 2, 3""".stripMargin) { (s, d) =>
      SparqlCompiler.compile(
        """SELECT ?s ?o ?u WHERE {
          |  ?s <urn:p:op> ?o .
          |  FILTER((STRSTARTS(?o, "j") || CONTAINS(?o, "ue")) && STRLEN(?o) >= 4)
          |  BIND(UCASE(?o) AS ?u)
          |} ORDER BY ?s ?o ?u""".stripMargin,
        tripleFrame(s, d))
    },

    // ---- datatype() over a TYPED frame: the dt column carries the
    // typed-literal datatype IRI ('' for plain literals and resources) —
    // same pushdown contract as lang(), so the equality prunes at the
    // scan. The frame types each doc's n_chars as xsd:integer next to
    // untagged title literals.
    "sparql_datatype_filter" -> Q(
      s"""WITH dtr AS (
         |  SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR) AS s,
         |         'urn:p:nchars' AS p, CAST(n_chars AS VARCHAR) AS o,
         |         'http://www.w3.org/2001/XMLSchema#integer' AS dt
         |  FROM documents
         |  UNION ALL
         |  SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR),
         |         'urn:p:title', substr(lower(text), 1, 12), ''
         |  FROM documents)
         |SELECT s, o AS n FROM dtr
         |WHERE p = 'urn:p:nchars'
         |  AND dt = 'http://www.w3.org/2001/XMLSchema#integer'
         |ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val typed = docs.select(
        concat(lit("urn:doc:"), col("doc_id").cast("string")).as("s"),
        lit("urn:p:nchars").as("p"),
        col("n_chars").cast("string").as("o"),
        lit("http://www.w3.org/2001/XMLSchema#integer").as("dt"))
      val titles = docs.select(
        concat(lit("urn:doc:"), col("doc_id").cast("string")).as("s"),
        lit("urn:p:title").as("p"),
        substring(lower(col("text")), 1, 12).as("o"),
        lit("").as("dt"))
      SparqlCompiler.compile(
        """PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
          |SELECT ?s ?n WHERE {
          |  ?s <urn:p:nchars> ?n . FILTER(datatype(?n) = xsd:integer)
          |} ORDER BY ?s ?n""".stripMargin,
        typed.unionAll(titles))
    },

    // ---- property path INSIDE GRAPH ?g: the closure evaluates per named
    // graph (every join step carries the g column as an extra equality
    // key) and '*' adds per-graph zero-length solutions — default-graph
    // rows (the modified-time metadata) never participate. The type edges
    // are depth-1, so the closure is edges ∪ zero-pairs, which the oracle
    // states without recursion.
    "sparql_graph_path" -> Q(
      s"""WITH $quadFrameSql,
         |named AS (SELECT * FROM qr WHERE g <> ''),
         |pairs AS (
         |  SELECT s AS pa, o AS pb, g FROM named WHERE p = 'urn:p:type'
         |  UNION
         |  SELECT t, t, g FROM (
         |    SELECT s AS t, g FROM named UNION SELECT o AS t, g FROM named))
         |SELECT g, pa AS d, pb AS c FROM pairs ORDER BY 1, 2, 3""".stripMargin) { (s, d) =>
      SparqlCompiler.compile(
        """SELECT ?g ?d ?c WHERE {
          |  GRAPH ?g { ?d <urn:p:type>* ?c }
          |} ORDER BY ?g ?d ?c""".stripMargin,
        quadFrame(s, d))
    },

    // ---- sub-SELECT inside GRAPH ?g: the spec's active-graph iteration —
    // the inner aggregation GROUPs PER GRAPH (the graph var joins the
    // grouping keys implicitly), so the same class counts differently in
    // different graphs.
    "sparql_graph_subselect" -> Q(
      s"""WITH $quadFrameSql
         |SELECT g, o AS c, CAST(COUNT(s) AS BIGINT) AS n FROM qr
         |WHERE p = 'urn:p:type' AND g <> ''
         |GROUP BY 1, 2 ORDER BY 1, 2, 3""".stripMargin) { (s, d) =>
      SparqlCompiler.compile(
        """SELECT ?g ?c ?n WHERE {
          |  GRAPH ?g { { SELECT ?c (COUNT(?d) AS ?n) WHERE { ?d <urn:p:type> ?c } GROUP BY ?c } }
          |} ORDER BY ?g ?c ?n""".stripMargin,
        quadFrame(s, d))
    },

    // ---- NUMERIC comparisons over a dt-typed frame: FILTER(?n > 400) is
    // a VALUE-space comparison — the dt ∈ numeric-types membership prunes
    // at the scan (the spec's type-error-removes-row for the untyped
    // title literals) and the cast comparison rides as a residual. The
    // lexical trap this lifts: "99" > "400" lexically, 99 < 400
    // numerically.
    "sparql_numeric_filter" -> Q(
      s"""WITH $dtFrameSql
         |SELECT s, o AS n FROM dtr
         |WHERE p = 'urn:p:nchars'
         |  AND dt = 'http://www.w3.org/2001/XMLSchema#integer'
         |  AND TRY_CAST(o AS DOUBLE) > 400
         |ORDER BY 1, 2""".stripMargin) { (s, d) =>
      SparqlCompiler.compile(
        """SELECT ?s ?n WHERE {
          |  ?s <urn:p:nchars> ?n . FILTER(?n > 400)
          |} ORDER BY ?s ?n""".stripMargin,
        dtFrame(s, d))
    },

    // ---- VAR-VAR value-space ordering: FILTER(?n > ?m) over TWO
    // proven-integer vars compares numerically via the castable proof
    // (round-5: previously this shape compiled lexicographically — "99" >
    // "400" — the silent-divergence class the proof contract exists to
    // kill; a provably MIXED ordering now refuses). The self-join pairs
    // same-class documents by length, a relational asymmetric-join shape
    // SPARQL endpoints run constantly (price < otherPrice etc).
    "sparql_varvar_numeric" -> Q(
      s"""WITH $dtFrameSql
         |SELECT ta.s AS a, tb.s AS b
         |FROM dtr ta
         |JOIN dtr na ON na.s = ta.s AND na.p = 'urn:p:nchars'
         |  AND na.dt = 'http://www.w3.org/2001/XMLSchema#integer'
         |JOIN dtr tb ON tb.p = 'urn:p:type' AND tb.o = 'urn:c:0'
         |JOIN dtr nb ON nb.s = tb.s AND nb.p = 'urn:p:nchars'
         |  AND nb.dt = 'http://www.w3.org/2001/XMLSchema#integer'
         |WHERE ta.p = 'urn:p:type' AND ta.o = 'urn:c:0'
         |  AND TRY_CAST(na.o AS BIGINT) > TRY_CAST(nb.o AS BIGINT)
         |ORDER BY 1, 2""".stripMargin) { (s, d) =>
      SparqlCompiler.compile(
        """PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
          |SELECT ?a ?b WHERE {
          |  ?a <urn:p:type> ?t . ?a <urn:p:nchars> ?n .
          |  ?b <urn:p:type> ?t . ?b <urn:p:nchars> ?m .
          |  FILTER(?t = <urn:c:0>)
          |  FILTER(datatype(?n) = xsd:integer)
          |  FILTER(datatype(?m) = xsd:integer)
          |  FILTER(?n > ?m)
          |} ORDER BY ?a ?b""".stripMargin,
        dtFrame(s, d))
    },

    // ---- SUM over a PROVEN-integer variable: the datatype() conjunct at
    // the binding scan pins the value space, so the aggregate compiles as
    // an exact BIGINT hash aggregate (map-side combinable) — never a sum
    // of lexical forms. HAVING rides the same aggregate. DuckDB's
    // SUM(BIGINT) widens to HUGEINT, hence the oracle's explicit cast.
    "sparql_agg_sum" -> Q(
      s"""WITH $dtFrameSql
         |SELECT ty.o AS c, CAST(SUM(CAST(n.o AS BIGINT)) AS BIGINT) AS total
         |FROM dtr ty
         |JOIN dtr n ON n.s = ty.s AND n.p = 'urn:p:nchars'
         |  AND n.dt = 'http://www.w3.org/2001/XMLSchema#integer'
         |WHERE ty.p = 'urn:p:type'
         |GROUP BY 1 HAVING SUM(CAST(n.o AS BIGINT)) > 1000
         |ORDER BY 1, 2""".stripMargin) { (s, d) =>
      SparqlCompiler.compile(
        """PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
          |SELECT ?c (SUM(?n) AS ?total) WHERE {
          |  ?s <urn:p:type> ?c .
          |  ?s <urn:p:nchars> ?n . FILTER(datatype(?n) = xsd:integer)
          |} GROUP BY ?c HAVING(SUM(?n) > 1000) ORDER BY ?c ?total""".stripMargin,
        dtFrame(s, d))
    },

    // ---- AVG of an integer-proven variable is cross-engine DETERMINISTIC:
    // both engines take an exact integer sum and do ONE double division,
    // so the doubles match bit-for-bit (no partial-sum reordering).
    "sparql_agg_avg" -> Q(
      s"""WITH $dtFrameSql
         |SELECT ty.o AS c, AVG(CAST(n.o AS BIGINT)) AS mean
         |FROM dtr ty
         |JOIN dtr n ON n.s = ty.s AND n.p = 'urn:p:nchars'
         |  AND n.dt = 'http://www.w3.org/2001/XMLSchema#integer'
         |WHERE ty.p = 'urn:p:type'
         |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      SparqlCompiler.compile(
        """PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
          |SELECT ?c (AVG(?n) AS ?mean) WHERE {
          |  ?s <urn:p:type> ?c .
          |  ?s <urn:p:nchars> ?n . FILTER(datatype(?n) = xsd:integer)
          |} GROUP BY ?c ORDER BY ?c""".stripMargin,
        dtFrame(s, d))
    },

    // ---- ORDER BY over a proven-numeric var sorts by VALUE (the proof
    // upgrades the sort key to a cast), with the subject as the
    // deterministic tiebreak; LIMIT keeps it a TakeOrdered, not a full
    // sort.
    "sparql_order_numeric" -> Q(
      s"""WITH $dtFrameSql
         |SELECT s, o AS n FROM dtr
         |WHERE p = 'urn:p:nchars'
         |  AND dt = 'http://www.w3.org/2001/XMLSchema#integer'
         |ORDER BY CAST(o AS BIGINT) DESC, s LIMIT 10""".stripMargin) { (s, d) =>
      SparqlCompiler.compile(
        """PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
          |SELECT ?s ?n WHERE {
          |  ?s <urn:p:nchars> ?n . FILTER(datatype(?n) = xsd:integer)
          |} ORDER BY DESC(?n) ?s LIMIT 10""".stripMargin,
        dtFrame(s, d))
    },

    // ---- DESCRIBE by pattern (queryType=DESCRIBE in the river config,
    // Harvester.java:1529-1540): all triples of every class-1 document.
    // The subject set semi-joins the triple frame — no duplication, and
    // the `p = urn:p:type` constant prunes the build side at the scan.
    "sparql_describe" -> Q(
      s"""WITH $tripleFrameSql
         |SELECT DISTINCT t.s, t.p, t.o
         |FROM tr t
         |WHERE t.s IN (SELECT s FROM tr WHERE p = 'urn:p:type' AND o = 'urn:c:1')
         |ORDER BY s, p, o""".stripMargin) { (s, d) =>
      SparqlCompiler.compile(
        """DESCRIBE ?s WHERE { ?s <urn:p:type> <urn:c:1> }""",
        tripleFrame(s, d))
        .orderBy("s", "p", "o")
    }
  )
}
