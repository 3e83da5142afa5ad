package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.config.PipelineConfig
import graft.materialize.DocAssembler

/** Driver-verifiable queries through the REAL document-assembly code path
  * (graft.materialize.DocAssembler) — the reference's output shape with the
  * config-driven features wired in:
  *
  *  - J1/J5 `uriDescription` label substitution (getLabelForUri semantics,
  *    ESNormalizer.java:410-457; priority EEASettings.java:46-50),
  *  - `includeResourceURI` about=[subj] (ESNormalizer.java:318-328),
  *  - `addLanguage` language=[lang] stamping (ESNormalizer.java:193-194),
  *  - A6 shared-prop merge + untagged-only fallback.
  *
  * Inputs are deterministic triple derivations of the `documents` table so
  * DuckDB can rebuild the identical input; the doc Map column is exploded to
  * long form for the value-level hash compare.
  */
object MaterializeQueries {

  val all: Map[String, Q] = Map(

    // ---- S5: N-Triples ingestion through the REAL line parser
    // (graft.sources.NTriplesSource): NT lines are synthesized
    // deterministically from `documents` (lang-tagged literal, typed literal,
    // IRI object per row), parsed distributed, and the recovered
    // (subj, pred, obj, objLang, objType) rows are oracle-checked against the
    // direct derivation — round-trip parity for the reader
    "s5_ntriples_roundtrip" -> Q(
      """SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR) AS subj,
        |       'urn:p:' || source AS pred,
        |       CAST(n_chars AS VARCHAR) AS obj,
        |       lang AS "objLang", '' AS "objType"
        |FROM documents
        |UNION ALL
        |SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR), 'urn:p:len',
        |       CAST(n_chars AS VARCHAR), '',
        |       'http://www.w3.org/2001/XMLSchema#integer'
        |FROM documents
        |UNION ALL
        |SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR), 'urn:p:ref',
        |       'urn:doc:' || CAST((doc_id * 3) % 500 AS VARCHAR), '', ''
        |FROM documents
        |ORDER BY subj, pred, obj, "objLang", "objType"""".stripMargin) { (s, d) =>
      import s.implicits._
      val docs = Tables.documents(s, d)
      val l1 = docs.select(format_string(
        "<urn:doc:%s> <urn:p:%s> \"%s\"@%s .",
        col("doc_id"), col("source"), col("n_chars"), col("lang")).as("line"))
      val l2 = docs.select(format_string(
        "<urn:doc:%s> <urn:p:len> \"%s\"^^<http://www.w3.org/2001/XMLSchema#integer> .",
        col("doc_id"), col("n_chars")).as("line"))
      val l3 = docs.select(format_string(
        "<urn:doc:%s> <urn:p:ref> <urn:doc:%s> .",
        col("doc_id"), (col("doc_id") * 3) % 500).as("line"))
      graft.sources.NTriplesSource
        .parse(l1.unionAll(l2).unionAll(l3).as[String])
        .toDF()
        .orderBy("subj", "pred", "obj", "objLang", "objType")
    },

    // ---- S5 (RDF/XML): the same round-trip through the REAL document
    // parser (graft.sources.RdfXmlSource): one small RDF/XML doc is
    // synthesized per `documents` row — xml:lang inheritance from the root,
    // rdf:datatype typed literal, rdf:resource object — parsed distributed
    // (one parse unit per doc, the file-granularity scan contract), and the
    // recovered rows oracle-checked against the direct derivation
    "s5_rdfxml_roundtrip" -> Q(
      """SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR) AS subj,
        |       'urn:p:' || source AS pred,
        |       CAST(n_chars AS VARCHAR) AS obj,
        |       lang AS "objLang", '' AS "objType"
        |FROM documents
        |UNION ALL
        |SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR), 'urn:p:len',
        |       CAST(n_chars AS VARCHAR), '',
        |       'http://www.w3.org/2001/XMLSchema#integer'
        |FROM documents
        |UNION ALL
        |SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR), 'urn:p:ref',
        |       'urn:doc:' || CAST((doc_id * 3) % 500 AS VARCHAR), '', ''
        |FROM documents
        |ORDER BY subj, pred, obj, "objLang", "objType"""".stripMargin) { (s, d) =>
      import s.implicits._
      val docs = Tables.documents(s, d)
      val xml = docs.select(
        col("doc_id").cast("string").as("id"),
        format_string(
          """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" xmlns:p="urn:p:" xml:lang="%s">
            |<rdf:Description rdf:about="urn:doc:%s">
            |<p:%s>%s</p:%s>
            |<p:len rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">%s</p:len>
            |<p:ref rdf:resource="urn:doc:%s"/>
            |</rdf:Description>
            |</rdf:RDF>""".stripMargin,
          col("lang"), col("doc_id"), col("source"), col("n_chars"),
          col("source"), col("n_chars"), (col("doc_id") * 3) % 500).as("xml"))
        .as[(String, String)]
      xml.flatMap { case (id, x) =>
          graft.sources.RdfXmlSource.parseFile(id, x).getOrElse(Seq.empty)
        }
        .toDF()
        .orderBy("subj", "pred", "obj", "objLang", "objType")
    },

    // ---- J5: config-driven label substitution at edge/doc build — object
    // URIs replaced by the best label found in the model itself; priority
    // prefLabel > title; URIs without labels pass through
    "j5_label_substitution" -> Q(
      """WITH t AS (
        |  SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR) AS subj, 'urn:p:ref' AS pred,
        |         'urn:doc:' || CAST((doc_id * 7) % 500 AS VARCHAR) AS obj
        |  FROM documents
        |  UNION ALL
        |  SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR), 'title',
        |         'Title ' || CAST(doc_id AS VARCHAR)
        |  FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR), 'prefLabel',
        |         'P' || CAST(doc_id AS VARCHAR)
        |  FROM documents WHERE doc_id % 5 = 0),
        |prio(pred, prank) AS (VALUES ('prefLabel', 0), ('title', 1)),
        |labels AS (
        |  SELECT obj, l FROM (
        |    SELECT t.subj AS obj, t.obj AS l,
        |           row_number() OVER (PARTITION BY t.subj ORDER BY p.prank, t.obj) AS rn
        |    FROM t JOIN prio p ON t.pred = p.pred WHERE length(t.obj) > 0)
        |  WHERE rn = 1)
        |SELECT t.subj, t.pred, coalesce(l.l, t.obj) AS obj
        |FROM t LEFT JOIN labels l ON t.obj = l.obj
        |ORDER BY subj, pred, obj""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val id = col("doc_id").cast("string")
      val t = docs.select(
          concat(lit("urn:doc:"), id).as("subj"),
          lit("urn:p:ref").as("pred"),
          concat(lit("urn:doc:"), ((col("doc_id") * 7) % 500).cast("string")).as("obj"))
        .unionByName(docs.filter(col("doc_id") % 3 === 0).select(
          concat(lit("urn:doc:"), id).as("subj"),
          lit("title").as("pred"),
          concat(lit("Title "), id).as("obj")))
        .unionByName(docs.filter(col("doc_id") % 5 === 0).select(
          concat(lit("urn:doc:"), id).as("subj"),
          lit("prefLabel").as("pred"),
          concat(lit("P"), id).as("obj")))
      DocAssembler.resolveUriLabels(t,
          PipelineConfig(uriDescription = Seq("prefLabel", "title")))
        .orderBy("subj", "pred", "obj")
    },

    // ---- F8+F10: typed JSON doc-value rendering through the real function
    // (DocAssembler.typedJsonValue): numeric/boolean datatypes pass through
    // as native JSON tokens, strings quote-escape — the reference's
    // getStringForResult dispatch composed with its mapToString rendering,
    // over NT-parsed triples so objType drives the dispatch end-to-end
    "mat_typed_json_render" -> Q(
      """WITH t AS (
        |  SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR) AS subj, 'urn:p:len' AS pred,
        |         CAST(n_chars AS VARCHAR) AS obj,
        |         'http://www.w3.org/2001/XMLSchema#integer' AS otype
        |  FROM documents
        |  UNION ALL
        |  SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR), 'urn:p:even',
        |         CASE WHEN doc_id % 2 = 0 THEN 'true' ELSE 'false' END,
        |         'http://www.w3.org/2001/XMLSchema#boolean'
        |  FROM documents
        |  UNION ALL
        |  SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR), 'urn:p:src',
        |         'src "' || source || '" \' || source, ''
        |  FROM documents)
        |SELECT subj, pred,
        |       CASE WHEN otype <> '' THEN obj
        |            ELSE '"' || replace(replace(obj, '\', '\\'), '"', '\"') || '"'
        |       END AS rendered
        |FROM t ORDER BY subj, pred, rendered""".stripMargin) { (s, d) =>
      import graft.materialize.DocAssembler.typedJsonValue
      val docs = Tables.documents(s, d)
      val id = col("doc_id").cast("string")
      val t = docs.select(
          concat(lit("urn:doc:"), id).as("subj"),
          lit("urn:p:len").as("pred"),
          col("n_chars").cast("string").as("obj"),
          lit("http://www.w3.org/2001/XMLSchema#integer").as("otype"))
        .unionByName(docs.select(
          concat(lit("urn:doc:"), id).as("subj"),
          lit("urn:p:even").as("pred"),
          when(col("doc_id") % 2 === 0, "true").otherwise("false").as("obj"),
          lit("http://www.w3.org/2001/XMLSchema#boolean").as("otype")))
        .unionByName(docs.select(
          concat(lit("urn:doc:"), id).as("subj"),
          lit("urn:p:src").as("pred"),
          concat(lit("src \""), col("source"), lit("\" \\"), col("source")).as("obj"),
          lit("").as("otype")))
      t.select(col("subj"), col("pred"),
          typedJsonValue(col("obj"), col("otype")).as("rendered"))
        .orderBy("subj", "pred", "rendered")
    },

    // ---- A5 normMissing through the full assembler: per-predicate defaults
    // fill the UNTAGGED map when it lacks the predicate (reference-exact:
    // a subject holding the predicate only under a language tag still gets
    // the default, which then unions into its tagged docs via the shared
    // merge — ESNormalizer.java:127-155 judges absence on the "" map alone);
    // defaults are raw config strings, never label-substituted
    "mat_doc_defaults" -> Q(
      """WITH t AS (
        |  SELECT 'urn:s:' || CAST(doc_id % 50 AS VARCHAR) AS subj,
        |         'urn:p:' || source AS pred,
        |         CAST(n_chars AS VARCHAR) AS obj,
        |         CASE WHEN doc_id % 50 >= 45 THEN ''
        |              WHEN doc_id % 4 = 0 THEN '' ELSE lang END AS lang
        |  FROM documents),
        |defaults(pred, obj) AS (VALUES ('urn:p:src3', 'd3a'),
        |                               ('urn:p:src3', 'd3b'),
        |                               ('urn:p:curated', 'no')),
        |untagged AS (SELECT DISTINCT subj, pred FROM t WHERE lang = ''),
        |withdefaults AS (
        |  SELECT * FROM t
        |  UNION ALL
        |  SELECT s.subj, d.pred, d.obj, '' AS lang
        |  FROM (SELECT DISTINCT subj FROM t) s CROSS JOIN defaults d
        |  WHERE NOT EXISTS (SELECT 1 FROM untagged u
        |                    WHERE u.subj = s.subj AND u.pred = d.pred)),
        |vals AS (
        |  SELECT subj, lang, pred, list_sort(list_distinct(list(obj))) AS vs
        |  FROM withdefaults GROUP BY 1, 2, 3),
        |shared AS (SELECT subj, pred, vs FROM vals WHERE lang = ''),
        |tagged AS (SELECT * FROM vals WHERE lang <> ''),
        |tlangs AS (SELECT DISTINCT subj, lang FROM tagged),
        |mergedentries AS (
        |  SELECT subj, lang, pred, vs FROM tagged
        |  UNION ALL
        |  SELECT tl.subj, tl.lang, s.pred, s.vs
        |  FROM tlangs tl JOIN shared s ON tl.subj = s.subj),
        |merged AS (
        |  SELECT subj, lang, pred, list_sort(list_distinct(flatten(list(vs)))) AS vs
        |  FROM mergedentries GROUP BY 1, 2, 3),
        |stamped AS (
        |  SELECT subj, lang, pred, vs FROM merged WHERE pred <> 'language'
        |  UNION ALL
        |  SELECT subj, lang, 'language' AS pred, [lang] AS vs FROM tlangs),
        |untaggedonly AS (
        |  SELECT s.subj, 'en' AS lang, s.pred, s.vs
        |  FROM shared s LEFT JOIN tlangs tl ON s.subj = tl.subj
        |  WHERE tl.subj IS NULL),
        |alldocs AS (SELECT * FROM stamped UNION ALL SELECT * FROM untaggedonly)
        |SELECT subj || '@' || lang AS id, subj, lang, pred AS key,
        |       array_to_string(vs, ',') AS vals
        |FROM alldocs ORDER BY id, key""".stripMargin) { (s, d) =>
      val t = Tables.documents(s, d).select(
        concat(lit("urn:s:"), (col("doc_id") % 50).cast("string")).as("subj"),
        concat(lit("urn:p:"), col("source")).as("pred"),
        col("n_chars").cast("string").as("obj"),
        when(col("doc_id") % 50 >= 45, "")
          .when(col("doc_id") % 4 === 0, "")
          .otherwise(col("lang")).as("lang"))
      val cfg = PipelineConfig(language = "en", addLanguage = true,
        normMissing = Map(
          "urn:p:src3" -> Seq("d3a", "d3b"),
          "urn:p:curated" -> Seq("no")))
      DocAssembler.assemble(t, cfg)
        .select(col("id"), col("subj"), col("lang"),
          explode(col("doc")).as(Seq("key", "vs")))
        .select(col("id"), col("subj"), col("lang"), col("key"),
          array_join(col("vs"), ",").as("vals"))
        .orderBy("id", "key")
    },

    // ---- A6 + about + language through the full assembler: shared-prop
    // merge, about=[subj] via the shared doc, language=[lang] on tagged docs,
    // untagged-only fallback at the default language — exploded to long form
    "mat_doc_assembly" -> Q(
      """WITH t AS (
        |  SELECT 'urn:s:' || CAST(doc_id % 50 AS VARCHAR) AS subj,
        |         'urn:p:' || source AS pred,
        |         CAST(n_chars AS VARCHAR) AS obj,
        |         CASE WHEN doc_id % 50 >= 45 THEN ''
        |              WHEN doc_id % 4 = 0 THEN '' ELSE lang END AS lang
        |  FROM documents),
        |withabout AS (
        |  SELECT * FROM t
        |  UNION ALL
        |  SELECT DISTINCT subj, 'about' AS pred, subj AS obj, '' AS lang FROM t),
        |vals AS (
        |  SELECT subj, lang, pred, list_sort(list_distinct(list(obj))) AS vs
        |  FROM withabout GROUP BY 1, 2, 3),
        |shared AS (SELECT subj, pred, vs FROM vals WHERE lang = ''),
        |tagged AS (SELECT * FROM vals WHERE lang <> ''),
        |tlangs AS (SELECT DISTINCT subj, lang FROM tagged),
        |mergedentries AS (
        |  SELECT subj, lang, pred, vs FROM tagged
        |  UNION ALL
        |  SELECT tl.subj, tl.lang, s.pred, s.vs
        |  FROM tlangs tl JOIN shared s ON tl.subj = s.subj),
        |merged AS (
        |  SELECT subj, lang, pred, list_sort(list_distinct(flatten(list(vs)))) AS vs
        |  FROM mergedentries GROUP BY 1, 2, 3),
        |stamped AS (
        |  SELECT subj, lang, pred, vs FROM merged WHERE pred <> 'language'
        |  UNION ALL
        |  SELECT subj, lang, 'language' AS pred, [lang] AS vs FROM tlangs),
        |untaggedonly AS (
        |  SELECT s.subj, 'en' AS lang, s.pred, s.vs
        |  FROM shared s LEFT JOIN tlangs tl ON s.subj = tl.subj
        |  WHERE tl.subj IS NULL),
        |alldocs AS (SELECT * FROM stamped UNION ALL SELECT * FROM untaggedonly)
        |SELECT subj || '@' || lang AS id, subj, lang, pred AS key,
        |       array_to_string(vs, ',') AS vals
        |FROM alldocs ORDER BY id, key""".stripMargin) { (s, d) =>
      val t = Tables.documents(s, d).select(
        concat(lit("urn:s:"), (col("doc_id") % 50).cast("string")).as("subj"),
        concat(lit("urn:p:"), col("source")).as("pred"),
        col("n_chars").cast("string").as("obj"),
        when(col("doc_id") % 50 >= 45, "")
          .when(col("doc_id") % 4 === 0, "")
          .otherwise(col("lang")).as("lang"))
      val cfg = PipelineConfig(language = "en", addLanguage = true,
        includeResourceURI = true)
      DocAssembler.assemble(t, cfg)
        .select(col("id"), col("subj"), col("lang"),
          explode(col("doc")).as(Seq("key", "vs")))
        .select(col("id"), col("subj"), col("lang"), col("key"),
          array_join(col("vs"), ",").as("vals"))
        .orderBy("id", "key")
    }
  )
}
