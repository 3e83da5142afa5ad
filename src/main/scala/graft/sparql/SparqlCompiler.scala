package graft.sparql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import SparqlAst._

/** Compiles the parsed SPARQL subset into a Catalyst plan over a triple
  * frame with string columns (s, p, o).
  *
  * This is the Spark-first re-expression of the reference's query surface
  * (Harvester.java:1516-1659 hands these same queries to Jena/a remote
  * triplestore): a BGP becomes a chain of equality hash joins over the
  * triple table, never an interpreter.
  *
  * Scale shape, by construction:
  *  - Constant positions in a pattern become `col === lit` filters applied
  *    directly to the scan, so Catalyst pushes them into the parquet reader
  *    (PushedFilters) and prunes row groups — a pattern like
  *    `?s <urn:p:label> ?o` reads only the label slice of a 100 TB table.
  *  - Pattern joins are EQUALITY joins on shared variables (shuffle or
  *    broadcast hash, AQE's choice), greedily ordered most-constant-first
  *    so the most selective pattern seeds the chain.
  *  - A join step with NO shared variable is REFUSED (SparqlUnsupported):
  *    at 10^12 triples an accidental cross product is an outage, not a
  *    query. The one sanctioned cross is the reference template's constant
  *    "redundant clause" (Harvester.java:1020-1024), compiled as an
  *    existence GATE: `LIMIT 1` on the constant match, then an equality
  *    join on a literal key — a 0-or-1-row BROADCAST HASH join, not a
  *    nested loop.
  *  - OPTIONAL is a left outer hash join on the shared variables;
  *    FILTER(!BOUND(?v)) is an IS NULL filter on top — together they
  *    compile the reference's has-no-label anti-join idiom into exactly
  *    the LeftOuter+IsNull plan Catalyst rewrites to an ANTI join. A
  *    filter INSIDE the optional group that references left-side bindings
  *    becomes the left join's residual condition (full LeftJoin(A, P, F)
  *    semantics — still a hash join, the shared-var equalities drive it).
  *  - A variable bound only optionally (or only in some UNION branches)
  *    must not be used as a later join key: SPARQL joins treat unbound as
  *    compatible-with-anything while SQL nulls never match, so such plans
  *    are REFUSED rather than silently diverging.
  */
object SparqlCompiler {

  final class SparqlUnsupported(msg: String) extends IllegalArgumentException(msg)

  private def unsupported(msg: String): Nothing = throw new SparqlUnsupported(msg)

  /** A compiled fragment: the frame, its bound variables in first-bound
    * order, and the subset of vars that may be NULL (bound only in an
    * OPTIONAL or only in some UNION branches). */
  private final case class Frag(df: DataFrame, vars: Seq[String], maybeNull: Set[String])

  /** Parse + compile in one step. `triples` must have string columns
    * (s, p, o). ASK compiles to a 0-or-1-row frame with a single `ask`
    * column (use [[ask]] for the boolean). */
  def compile(query: String, triples: DataFrame): DataFrame =
    compileAst(SparqlParser.parse(query), triples)

  /** ASK helper: true iff the pattern has at least one solution. */
  def ask(query: String, triples: DataFrame): Boolean =
    SparqlParser.parse(query) match {
      case AskQ(where) => !compileGroup(where, triples).df.isEmpty
      case _ => unsupported("ask() requires an ASK query")
    }

  def compileAst(q: SparqlQuery, triples: DataFrame): DataFrame = q match {
    case sel: SelectQ => compileSelect(sel, triples).df

    case ConstructQ(template, where, limit) =>
      if (template.isEmpty) unsupported("CONSTRUCT with an empty template")
      val w = compileGroup(where, triples)
      // SPARQL solution modifiers bound the SOLUTION sequence; the template
      // then instantiates per kept solution — limiting output triples
      // instead would truncate mid-solution on multi-triple templates
      val wdf = limit.fold(w.df)(n => w.df.limit(checkedInt(n, "LIMIT")))
      def out(t: Term): Column = t match {
        case V(n) =>
          if (w.vars.contains(n)) col(n)
          else lit(null).cast("string") // unbound template var: rows drop below
        case I(u) => lit(u)
        case L(v) => lit(v)
      }
      val parts = template.map { tp =>
        wdf.select(out(tp.s).as("s"), out(tp.p).as("p"), out(tp.o).as("o"))
          // RDF graphs cannot contain triples with unbound positions —
          // template rows that lost a var (OPTIONAL miss) are skipped
          .filter(col("s").isNotNull && col("p").isNotNull && col("o").isNotNull)
      }
      parts.reduce(_ unionAll _).distinct() // a graph is a SET of triples

    case DescribeQ(terms, where) =>
      val iris = terms.collect { case I(u) => u }
      val vars = terms.collect { case V(n) => n }
      val byIri =
        if (iris.isEmpty) None
        else Some(triples.filter(col("s").isin(iris: _*)))
      val byVar = vars match {
        case Seq() => None
        case vs =>
          val w = compileGroup(where.getOrElse(unsupported(
            "DESCRIBE ?var requires a WHERE group")), triples)
          vs.foreach { v =>
            if (!w.vars.contains(v)) unsupported(s"DESCRIBE ?$v: variable not bound in WHERE")
          }
          // subjects to describe = union of the described vars' bindings;
          // LEFT SEMI keeps the scan-side pruned and never duplicates
          val subjects = vs.map(v => w.df.select(col(v).as("__subj")))
            .reduce(_ unionAll _).filter(col("__subj").isNotNull).distinct()
          Some(triples.join(subjects, col("s") === col("__subj"), "left_semi"))
      }
      (byIri, byVar) match {
        case (Some(a), Some(b)) => a.unionAll(b).distinct()
        case (Some(a), None) => a.distinct()
        case (None, Some(b)) => b.distinct()
        case (None, None) => unsupported("DESCRIBE with no terms")
      }

    case AskQ(where) =>
      compileGroup(where, triples).df.limit(1).select(lit(true).as("ask"))
  }

  private def checkedInt(n: Long, what: String): Int = {
    if (n < 0 || n > Int.MaxValue) unsupported(s"$what $n out of range")
    n.toInt
  }

  // ---- SELECT ---------------------------------------------------------------

  private def compileSelect(sel: SelectQ, triples: DataFrame): Frag = {
    val w = compileGroup(sel.where, triples)
    if (sel.projs.isEmpty && w.vars.isEmpty)
      unsupported("SELECT * over an all-constant pattern binds no variables " +
        "(a zero-column result): use ASK for existence checks")
    val (projected, outVars) =
      if (sel.projs.isEmpty) { // SELECT *
        (w.df.select(w.vars.map(col): _*), w.vars)
      } else {
        val cols = sel.projs.map { case Proj(name, source) =>
          val src = source.getOrElse(name)
          if (!w.vars.contains(src)) unsupported(s"projected variable ?$src is not bound")
          col(src).as(name)
        }
        (w.df.select(cols: _*), sel.projs.map(_.name))
      }
    var df = if (sel.distinct) projected.distinct() else projected
    if (sel.orderBy.nonEmpty) {
      sel.orderBy.foreach { case (v, _) =>
        if (!outVars.contains(v)) unsupported(s"ORDER BY ?$v is not in the projection")
      }
      df = df.orderBy(sel.orderBy.map {
        case (v, true) => col(v).asc
        case (v, false) => col(v).desc
      }: _*)
    }
    sel.offset.foreach(n => df = df.offset(checkedInt(n, "OFFSET")))
    sel.limit.foreach(n => df = df.limit(checkedInt(n, "LIMIT")))
    // projection renames can re-bind names; everything projected is now
    // top-level, and null-ness survives the rename
    val nullable = sel.projs match {
      case Seq() => w.maybeNull
      case ps => ps.collect {
        case Proj(name, source) if w.maybeNull(source.getOrElse(name)) => name
      }.toSet
    }
    Frag(df, outVars, nullable)
  }

  // ---- group graph patterns -----------------------------------------------------

  /** `leftVars`: variables bound OUTSIDE this group when it is the pattern
    * of an OPTIONAL — the scope `compileOptional` may lift that group's
    * filters into the left-join condition from (see its scaladoc). In every
    * other position, a filter referencing a var its own group never binds
    * is conformant SPARQL (unbound -> error -> row removed) and compiles as
    * such. */
  private def compileGroup(g: Group, triples: DataFrame,
                           leftVars: Set[String] = Set.empty): Frag = {
    var acc: Option[Frag] = None
    var gates = List.empty[DataFrame] // constant-only patterns: existence checks
    var gateId = 0

    def joinInto(f: Frag, kind: String): Unit = acc match {
      case None =>
        if (kind == "optional")
          unsupported("OPTIONAL cannot be the first pattern of a group")
        acc = Some(f)
      case Some(a) =>
        val shared = a.vars.filter(f.vars.contains)
        if (shared.isEmpty)
          unsupported(s"join of {${f.vars.mkString(",")}} with {${a.vars.mkString(",")}} " +
            "shares no variable: refusing the cross product")
        shared.filter(a.maybeNull).foreach { v =>
          unsupported(s"?$v is only optionally bound and later used as a join key: " +
            "SPARQL unbound-compatibility differs from SQL null-join semantics")
        }
        shared.filter(f.maybeNull).foreach { v =>
          unsupported(s"?$v is only optionally bound in a sub-pattern used as a join key")
        }
        val joined = a.df.join(f.df, shared, if (kind == "optional") "left_outer" else "inner")
        val vars = a.vars ++ f.vars.filterNot(a.vars.contains)
        val fresh = f.vars.filterNot(a.vars.contains).toSet
        val maybeNull =
          if (kind == "optional") a.maybeNull ++ fresh ++ (f.maybeNull -- shared.toSet)
          else a.maybeNull ++ (f.maybeNull -- shared.toSet)
        acc = Some(Frag(joined, vars, maybeNull))
    }

    /** SPARQL `OPTIONAL { P FILTER F }` is LeftJoin(left, P, F): F sees the
      * LEFT side's bindings, not just P's. Filters of the optional group
      * that reference left-bound variables therefore compile into the left
      * join's CONDITION — equality on the shared variables plus the residual
      * predicate, which Spark still executes as a hash join (the equality
      * keys drive the build/probe; the residual evaluates per matched row).
      * Filters over only the group's own variables apply to P before the
      * join, same result, cheaper (they prune the build side). A condition
      * variable bound NOWHERE compiles to null => never matches => the left
      * row survives bare — exactly SPARQL's error-means-no-extension. Only
      * variables visible one level up are in scope; a condition reaching a
      * grand-outer binding is refused. */
    def compileOptional(og: Group): Unit = {
      val a = acc.getOrElse(
        unsupported("OPTIONAL cannot be the first pattern of a group"))
      val bound = a.vars.toSet ++ leftVars
      val (filterElems, core) = og.elems.partition(_.isInstanceOf[GFilter])
      val fs = filterElems.collect { case GFilter(e) => e }
      val c0 = compileGroup(Group(core), triples, bound)
      val (pending, local) = fs.partition(e => (fvars(e) -- c0.vars.toSet).exists(bound))
      val c = local.foldLeft(c0)((f, e) =>
        f.copy(df = f.df.filter(compileFilter(e, f.vars))))
      val shared = a.vars.filter(c.vars.contains)
      if (shared.isEmpty)
        unsupported(s"OPTIONAL {${c.vars.mkString(",")}} shares no variable " +
          s"with {${a.vars.mkString(",")}}: refusing the cross product")
      (shared.filter(a.maybeNull) ++ shared.filter(c.maybeNull)).foreach { v =>
        unsupported(s"?$v is only optionally bound and later used as a join key: " +
          "SPARQL unbound-compatibility differs from SQL null-join semantics")
      }
      pending.flatMap(fvars).distinct.foreach { v =>
        if (!a.vars.contains(v) && !c.vars.contains(v) && bound(v))
          unsupported(s"FILTER in OPTIONAL references ?$v bound outside the " +
            "enclosing group: only one level of left-join condition scope is compiled")
      }
      val freshVars = c.vars.filterNot(a.vars.contains)
      if (pending.isEmpty) {
        acc = Some(Frag(a.df.join(c.df, shared, "left_outer"),
          a.vars ++ freshVars,
          a.maybeNull ++ freshVars.toSet ++ (c.maybeNull -- shared.toSet)))
      } else {
        // disambiguate the optional side, then join on shared-var equality
        // AND the residual condition
        val ren = c.vars.map(v => v -> s"__opt_$v").toMap
        val cdf = c.vars.foldLeft(c.df)((d, v) => d.withColumnRenamed(v, ren(v)))
        val resolve: String => Option[Column] = v =>
          if (c.vars.contains(v)) Some(col(ren(v)))
          else if (a.vars.contains(v)) Some(col(v))
          else None // bound nowhere: null condition => no extension
        val eq = shared.map(v => col(v) === col(ren(v))).reduce(_ && _)
        val cond = pending.map(e => compileFilter(e, resolve)).reduce(_ && _)
        val joined = a.df.join(cdf, eq && cond, "left_outer")
          .select(a.vars.map(col) ++ freshVars.map(v => col(ren(v)).as(v)): _*)
        acc = Some(Frag(joined, a.vars ++ freshVars,
          a.maybeNull ++ freshVars.toSet ++ (c.maybeNull -- shared.toSet)))
      }
    }

    // source order matters for OPTIONAL scoping; runs of adjacent triple
    // patterns form one BGP and are join-ordered greedily within the run
    val elems = g.elems
    var idx = 0
    var deferredFilters = List.empty[FExpr]
    var deferredExists = List.empty[(Group, Boolean)]
    while (idx < elems.length) {
      elems(idx) match {
        case GTriple(_) =>
          val run = elems.drop(idx).takeWhile(_.isInstanceOf[GTriple])
            .collect { case GTriple(tp) => tp }
          idx += run.length
          val frags = run.map(compilePattern(_, triples))
          val (constOnly, withVars) = frags.partition(_.vars.isEmpty)
          gates :::= constOnly.map(_.df).toList
          greedyBgp(withVars).foreach(joinInto(_, "inner"))
        case GOptional(og) =>
          compileOptional(og); idx += 1
        case GSub(sub) =>
          joinInto(compileSelect(sub, triples), "inner"); idx += 1
        case GUnion(branches) =>
          joinInto(compileUnion(branches, triples), "inner"); idx += 1
        case GValues(vvars, rows) =>
          joinInto(compileValues(vvars, rows, triples), "inner"); idx += 1
        case GExists(eg, pos) =>
          // group-scoped like plain filters: applied over the group's
          // solutions, as one LEFT SEMI / LEFT ANTI hash join
          deferredExists ::= (eg, pos); idx += 1
        case GMinus(mg) =>
          // MINUS removes solutions COMPATIBLE with the pattern on >=1
          // shared variable — one LEFT ANTI hash join. Unlike NOT EXISTS
          // there are NO substitute semantics (the pattern never sees this
          // group's bindings, so no leftVars and no phantom-variable
          // refusal is needed), and a pattern sharing NOTHING removes
          // NOTHING per the spec — compiled as the no-op it is, not as a
          // gate (the classic MINUS-vs-NOT-EXISTS divergence)
          val a = acc.getOrElse(
            unsupported("MINUS cannot be the first pattern of a group"))
          val c = compileGroup(mg, triples)
          val shared = a.vars.filter(c.vars.contains)
          if (shared.nonEmpty) {
            (shared.filter(a.maybeNull) ++ shared.filter(c.maybeNull)).foreach { v =>
              unsupported(s"?$v is only optionally bound and used as a MINUS " +
                "key: SPARQL unbound-compatibility differs from SQL " +
                "null-join semantics")
            }
            acc = Some(a.copy(df = a.df.join(
              c.df.select(shared.map(col): _*), shared, "left_anti")))
          }
          idx += 1
        case GFilter(e) =>
          // group-scoped: applies to the whole group's solutions
          deferredFilters ::= e; idx += 1
      }
    }

    var result = acc.getOrElse {
      if (gates.isEmpty) unsupported("empty group pattern")
      // gates only (e.g. ASK { <s> <p> <o> }): the first gate seeds a
      // 0-or-1-row frame; the rest conjoin through the normal gate joins
      val seed = gates.head
      gates = gates.tail
      Frag(seed.limit(1).select(lit(1).as("__gate0")), Seq.empty, Set.empty)
    }
    // apply existence gates: 0-or-1-row EQUALITY join on a key each side
    // derives from its own data. The key is '' for every row, but via an
    // expression no optimizer rule can prove constant (a lit key would be
    // constant-folded to `true` and the join demoted to a
    // BroadcastNestedLoopJoin; arithmetic like nonNullable*0 gets
    // simplified the same way). This stays a broadcast HASH join, keeping
    // the engine-wide no-nested-loop invariant intact. When the gate's
    // source folds to a literal LocalRelation anyway (an all-constant
    // ontology slice), Catalyst may still demote — that case is a
    // compile-time-known 1-row build side, i.e. free at any scale.
    def zeroKey(df: DataFrame): Column =
      coalesce(substring(col(df.columns.head).cast("string"), 1, 0), lit(""))
    // shared by the constant-pattern gates ("inner") and the var-free
    // EXISTS / NOT EXISTS forms ("left_semi" / "left_anti")
    def gateJoin(gdf: DataFrame, joinType: String): Unit = {
      gateId += 1
      val k = s"__gate$gateId"
      val gate = broadcast(gdf.limit(1).select(zeroKey(gdf).as(k)))
      val left = result.df.withColumn(k, zeroKey(result.df))
      result = result.copy(df = left.join(gate, Seq(k), joinType).drop(k))
    }
    gates.foreach(gateJoin(_, "inner"))
    deferredFilters.reverse.foreach { e =>
      val outerRefs = (fvars(e) -- result.vars.toSet).intersect(leftVars)
      if (outerRefs.nonEmpty)
        unsupported(s"FILTER references " +
          outerRefs.toSeq.sorted.map("?" + _).mkString(", ") +
          " bound only in the enclosing group: substitute semantics are " +
          "not compiled at this nesting — move the filter up a level " +
          "(scaladoc: compileGroup/compileOptional)")
      result = result.copy(df = result.df.filter(compileFilter(e, result.vars)))
    }
    // FILTER [NOT] EXISTS { P }: per-solution existence over the shared
    // variables = ONE left semi / left anti hash join against P — the plan
    // the reference's OPTIONAL+!BOUND idiom only reaches via the optimizer.
    // P sharing NO variable is a global gate (query-constant truth value):
    // the zero-key equality against P's limit(1) keeps it a hash join.
    // SPARQL's substitute semantics (P evaluated with the CURRENT solution's
    // bindings) reach only this group's own vars here; a P that touches an
    // ENCLOSING group's binding — through a filter (the compileGroup
    // leftVars guard) or through a pattern variable (the phantom check
    // below: such a var would silently rebind as free) — is REFUSED.
    deferredExists.reverse.foreach { case (eg, pos) =>
      val c = compileGroup(eg, triples, result.vars.toSet ++ leftVars)
      val phantom = (c.vars.toSet -- result.vars.toSet).intersect(leftVars)
      if (phantom.nonEmpty)
        unsupported(s"[NOT] EXISTS pattern references " +
          phantom.toSeq.sorted.map("?" + _).mkString(", ") +
          " bound only in the enclosing group: substitute semantics are " +
          "not compiled at this nesting — move the EXISTS up a level")
      val shared = result.vars.filter(c.vars.contains)
      (shared.filter(result.maybeNull) ++ shared.filter(c.maybeNull)).foreach { v =>
        unsupported(s"?$v is only optionally bound and used as an EXISTS " +
          "join key: SPARQL unbound-compatibility differs from SQL " +
          "null-join semantics")
      }
      if (shared.nonEmpty) {
        val probe = c.df.select(shared.map(col): _*)
        result = result.copy(df = result.df.join(probe, shared,
          if (pos) "left_semi" else "left_anti"))
      } else {
        gateJoin(c.df, if (pos) "left_semi" else "left_anti")
      }
    }
    result
  }

  private def fvars(e: FExpr): Set[String] = e match {
    case FIn(t, vals) => tvars(t) ++ vals.flatMap(tvars)
    case FCmp(_, l, r) => tvars(l) ++ tvars(r)
    case FBound(v) => Set(v.name)
    case FRegex(t, _) => tvars(t)
    case FAnd(a, b) => fvars(a) ++ fvars(b)
    case FOr(a, b) => fvars(a) ++ fvars(b)
    case FNot(a) => fvars(a)
  }

  private def tvars(t: Term): Set[String] = t match {
    case V(n) => Set(n)
    case _ => Set.empty
  }

  /** Fold every-gate-and-no-triples case safely and join var-bearing
    * patterns greedily: seed with the most-constant (most selective)
    * pattern, then repeatedly take the pattern sharing the most variables
    * with the bound set (constants break ties). Shares-nothing => refuse. */
  private def greedyBgp(frags: Seq[Frag]): Option[Frag] = {
    if (frags.isEmpty) return None
    def constness(f: Frag): Int = 3 - f.vars.length // patterns have <=3 var positions
    val pool = scala.collection.mutable.ArrayBuffer(frags: _*)
    var cur = pool.remove(pool.indices.maxBy(i => (constness(pool(i)), -i)))
    while (pool.nonEmpty) {
      val bound = cur.vars.toSet
      val cands = pool.indices.filter(i => pool(i).vars.exists(bound))
      if (cands.isEmpty)
        unsupported("basic graph pattern is disconnected: refusing the cross product " +
          s"(bound {${cur.vars.mkString(",")}} vs remaining " +
          s"{${pool.map(_.vars.mkString("/")).mkString(", ")}})")
      val pick = cands.maxBy(i => (pool(i).vars.count(bound), constness(pool(i)), -i))
      val nxt = pool.remove(pick)
      val shared = cur.vars.filter(nxt.vars.contains)
      cur = Frag(cur.df.join(nxt.df, shared, "inner"),
        cur.vars ++ nxt.vars.filterNot(cur.vars.contains), Set.empty)
    }
    Some(cur)
  }

  /** VALUES compiles to a broadcast inline relation joined on its shared
    * variables — the scalable form of the reference's FILTER(?s IN ...)
    * changed-set idiom: a 10k-row VALUES block stays a broadcast hash join
    * where the OR-chain would bloat the predicate tree. A variable that is
    * UNDEF in any row is maybeNull: SQL null join keys never match while
    * SPARQL UNDEF is compatible-with-anything, so using one as a later join
    * key is refused by the shared guard rather than silently diverging. */
  private def compileValues(vars: Seq[String], rows: Seq[Seq[Option[Term]]],
                            triples: DataFrame): Frag = {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(vars.map(v =>
      org.apache.spark.sql.types.StructField(v,
        org.apache.spark.sql.types.StringType, nullable = true)))
    val data: Seq[org.apache.spark.sql.Row] = rows.map { r =>
      org.apache.spark.sql.Row(r.map(_.map {
        case I(u) => u
        case L(v) => v
        case V(n) => unsupported(s"?$n inside a VALUES row") // parser refuses first
      }.orNull): _*)
    }
    val df = broadcast(triples.sparkSession.createDataFrame(data.asJava, schema))
    val undefVars = vars.zipWithIndex.collect {
      case (v, i) if rows.exists(_(i).isEmpty) => v
    }.toSet
    Frag(df, vars, undefVars)
  }

  private def compileUnion(branches: Seq[Group], triples: DataFrame): Frag = {
    val frags = branches.map(compileGroup(_, triples))
    if (frags.length == 1) return frags.head // plain nested group
    val allVars = frags.flatMap(_.vars).distinct
    val aligned = frags.map { f =>
      val cols = allVars.map(v =>
        if (f.vars.contains(v)) col(v) else lit(null).cast("string").as(v))
      f.df.select(cols: _*)
    }
    val everywhere = allVars.filter(v => frags.forall(_.vars.contains(v))).toSet
    val maybeNull = allVars.filterNot(everywhere).toSet ++ frags.flatMap(_.maybeNull)
    Frag(aligned.reduce(_ unionAll _), allVars, maybeNull)
  }

  // ---- triple patterns ---------------------------------------------------------

  private def compilePattern(tp: TP, triples: DataFrame): Frag = {
    val pos: Seq[(String, Term)] = Seq("s" -> tp.s, "p" -> tp.p, "o" -> tp.o)
    var df = triples
    pos.foreach {
      case (c, I(u)) => df = df.filter(col(c) === u)
      case (c, L(v)) => df = df.filter(col(c) === v)
      case _ => ()
    }
    val varPos = pos.collect { case (c, V(n)) => (c, n) }
    // same var twice in one pattern (?s ?p ?s): in-pattern equality
    varPos.groupBy(_._2).valuesIterator.filter(_.size > 1).foreach { dup =>
      dup.map(_._1).sliding(2).foreach {
        case Seq(a, b) => df = df.filter(col(a) === col(b))
        case _ => ()
      }
    }
    val keep = varPos.distinctBy(_._2)
    if (keep.isEmpty)
      // constant-only pattern (the reference's "redundant clause"): keep the
      // filtered (s, p, o) frame — the gate key derives from its columns
      Frag(df, Seq.empty, Set.empty)
    else
      Frag(df.select(keep.map { case (c, n) => col(c).as(n) }: _*), keep.map(_._2), Set.empty)
  }

  // ---- filters -------------------------------------------------------------------

  private def compileFilter(e: FExpr, vars: Seq[String]): Column =
    compileFilter(e, (n: String) => if (vars.contains(n)) Some(col(n)) else None)

  /** `resolve`: variable -> in-scope column; None means the variable is
    * bound nowhere — SPARQL evaluates it to an error, and a filter whose
    * expression errors removes the row, so it compiles to a null literal
    * (three-valued logic then filters the row, or voids the join
    * condition, exactly as required). */
  private def compileFilter(e: FExpr, resolve: String => Option[Column]): Column = {
    def term(t: Term): Column = t match {
      case V(n) => resolve(n).getOrElse(lit(null).cast("string"))
      case I(u) => lit(u)
      case L(v) => lit(v)
    }
    e match {
      case FIn(t, vals) =>
        val c = term(t)
        vals.map(v => c === term(v)).reduce(_ || _)
      case FCmp(op, l, r) =>
        val (a, b) = (term(l), term(r))
        op match {
          case "=" => a === b
          case "!=" => a =!= b
          case "<" => a < b
          case "<=" => a <= b
          case ">" => a > b
          case ">=" => a >= b
        }
      case FBound(V(n)) => resolve(n).map(_.isNotNull).getOrElse(lit(false))
      case FRegex(t, pat) => term(t).rlike(pat)
      case FAnd(a, b) => compileFilter(a, resolve) && compileFilter(b, resolve)
      case FOr(a, b) => compileFilter(a, resolve) || compileFilter(b, resolve)
      case FNot(a) =>
        // SQL three-valued NOT(null)=null filters the row, which matches
        // SPARQL's error-removes-row for everything EXCEPT !BOUND — BOUND
        // compiles to a non-null boolean, so NOT stays two-valued there
        !compileFilter(a, resolve)
    }
  }
}
