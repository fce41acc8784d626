"""SPARQL text front-end: parse a SPARQL 1.1 subset to the BGP layer.

The operator layer (``operators/bgp.py``, ``operators/entailment.py``)
evaluates SPARQL algebra as DataFrame plans; this module adds the
concrete syntax so a user can run the QUERY STRING they already have.
The reference never needed this — its queries are Python calls on an
rdflib graph — but "switch to this repo and run every query you run
today" for a KG user means accepting SPARQL text.

Grammar (SPARQL 1.1 subset; everything parsed maps 1:1 onto an
operator-layer feature, and everything outside raises ``SparqlError``
with the unsupported construct named — never a silent wrong answer):

    query      := prologue (select | ask | describe | construct)
    prologue   := ('PREFIX' pname ':' iriref)*
    select     := 'SELECT' 'DISTINCT'? (var | '*' | '(' agg 'AS' var ')'
                                        | '(' expr 'AS' var ')')+
                  'WHERE'? group
                  ('GROUP' 'BY' vars)?
                  ('HAVING' '(' expr ')')?     -- bare aggs allowed here
                  ('ORDER' 'BY' ordercond+)? ('LIMIT' n)? ('OFFSET' n)?
    ordercond  := var | ('ASC'|'DESC') '(' (var | expr) ')'
                | fn-call | '(' expr ')'
    path       := seg ('/' seg)*
    seg        := atom | atom op | '(' alt ')' op? | '!' atom
                | '!(' alt ')' op?              -- op in {+ * ?}
    alt        := [^]iri ('|' [^]iri)*
    ask        := 'ASK' 'WHERE'? group
    describe   := 'DESCRIBE' (iri+ | var) ('WHERE'? group)?
    construct  := 'CONSTRUCT' '{' plain-triples '}' 'WHERE'? group
                  ('LIMIT' n)?
    group      := '{' member* '}'
    member     := triples '.'? | 'OPTIONAL' group | 'MINUS' group
                | group 'UNION' group | 'FILTER' constraint
                | 'VALUES' var '{' term* '}'
                | 'VALUES' '(' var+ ')' '{' ('(' (term|'UNDEF')* ')')* '}'
                | 'GRAPH' (iri | var) group
                | 'BIND' '(' expr 'AS' var ')'
                | '{' select '}'
    constraint := '(' expr ')' | 'EXISTS' group | 'NOT' 'EXISTS' group
                | 'REGEX' '(' ... ')'

Triple patterns support prefixed names, ``<iri>``, ``a`` (rdf:type),
``?var``/``$var``, plain/numeric literals, object lists (``,``),
predicate-object lists (``;``), the path operators the BGP layer
evaluates (``^iri``, ``alt|alt``, trailing ``+``/``*``/``?`` — the
last two with §18.4 ALP zero-length semantics, constant endpoints
seeding their own reflexive pair), and SequencePath
``p1/p2/...`` — desugared here to fresh-variable chains (the §18.2.2.4
translation; intermediates are dropped from SELECT solutions without
collapsing the multiset). Mixing ``|`` with ``/`` in one path raises
(needs parentheses, which are not offered). FILTER expressions
translate to Spark SQL over the variable columns: comparisons,
``&&/||/!``, ``IN``, ``REGEX(?v, "re")``, ``BOUND(?v)``, term accessors
(LANG/DATATYPE/isIRI/isURI/isLiteral/isBlank/LANGMATCHES/sameTerm —
compiled against hidden term-metadata columns, see operators/bgp.py
``meta_vars``), and the string/numeric builtins in ``_FN_SQL``
(STR/STRLEN/CONTAINS/STRSTARTS/STRENDS/UCASE/LCASE/SUBSTR/CONCAT/
REPLACE/COALESCE/ABS/CEIL/FLOOR/ROUND/IF/IRI/URI/MD5/SHA1/SHA256/
SHA384/SHA512/STRBEFORE/STRAFTER). ``BIND(expr AS ?v)`` and scalar
``SELECT (expr AS ?v)`` projections extend solutions AFTER the group's
joins (usable in FILTER/SELECT/ORDER, not in triple patterns —
enforced).
Subqueries ``{ SELECT ... }`` are supported in SELECT groups: the
inner SELECT is evaluated independently (its own aggregates/modifiers)
and joined onto the outer solution on its projected shared variables
(§18.2.2.7 then Join). Typed/lang-tagged literals (``"x"^^xsd:int``,
``"x"@en``) are matched as SPARQL TERM equality against the store's
(obj, obj_datatype, lang) columns — exact datatype, case-insensitive
language tag, RDF 1.1 simple-literal ≡ xsd:string — in object
position only (see ``operators/bgp._typed_literal_cond``). Blank
nodes (``_:label``, ``[]``, ``[ p o ; ... ]``) desugar to hidden
non-projectable variables per §4.1.4, the property-list form emitting
its patterns into the enclosing block (one documented divergence:
``_:label`` scopes query-wide, not per-group). Property functions
raise ``SparqlError``.

UNION branches: the operator layer models UNION as alternate groups
against the required group, so ``C . {A} UNION {B}`` distributes the
surrounding patterns into each branch (§18.2 Join-over-Union
equivalence) — the parser does this mechanically.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDF_LANGSTRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"

# Hidden-variable prefix for SequencePath desugaring (`a/b` → fresh
# intermediate variables). operators/sparql.py drops these columns from
# SELECT solutions after the joins; user variables may not use it.
SEQ_VAR_PREFIX = "_pp"


class SparqlError(ValueError):
    """Unsupported or malformed SPARQL — always named, never guessed."""


_TOKEN = re.compile(r"""
      (?P<IRI><[^<>\s]*>)
    | (?P<VAR>[?$][A-Za-z_][A-Za-z0-9_]*)
    | (?P<STRING>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
    | (?P<NUM>[+-]?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
    | (?P<PNAME>[A-Za-z_][A-Za-z0-9_\-]*:[A-Za-z0-9_\-.%]*)
    | (?P<KW>[A-Za-z_][A-Za-z0-9_]*)
    | (?P<PUNCT>\^\^|&&|\|\||!=|<=|>=|[{}()\[\].;,|^+*?=<>!:@/-])
    | (?P<COMMENT>\#[^\n]*)
    | (?P<WS>\s+)
""", re.VERBOSE)


def _tokenize(text: str) -> list[str]:
    out, i = [], 0
    while i < len(text):
        m = _TOKEN.match(text, i)
        if not m:
            raise SparqlError(f"sparql: cannot tokenize at ...{text[i:i+24]!r}")
        i = m.end()
        if m.lastgroup in ("WS", "COMMENT"):
            continue
        out.append(m.group())
    return out


@dataclass
class _Group:
    """Parsed group graph pattern, mirroring match_bgp's keyword surface.

    ``union_branches`` holds the branches of the group's ONE UNION block
    (plain conjunctions); at evaluation the group's other patterns are
    distributed into every branch (§18.2 Join-over-Union), so patterns
    before or after the block behave identically."""
    patterns: list[tuple] = field(default_factory=list)
    optional: list[list[tuple]] = field(default_factory=list)
    union_branches: list[list[tuple]] = field(default_factory=list)
    minus: list[list[tuple]] = field(default_factory=list)
    exists: list[list[tuple]] = field(default_factory=list)
    not_exists: list[list[tuple]] = field(default_factory=list)
    values: dict[str, list[str]] = field(default_factory=dict)
    # VALUES (?a ?b) { (x y) (z UNDEF) } — (vars, rows), None = UNDEF
    values_rows: tuple[list[str], list[tuple]] | None = None
    filters: list[str] = field(default_factory=list)
    # BIND(expr AS ?v): applied AFTER the group's joins (documented
    # divergence: the bound variable is usable in FILTER/SELECT/ORDER,
    # not in subsequent triple patterns — the parser enforces it)
    binds: list[tuple[str, str]] = field(default_factory=list)
    # { SELECT ... } subqueries: parsed SELECT specs, evaluated
    # independently and joined on their shared variables (§18.2.2.7)
    subqueries: list[dict] = field(default_factory=list)
    # variables whose FILTER/BIND expressions use a term accessor
    # (LANG/DATATYPE/isIRI/isLiteral/isBlank): the BGP layer projects
    # hidden `var$lang`/`var$dt`/`var$kind` columns from the pattern
    # that binds the variable in object position
    meta_vars: set[str] = field(default_factory=set)

    def bgp_kwargs(self) -> tuple[list[tuple], dict]:
        """(required patterns, match_bgp keyword dict) with the UNION
        distribution applied. A branch/group item may be a dict
        ``{"patterns", "filter_expr"}`` (group-internal FILTER); the
        required slot must be filter-free because the top-level
        filter_expr applies AFTER the union, so the first unfiltered
        branch is folded in and the rest ride the union keyword (their
        filters apply inside the branch, per §18.2)."""
        pats = list(self.patterns)
        union_kw: list = []
        if self.union_branches:
            unfiltered = [i for i, b in enumerate(self.union_branches)
                          if not isinstance(b, dict)]
            if not unfiltered:
                raise SparqlError(
                    "sparql: every UNION branch carries its own FILTER — "
                    "at least one branch must be filter-free (restructure "
                    "or lift one filter out of its branch)")
            k = unfiltered[0]
            pats = pats + self.union_branches[k]
            for i, b in enumerate(self.union_branches):
                if i == k:
                    continue
                if isinstance(b, dict):
                    union_kw.append({**b, "patterns":
                                     self.patterns + b["patterns"]})
                else:
                    union_kw.append(self.patterns + b)
        kw: dict = {}
        if self.optional:
            kw["optional"] = self.optional
        if union_kw:
            kw["union"] = union_kw
        if self.minus:
            kw["minus"] = self.minus
        if self.exists:
            kw["exists"] = self.exists
        if self.not_exists:
            kw["not_exists"] = self.not_exists
        if self.meta_vars:
            kw["meta_vars"] = set(self.meta_vars)
        if self.values:
            kw["values"] = self.values
        if self.values_rows is not None:
            kw["values_rows"] = self.values_rows
        if self.filters:
            kw["filter_expr"] = " AND ".join(f"({f})" for f in self.filters)
        return pats, kw


class _Parser:
    def __init__(self, text: str):
        self.toks = _tokenize(text)
        self.pos = 0
        self.prefixes: dict[str, str] = {}
        self._seq_n = 0  # fresh-variable counter for SequencePath desugar
        # blank nodes desugar to hidden variables (SPARQL §4.1.4: a query
        # bnode is a non-projectable variable): _:label → one stable
        # hidden var query-wide (divergence: the spec scopes labels per
        # group and forbids reuse across groups; we share, which only
        # ever CONNECTS patterns the spec would reject), [] / [ p o ]
        # → a fresh hidden var per occurrence
        self._bn_labels: dict[str, str] = {}
        self._bn_anon = 0
        # (group, graph_term) while inside a triples block — the context
        # a [ p o ] property list emits its patterns into
        self._cur: tuple | None = None
        # meta_vars set of the group whose FILTER/BIND is being parsed —
        # term accessors (LANG/DATATYPE/is*) register their variable here
        self._meta_sink: set | None = None
        # the aggs dict while a HAVING expression is being parsed — bare
        # aggregate calls there (HAVING (COUNT(*) > 1)) register hidden
        # aggregates the evaluator drops after the filter
        self._agg_sink: dict | None = None
        self._agg_n = 0

    # -- token plumbing ----------------------------------------------------
    def peek(self, k: int = 0) -> str | None:
        return self.toks[self.pos + k] if self.pos + k < len(self.toks) else None

    def next(self) -> str:
        if self.pos >= len(self.toks):
            raise SparqlError("sparql: unexpected end of query")
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def eat(self, tok: str) -> None:
        t = self.next()
        if t.upper() != tok.upper():
            raise SparqlError(f"sparql: expected {tok!r}, got {t!r}")

    def at_kw(self, *kws: str) -> bool:
        t = self.peek()
        return t is not None and t.upper() in kws

    # -- terms ---------------------------------------------------------------
    def _expand(self, pname: str) -> str:
        pfx, _, local = pname.partition(":")
        if pfx not in self.prefixes:
            raise SparqlError(f"sparql: undeclared prefix {pfx!r}:")
        return self.prefixes[pfx] + local

    def term(self, *, as_predicate: bool = False) -> str:
        t = self.next()
        if t.startswith("<") and t.endswith(">"):
            return t[1:-1]
        if t[0] in "?$":
            if t[1:].startswith(SEQ_VAR_PREFIX):
                raise SparqlError(
                    f"sparql: variable names starting with "
                    f"{SEQ_VAR_PREFIX!r} are reserved for sequence-path "
                    "desugaring")
            return "?" + t[1:]
        if t == "a":
            return RDF_TYPE
        if t[0] in "\"'":
            lit = _unquote(t)
            if self.peek() == "^^":
                self.next()
                d = self.next()
                if d.startswith("<") and d.endswith(">"):
                    dt = d[1:-1]
                elif ":" in d:
                    dt = self._expand(d)
                else:
                    raise SparqlError(f"sparql: bad datatype {d!r}")
                # typed-literal object term: matched against the store's
                # (obj, obj_datatype) pair — SPARQL BGP term equality, not
                # value equality (FILTER = does values)
                return ("lit", lit, dt, None)
            if self.peek() == "@":
                self.next()
                tag = self.next()
                while self.peek() == "-":   # en-US and friends
                    self.next()
                    tag += "-" + self.next()
                return ("lit", lit, None, tag)
            return lit
        if re.fullmatch(r"[+-]?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?", t):
            return t
        if t == "^":
            if as_predicate:
                return "^" + self.term(as_predicate=True)
            raise SparqlError("sparql: ^ outside predicate position")
        if t.startswith("_:"):
            v = self._bn_labels.get(t)
            if v is None:
                v = f"?{SEQ_VAR_PREFIX}bn{len(self._bn_labels)}"
                self._bn_labels[t] = v
            return v
        if ":" in t:
            return self._expand(t)
        if t == "[":
            return self._bnode_prop_list()
        raise SparqlError(f"sparql: unexpected term {t!r}")

    def _bnode_prop_list(self) -> str:
        """``[]`` / ``[ p1 o1 ; p2 o2 ]`` → fresh hidden variable; the
        inner predicate-object list emits patterns into the enclosing
        triples block (SPARQL §4.1.4 — a query blank node is just a
        variable that cannot be projected)."""
        if self._cur is None:
            raise SparqlError(
                "sparql: a blank-node property list is only supported "
                "inside triple patterns")
        g, graph_term = self._cur
        v = f"?{SEQ_VAR_PREFIX}bna{self._bn_anon}"
        self._bn_anon += 1
        if self.peek() == "]":
            self.next()
            return v
        while True:
            pred = self.predicate()
            while True:
                o = self.term()
                g.patterns.append(
                    (v, pred, o) if graph_term is None
                    else (v, pred, o, graph_term))
                if self.peek() == ",":
                    self.next()
                    continue
                break
            if self.peek() == ";":
                self.next()
                if self.peek() == "]":
                    break
                continue
            break
        self.eat("]")
        return v

    def predicate(self) -> str:
        """Predicate position: IRI/pname/a with the BGP path operators."""
        return self.predicate_ex()[0]

    def predicate_ex(self) -> tuple[str, bool]:
        """(path string, came-from-parentheses) — the flag lets a
        sequence accept an alternation SEGMENT when the user wrote the
        unambiguous ``(a|b)/c`` form while still rejecting the
        precedence-ambiguous bare ``a|b/c``."""
        if self.peek() == "(":
            # parenthesized alternation (a|^b|...) with an optional
            # trailing operator — the standard SPARQL spelling of what
            # the bare a|b+ grammar also accepts (the + still closes the
            # whole union either way)
            self.next()
            atoms = [self.term(as_predicate=True)]
            while self.peek() == "|":
                self.next()
                atoms.append(self.term(as_predicate=True))
            self.eat(")")
            for a in atoms:
                if isinstance(a, tuple) or a.startswith("?"):
                    raise SparqlError("sparql: a parenthesized path takes "
                                      "IRIs (optionally ^-inverted)")
            p = "|".join(atoms)
            if self.peek() in ("+", "*", "?"):
                p += self.next()
                if self.peek() in ("|", "+", "*", "?"):
                    raise SparqlError(
                        "sparql: only a single trailing operator is "
                        "supported after a parenthesized path")
            return p, True
        if self.peek() == "!":
            # negated property set !iri / !(iri|^iri|...) (§9.1 PathNegated)
            self.next()
            if self.peek() == "(":
                self.next()
                atoms = [self.term(as_predicate=True)]
                while self.peek() == "|":
                    self.next()
                    atoms.append(self.term(as_predicate=True))
                self.eat(")")
            else:
                atoms = [self.term(as_predicate=True)]
            for a in atoms:
                if isinstance(a, tuple) or a.startswith("?"):
                    raise SparqlError("sparql: a negated property set "
                                      "takes IRIs (optionally ^-inverted)")
            p = "!" + "|".join(atoms)
            if self.peek() in ("+", "*", "?"):
                p += self.next()
                if self.peek() in ("|", "+", "*", "?"):
                    raise SparqlError(
                        "sparql: only a single trailing operator is "
                        "supported after a negated property set")
            return p, False
        p = self.term(as_predicate=True)
        if isinstance(p, tuple):
            raise SparqlError("sparql: literal in predicate position")
        while self.peek() in ("|", "+", "*", "?"):
            if p.startswith("?"):
                raise SparqlError("sparql: path operator on a variable "
                                  "predicate")
            op = self.next()
            if op in ("+", "*", "?"):
                p += op
                if self.peek() in ("|", "+", "*", "?"):
                    raise SparqlError(
                        f"sparql: only a single trailing {op} is "
                        "supported (closes the whole alternation, see "
                        "operators/bgp.py)")
                return p, False
            nxt = self.term(as_predicate=True)
            p += "|" + nxt
        return p, False

    # -- groups ----------------------------------------------------------------
    def group(self, graph_term: str | None = None) -> _Group:
        self.eat("{")
        g = _Group()
        while True:
            t = self.peek()
            if t is None:
                raise SparqlError("sparql: unterminated group (missing })")
            if t == "}":
                self.next()
                return g
            if t == "{":
                if (self.peek(1) or "").upper() == "SELECT":
                    # { SELECT ... } subquery (§18.2.2.7): only its
                    # projected variables are visible outside
                    self.next()
                    if graph_term is not None:
                        raise SparqlError(
                            "sparql: a subquery inside GRAPH is not "
                            "supported (scope the GRAPH inside it)")
                    g.subqueries.append(_parse_select(self, subquery=True))
                    self.eat("}")
                    continue
                # { A } UNION { B } [UNION { C }]*
                first = self.group(graph_term)
                branches = [first]
                while self.at_kw("UNION"):
                    self.next()
                    branches.append(self.group(graph_term))
                if len(branches) == 1:
                    self._merge(g, first)
                else:
                    if g.union_branches:
                        raise SparqlError(
                            "sparql: one UNION block per group (nest a "
                            "second one in its own subgroup)")
                    g.union_branches = [self._group_item(b, "UNION")
                                        for b in branches]
                continue
            if self.at_kw("OPTIONAL"):
                self.next()
                sub = self.group(graph_term)
                g.optional.append(self._group_item(sub, "OPTIONAL"))
                continue
            if self.at_kw("MINUS"):
                self.next()
                g.minus.append(self._group_item(self.group(graph_term),
                                                "MINUS"))
                continue
            if self.at_kw("GRAPH"):
                self.next()
                gterm = self.term()
                if isinstance(gterm, tuple):
                    raise SparqlError("sparql: literal as GRAPH term")
                sub = self.group(gterm)
                self._merge(g, sub)
                continue
            if self.at_kw("VALUES"):
                self.next()
                if self.peek() == "(":
                    self._values_rows(g)
                    continue
                var = self.next()
                if var[0] not in "?$":
                    raise SparqlError("sparql: VALUES needs a variable "
                                      "or a parenthesized variable list")
                self.eat("{")
                vals = []
                while self.peek() != "}":
                    v = self.term()
                    if isinstance(v, tuple) or v.startswith("?"):
                        raise SparqlError(
                            "sparql: VALUES data must be plain constants "
                            "(typed/lang-tagged literals and blank nodes "
                            "are not supported)")
                    vals.append(v)
                self.next()
                g.values[var[1:]] = vals
                continue
            if self.at_kw("FILTER"):
                self.next()
                self._filter(g)
                continue
            if self.at_kw("BIND"):
                self.next()
                prev_sink = self._meta_sink
                self._meta_sink = g.meta_vars
                try:
                    sql = self._expr_parens(stop_at_as=True)
                finally:
                    self._meta_sink = prev_sink
                v = self.next()
                if v[0] not in "?$":
                    raise SparqlError("sparql: BIND needs 'AS ?var'")
                self.eat(")")
                g.binds.append((v[1:], sql))
                continue
            self._triples(g, graph_term)
        # unreachable

    def _plain(self, sub: _Group, kind: str) -> list[tuple]:
        if (sub.optional or sub.union_branches or sub.minus or sub.exists or
                sub.not_exists or sub.values or sub.values_rows or
                sub.filters or sub.binds or sub.subqueries):
            raise SparqlError(
                f"sparql: {kind} groups must be plain conjunctions here "
                "(compose richer groups as two queries)")
        return sub.patterns

    def _group_item(self, sub: _Group, kind: str):
        """Sub-group item for OPTIONAL/UNION/MINUS/EXISTS: triples plus
        optionally the group's OWN FILTERs (§18.2 — evaluated inside the
        group, e.g. ``OPTIONAL { ?x p ?v FILTER(?v > 3) }``); anything
        richer still raises."""
        if sub.binds:
            raise SparqlError(
                f"sparql: BIND inside a {kind} group is not supported "
                "(bind in the outer group)")
        if (sub.optional or sub.union_branches or sub.minus or
                sub.exists or sub.not_exists or sub.values or
                sub.values_rows or sub.subqueries or sub.meta_vars):
            raise SparqlError(
                f"sparql: {kind} groups support only triple patterns "
                "plus FILTER here (compose richer groups as two queries; "
                "term accessors belong in the outer group's FILTER)")
        if sub.filters:
            return {"patterns": sub.patterns, "filter_expr":
                    " AND ".join(f"({f})" for f in sub.filters)}
        return sub.patterns

    def _merge(self, g: _Group, sub: _Group) -> None:
        g.patterns.extend(sub.patterns)
        g.optional.extend(sub.optional)
        if sub.union_branches:
            if g.union_branches:
                raise SparqlError("sparql: one UNION block per group")
            g.union_branches = sub.union_branches
        g.minus.extend(sub.minus)
        g.exists.extend(sub.exists)
        g.not_exists.extend(sub.not_exists)
        for k, v in sub.values.items():
            g.values[k] = v
        g.filters.extend(sub.filters)
        g.binds.extend(sub.binds)
        g.subqueries.extend(sub.subqueries)
        g.meta_vars |= sub.meta_vars

    def _triples(self, g: _Group, graph_term: str | None) -> None:
        prev = self._cur
        self._cur = (g, graph_term)
        try:
            self._triples_body(g, graph_term)
        finally:
            self._cur = prev

    def _triples_body(self, g: _Group, graph_term: str | None) -> None:
        s = self.term()
        if isinstance(s, tuple):
            raise SparqlError("sparql: literal in subject position")
        while True:
            seg0, par0 = self.predicate_ex()
            segs, pars = [seg0], [par0]
            while self.peek() == "/":
                # SequencePath p1/p2/... — desugared below per SPARQL 1.1
                # §18.2.2.4: X (P/Q) Y ≡ X P ?fresh . ?fresh Q Y (fresh
                # per object term, so object lists don't share the hop)
                self.next()
                s_i, p_i = self.predicate_ex()
                segs.append(s_i)
                pars.append(p_i)
            if len(segs) > 1 and any(
                    "|" in x and not par and not x.startswith("!")
                    for x, par in zip(segs, pars)):
                raise SparqlError(
                    "sparql: a bare alternation inside a sequence path is "
                    "precedence-ambiguous (SPARQL binds '/' tighter than "
                    "'|') — parenthesize the alternation: (a|b)/c")
            while True:
                o = self.term()
                subj = s
                for seg in segs[:-1]:
                    mid = f"?{SEQ_VAR_PREFIX}{self._seq_n}"
                    self._seq_n += 1
                    g.patterns.append(
                        (subj, seg, mid) if graph_term is None
                        else (subj, seg, mid, graph_term))
                    subj = mid
                pat = ((subj, segs[-1], o) if graph_term is None
                       else (subj, segs[-1], o, graph_term))
                g.patterns.append(pat)
                if self.peek() == ",":
                    self.next()
                    continue
                break
            if self.peek() == ";":
                self.next()
                if self.peek() in (".", "}", ";", None):
                    pass
                else:
                    continue
            break
        if self.peek() == ".":
            self.next()

    def _values_rows(self, g: _Group) -> None:
        """Multi-variable inline data: VALUES (?a ?b) { (x y) (z UNDEF) }.
        Stored as (vars, rows) with None for UNDEF; one block per group
        (SPARQL allows several — compose as separate groups)."""
        if g.values_rows is not None:
            raise SparqlError("sparql: one multi-variable VALUES block "
                              "per group")
        self.eat("(")
        vrs: list[str] = []
        while self.peek() != ")":
            v = self.next()
            if v[0] not in "?$":
                raise SparqlError(f"sparql: VALUES variable list got {v!r}")
            vrs.append(v[1:])
        self.next()
        if not vrs:
            raise SparqlError("sparql: empty VALUES variable list")
        self.eat("{")
        rows: list[tuple] = []
        while self.peek() != "}":
            self.eat("(")
            row: list[str | None] = []
            while self.peek() != ")":
                if self.at_kw("UNDEF"):
                    self.next()
                    row.append(None)
                else:
                    v = self.term()
                    if isinstance(v, tuple) or v.startswith("?"):
                        raise SparqlError(
                            "sparql: VALUES data must be plain constants "
                            "(typed/lang-tagged literals and blank nodes "
                            "are not supported)")
                    row.append(v)
            self.next()
            if len(row) != len(vrs):
                raise SparqlError(
                    f"sparql: VALUES row has {len(row)} terms for "
                    f"{len(vrs)} variables")
            rows.append(tuple(row))
        self.next()
        if not rows:
            raise SparqlError("sparql: empty VALUES data block")
        g.values_rows = (vrs, rows)

    # -- FILTER ------------------------------------------------------------------
    def _filter(self, g: _Group) -> None:
        prev_sink = self._meta_sink
        self._meta_sink = g.meta_vars
        try:
            self._filter_body(g)
        finally:
            self._meta_sink = prev_sink

    def _filter_body(self, g: _Group) -> None:
        if self.at_kw("EXISTS"):
            self.next()
            g.exists.append(self._group_item(self.group(), "EXISTS"))
            return
        if self.at_kw("NOT"):
            self.next()
            self.eat("EXISTS")
            g.not_exists.append(self._group_item(self.group(),
                                                 "NOT EXISTS"))
            return
        if self.at_kw(*self._FN_SQL):
            # bare builtin call: FILTER REGEX(?l, "re") — legal per the
            # Constraint production (no bracketting required)
            g.filters.append(self._call_sql(self.next().upper()))
            return
        g.filters.append(self._expr_parens())

    # SPARQL builtin → Spark SQL function (None = custom translation in
    # _call_sql).  Only 1:1 semantic matches are listed: terms here are
    # lexical strings, so STR is a string cast, SUBSTR shares SQL's
    # 1-based indexing (§17.4.3.3), and REPLACE is regex-based in both
    # languages.  Term accessors (LANG/DATATYPE/isIRI/isURI/isLiteral/
    # isBlank, §17.4.1–2) compile to the hidden `var$lang`/`$dt`/`$kind`
    # columns the BGP layer projects for ``meta_vars`` — a type error
    # (LANG of an IRI) becomes NULL, so the solution drops, matching the
    # spec's error-eliminates-solution rule.
    _TERM_ACCESSORS = ("LANG", "DATATYPE", "ISIRI", "ISURI",
                       "ISLITERAL", "ISBLANK")
    _FN_SQL = {"LANG": None, "DATATYPE": None, "ISIRI": None,
               "ISURI": None, "ISLITERAL": None, "ISBLANK": None,
               "LANGMATCHES": None,
               "SAMETERM": None,
               # IRI/URI are identity here: the engine's term values ARE
               # lexical strings, so constructing an IRI from a string is
               # a cast (STR is the same mapping in reverse)
               "IRI": "string", "URI": "string",
               "MD5": "md5", "SHA1": "sha1",
               "SHA256": None, "SHA384": None, "SHA512": None,
               "STRBEFORE": None, "STRAFTER": None,
               "REGEX": None, "BOUND": None, "STRLEN": "length",
               "CONTAINS": "contains", "STRSTARTS": "startswith",
               "STRENDS": "endswith", "STR": "string",
               "UCASE": "upper", "LCASE": "lower",
               "SUBSTR": "substring", "CONCAT": "concat",
               "REPLACE": "regexp_replace", "COALESCE": "coalesce",
               "ABS": "abs", "CEIL": "ceiling", "FLOOR": "floor",
               "ROUND": "round", "IF": "if"}

    def _call_sql(self, fn: str) -> str:
        """SQL for one builtin call, fn token already consumed."""
        if fn == "LANGMATCHES":
            # §17.4.3.2 basic language ranges: "*" = any tagged literal,
            # otherwise case-insensitive exact tag or prefix-with-"-"
            # (so "en" matches "en" and "en-US" but not "enx")
            self.eat("(")
            t = self.next()
            if t.upper() != "LANG":
                raise SparqlError(
                    'sparql: LANGMATCHES supports the form '
                    'LANGMATCHES(LANG(?v), "range")')
            lang_sql = self._call_sql("LANG")
            self.eat(",")
            rng = _unquote(self.next()).lower()
            self.eat(")")
            if rng == "*":
                return f"(coalesce({lang_sql}, '') <> '')"
            rng_lit = _sql_str(rng)
            rng_dash = _sql_str(rng + "-")
            return (f"(lower({lang_sql}) = {rng_lit} OR "
                    f"startswith(lower({lang_sql}), {rng_dash}))")
        if fn in self._TERM_ACCESSORS:
            self.eat("(")
            v = self.next()
            if v[0] not in "?$":
                raise SparqlError(f"sparql: {fn} needs a variable")
            self.eat(")")
            if self._meta_sink is None:
                raise SparqlError(
                    f"sparql: {fn} is supported in group FILTER/BIND "
                    "expressions only (not HAVING/aggregates — the term "
                    "metadata is gone after grouping)")
            name = v[1:]
            self._meta_sink.add(name)
            kind = f"coalesce(`{name}$kind`, 'literal')"
            if fn == "LANG":
                return (f"(CASE WHEN {kind} <> 'literal' THEN NULL "
                        f"ELSE coalesce(`{name}$lang`, '') END)")
            if fn == "DATATYPE":
                return (f"(CASE WHEN {kind} <> 'literal' THEN NULL "
                        f"WHEN `{name}$lang` IS NOT NULL "
                        f"THEN '{RDF_LANGSTRING}' "
                        f"ELSE coalesce(`{name}$dt`, '{XSD_STRING}') END)")
            target = {"ISIRI": "iri", "ISURI": "iri",
                      "ISLITERAL": "literal", "ISBLANK": "bnode"}[fn]
            return f"({kind} = '{target}')"
        if fn == "SAMETERM":
            # §17.4.1.8 term identity: lexical form + datatype + language
            # tag + kind must all agree (plain `=` compares lexical forms
            # only); both arguments register as meta variables
            self.eat("(")
            a = self.next()
            self.eat(",")
            b = self.next()
            self.eat(")")
            if a[0] not in "?$" or b[0] not in "?$":
                raise SparqlError("sparql: sameTerm needs two variables")
            if self._meta_sink is None:
                raise SparqlError(
                    "sparql: sameTerm is supported in group FILTER/BIND "
                    "expressions only")
            na, nb = a[1:], b[1:]
            self._meta_sink.update((na, nb))
            return (f"(`{na}` = `{nb}` AND "
                    f"coalesce(`{na}$dt`, '') = coalesce(`{nb}$dt`, '') AND "
                    f"coalesce(lower(`{na}$lang`), '') = "
                    f"coalesce(lower(`{nb}$lang`), '') AND "
                    f"coalesce(`{na}$kind`, 'literal') = "
                    f"coalesce(`{nb}$kind`, 'literal'))")
        if fn in ("SHA256", "SHA384", "SHA512"):
            # Spark spells the SHA-2 family as sha2(expr, bits)
            inner = self._expr_parens()
            return f"sha2 ( {inner} , {fn[3:]} )"
        if fn in ("STRBEFORE", "STRAFTER"):
            # §17.4.3.7/8 on the lexical forms; '' when no occurrence
            self.eat("(")
            v = self.next()
            if v[0] not in "?$":
                raise SparqlError(f"sparql: {fn} needs (?var, \"lit\")")
            self.eat(",")
            lit = self.next()
            if lit[0] not in "\"'":
                raise SparqlError(f"sparql: {fn} needs (?var, \"lit\")")
            self.eat(")")
            col = f"`{v[1:]}`"
            s = _sql_str(_unquote(lit))
            if fn == "STRBEFORE":
                return (f"(CASE WHEN instr({col}, {s}) > 0 THEN "
                        f"substring({col}, 1, instr({col}, {s}) - 1) "
                        "ELSE '' END)")
            return (f"(CASE WHEN instr({col}, {s}) > 0 THEN "
                    f"substring({col}, instr({col}, {s}) + length({s})) "
                    "ELSE '' END)")
        if fn == "REGEX":
            self.eat("(")
            v = self.next()
            if v[0] not in "?$":
                raise SparqlError("sparql: REGEX needs a variable")
            self.eat(",")
            pat = self.next()
            self.eat(")")
            return f"`{v[1:]}` RLIKE {_sql_str(_unquote(pat))}"
        if fn == "BOUND":
            self.eat("(")
            v = self.next()
            self.eat(")")
            return f"`{v[1:]}` IS NOT NULL"
        # two-argument string predicates / one-arg length: reuse the
        # generic expression walker from the opening paren
        return self._FN_SQL[fn] + " " + self._expr_with_parens()

    def _agg_ref(self, fn: str) -> str:
        """A bare aggregate call inside HAVING: register it as a HIDDEN
        aggregate (reusing a same-spec user alias when one exists) and
        reference its output column. The evaluator drops hidden columns
        after the HAVING filter runs."""
        self.eat("(")
        distinct = False
        if self.at_kw("DISTINCT"):
            self.next()
            distinct = True
        arg = self.next()
        if arg == "*":
            var = "*"
        elif arg[0] in "?$":
            var = arg[1:]
        else:
            raise SparqlError(f"sparql: aggregate over {arg!r}")
        self.eat(")")
        spec = (fn + ("_DISTINCT" if distinct else ""), var)
        for name, existing in self._agg_sink.items():
            if existing == spec:
                return f"`{name}`"
        name = f"{SEQ_VAR_PREFIX}h{self._agg_n}"
        self._agg_n += 1
        self._agg_sink[name] = spec
        return f"`{name}`"

    def _expr_with_parens(self) -> str:
        """Parse '( ... )' returning it WITH the parentheses."""
        return "( " + self._expr_parens() + " )"

    def _expr_parens(self, *, stop_at_as: bool = False) -> str:
        """Translate a parenthesized SPARQL expression to Spark SQL.
        ``stop_at_as=True`` returns at a depth-1 ``AS`` token (consumed)
        instead of the closing paren — the ``BIND(expr AS ?v)`` split."""
        self.eat("(")
        out, depth = [], 1
        while depth:
            t = self.next()
            if stop_at_as and depth == 1 and t.upper() == "AS":
                return " ".join(out)
            if t == "(":
                depth += 1
                out.append("(")
            elif t == ")":
                depth -= 1
                if depth:
                    out.append(")")
            elif t[0] in "?$":
                out.append(f"`{t[1:]}`")
            elif t == "&&":
                out.append("AND")
            elif t == "||":
                out.append("OR")
            elif t == "!=":
                out.append("<>")
            elif t == "!":
                out.append("NOT")
            elif t[0] in "\"'":
                out.append(_sql_str(_unquote(t)))
            elif (self._agg_sink is not None and
                  t.upper() in ("COUNT", "SUM", "MIN", "MAX", "AVG",
                                "SAMPLE", "GROUP_CONCAT")):
                out.append(self._agg_ref(t.upper()))
            elif (t.upper() in ("REGEX", "BOUND", "LANGMATCHES", "SHA256",
                                "SHA384", "SHA512", "STRBEFORE",
                                "STRAFTER", "SAMETERM")
                  + self._TERM_ACCESSORS):
                out.append(self._call_sql(t.upper()))
            elif t.upper() in self._FN_SQL:
                out.append(self._FN_SQL[t.upper()])
            elif t.upper() == "IN":
                out.append("IN")
            elif t.upper() in ("TRUE", "FALSE"):
                out.append(t.upper())
            elif t == "," or t in ("=", "<", ">", "<=", ">=",
                                   "+", "-", "*", "/"):
                out.append(t)
            elif re.fullmatch(r"[+-]?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?", t):
                out.append(t)
            elif t.startswith("<") and t.endswith(">"):
                out.append("'" + t[1:-1] + "'")
            elif ":" in t:
                out.append("'" + self._expand(t) + "'")
            else:
                raise SparqlError(
                    f"sparql: unsupported token {t!r} in FILTER expression")
        return " ".join(out)

    # -- query forms --------------------------------------------------------------
    def prologue(self) -> None:
        while self.at_kw("PREFIX"):
            self.next()
            pname = self.next()
            if not pname.endswith(":"):
                if self.peek() == ":":
                    self.next()
                else:
                    raise SparqlError(f"sparql: bad PREFIX {pname!r}")
            iri = self.next()
            if not (iri.startswith("<") and iri.endswith(">")):
                raise SparqlError(f"sparql: PREFIX needs <iri>, got {iri!r}")
            self.prefixes[pname.rstrip(":")] = iri[1:-1]
        if self.at_kw("BASE"):
            raise SparqlError("sparql: BASE is not supported (use full IRIs)")


def _unquote(t: str) -> str:
    body = t[1:-1]
    return re.sub(r"\\(.)", lambda m: {"n": "\n", "t": "\t", '"': '"',
                                       "'": "'", "\\": "\\"}.get(
                                           m.group(1), m.group(1)), body)


def _sql_str(s: str) -> str:
    """Embed a Python string as a Spark SQL single-quoted literal.

    Backslashes MUST be escaped before quotes: Spark's default string
    parser treats backslash as an escape, so an unescaped ``\\d`` in a
    REGEX/FILTER literal was silently consumed (``^\\d+$`` compiled to
    regex ``^d+$`` — r5 ADVICE, high). Every literal-embedding site
    (REGEX, LANGMATCHES, STRBEFORE/STRAFTER, generic expression literals)
    routes through here.
    """
    return "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"


def parse(text: str) -> dict:
    """Parse SPARQL text → an execution spec dict (form + kwargs).

    Returns ``{"form": "select"|"ask"|"describe", ...}`` — see
    ``operators/sparql.sparql_query`` for the evaluator that binds it to
    a triples DataFrame. Split so tests can check the translation
    without a SparkSession.
    """
    p = _Parser(text)
    p.prologue()
    t = (p.peek() or "").upper()
    if t == "SELECT":
        spec = _parse_select(p)
        for v, _ in spec["group"].binds:
            if any("?" + v in pat for pat in spec["group"].patterns):
                raise SparqlError(
                    f"sparql: BIND variable ?{v} also appears in a triple "
                    "pattern — binds apply after the joins here, so a "
                    "pattern cannot consume them (use a fresh name)")
        return spec
    if t == "ASK":
        p.next()
        if p.at_kw("WHERE"):
            p.next()
        g = p.group()
        _no_binds(g, "ASK")
        _end(p)
        return {"form": "ask", "group": g}
    if t == "DESCRIBE":
        p.next()
        nodes, var = [], None
        while p.peek() is not None and not p.at_kw("WHERE") and p.peek() != "{":
            term = p.term()
            if isinstance(term, tuple):
                raise SparqlError("sparql: DESCRIBE takes IRIs or a "
                                  "variable, not literals")
            if term.startswith("?" + SEQ_VAR_PREFIX):
                raise SparqlError("sparql: DESCRIBE takes IRIs or a "
                                  "variable, not blank nodes")
            if term.startswith("?"):
                var = term
            else:
                nodes.append(term)
        group = None
        if p.peek() is not None:
            if p.at_kw("WHERE"):
                p.next()
            group = p.group()
        _end(p)
        if var is not None and group is None:
            raise SparqlError("sparql: DESCRIBE ?var needs a WHERE group")
        if var is not None and nodes:
            raise SparqlError("sparql: DESCRIBE mixes IRIs and a variable")
        if group is not None:
            _no_binds(group, "DESCRIBE")
        return {"form": "describe", "nodes": nodes, "var": var,
                "group": group}
    if t == "CONSTRUCT":
        p.next()
        tmpl_group = p.group()
        if (tmpl_group.optional or tmpl_group.union_branches or
                tmpl_group.minus or tmpl_group.exists or
                tmpl_group.not_exists or tmpl_group.values or
                tmpl_group.filters):
            raise SparqlError("sparql: CONSTRUCT template must be plain "
                              "triples")
        template = []
        for pat in tmpl_group.patterns:
            if len(pat) != 3:
                raise SparqlError("sparql: CONSTRUCT template takes no "
                                  "GRAPH terms")
            s, pr, o = pat
            if pr.startswith("^") or "|" in pr or (pr[-1:] in "+*?"
                                                   and len(pr) > 1):
                raise SparqlError("sparql: CONSTRUCT template takes no "
                                  "path expressions")
            if isinstance(o, tuple):
                raise SparqlError("sparql: CONSTRUCT template takes no "
                                  "typed/lang-tagged literals (the emitted "
                                  "frame carries lexical forms)")
            if any(isinstance(x, str) and x.startswith("?" + SEQ_VAR_PREFIX)
                   for x in pat):
                raise SparqlError(
                    "sparql: blank nodes in a CONSTRUCT template are not "
                    "supported (the spec mints fresh bnodes per solution, "
                    "which no oracle can reproduce); BIND an IRI instead")
            template.append(pat)
        if not template:
            raise SparqlError("sparql: empty CONSTRUCT template")
        if p.at_kw("WHERE"):
            p.next()
        g = p.group()
        _no_binds(g, "CONSTRUCT")
        limit = None
        if p.at_kw("LIMIT"):
            p.next()
            limit = int(p.next())
        _end(p)
        return {"form": "construct", "template": template, "group": g,
                "limit": limit}
    raise SparqlError(f"sparql: expected SELECT/ASK/DESCRIBE/CONSTRUCT, "
                      f"got {t!r}")


def _parse_select(p: _Parser, *, subquery: bool = False) -> dict:
    p.next()
    distinct = False
    if p.at_kw("DISTINCT"):
        p.next()
        distinct = True
    elif p.at_kw("REDUCED"):
        p.next()  # REDUCED permits-but-does-not-require dedup; we dedup
        distinct = True
    select: list[str] | None = []
    aggs: dict[str, tuple[str, str]] = {}
    select_exprs: list[tuple[str, str]] = []
    group_by: list[str] = []
    having: str | None = None
    # scalar SELECT expressions may use term accessors; their meta vars
    # are pending until the WHERE group exists (save/restore nests
    # through subqueries)
    prev_pending = getattr(p, "_pending_meta", None)
    p._pending_meta = set()
    while True:
        t = p.peek()
        if t == "*":
            p.next()
            select = None
            continue
        if t is not None and t[0] in "?$":
            select.append(p.next()[1:])
            continue
        if t == "(":
            # ( AGG(?v) AS ?name ) — or a scalar projection
            # ( expr AS ?name ), §18.2.4.4 Extend after the group's joins
            fn = (p.peek(1) or "").upper()
            if (fn not in ("COUNT", "SUM", "MIN", "MAX", "AVG", "SAMPLE",
                           "GROUP_CONCAT") or p.peek(2) != "("):
                # scalar SELECT expression; term accessors inside register
                # pending meta vars merged into the group after it parses
                prev_sink = p._meta_sink
                p._meta_sink = p._pending_meta
                try:
                    sql = p._expr_parens(stop_at_as=True)
                finally:
                    p._meta_sink = prev_sink
                name = p.next()
                if name[0] not in "?$":
                    raise SparqlError("sparql: AS needs a variable")
                p.eat(")")
                select_exprs.append((name[1:], sql))
                select.append(name[1:])
                continue
            p.next()
            p.next()
            p.eat("(")
            agg_distinct = False
            if p.at_kw("DISTINCT"):
                # COUNT(DISTINCT ?v) / SUM(DISTINCT ?v) / ... — §18.5.1
                # applies Distinct to the aggregate's own multiset
                p.next()
                agg_distinct = True
            arg = p.next()
            if arg == "*":
                var = "*"
            elif arg[0] in "?$":
                var = arg[1:]
            else:
                raise SparqlError(f"sparql: aggregate over {arg!r}")
            p.eat(")")
            p.eat("AS")
            name = p.next()
            if name[0] not in "?$":
                raise SparqlError("sparql: AS needs a variable")
            p.eat(")")
            aggs[name[1:]] = (fn + "_DISTINCT" if agg_distinct else fn, var)
            continue
        break
    if select is not None and not select and not aggs:
        raise SparqlError("sparql: empty SELECT clause")
    if select_exprs and aggs:
        raise SparqlError(
            "sparql: scalar SELECT expressions cannot mix with "
            "aggregates in one projection (aggregate first, wrap in a "
            "subquery, and compute the expression outside)")
    if p.at_kw("WHERE"):
        p.next()
    g = p.group()
    g.meta_vars |= p._pending_meta
    p._pending_meta = prev_pending
    if p.at_kw("GROUP"):
        p.next()
        p.eat("BY")
        while p.peek() is not None and p.peek()[0] in "?$":
            group_by.append(p.next()[1:])
        if not group_by:
            raise SparqlError("sparql: GROUP BY needs variables")
    if p.at_kw("HAVING"):
        p.next()
        p._agg_sink = aggs
        try:
            having = p._expr_parens()
        finally:
            p._agg_sink = None
    order: list[tuple[str, bool]] = []
    if p.at_kw("ORDER"):
        p.next()
        p.eat("BY")
        while True:
            t = p.peek()
            if t is None:
                break
            if t.upper() in ("ASC", "DESC"):
                desc = p.next().upper() == "DESC"
                if (p.peek(1) or "")[0:1] in "?$" and p.peek(2) == ")":
                    p.eat("(")
                    v = p.next()
                    p.eat(")")
                    order.append((v[1:], desc))
                else:
                    # DESC(expr) — translated like a FILTER expression;
                    # marked with a leading NUL so the evaluator knows
                    # it is SQL over the projection, not a variable name
                    order.append(("\x00" + p._expr_parens(), desc))
            elif t[0] in "?$":
                order.append((p.next()[1:], False))
            elif t == "(" or t.upper() in p._FN_SQL:
                sql = (p._expr_parens() if t == "("
                       else p._call_sql(p.next().upper()))
                order.append(("\x00" + sql, False))
            else:
                break
        if not order:
            raise SparqlError("sparql: ORDER BY needs variables")
    limit = offset = None
    for kw in ("LIMIT", "OFFSET"):
        if p.at_kw(kw):
            p.next()
            n = p.next()
            if not n.isdigit():
                raise SparqlError(f"sparql: {kw} needs an integer")
            if kw == "LIMIT":
                limit = int(n)
            else:
                offset = int(n)
    # LIMIT may precede OFFSET or vice versa
    if p.at_kw("LIMIT") and limit is None:
        p.next()
        limit = int(p.next())
    if not subquery:
        _end(p)
    if aggs and select:
        extra = [v for v in select if v not in group_by]
        if extra:
            raise SparqlError(
                f"sparql: non-aggregated SELECT variables {extra} must "
                "appear in GROUP BY (§11.4)")
    return {"form": "select", "group": g, "select": select,
            "select_exprs": select_exprs,
            "distinct": distinct, "aggs": aggs, "group_by": group_by,
            "having": having, "order": order, "limit": limit,
            "offset": offset}


def _no_binds(g, form: str) -> None:
    if g.binds:
        raise SparqlError(f"sparql: BIND is supported in SELECT only, "
                          f"not {form}")
    if g.subqueries:
        raise SparqlError(f"sparql: subqueries are supported in SELECT "
                          f"only, not {form}")


def _end(p: _Parser) -> None:
    if p.peek() is not None:
        raise SparqlError(f"sparql: trailing tokens from {p.peek()!r}")
