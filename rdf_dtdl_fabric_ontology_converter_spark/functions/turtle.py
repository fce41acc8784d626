"""Pure-Python Turtle / N-Triples / N-Quads / TriG tokenizer.

Runs inside Arrow-batched pandas UDFs on executors (no rdflib — from-scratch
rule). Supports the grammar exercised by the reference corpus
(reference: tests/fixtures/ttl_fixtures.py, samples/rdf/*):

  @prefix / @base (and SPARQL-style PREFIX/BASE), IRIs, prefixed names,
  ``a`` keyword, predicate-object lists (``;``), object lists (``,``),
  blank-node property lists ``[ ... ]``, collections ``( ... )`` expanded to
  rdf:first / rdf:rest chains, labelled bnodes ``_:x``, literals (short and
  long quoted, escapes, ``@lang``, ``^^datatype``, bare numeric / boolean),
  comments, TriG ``GRAPH <g> { ... }`` / ``<g> { ... }`` blocks, and the
  N-Quads 4th term.

Each statement yields a tuple ``(subj, pred, obj, obj_kind, obj_datatype,
lang, graph_ctx)`` with ``obj_kind`` in {'iri','bnode','literal'}.  Blank
nodes are emitted as ``_:<label>`` and must be doc-qualified by the caller
before any cross-document union (SURVEY §7.4 risk 3).
"""

from __future__ import annotations

import re

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE = RDF_NS + "type"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"
XSD_NS = "http://www.w3.org/2001/XMLSchema#"
XSD_INTEGER = XSD_NS + "integer"
XSD_DECIMAL = XSD_NS + "decimal"
XSD_DOUBLE = XSD_NS + "double"
XSD_BOOLEAN = XSD_NS + "boolean"

_TOKEN_RE = re.compile(
    r"""
      (?P<COMMENT>\#[^\n]*)
    | (?P<LONG_STRING>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\"|'''(?:[^'\\]|\\.|'(?!''))*''')
    | (?P<STRING>"(?:[^"\\\n]|\\.)*"|'(?:[^'\\\n]|\\.)*')
    | (?P<IRI><[^<>"{}|^`\\\s]*>)
    | (?P<BNODE>_:[A-Za-z0-9_][A-Za-z0-9_.\-]*)
    | (?P<DIRECTIVE>@(?:prefix|base)\b)
    | (?P<LANGTAG>@[A-Za-z]+(?:-[A-Za-z0-9]+)*)
    | (?P<DOUBLE>[+-]?(?:\d+\.\d*|\.\d+|\d+)[eE][+-]?\d+)
    | (?P<DECIMAL>[+-]?\d*\.\d+)
    | (?P<INTEGER>[+-]?\d+)
    | (?P<HATHAT>\^\^)
    | (?P<OP>=>|<=|=)
    | (?P<VAR>\?[A-Za-z_][A-Za-z0-9_]*)
    | (?P<PUNCT>[;,.\[\]()\{\}])
    | (?P<PNAME>[A-Za-z0-9_][A-Za-z0-9_.\-]*)?:(?:[A-Za-z0-9_%\-.]*[A-Za-z0-9_%\-])?
    | (?P<KEYWORD>[A-Za-z][A-Za-z0-9_]*)
    """,
    re.VERBOSE,
)

_ESCAPES = {
    "t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}


def _unescape(s: str) -> str:
    if "\\" not in s:
        return s
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            e = s[i + 1]
            if e in _ESCAPES:
                out.append(_ESCAPES[e])
                i += 2
                continue
            if e == "u" and i + 6 <= n:
                out.append(chr(int(s[i + 2:i + 6], 16)))
                i += 6
                continue
            if e == "U" and i + 10 <= n:
                out.append(chr(int(s[i + 2:i + 10], 16)))
                i += 10
                continue
        out.append(c)
        i += 1
    return "".join(out)


class TurtleParseError(ValueError):
    pass


class _N3Formula(Exception):
    """Internal: an N3 formula/implication construct was hit mid-statement;
    the statement is rolled back and recorded as a skip, not a doc error."""

    def __init__(self, what: str, open_braces: int = 0):
        self.what = what
        self.open_braces = open_braces  # '{' already consumed when raised


OWL_SAME_AS = "http://www.w3.org/2002/07/owl#sameAs"


class _Tokens:
    __slots__ = ("toks", "pos")

    def __init__(self, text: str):
        toks = []
        append = toks.append
        for m in _TOKEN_RE.finditer(text):
            kind = m.lastgroup
            if kind == "COMMENT":
                continue
            if kind is None:
                # PNAME group has no name when optional groups empty; detect ':'
                val = m.group(0)
                if ":" in val:
                    kind = "PNAME"
                else:
                    continue
            append((kind, m.group(0)))
        # sentinels: peek/next never bounds-check in the hot loop
        toks.extend(((None, None),) * 4)
        self.toks = toks
        self.pos = 0

    def peek(self):
        return self.toks[self.pos]

    def next(self):
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def expect(self, value: str):
        kind, val = self.next()
        if val != value:
            raise TurtleParseError(f"expected {value!r}, got {val!r}")


class TurtleParser:
    """Recursive-descent statement parser over the token stream."""

    def __init__(self):
        self.prefixes: dict[str, str] = {}
        self.base = ""
        self._bnode_n = 0
        self.triples: list[tuple] = []
        # N3-only constructs skipped gracefully (one reason per statement);
        # the caller surfaces these as skipped_items rows, NOT doc errors
        self.skipped: list[str] = []
        # pname → IRI memo (vocab terms like owl:Class repeat constantly);
        # invalidated whenever a prefix is (re)declared
        self._pname_cache: dict[str, str] = {}

    # -- terms ------------------------------------------------------------

    def _new_bnode(self) -> str:
        self._bnode_n += 1
        return f"_:gen{self._bnode_n}"

    def _resolve_iri(self, raw: str) -> str:
        iri = _unescape(raw[1:-1])
        if self.base and not re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*:", iri):
            return self.base + iri
        return iri

    def _resolve_pname(self, raw: str) -> str:
        hit = self._pname_cache.get(raw)
        if hit is not None:
            return hit
        pfx, _, local = raw.partition(":")
        ns = self.prefixes.get(pfx)
        if ns is None:
            raise TurtleParseError(f"undefined prefix {pfx!r}:")
        if "\\" in local:
            local = local.replace("\\", "")
        out = ns + local
        self._pname_cache[raw] = out
        return out

    def _parse_term(self, tk, tv, *, as_subject: bool):
        """Return (value, kind, datatype, lang); may consume more tokens."""
        if tk == "IRI":
            return self._resolve_iri(tv), "iri", None, None
        if tk == "PNAME":
            return self._resolve_pname(tv), "iri", None, None
        if tk == "BNODE":
            return tv, "bnode", None, None
        if tv == "[":
            bnode = self._new_bnode()
            if self.toks.peek()[1] != "]":
                self._parse_predicate_object_list(bnode)
            self.toks.expect("]")
            return bnode, "bnode", None, None
        if tv == "(":
            return self._parse_collection(), "bnode_or_nil", None, None
        if tv == "{":
            raise _N3Formula("formula term", open_braces=1)
        if tk == "VAR":
            raise _N3Formula(f"quantified variable {tv}")
        if as_subject:
            raise TurtleParseError(f"bad subject token {tv!r}")
        # objects only below
        if tk in ("STRING", "LONG_STRING"):
            body = tv[3:-3] if tk == "LONG_STRING" else tv[1:-1]
            lit = _unescape(body)
            nk, nv = self.toks.peek()
            if nk == "LANGTAG":
                self.toks.next()
                return lit, "literal", None, nv[1:]
            if nv == "^^":
                self.toks.next()
                dk, dv = self.toks.next()
                if dk == "IRI":
                    dt = self._resolve_iri(dv)
                elif dk == "PNAME":
                    dt = self._resolve_pname(dv)
                else:
                    raise TurtleParseError(f"bad datatype token {dv!r}")
                return lit, "literal", dt, None
            return lit, "literal", None, None
        if tk == "INTEGER":
            return tv, "literal", XSD_INTEGER, None
        if tk == "DECIMAL":
            return tv, "literal", XSD_DECIMAL, None
        if tk == "DOUBLE":
            return tv, "literal", XSD_DOUBLE, None
        if tk == "KEYWORD" and tv in ("true", "false"):
            return tv, "literal", XSD_BOOLEAN, None
        raise TurtleParseError(f"bad object token {tv!r}")

    def _parse_collection(self) -> str:
        """( e1 e2 ... ) -> rdf:first/rdf:rest chain; returns head node."""
        items = []
        while True:
            tk, tv = self.toks.next()
            if tv == ")":
                break
            if tv is None:
                raise TurtleParseError("unterminated collection")
            items.append(self._parse_object_term(tk, tv))
        if not items:
            return RDF_NIL
        head = self._new_bnode()
        cur = head
        for i, (val, kind, dt, lang) in enumerate(items):
            self._emit(cur, "bnode", RDF_FIRST, val, kind, dt, lang)
            if i + 1 < len(items):
                nxt = self._new_bnode()
                self._emit(cur, "bnode", RDF_REST, nxt, "bnode", None, None)
                cur = nxt
            else:
                self._emit(cur, "bnode", RDF_REST, RDF_NIL, "iri", None, None)
        return head

    def _parse_object_term(self, tk, tv):
        val, kind, dt, lang = self._parse_term(tk, tv, as_subject=False)
        if kind == "bnode_or_nil":
            kind = "iri" if val == RDF_NIL else "bnode"
        return val, kind, dt, lang

    # -- statements --------------------------------------------------------

    def _emit(self, subj, subj_kind, pred, obj, obj_kind, dt, lang):
        self.triples.append(
            (subj, pred, obj, obj_kind, dt, lang, self.graph_ctx)
        )

    def _parse_verb(self) -> str:
        tk, tv = self.toks.next()
        if tk == "KEYWORD" and tv == "a":
            return RDF_TYPE
        if tk == "IRI":
            return self._resolve_iri(tv)
        if tk == "PNAME":
            if tv == "log:implies":
                raise _N3Formula("log:implies rule")
            return self._resolve_pname(tv)
        if tk == "OP":
            # N3 operators: '=' is owl:sameAs (emit normally); '=>' / '<='
            # are implication — the statement is a rule, skipped gracefully
            if tv == "=":
                return OWL_SAME_AS
            raise _N3Formula(f"'{tv}' implication rule")
        raise TurtleParseError(f"bad predicate token {tv!r}")

    def _parse_predicate_object_list(self, subj: str):
        subj_kind = "bnode" if subj.startswith("_:") else "iri"
        while True:
            pred = self._parse_verb()
            while True:
                tk, tv = self.toks.next()
                val, kind, dt, lang = self._parse_term(tk, tv, as_subject=False)
                if kind == "bnode_or_nil":
                    kind = "iri" if val == RDF_NIL else "bnode"
                self._emit(subj, subj_kind, pred, val, kind, dt, lang)
                # N-Quads: optional 4th term before the '.'
                nk, nv = self.toks.peek()
                if nk in ("IRI", "PNAME") and self._lookahead_is_quad_graph():
                    gk, gv = self.toks.next()
                    g = self._resolve_iri(gv) if gk == "IRI" else self._resolve_pname(gv)
                    s, p, o, ok, d, lg, _ = self.triples.pop()
                    self.triples.append((s, p, o, ok, d, lg, g))
                    nk, nv = self.toks.peek()
                if nv == ",":
                    self.toks.next()
                    continue
                break
            nk, nv = self.toks.peek()
            if nv == ";":
                self.toks.next()
                # allow trailing ';' before '.' or ']'
                nk, nv = self.toks.peek()
                if nv in (".", "]", None):
                    return
                continue
            return

    def _lookahead_is_quad_graph(self) -> bool:
        """True if the next IRI/PNAME is an N-Quads graph label (followed by '.')."""
        nxt = self.toks.pos + 1
        if nxt < len(self.toks.toks):
            return self.toks.toks[nxt][1] == "."
        return False

    def parse(self, text: str, graph_ctx: str | None = None) -> list[tuple]:
        self.toks = _Tokens(text)
        self.graph_ctx = graph_ctx
        while True:
            tk, tv = self.toks.peek()
            if tk is None:
                break
            if tk == "DIRECTIVE" or (tk == "KEYWORD" and tv.upper() in ("PREFIX", "BASE")):
                self.toks.next()
                is_prefix = tv.lstrip("@").upper() == "PREFIX"
                if is_prefix:
                    pk, pv = self.toks.next()
                    if pk != "PNAME" or not pv.endswith(":"):
                        raise TurtleParseError(f"bad prefix decl {pv!r}")
                    ik, iv = self.toks.next()
                    self.prefixes[pv[:-1]] = self._resolve_iri(iv)
                    self._pname_cache.clear()
                else:
                    ik, iv = self.toks.next()
                    self.base = self._resolve_iri(iv)
                if self.toks.peek()[1] == ".":
                    self.toks.next()
                continue
            if tk == "LANGTAG" and tv in ("@forAll", "@forSome"):
                # N3 quantifier directive: skip the whole statement
                self.toks.next()
                self._skip_n3_statement(f"{tv} quantifier")
                continue
            if tv == "{" and self._formula_ahead():
                # {premise} => {conclusion} .  — an N3 rule, not a TriG
                # default-graph block; skip it whole
                self._skip_n3_statement("formula implication rule")
                continue
            if tk == "KEYWORD" and tv.upper() == "GRAPH":
                self.toks.next()
                gk, gv = self.toks.next()
                g = self._resolve_iri(gv) if gk == "IRI" else self._resolve_pname(gv)
                self._parse_graph_block(g)
                continue
            if tv == "{":  # TriG default-graph block
                self._parse_graph_block(None, already_open=False)
                continue
            # TriG named graph without GRAPH keyword: <iri> { ... }
            if tk in ("IRI", "PNAME"):
                save = self.toks.pos
                self.toks.next()
                if self.toks.peek()[1] == "{":
                    g = self._resolve_iri(tv) if tk == "IRI" else self._resolve_pname(tv)
                    self._parse_graph_block(g)
                    continue
                self.toks.pos = save
            self._parse_statement()
        return self.triples

    def _formula_ahead(self) -> bool:
        """At a statement-initial '{': True iff the token after the
        matching '}' is an N3 implication verb (=> / <= / = / log:implies)
        — distinguishing an N3 rule from a TriG default-graph block."""
        toks = self.toks.toks
        depth = 0
        i = self.toks.pos
        while i < len(toks):
            v = toks[i][1]
            if v is None:
                return False
            if v == "{":
                depth += 1
            elif v == "}":
                depth -= 1
                if depth == 0:
                    nk, nv = toks[i + 1]
                    return nk == "OP" or nv == "log:implies"
            i += 1
        return False

    def _skip_n3_statement(self, what: str, depth: int = 0):
        """Consume tokens (brace-balanced) through the statement's closing
        '.', recording the skip instead of erroring the document. ``depth``
        counts '{' already consumed before the skip began; a '}' taking
        depth negative belongs to an enclosing TriG block and is pushed
        back for the block parser."""
        while True:
            _k, v = self.toks.next()
            if v is None:
                break
            if v == "{":
                depth += 1
            elif v == "}":
                depth -= 1
                if depth < 0:
                    self.toks.pos -= 1
                    break
            elif v == "." and depth <= 0:
                break
        self.skipped.append(what)

    def _parse_graph_block(self, graph: str | None, already_open: bool = False):
        outer = self.graph_ctx
        self.graph_ctx = graph
        if not already_open:
            self.toks.expect("{")
        while self.toks.peek()[1] not in ("}", None):
            self._parse_statement(end_tokens=(".", "}"))
        if self.toks.peek()[1] == "}":
            self.toks.next()
        self.graph_ctx = outer

    def _parse_statement(self, end_tokens=(".",)):
        mark = len(self.triples)
        try:
            self._parse_statement_inner(end_tokens)
        except _N3Formula as f:
            # roll back the statement's partial triples and skip to its
            # end: N3-only constructs degrade to skip rows, never doc errors
            del self.triples[mark:]
            self._skip_n3_statement(f.what, depth=f.open_braces)

    def _parse_statement_inner(self, end_tokens=(".",)):
        tk, tv = self.toks.next()
        subj, kind, _, _ = self._parse_term(tk, tv, as_subject=True)
        if kind == "bnode_or_nil":
            kind = "iri" if subj == RDF_NIL else "bnode"
        nk, nv = self.toks.peek()
        # bare "[...] ." statement — already emitted inner triples
        if nv in end_tokens:
            self.toks.next()
            return
        self._parse_predicate_object_list(subj)
        nk, nv = self.toks.peek()
        if nv == ".":
            self.toks.next()
        elif nv == "}" and "}" in end_tokens:
            pass
        elif nv is None:
            pass
        else:
            raise TurtleParseError(f"expected '.', got {nv!r}")


def parse_turtle(text: str) -> list[tuple]:
    """Parse Turtle/N-Triples/N-Quads/TriG text into triple tuples.

    Returns list of (subj, pred, obj, obj_kind, obj_datatype, lang, graph_ctx).
    Covers the statement grammar of the reference's 11-format surface that is
    line-oriented text (reference: src/formats/rdf/rdf_parser.py:187-199);
    XML/TriX/RDFa are handled by the jsonld/xml span parsers.
    """
    return TurtleParser().parse(text)


def parse_turtle_with_skips(text: str) -> tuple[list[tuple], list[str]]:
    """Like :func:`parse_turtle`, also returning the reasons for any
    N3-only statements that were skipped gracefully (formulae ``{...} =>
    {...}``, ``<=``, ``log:implies`` rules, ``@forAll``/``@forSome``
    quantifiers). N3 ``=`` is emitted as owl:sameAs, not skipped. An N3
    rule file thus yields its plain triples plus skip records instead of
    a document-level parse error."""
    p = TurtleParser()
    rows = p.parse(text)
    return rows, p.skipped
