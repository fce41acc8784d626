"""HTML-embedded RDF span parsers: RDFa-lite and microdata.

The reference delegates these two formats to rdflib's HTML plugin parsers
(reference: src/formats/rdf/rdf_parser.py:187-234 lists 'rdfa' and
'microdata' with html/xhtml aliases). This engine implements the
commonly-used subset of each public spec over the stdlib ``html.parser``
(no external libs on executors):

RDFa 1.1 (lite + links): ``vocab`` / ``prefix`` / ``about`` /
``resource`` / ``typeof`` / ``property`` / ``content`` / ``datatype`` /
``href`` / ``src`` / ``lang`` / ``rel`` / ``rev`` (including incomplete
triples completed by descendant subjects). Subject resolution follows the
RDFa 1.1 processing sequence: @about sets the subject for the element's
own @property; @property+@resource makes the resource the object AND the
subject for descendants (object chaining). Bare @rel/@rev terms with no
in-scope vocab/prefix are HTML link relations (stylesheet, nofollow, …)
and are ignored, per the HTML5 host-language rules. The RDFa 1.1
initial context's default prefixes (dc, foaf, schema, og, …) are
predefined, locally-declared prefixes winning; @about/@resource follow
the SafeCURIEorCURIEorIRI grammar (safe-CURIE brackets, no @vocab
application, relative IRIs resolved against <base href>), and bare
@href/@src resolve against <base href> too; an element carrying only
@href/@src establishes the new subject (completing ancestor incomplete
triples). @inlist collects property/rel values into rdf:first/rdf:rest
chains (one list per (subject, predicate), document order; disjoint list
scopes for the same pair merge — documented deviation), including
object-less @rel+@inlist whose list fills from descendant link targets.
@vocab additionally asserts rdfa:usesVocabulary on the document IRI when
<base href> makes it known (documented deviation: standalone spans have
no URL otherwise). xmlns:foo prefix declarations are honored for
RDFa 1.0 back-compat.

Microdata (WHATWG + microdata-to-RDF conventions): ``itemscope`` /
``itemtype`` / ``itemid`` (resolved against ``<base href>``) /
``itemprop`` / ``itemref`` (properties
crawled from id-referenced subtrees per WHATWG §5.2.4, forward or
backward references, cycle-safe — evaluated over a one-pass DOM tree
because a reference can point anywhere in the document); value
extraction per element kind (a/link/area → href,
img/audio/video/embed/iframe/source → src, object → data, meta →
content, time → datetime with the datatype sniffed from the lexical
form, data/meter → value, nested itemscope → the nested item, else text
content). Plain literals carry the language of the nearest ancestor
``lang`` attribute per the microdata-to-RDF note. Property IRIs resolve
against the itemtype's vocabulary (last path segment replaced — the
schema.org convention).

Both return the shared 7-tuple shape
``(subj, pred, obj, obj_kind, obj_datatype, lang, graph_ctx)``; blank
nodes are ``_:label`` and doc-qualified by the caller.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDF_FIRST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"
RDF_REST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"
RDF_NIL = "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil"
RDFA_USES_VOCABULARY = "http://www.w3.org/ns/rdfa#usesVocabulary"
_ABS_IRI = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")

_VOID = {"area", "base", "br", "col", "embed", "hr", "img", "input",
         "link", "meta", "param", "source", "track", "wbr"}

# RDFa 1.1 initial context (https://www.w3.org/2011/rdfa-context/rdfa-1.1):
# prefixes every conformant processor predefines, so real pages use
# `property="dc:title"` etc. WITHOUT declaring them. Locally-declared
# prefixes always win.
INITIAL_CONTEXT = {
    "cc": "http://creativecommons.org/ns#",
    "ctag": "http://commontag.org/ns#",
    "dc": "http://purl.org/dc/terms/",
    "dc11": "http://purl.org/dc/elements/1.1/",
    "dcterms": "http://purl.org/dc/terms/",
    "foaf": "http://xmlns.com/foaf/0.1/",
    "gr": "http://purl.org/goodrelations/v1#",
    "grddl": "http://www.w3.org/2003/g/data-view#",
    "ical": "http://www.w3.org/2002/12/cal/icaltzd#",
    "ma": "http://www.w3.org/ns/ma-ont#",
    "og": "http://ogp.me/ns#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "prov": "http://www.w3.org/ns/prov#",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfa": "http://www.w3.org/ns/rdfa#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "rev": "http://purl.org/stuff/rev#",
    "rif": "http://www.w3.org/2007/rif#",
    "schema": "http://schema.org/",
    "sioc": "http://rdfs.org/sioc/ns#",
    "skos": "http://www.w3.org/2004/02/skos/core#",
    "skosxl": "http://www.w3.org/2008/05/skos-xl#",
    "v": "http://rdf.data-vocabulary.org/#",
    "vcard": "http://www.w3.org/2006/vcard/ns#",
    "void": "http://rdfs.org/ns/void#",
    "wdr": "http://www.w3.org/2007/05/powder#",
    "wdrs": "http://www.w3.org/2007/05/powder-s#",
    "xhv": "http://www.w3.org/1999/xhtml/vocab#",
    "xml": "http://www.w3.org/XML/1998/namespace",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
}


def _resolve_base(base: str | None, iri: str) -> str:
    """Resolve a (possibly relative) IRI against the document base set by
    ``<base href>`` — the HTML host-language rule shared by RDFa and
    microdata. Absolute IRIs and missing bases pass through."""
    if not base or not iri or _is_abs(iri) or iri.startswith("_:"):
        return iri
    from urllib.parse import urljoin
    return urljoin(base, iri)


class HtmlRdfParseError(ValueError):
    pass


_XSD = "http://www.w3.org/2001/XMLSchema#"
_TIME_LEXICALS = [
    (re.compile(r"^-?\d{4,}-\d{2}-\d{2}T\d{2}:\d{2}(:\d{2}(\.\d+)?)?"
                r"(Z|[+-]\d{2}:\d{2})?$"), _XSD + "dateTime"),
    (re.compile(r"^-?\d{4,}-\d{2}-\d{2}(Z|[+-]\d{2}:\d{2})?$"),
     _XSD + "date"),
    (re.compile(r"^\d{2}:\d{2}(:\d{2}(\.\d+)?)?(Z|[+-]\d{2}:\d{2})?$"),
     _XSD + "time"),
    (re.compile(r"^-?\d{4,}-\d{2}$"), _XSD + "gYearMonth"),
    (re.compile(r"^-?\d{4,}$"), _XSD + "gYear"),
    (re.compile(r"^-?P(\d+Y)?(\d+M)?(\d+D)?(T(\d+H)?(\d+M)?"
                r"(\d+(\.\d+)?S)?)?$"), _XSD + "duration"),
]


def _sniff_time_datatype(value: str) -> str | None:
    """HTML+RDFa: infer the XSD datatype of a <time datetime=...> literal
    from its lexical form (dateTime/date/time/gYearMonth/gYear/duration);
    unrecognized forms stay plain literals."""
    for rx, dt in _TIME_LEXICALS:
        if rx.match(value or ""):
            return dt
    return None


def _is_abs(term: str) -> bool:
    return bool(_ABS_IRI.match(term))


# ---------------------------------------------------------------------------
# RDFa-lite
# ---------------------------------------------------------------------------

class _RdfaParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.triples: list[tuple] = []
        self.bnode_n = 0
        # scope stack entries: dict(subject, vocab, prefixes, lang,
        # incomplete) — incomplete holds pending @rel/@rev triples as
        # (direction, pred, subject), completed by each descendant element
        # that establishes a new subject (RDFa 1.1 processing step 10).
        self.scopes = [{"subject": None, "vocab": None, "prefixes": {},
                        "lang": None, "incomplete": []}]
        self.base: str | None = None  # <base href> (HTML host language)
        # pending text-content captures: list of
        # [depth, subject, pred, datatype, lang, buf, inlist]
        self.captures: list[list] = []
        # @inlist accumulators: (subject, pred) -> [(obj, kind, dt, lang)]
        # (document-scoped: separate list scopes for the SAME subject+pred
        # merge into one list — a documented deviation; per-element list
        # mappings only differ when a subject repeats @inlist in disjoint
        # subtrees, which the corpus fixtures never do)
        self.lists: dict[tuple, list] = {}
        self.depth = 0

    def _inlist_add(self, subj, pred, obj, kind, dt=None, lang=None):
        self.lists.setdefault((subj, pred), []).append((obj, kind, dt, lang))

    def _bnode(self) -> str:
        self.bnode_n += 1
        return f"_:rdfa{self.bnode_n}"

    def _resolve(self, term: str, scope: dict) -> str | None:
        """TERMorCURIEorAbsIRI resolution (@property/@typeof/@datatype):
        local prefixes, then the RDFa 1.1 initial context, then @vocab.
        A bare term with NO in-scope vocab resolves to nothing (RDFa 1.1
        §7.4.3: terms are only meaningful against a vocabulary) — emitting
        it verbatim would mint a relative 'IRI' like ``name``."""
        if not term:
            return None
        if term.startswith("_:"):
            return term
        pfx, sep, local = term.partition(":")
        if sep and pfx in scope["prefixes"]:
            return scope["prefixes"][pfx] + local
        # initial context BEFORE the absolute-IRI test: "dc:title" matches
        # the scheme grammar but none of the context prefixes are real
        # URI schemes, so the CURIE reading wins
        if sep and pfx in INITIAL_CONTEXT:
            return INITIAL_CONTEXT[pfx] + local
        if _is_abs(term):
            return term
        if scope["vocab"]:
            return scope["vocab"] + term
        return None

    def _resolve_iri_attr(self, term: str, scope: dict) -> str | None:
        """SafeCURIEorCURIEorIRI resolution (@about/@resource): safe-CURIE
        brackets, prefixes (local then initial context) — @vocab does NOT
        apply here per the RDFa attribute grammar — else a (possibly
        relative) IRI resolved against <base href>."""
        if term is None:
            return None
        if not term:
            return self.base  # @about="" / @resource="" = the document
        safe = term.startswith("[") and term.endswith("]")
        if safe:
            term = term[1:-1]
        if term.startswith("_:"):
            return term
        pfx, sep, local = term.partition(":")
        if sep and pfx in scope["prefixes"]:
            return scope["prefixes"][pfx] + local
        if sep and pfx in INITIAL_CONTEXT:
            return INITIAL_CONTEXT[pfx] + local
        if safe:
            # a safe CURIE MUST be a CURIE: an undeclared prefix makes the
            # attribute value ignored (RDFa 1.1 §6), never a literal IRI
            # like "nope:s"
            return None
        if _is_abs(term):
            return term
        return _resolve_base(self.base, term)

    def _link_preds(self, val: str | None, scope: dict) -> list[str]:
        """Resolve @rel/@rev terms; bare terms with no in-scope vocab or
        prefix are HTML link relations (stylesheet, nofollow, …) → ignored."""
        if not val:
            return []
        preds = []
        for term in val.split():
            if term.startswith("_:"):
                continue
            pfx, sep, local = term.partition(":")
            if sep and pfx in scope["prefixes"]:
                preds.append(scope["prefixes"][pfx] + local)
            elif sep and pfx in INITIAL_CONTEXT:
                preds.append(INITIAL_CONTEXT[pfx] + local)
            elif _is_abs(term):
                preds.append(term)
            elif scope["vocab"]:
                preds.append(scope["vocab"] + term)
        return preds

    @staticmethod
    def _kind(term: str) -> str:
        return "bnode" if term.startswith("_:") else "iri"

    def handle_starttag(self, tag, attrs):
        self.depth += 1
        a = dict(attrs)
        parent = self.scopes[-1]
        incoming = parent["incomplete"]
        scope = {"subject": parent["subject"], "vocab": parent["vocab"],
                 "prefixes": parent["prefixes"], "lang": parent["lang"],
                 "incomplete": incoming, "_depth": self.depth, "_tag": tag}
        if "vocab" in a and a["vocab"]:
            scope["vocab"] = a["vocab"]
            # RDFa 1.1 Core step 2: @vocab emits
            # (base rdfa:usesVocabulary vocab). Only possible when the
            # document IRI is known — for these standalone spans that means
            # an explicit <base href> (documented deviation: a browser
            # processor always knows the document URL).
            if self.base:
                self.triples.append((self.base, RDFA_USES_VOCABULARY,
                                     a["vocab"], "iri", None, None, None))
        if "prefix" in a and a["prefix"]:
            toks = a["prefix"].split()
            pfx = dict(parent["prefixes"])
            for i in range(0, len(toks) - 1, 2):
                pfx[toks[i].rstrip(":")] = toks[i + 1]
            scope["prefixes"] = pfx
        # RDFa 1.0-style xmlns:foo="..." prefix declarations (still accepted
        # by RDFa 1.1 processors for back-compat)
        xmlns = {k[6:]: v for k, v in a.items()
                 if k.startswith("xmlns:") and v}
        if xmlns:
            pfx = dict(scope["prefixes"])
            pfx.update(xmlns)
            scope["prefixes"] = pfx
        lang = a.get("lang") or a.get("xml:lang")
        if lang:
            scope["lang"] = lang

        about = a.get("about")
        resource = a.get("resource")
        typeof = a.get("typeof")
        prop = a.get("property")
        rel_preds = self._link_preds(a.get("rel"), scope)
        rev_preds = self._link_preds(a.get("rev"), scope)

        if tag == "base" and a.get("href"):
            self.base = a["href"]

        # the object resource carried by this element (resource > href > src)
        obj_iri = None
        if resource is not None:
            obj_iri = self._resolve_iri_attr(resource, scope)
        elif "href" in a:
            obj_iri = _resolve_base(self.base, a["href"])
        elif "src" in a:
            obj_iri = _resolve_base(self.base, a["src"])

        new_subject = None      # subject established BY this element
        child_subject = None    # subject for descendants via object chaining
        if about is not None:
            new_subject = self._resolve_iri_attr(about, scope)
        # subject this element's own @rel/@rev/@property attach to
        self_subject = (new_subject if new_subject is not None
                        else parent["subject"])

        if rel_preds or rev_preds:
            if self_subject is None:
                self_subject = self._bnode()
            if obj_iri is not None:
                for p in rel_preds:
                    if "inlist" in a:
                        self._inlist_add(self_subject, p, obj_iri,
                                         self._kind(obj_iri))
                    else:
                        self.triples.append((self_subject, p, obj_iri,
                                             self._kind(obj_iri),
                                             None, None, None))
                for p in rev_preds:
                    self.triples.append((obj_iri, p, self_subject,
                                         self._kind(self_subject),
                                         None, None, None))
                child_subject = obj_iri
                scope["incomplete"] = []
            else:
                # no object here: incomplete triples, completed by each
                # descendant element that establishes a new subject;
                # @inlist routes forward completions into the list
                # accumulator instead ("list incomplete triples")
                scope["incomplete"] = (
                    [("fwd", p, self_subject, "inlist" in a)
                     for p in rel_preds] +
                    [("rev", p, self_subject, False) for p in rev_preds])

        # @property admits a whitespace-separated list of terms; terms
        # that resolve to nothing (bare term without vocab, undeclared
        # CURIE prefix) are dropped per the TERMorCURIEorAbsIRIs grammar
        prop_preds = [q for q in (self._resolve(t, scope)
                                  for t in (prop or "").split())
                      if q and not q.startswith("_:")]
        if prop_preds:
            if self_subject is None:
                self_subject = self._bnode()
            psubj = self_subject
            dt = self._resolve(a.get("datatype"), scope) \
                if a.get("datatype") else None
            inlist = "inlist" in a
            content_val = a.get("content")
            if content_val is None and tag == "time" and "datetime" in a:
                # HTML+RDFa host-language rule: <time datetime=...> supplies
                # the literal, with the datatype sniffed from its lexical
                # form unless @datatype overrides
                content_val = a["datetime"]
                if "datatype" not in a:
                    dt = _sniff_time_datatype(content_val)
            if content_val is not None:
                for pred in prop_preds:
                    if inlist:
                        self._inlist_add(psubj, pred, content_val or "",
                                         "literal", dt, scope["lang"])
                    else:
                        self.triples.append((psubj, pred, content_val or "",
                                             "literal", dt, scope["lang"],
                                             None))
                if obj_iri is not None and not (rel_preds or rev_preds):
                    child_subject = obj_iri
            elif obj_iri is not None and not (rel_preds or rev_preds):
                for pred in prop_preds:
                    if inlist:
                        self._inlist_add(psubj, pred, obj_iri,
                                         self._kind(obj_iri))
                    else:
                        self.triples.append((psubj, pred, obj_iri,
                                             self._kind(obj_iri),
                                             None, None, None))
                # @property+@resource: the resource becomes the subject for
                # descendant elements (object chaining), typeof or not
                child_subject = obj_iri
            elif typeof is not None and about is None:
                # property + typeof chaining: object is a fresh bnode that
                # becomes the subject for descendants
                obj = self._bnode()
                for pred in prop_preds:
                    self.triples.append((psubj, pred, obj, "bnode",
                                         None, None, None))
                child_subject = obj
            elif tag in _VOID:
                for pred in prop_preds:
                    if inlist:
                        self._inlist_add(psubj, pred, "", "literal",
                                         dt, scope["lang"])
                    else:
                        self.triples.append((psubj, pred, "", "literal",
                                             dt, scope["lang"], None))
            else:
                self.captures.append(
                    [self.depth, psubj, prop_preds, dt, scope["lang"], [],
                     inlist])
        elif not (rel_preds or rev_preds):
            if new_subject is None and typeof is not None:
                # typeof without about/property: new (b)node subject
                new_subject = (self._resolve_iri_attr(resource, scope)
                               if resource else self._bnode())
            elif new_subject is None and resource is not None:
                new_subject = self._resolve_iri_attr(resource, scope)
            elif new_subject is None and obj_iri is not None:
                # RDFa 1.1 step 5: with no @rel/@rev/@property, a bare
                # @href/@src establishes the new subject (this is what
                # completes an ancestor's incomplete triples with the
                # link target, e.g. @inlist-of-resources markup)
                new_subject = obj_iri

        # complete the nearest ancestor's pending @rel/@rev triples
        if new_subject is not None and incoming:
            for direction, p, s, in_list in incoming:
                if direction == "fwd":
                    if in_list:
                        self._inlist_add(s, p, new_subject,
                                         self._kind(new_subject))
                    else:
                        self.triples.append((s, p, new_subject,
                                             self._kind(new_subject),
                                             None, None, None))
                else:
                    self.triples.append((new_subject, p, s,
                                         self._kind(s), None, None, None))
            if scope["incomplete"] is incoming:
                scope["incomplete"] = []

        if child_subject is not None:
            scope["subject"] = child_subject
        elif new_subject is not None:
            scope["subject"] = new_subject
        elif self_subject is not None and parent["subject"] is None:
            scope["subject"] = self_subject

        if typeof is not None:
            if about is not None:
                tsubj = new_subject
            elif prop_preds and child_subject is not None:
                tsubj = child_subject  # typed resource = the object
            else:
                tsubj = (new_subject or child_subject or scope["subject"]
                         or self._bnode())
            scope["subject"] = scope["subject"] or tsubj
            for t in typeof.split():
                t_iri = self._resolve(t, scope)
                if t_iri:
                    self.triples.append((tsubj, RDF_TYPE, t_iri, "iri",
                                         None, None, None))
        self.scopes.append(scope)
        if tag in _VOID:
            self._pop()

    def _pop(self):
        if len(self.scopes) > 1:
            self.scopes.pop()
        while self.captures and self.captures[-1][0] >= self.depth:
            d, subj, preds, dt, lang, buf, inlist = self.captures.pop()
            for pred in preds:
                if inlist:
                    self._inlist_add(subj, pred, "".join(buf).strip(),
                                     "literal", dt, lang)
                else:
                    self.triples.append((subj, pred, "".join(buf).strip(),
                                         "literal", dt, lang, None))
        self.depth -= 1

    def handle_endtag(self, tag):
        if tag in _VOID:
            return
        self._pop()

    def handle_data(self, data):
        for cap in self.captures:
            cap[5].append(data)

    def emit_lists(self):
        """Materialize @inlist accumulators as rdf:first/rdf:rest chains
        (one rdf:List per (subject, predicate), values in document order)."""
        for (subj, pred), vals in self.lists.items():
            if not vals:
                self.triples.append((subj, pred, RDF_NIL, "iri",
                                     None, None, None))
                continue
            nodes = [self._bnode() for _ in vals]
            self.triples.append((subj, pred, nodes[0], "bnode",
                                 None, None, None))
            for i, (obj, kind, dt, lang) in enumerate(vals):
                self.triples.append((nodes[i], RDF_FIRST, obj, kind,
                                     dt, lang, None))
                nxt = nodes[i + 1] if i + 1 < len(nodes) else RDF_NIL
                self.triples.append((nodes[i], RDF_REST, nxt,
                                     "bnode" if nxt != RDF_NIL else "iri",
                                     None, None, None))
        self.lists = {}


def parse_rdfa(text: str) -> list[tuple]:
    p = _RdfaParser()
    try:
        p.feed(text)
        p.close()
        p.emit_lists()
    except Exception as e:  # html.parser is forgiving; be explicit anyway
        raise HtmlRdfParseError(f"RDFa parse failed: {e}") from e
    if not p.triples:
        raise HtmlRdfParseError("no RDFa triples found")
    return p.triples


# ---------------------------------------------------------------------------
# microdata
# ---------------------------------------------------------------------------

class _Node:
    """Minimal DOM node: microdata needs a tree (``itemref`` may point
    forward OR backward in the document), so a streaming parse can't
    evaluate it — the tree is built once, then crawled per item."""
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict, parent):
        self.tag = tag
        self.attrs = attrs
        self.children: list = []  # _Node or str (text)
        self.parent = parent


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", {}, None)
        self.cur = self.root
        self.ids: dict[str, _Node] = {}  # first id wins, per getElementById
        self.base: str | None = None     # first <base href> wins

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        node = _Node(tag, a, self.cur)
        self.cur.children.append(node)
        if a.get("id") and a["id"] not in self.ids:
            self.ids[a["id"]] = node
        if tag == "base" and a.get("href") and self.base is None:
            self.base = a["href"]
        if tag not in _VOID:
            self.cur = node

    def handle_endtag(self, tag):
        if tag in _VOID:
            return
        n = self.cur
        while n is not self.root and n.tag != tag:
            n = n.parent
        if n is not self.root:
            self.cur = n.parent

    def handle_data(self, data):
        self.cur.children.append(data)


def _text_content(node: _Node) -> str:
    text: list[str] = []
    _collect(node, text)
    return "".join(text).strip()


def _collect(node: _Node, out: list[str]) -> None:
    for c in node.children:
        if isinstance(c, str):
            out.append(c)
        else:
            _collect(c, out)


class _MicrodataEvaluator:
    """WHATWG microdata → RDF over the parsed tree.

    Items are every ``itemscope`` element (document order, which also
    fixes bnode numbering). Each item's properties come from the WHATWG
    §5.2.4 crawl: the item element's children plus the elements named by
    ``itemref`` ids; the crawl descends through non-item elements, treats
    an ``itemprop`` element as a property of the item (a nested
    ``itemscope`` property's value is the nested item), and never crawls
    INTO a nested itemscope (its subtree belongs to the nested item). A
    per-item visited set makes itemref cycles terminate.
    """

    def __init__(self, root: _Node, ids: dict[str, _Node],
                 base: str | None = None):
        self.root = root
        self.ids = ids
        self.base = base
        self.triples: list[tuple] = []
        self.bnode_n = 0

    def _bnode(self) -> str:
        self.bnode_n += 1
        return f"_:md{self.bnode_n}"

    @staticmethod
    def _pred(prop: str, vocab: str | None) -> str:
        if _is_abs(prop):
            return prop
        if vocab:
            return vocab + prop
        return prop

    @staticmethod
    def _vocab_of(itemtype: str) -> str:
        if "#" in itemtype:
            return itemtype.split("#")[0] + "#"
        return itemtype.rsplit("/", 1)[0] + "/"

    def run(self) -> list[tuple]:
        scopes: list[_Node] = []
        stack = [self.root]
        order: list[_Node] = []
        while stack:
            n = stack.pop()
            order.append(n)
            stack.extend(c for c in reversed(n.children)
                         if isinstance(c, _Node))
        for n in order:
            if "itemscope" in n.attrs:
                scopes.append(n)

        item_id: dict[int, str] = {}
        vocab: dict[int, str | None] = {}
        for n in scopes:
            iid = n.attrs.get("itemid")
            item_id[id(n)] = (_resolve_base(self.base, iid) if iid
                              else self._bnode())
        for n in scopes:
            itemtype = n.attrs.get("itemtype")
            if itemtype:
                vocab[id(n)] = self._vocab_of(itemtype.split()[0])
            else:
                # inherit from the nearest ancestor item
                p = n.parent
                while p is not None and "itemscope" not in p.attrs:
                    p = p.parent
                vocab[id(n)] = vocab.get(id(p)) if p is not None else None

        for n in scopes:
            subj = item_id[id(n)]
            for t in (n.attrs.get("itemtype") or "").split():
                self.triples.append((subj, RDF_TYPE, t, "iri",
                                     None, None, None))
            self._crawl_item(n, subj, vocab[id(n)], item_id)
        return self.triples

    def _crawl_item(self, node: _Node, subj: str, vocab: str | None,
                    item_id: dict[int, str]) -> None:
        roots: list = list(node.children)
        for ref in (node.attrs.get("itemref") or "").split():
            if ref in self.ids:
                roots.append(self.ids[ref])
        visited: set[int] = {id(node)}
        pending = list(reversed(roots))
        while pending:
            e = pending.pop()
            if isinstance(e, str) or id(e) in visited:
                continue
            visited.add(id(e))
            prop = e.attrs.get("itemprop")
            if prop:
                self._emit_property(e, subj, prop, vocab, item_id)
            if "itemscope" not in e.attrs:
                pending.extend(reversed(e.children))

    def _emit_property(self, e: _Node, subj: str, prop: str,
                       vocab: str | None,
                       item_id: dict[int, str]) -> None:
        a = e.attrs
        dt = None
        if "itemscope" in a:
            val = item_id[id(e)]
            kind = "bnode" if val.startswith("_:") else "iri"
        else:
            val, kind = None, "literal"
            if e.tag in ("a", "link", "area") and "href" in a:
                val, kind = _resolve_base(self.base, a["href"]), "iri"
            elif e.tag in ("img", "audio", "video", "embed", "iframe",
                           "source", "track") and "src" in a:
                val, kind = _resolve_base(self.base, a["src"]), "iri"
            elif e.tag == "object" and "data" in a:
                val, kind = _resolve_base(self.base, a["data"]), "iri"
            elif e.tag == "meta":
                val = a.get("content", "")
            elif e.tag == "time":
                val = a.get("datetime") or None
                if val is not None:
                    # microdata-to-RDF §4.3: time values carry a datatype
                    # determined by the lexical form
                    dt = _sniff_time_datatype(val)
            elif e.tag in ("data", "meter") and "value" in a:
                val = a["value"]
            if val is None:
                val = _text_content(e) if e.tag not in _VOID else ""
        # microdata-to-RDF §4.3: a plain literal carries the language of
        # the nearest ancestor lang attribute (typed literals don't)
        lang = self._lang_of(e) if kind == "literal" and dt is None else None
        for pn in prop.split():
            self.triples.append((subj, self._pred(pn, vocab), val, kind,
                                 dt, lang, None))

    @staticmethod
    def _lang_of(e: _Node) -> str | None:
        n = e
        while n is not None:
            lang = n.attrs.get("lang") or n.attrs.get("xml:lang")
            if lang:
                return lang
            n = n.parent
        return None


def parse_microdata(text: str) -> list[tuple]:
    tb = _TreeBuilder()
    try:
        tb.feed(text)
        tb.close()
        triples = _MicrodataEvaluator(tb.root, tb.ids, tb.base).run()
    except Exception as e:
        raise HtmlRdfParseError(f"microdata parse failed: {e}") from e
    if not triples:
        raise HtmlRdfParseError("no microdata items found")
    return triples
