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
and are ignored, per the HTML5 host-language rules. @inlist collects
property/rel values into rdf:first/rdf:rest chains (one list per
(subject, predicate), document order; disjoint list scopes for the same
pair merge — documented deviation). xmlns:foo prefix declarations are
honored for RDFa 1.0 back-compat.

Microdata (WHATWG + microdata-to-RDF conventions): ``itemscope`` /
``itemtype`` / ``itemid`` / ``itemprop``; value extraction per element
kind (a/link/area → href, img/audio/video/embed/iframe/source → src,
meta → content, time → datetime, data/meter → value, nested itemscope →
the nested item, else text content). Property IRIs resolve against the
itemtype's vocabulary (last path segment replaced — the schema.org
convention).

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
_ABS_IRI = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")

_VOID = {"area", "base", "br", "col", "embed", "hr", "img", "input",
         "link", "meta", "param", "source", "track", "wbr"}


class HtmlRdfParseError(ValueError):
    pass


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
        if not term:
            return None
        if term.startswith("_:"):
            return term
        pfx, sep, local = term.partition(":")
        if sep and pfx in scope["prefixes"]:
            return scope["prefixes"][pfx] + local
        if _is_abs(term):
            return term
        if scope["vocab"]:
            return scope["vocab"] + term
        return term

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

        # the object resource carried by this element (resource > href > src)
        obj_iri = None
        if resource is not None:
            obj_iri = self._resolve(resource, scope)
        elif "href" in a:
            obj_iri = a["href"]
        elif "src" in a:
            obj_iri = a["src"]

        new_subject = None      # subject established BY this element
        child_subject = None    # subject for descendants via object chaining
        if about is not None:
            new_subject = self._resolve(about, scope)
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
                # descendant element that establishes a new subject
                scope["incomplete"] = (
                    [("fwd", p, self_subject) for p in rel_preds] +
                    [("rev", p, self_subject) for p in rev_preds])

        if prop:
            if self_subject is None:
                self_subject = self._bnode()
            psubj = self_subject
            pred = self._resolve(prop, scope)
            dt = self._resolve(a.get("datatype"), scope) \
                if a.get("datatype") else None
            inlist = "inlist" in a
            if "content" in a:
                if inlist:
                    self._inlist_add(psubj, pred, a["content"] or "",
                                     "literal", dt, scope["lang"])
                else:
                    self.triples.append((psubj, pred, a["content"] or "",
                                         "literal", dt, scope["lang"], None))
                if obj_iri is not None and not (rel_preds or rev_preds):
                    child_subject = obj_iri
            elif obj_iri is not None and not (rel_preds or rev_preds):
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
                self.triples.append((psubj, pred, obj, "bnode",
                                     None, None, None))
                child_subject = obj
            elif tag in _VOID:
                if inlist:
                    self._inlist_add(psubj, pred, "", "literal",
                                     dt, scope["lang"])
                else:
                    self.triples.append((psubj, pred, "", "literal",
                                         dt, scope["lang"], None))
            else:
                self.captures.append(
                    [self.depth, psubj, pred, dt, scope["lang"], [],
                     inlist])
        elif not (rel_preds or rev_preds):
            if new_subject is None and typeof is not None:
                # typeof without about/property: new (b)node subject
                new_subject = (self._resolve(resource, scope) if resource
                               else self._bnode())
            elif new_subject is None and resource is not None:
                new_subject = self._resolve(resource, scope)

        # complete the nearest ancestor's pending @rel/@rev triples
        if new_subject is not None and incoming:
            for direction, p, s in incoming:
                if direction == "fwd":
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
            elif prop and child_subject is not None:
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
            d, subj, pred, dt, lang, buf, inlist = self.captures.pop()
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

class _MicrodataParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.triples: list[tuple] = []
        self.bnode_n = 0
        # item stack entries: dict(item, vocab, depth) — None sentinel root
        self.items: list[dict] = [{"item": None, "vocab": None, "depth": 0}]
        self.captures: list[list] = []  # [depth, item, pred, buf]
        self.depth = 0

    def _bnode(self) -> str:
        self.bnode_n += 1
        return f"_:md{self.bnode_n}"

    def _pred(self, prop: str, vocab: str | None) -> str:
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

    def handle_starttag(self, tag, attrs):
        self.depth += 1
        a = dict(attrs)
        cur = self.items[-1]
        prop = a.get("itemprop")

        if "itemscope" in a:
            item = a.get("itemid") or self._bnode()
            vocab = cur["vocab"]
            itemtype = a.get("itemtype")
            if itemtype:
                types = itemtype.split()
                vocab = self._vocab_of(types[0])
                for t in types:
                    self.triples.append((item, RDF_TYPE, t, "iri",
                                         None, None, None))
            if prop and cur["item"] is not None:
                for pn in prop.split():
                    kind = "bnode" if item.startswith("_:") else "iri"
                    self.triples.append(
                        (cur["item"], self._pred(pn, cur["vocab"]), item,
                         kind, None, None, None))
            self.items.append({"item": item, "vocab": vocab,
                               "depth": self.depth})
            if tag in _VOID:
                self._pop_items()
            return

    # non-itemscope itemprop: extract a value
        if prop and cur["item"] is not None:
            val, kind = None, "literal"
            if tag in ("a", "link", "area") and "href" in a:
                val, kind = a["href"], "iri"
            elif tag in ("img", "audio", "video", "embed", "iframe",
                         "source", "track") and "src" in a:
                val, kind = a["src"], "iri"
            elif tag == "meta":
                val = a.get("content", "")
            elif tag == "time":
                val = a.get("datetime") or None
            elif tag in ("data", "meter") and "value" in a:
                val = a["value"]
            if val is not None:
                for pn in prop.split():
                    self.triples.append(
                        (cur["item"], self._pred(pn, cur["vocab"]), val,
                         kind, None, None, None))
            elif tag not in _VOID:
                for pn in prop.split():
                    self.captures.append(
                        [self.depth, cur["item"],
                         self._pred(pn, cur["vocab"]), []])
        if tag in _VOID:
            self.depth -= 1

    def _pop_items(self):
        while len(self.items) > 1 and self.items[-1]["depth"] >= self.depth:
            self.items.pop()
        while self.captures and self.captures[-1][0] >= self.depth:
            d, item, pred, buf = self.captures.pop()
            self.triples.append((item, pred, "".join(buf).strip(),
                                 "literal", None, None, None))
        self.depth -= 1

    def handle_endtag(self, tag):
        if tag in _VOID:
            return
        self._pop_items()

    def handle_data(self, data):
        for cap in self.captures:
            cap[3].append(data)


def parse_microdata(text: str) -> list[tuple]:
    p = _MicrodataParser()
    try:
        p.feed(text)
        p.close()
    except Exception as e:
        raise HtmlRdfParseError(f"microdata parse failed: {e}") from e
    if not p.triples:
        raise HtmlRdfParseError("no microdata items found")
    return p.triples
