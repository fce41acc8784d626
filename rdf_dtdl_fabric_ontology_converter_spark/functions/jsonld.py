"""JSON-LD-lite parser → triple tuples.

Covers the JSON-LD subset used by the reference sample corpus
(reference: samples/rdf/*.jsonld — ``@context`` prefix map, ``@graph`` node
array or a single node object, values as plain literals, ``{"@id": ...}``
references, ``{"@value","@type","@language"}`` typed literals, and arrays of
any of those). Runs inside pandas UDF batches; no external libs.
"""

from __future__ import annotations

import json
import re

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_ABS_IRI = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")


class JsonLdParseError(ValueError):
    pass


def _expand(term: str, ctx: dict, vocab: str | None) -> str:
    if term.startswith("@"):
        return term
    pfx, sep, local = term.partition(":")
    if sep and pfx in ctx and isinstance(ctx[pfx], str):
        return ctx[pfx] + local
    if _ABS_IRI.match(term):
        return term
    if vocab:
        return vocab + term
    return term


def _node_triples(node: dict, ctx: dict, vocab, out: list, bnode_counter: list):
    subj = node.get("@id")
    if subj is None:
        bnode_counter[0] += 1
        subj = f"_:jld{bnode_counter[0]}"
    else:
        subj = _expand(subj, ctx, None)

    for key, value in node.items():
        if key in ("@id", "@context"):
            continue
        if key == "@type":
            types = value if isinstance(value, list) else [value]
            for t in types:
                out.append((subj, RDF_TYPE, _expand(t, ctx, vocab), "iri",
                            None, None, None))
            continue
        if key.startswith("@"):
            continue
        pred = _expand(key, ctx, vocab)
        values = value if isinstance(value, list) else [value]
        for v in values:
            if isinstance(v, dict):
                if "@id" in v and "@value" not in v:
                    out.append((subj, pred, _expand(v["@id"], ctx, None),
                                "iri", None, None, None))
                elif "@value" in v:
                    dt = v.get("@type")
                    out.append((subj, pred, str(v["@value"]), "literal",
                                _expand(dt, ctx, None) if dt else None,
                                v.get("@language"), None))
                else:  # nested node object
                    child = _node_triples(v, ctx, vocab, out, bnode_counter)
                    kind = "bnode" if child.startswith("_:") else "iri"
                    out.append((subj, pred, child, kind, None, None, None))
            elif isinstance(v, bool):
                out.append((subj, pred, "true" if v else "false", "literal",
                            "http://www.w3.org/2001/XMLSchema#boolean", None, None))
            elif isinstance(v, int):
                out.append((subj, pred, str(v), "literal",
                            "http://www.w3.org/2001/XMLSchema#integer", None, None))
            elif isinstance(v, float):
                out.append((subj, pred, repr(v), "literal",
                            "http://www.w3.org/2001/XMLSchema#double", None, None))
            else:
                out.append((subj, pred, str(v), "literal", None, None, None))
    return subj


def parse_jsonld(text: str) -> list[tuple]:
    """Parse a JSON-LD document into triple tuples (same shape as turtle)."""
    doc = json.loads(text)
    if not isinstance(doc, (dict, list)):
        raise JsonLdParseError("JSON-LD document must be an object or array")
    if isinstance(doc, dict):
        ctx = doc.get("@context") or {}
        if not isinstance(ctx, dict):
            ctx = {}
        vocab = ctx.get("@vocab")
        nodes = doc.get("@graph")
        if nodes is None:
            nodes = [doc]
        elif isinstance(nodes, dict):
            nodes = [nodes]
    else:
        ctx, vocab, nodes = {}, None, doc

    out: list[tuple] = []
    counter = [0]
    for node in nodes:
        if isinstance(node, dict):
            _node_triples(node, ctx, vocab, out, counter)
    return out
