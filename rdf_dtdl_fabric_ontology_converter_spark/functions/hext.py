"""HexTuples (ND-JSON) span parser → triple tuples.

Each line is a 6-element JSON string array
``[subject, predicate, value, datatype, language, graph]`` where the
datatype slot is ``"globalId"`` (object is an IRI), ``"localId"`` (object
is a blank node, value spelled ``_:label``) or a literal datatype IRI;
language is ``""`` unless the literal is language-tagged; graph is ``""``
for the default graph (public HexTuples profile as implemented by rdflib,
which the reference delegates to — reference:
src/formats/rdf/rdf_parser.py:187-229 lists 'hext' as a dataset format).

Returns the shared 7-tuple shape
``(subj, pred, obj, obj_kind, obj_datatype, lang, graph_ctx)``; blank
nodes keep their ``_:label`` spelling and are doc-qualified by the caller.
"""

from __future__ import annotations

import json


class HextParseError(ValueError):
    pass


def parse_hext(text: str) -> list[tuple]:
    triples: list[tuple] = []
    for ln, line in enumerate(text.splitlines(), 1):
        line = line.strip()
        if not line:
            continue
        try:
            row = json.loads(line)
        except ValueError as e:
            raise HextParseError(f"line {ln}: invalid JSON: {e}") from e
        if not isinstance(row, list) or len(row) != 6:
            raise HextParseError(
                f"line {ln}: expected a 6-element JSON array")
        s, p, v, dt, lang, g = row
        if not all(isinstance(x, str) for x in (s, p, v, dt)):
            raise HextParseError(
                f"line {ln}: subject/predicate/value/datatype must be "
                "strings")
        if dt == "globalId":
            kind, odt = "iri", None
        elif dt == "localId":
            kind, odt = "bnode", None
        else:
            kind, odt = "literal", dt or None
        triples.append((s, p, v, kind, odt,
                        lang if isinstance(lang, str) and lang else None,
                        g if isinstance(g, str) and g else None))
    if not triples:
        raise HextParseError("no tuples found")
    return triples
