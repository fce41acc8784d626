"""RDF/XML (and TriX) parser → triple tuples, stdlib xml.etree only.

Covers the RDF/XML subset in the reference sample corpus
(reference: samples/rdf/sample_iot_ontology.rdf): typed node elements
(``<owl:Class rdf:about=...>``), ``rdf:Description``, nested property
elements with ``rdf:resource`` references or literal text content,
``rdf:datatype``, ``xml:lang``, ``rdf:nodeID`` and ``rdf:parseType=
"Resource"`` blank nodes.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE = RDF_NS + "type"

_R = "{" + RDF_NS + "}"
_XML_LANG = "{http://www.w3.org/XML/1998/namespace}lang"


class RdfXmlParseError(ValueError):
    pass


def _uri(tag: str) -> str:
    # ElementTree tags look like '{namespace}local'
    if tag.startswith("{"):
        ns, local = tag[1:].split("}", 1)
        return ns + local
    return tag


def _parse_node(elem, out, counter, base):
    subj = elem.get(_R + "about") or elem.get(_R + "ID")
    if subj is None:
        node_id = elem.get(_R + "nodeID")
        if node_id is not None:
            subj = f"_:{node_id}"
        else:
            counter[0] += 1
            subj = f"_:xml{counter[0]}"
    tag_uri = _uri(elem.tag)
    if tag_uri != RDF_NS + "Description":
        out.append((subj, RDF_TYPE, tag_uri, "iri", None, None, None))
    for prop in elem:
        pred = _uri(prop.tag)
        res = prop.get(_R + "resource")
        node_id = prop.get(_R + "nodeID")
        if res is not None:
            out.append((subj, pred, res, "iri", None, None, None))
        elif node_id is not None:
            out.append((subj, pred, f"_:{node_id}", "bnode", None, None, None))
        elif prop.get(_R + "parseType") == "Resource" or len(prop) > 0:
            if prop.get(_R + "parseType") == "Resource":
                counter[0] += 1
                child_subj = f"_:xml{counter[0]}"
                out.append((subj, pred, child_subj, "bnode", None, None, None))
                # treat the property element itself as a node description
                fake = ET.Element(_R + "Description")
                fake.set(_R + "nodeID", child_subj[2:])
                fake.extend(list(prop))
                _parse_node(fake, out, counter, base)
            else:
                for child in prop:
                    child_subj = _parse_node(child, out, counter, base)
                    kind = "bnode" if child_subj.startswith("_:") else "iri"
                    out.append((subj, pred, child_subj, kind, None, None, None))
        else:
            dt = prop.get(_R + "datatype")
            lang = prop.get(_XML_LANG)
            out.append((subj, pred, prop.text or "", "literal", dt, lang, None))
    return subj


def parse_rdfxml(text: str) -> list[tuple]:
    """Parse RDF/XML into (subj,pred,obj,obj_kind,obj_datatype,lang,graph_ctx)."""
    try:
        root = ET.fromstring(text)
    except ET.ParseError as e:
        raise RdfXmlParseError(str(e)) from e
    out: list[tuple] = []
    counter = [0]
    if _uri(root.tag) == RDF_NS + "RDF":
        nodes = list(root)
    else:
        nodes = [root]
    for node in nodes:
        _parse_node(node, out, counter, None)
    return out


def parse_trix(text: str) -> list[tuple]:
    """Parse TriX (W3C triples-in-XML) into triple tuples with graph_ctx."""
    try:
        root = ET.fromstring(text)
    except ET.ParseError as e:
        raise RdfXmlParseError(str(e)) from e
    out: list[tuple] = []

    def local(tag):
        return tag.split("}", 1)[-1]

    for graph in root:
        if local(graph.tag) != "graph":
            continue
        ctx = None
        triples = []
        for child in graph:
            if local(child.tag) == "uri" and ctx is None and len(list(child)) == 0:
                ctx = child.text
            elif local(child.tag) == "triple":
                triples.append(child)
        for t in triples:
            terms = []
            for term in t:
                kind = local(term.tag)
                if kind == "uri":
                    terms.append((term.text, "iri", None, None))
                elif kind == "id":
                    terms.append((f"_:{term.text}", "bnode", None, None))
                elif kind == "plainLiteral":
                    terms.append((term.text or "", "literal", None,
                                  term.get(_XML_LANG)))
                elif kind == "typedLiteral":
                    terms.append((term.text or "", "literal",
                                  term.get("datatype"), None))
            if len(terms) == 3:
                (s, _, _, _), (p, _, _, _), (o, ok, dt, lg) = terms
                out.append((s, p, o, ok, dt, lg, ctx))
    return out
