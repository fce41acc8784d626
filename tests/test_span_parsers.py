"""Unit tests for the pure-Python span parsers (no Spark needed)."""

import corpus
from rdf_dtdl_fabric_ontology_converter_spark.functions.turtle import parse_turtle
from rdf_dtdl_fabric_ontology_converter_spark.functions.jsonld import parse_jsonld
from rdf_dtdl_fabric_ontology_converter_spark.functions.rdfxml import parse_rdfxml

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
OWL_CLASS = "http://www.w3.org/2002/07/owl#Class"
EX = "http://example.org/"


def spo(rows):
    return {(s, p, o) for (s, p, o, *_rest) in rows}


def test_simple_ttl_triples():
    rows = parse_turtle(corpus.TTL["simple"])
    got = spo(rows)
    assert (EX + "Person", RDF_TYPE, OWL_CLASS) in got
    assert (EX + "Organization", RDF_TYPE, OWL_CLASS) in got
    assert (EX + "worksFor",
            "http://www.w3.org/2000/01/rdf-schema#range",
            EX + "Organization") in got
    # reference parses this fixture to 14 triples (rdflib len(graph))
    assert len(got) == 14


def test_union_domain_rdf_list():
    rows = parse_turtle(corpus.TTL["union_domain"])
    preds = {p for (_, p, _, *_r) in rows}
    assert "http://www.w3.org/2002/07/owl#unionOf" in preds
    assert "http://www.w3.org/1999/02/22-rdf-syntax-ns#first" in preds
    firsts = {o for (_, p, o, *_r) in rows
              if p == "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"}
    assert firsts == {EX + "Person", EX + "Organization"}


def test_literals_langs_datatypes():
    rows = parse_turtle(
        '@prefix ex: <http://example.org/> .\n'
        'ex:a ex:p "hello"@en ; ex:q "3.5"^^<http://www.w3.org/2001/XMLSchema#decimal> ;'
        ' ex:r 42 ; ex:s true .')
    by_pred = {p.rsplit("/", 1)[-1]: (o, dt, lg)
               for (_, p, o, _k, dt, lg, _g) in rows}
    assert by_pred["p"] == ("hello", None, "en")
    assert by_pred["q"] == ("3.5", "http://www.w3.org/2001/XMLSchema#decimal", None)
    assert by_pred["r"][0] == "42"
    assert by_pred["r"][1].endswith("integer")
    assert by_pred["s"][1].endswith("boolean")


def test_ntriples_and_nquads():
    rows = parse_turtle(
        '<http://a> <http://b> "x"@en <http://g> .\n'
        '<http://a> <http://b> <http://c> .\n')
    assert rows[0][6] == "http://g"      # graph ctx from 4th term
    assert rows[1][6] is None


def test_escapes_and_comments():
    rows = parse_turtle(
        '# a comment\n'
        '@prefix ex: <http://example.org/> .\n'
        'ex:a ex:p "line\\nbreak \\"q\\"" . # trailing\n')
    assert rows[0][2] == 'line\nbreak "q"'


def test_long_string():
    rows = parse_turtle(
        '@prefix ex: <http://example.org/> .\n'
        'ex:a ex:p """multi\nline "quoted" text""" .')
    assert rows[0][2] == 'multi\nline "quoted" text'


def test_jsonld_graph():
    doc = '''{
      "@context": {"owl": "http://www.w3.org/2002/07/owl#",
                   "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
                   "ex": "http://example.org/"},
      "@graph": [
        {"@id": "ex:Person", "@type": "owl:Class", "rdfs:label": "Person"},
        {"@id": "ex:Child", "@type": "owl:Class",
         "rdfs:subClassOf": {"@id": "ex:Person"}}
      ]}'''
    got = spo(parse_jsonld(doc))
    assert (EX + "Person", RDF_TYPE, OWL_CLASS) in got
    assert (EX + "Child", "http://www.w3.org/2000/01/rdf-schema#subClassOf",
            EX + "Person") in got


def test_rdfxml_sample():
    doc = '''<?xml version="1.0"?>
    <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
             xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
             xmlns:owl="http://www.w3.org/2002/07/owl#">
      <owl:Class rdf:about="http://example.org/Person">
        <rdfs:label>Person</rdfs:label>
        <rdfs:subClassOf rdf:resource="http://example.org/Agent"/>
      </owl:Class>
    </rdf:RDF>'''
    got = spo(parse_rdfxml(doc))
    assert (EX + "Person", RDF_TYPE, OWL_CLASS) in got
    assert (EX + "Person", "http://www.w3.org/2000/01/rdf-schema#label",
            "Person") in got
    assert (EX + "Person", "http://www.w3.org/2000/01/rdf-schema#subClassOf",
            EX + "Agent") in got


def test_cross_serialization_consistency():
    """Same ontology in ttl vs jsonld vs rdf/xml must yield identical triples
    (reference: tests/rdf/test_rdf_formats.py:446-576)."""
    ttl = ('@prefix owl: <http://www.w3.org/2002/07/owl#> .\n'
           '@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n'
           '@prefix ex: <http://example.org/> .\n'
           'ex:Device a owl:Class ; rdfs:label "Device" .\n'
           'ex:Sensor a owl:Class ; rdfs:subClassOf ex:Device .\n')
    jld = '''{
      "@context": {"owl": "http://www.w3.org/2002/07/owl#",
                   "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
                   "ex": "http://example.org/"},
      "@graph": [
        {"@id": "ex:Device", "@type": "owl:Class", "rdfs:label": "Device"},
        {"@id": "ex:Sensor", "@type": "owl:Class",
         "rdfs:subClassOf": {"@id": "ex:Device"}}]}'''
    xml = '''<?xml version="1.0"?>
    <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
             xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
             xmlns:owl="http://www.w3.org/2002/07/owl#">
      <owl:Class rdf:about="http://example.org/Device">
        <rdfs:label>Device</rdfs:label>
      </owl:Class>
      <owl:Class rdf:about="http://example.org/Sensor">
        <rdfs:subClassOf rdf:resource="http://example.org/Device"/>
      </owl:Class>
    </rdf:RDF>'''
    assert spo(parse_turtle(ttl)) == spo(parse_jsonld(jld)) == spo(parse_rdfxml(xml))


def test_all_corpus_fixtures_parse():
    for name, text in corpus.TTL.items():
        rows = parse_turtle(text)
        assert rows, name


def test_hextuples():
    from rdf_dtdl_fabric_ontology_converter_spark.functions.hext import (
        HextParseError, parse_hext)
    from rdf_dtdl_fabric_ontology_converter_spark.operators.extract import (
        sniff_format)
    import json
    import pytest
    lines = [
        [EX + "Person", RDF_TYPE, OWL_CLASS, "globalId", "", ""],
        [EX + "Person", EX + "label", "Person", "http://www.w3.org/2001/XMLSchema#string", "", ""],
        [EX + "Person", EX + "note", "hello", "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString", "en", ""],
        ["_:b0", EX + "memberOf", "_:b1", "localId", "", EX + "g1"],
    ]
    text = "\n".join(json.dumps(x) for x in lines)
    assert sniff_format(text) == "hext"
    rows = parse_hext(text)
    assert (EX + "Person", RDF_TYPE, OWL_CLASS) in spo(rows)
    kinds = {(s, o): k for (s, _p, o, k, *_r) in rows}
    assert kinds[(EX + "Person", OWL_CLASS)] == "iri"
    assert kinds[("_:b0", "_:b1")] == "bnode"
    lit = [r for r in rows if r[2] == "hello"][0]
    assert lit[3] == "literal" and lit[5] == "en"
    graphs = {r[6] for r in rows}
    assert graphs == {None, EX + "g1"}
    with pytest.raises(HextParseError):
        parse_hext('["only", "three", "slots"]')
    # single-line hext is still valid whole-doc JSON: must NOT sniff jsonld
    assert sniff_format(json.dumps(lines[0])) == "hext"


def test_rdfa_lite():
    from rdf_dtdl_fabric_ontology_converter_spark.functions.htmlrdf import parse_rdfa
    from rdf_dtdl_fabric_ontology_converter_spark.operators.extract import (
        sniff_format)
    html = """<!DOCTYPE html>
<html lang="en"><body vocab="http://schema.org/"
      prefix="ex: http://example.org/">
  <div about="ex:alice" typeof="Person">
    <span property="name">Alice</span>
    <a property="url" href="http://alice.example/">home</a>
    <meta property="ex:age" content="30"
          datatype="http://www.w3.org/2001/XMLSchema#integer">
    <div property="knows" typeof="Person">
      <span property="name">Bob</span>
    </div>
  </div>
</body></html>"""
    assert sniff_format(html) == "rdfa"
    rows = parse_rdfa(html)
    got = spo(rows)
    alice = "http://example.org/alice"
    assert (alice, RDF_TYPE, "http://schema.org/Person") in got
    assert (alice, "http://schema.org/name", "Alice") in got
    assert (alice, "http://schema.org/url", "http://alice.example/") in got
    by = {(s, p): (o, k, dt, lg) for (s, p, o, k, dt, lg, _g) in rows}
    assert by[(alice, "http://example.org/age")][0] == "30"
    assert by[(alice, "http://example.org/age")][2].endswith("integer")
    assert by[(alice, "http://schema.org/name")][3] == "en"  # lang cascade
    # chaining: knows → bnode that carries Bob's name
    knows = by[(alice, "http://schema.org/knows")]
    assert knows[1] == "bnode"
    bob = knows[0]
    assert (bob, "http://schema.org/name", "Bob") in got
    assert (bob, RDF_TYPE, "http://schema.org/Person") in got


def test_rdfa_subject_resolution():
    """RDFa 1.1 subject rules (round-3 ADVICE): @about+@property attaches to
    the about IRI; @property+@resource chains the resource as descendant
    subject (typeof not required)."""
    from rdf_dtdl_fabric_ontology_converter_spark.functions.htmlrdf import parse_rdfa
    h = """<html><body vocab="http://schema.org/">
    <span about="http://e.org/alice" property="name">Alice</span>
    <div about="http://e.org/alice">
      <span property="knows" resource="http://e.org/bob">
        <span property="name">Bob</span>
      </span>
    </div></body></html>"""
    got = spo(parse_rdfa(h))
    assert ("http://e.org/alice", "http://schema.org/name", "Alice") in got
    assert ("http://e.org/alice", "http://schema.org/knows",
            "http://e.org/bob") in got
    assert ("http://e.org/bob", "http://schema.org/name", "Bob") in got


def test_rdfa_rel_rev():
    """@rel/@rev: immediate objects, incomplete-triple completion by each
    descendant subject, @rev inversion, HTML link relations ignored."""
    from rdf_dtdl_fabric_ontology_converter_spark.functions.htmlrdf import parse_rdfa
    h = """<html><head><link rel="stylesheet" href="x.css"></head>
    <body vocab="http://schema.org/" prefix="ex: http://ex.org/">
    <div about="http://e.org/alice" rel="ex:follows"
         resource="http://e.org/carol"></div>
    <div about="http://e.org/alice" rel="knows">
      <div about="http://e.org/bob"><span property="name">Bob</span></div>
      <div about="http://e.org/eve"><span property="name">Eve</span></div>
    </div>
    <div about="http://e.org/doc" rev="author"
         resource="http://e.org/alice"></div>
    </body></html>"""
    rows = parse_rdfa(h)
    got = spo(rows)
    assert ("http://e.org/alice", "http://ex.org/follows",
            "http://e.org/carol") in got
    # incomplete triples completed by BOTH sibling subjects
    assert ("http://e.org/alice", "http://schema.org/knows",
            "http://e.org/bob") in got
    assert ("http://e.org/alice", "http://schema.org/knows",
            "http://e.org/eve") in got
    assert ("http://e.org/bob", "http://schema.org/name", "Bob") in got
    # @rev inverts subject/object
    assert ("http://e.org/alice", "http://schema.org/author",
            "http://e.org/doc") in got
    # rel="stylesheet" (no vocab in <head>) is a link relation, not a triple
    assert all(p != "stylesheet" and not p.endswith("/stylesheet")
               for (_s, p, _o) in got)


def test_sniff_html_edge_cases():
    """Round-3 ADVICE: itemscope beyond the sniff prefix; XHTML+RDFa."""
    from rdf_dtdl_fabric_ontology_converter_spark.functions.htmlrdf import (
        parse_microdata)
    from rdf_dtdl_fabric_ontology_converter_spark.operators.extract import (
        _parse_span, sniff_format)
    filler = "\n".join(f"  <p>paragraph {i} of plain filler text</p>"
                       for i in range(200))
    late = ("<!DOCTYPE html>\n<html><body>\n" + filler +
            '\n<div itemscope itemtype="https://schema.org/Thing" '
            'itemid="http://e.org/t"><span itemprop="name">T</span></div>'
            "\n</body></html>")
    assert len(late[:2048].lower().split("itemscope")) == 1  # beyond prefix
    assert sniff_format(late) == "microdata"
    assert ("http://e.org/t", "https://schema.org/name", "T") in spo(
        parse_microdata(late))
    xhtml = ('<?xml version="1.0" encoding="UTF-8"?>\n'
             '<html xmlns="http://www.w3.org/1999/xhtml">'
             '<body vocab="http://schema.org/">'
             '<span about="http://e.org/a" property="name">A</span>'
             "</body></html>")
    assert sniff_format(xhtml) == "rdfa"
    fmt, rows, err = _parse_span(xhtml)
    assert err is None and fmt == "rdfa"
    assert ("http://e.org/a", "http://schema.org/name", "A") in spo(rows)
    # mis-sniffed flavor falls back to the sibling HTML parser
    trick = ('<!DOCTYPE html><html><body>'
             '<p>the itemscope attribute is discussed here</p>'
             '<span about="http://e.org/b" property="http://s.org/name">B'
             "</span></body></html>")
    assert sniff_format(trick) == "microdata"
    fmt, rows, err = _parse_span(trick)
    assert err is None and fmt == "rdfa"
    assert ("http://e.org/b", "http://s.org/name", "B") in spo(rows)


def test_microdata():
    from rdf_dtdl_fabric_ontology_converter_spark.functions.htmlrdf import (
        parse_microdata)
    from rdf_dtdl_fabric_ontology_converter_spark.operators.extract import (
        sniff_format)
    html = """<!DOCTYPE html>
<html><body>
  <div itemscope itemtype="https://schema.org/Person"
       itemid="http://example.org/carol">
    <span itemprop="name">Carol</span>
    <img itemprop="image" src="http://example.org/carol.jpg">
    <time itemprop="birthDate" datetime="1990-01-02">Jan 2 1990</time>
    <div itemprop="address" itemscope
         itemtype="https://schema.org/PostalAddress">
      <span itemprop="addressLocality">Springfield</span>
    </div>
  </div>
</body></html>"""
    assert sniff_format(html) == "microdata"
    rows = parse_microdata(html)
    got = spo(rows)
    carol = "http://example.org/carol"
    assert (carol, RDF_TYPE, "https://schema.org/Person") in got
    assert (carol, "https://schema.org/name", "Carol") in got
    assert (carol, "https://schema.org/image",
            "http://example.org/carol.jpg") in got
    assert (carol, "https://schema.org/birthDate", "1990-01-02") in got
    addr = [o for (s, p, o) in got
            if p == "https://schema.org/address"][0]
    assert addr.startswith("_:")
    assert (addr, "https://schema.org/addressLocality", "Springfield") in got
    assert (addr, RDF_TYPE, "https://schema.org/PostalAddress") in got


def test_n3_formulae_degrade_to_skips():
    """An N3 rule file yields its plain triples PLUS skip records for the
    N3-only statements ({..} => {..}, <=, log:implies, @forAll), never a
    document-level parse error; N3 '=' becomes owl:sameAs."""
    from rdf_dtdl_fabric_ontology_converter_spark.functions.turtle import (
        OWL_SAME_AS, parse_turtle_with_skips)
    n3 = """@prefix : <http://e.org/> .
@prefix log: <http://www.w3.org/2000/10/swap/log#> .
:alice a :Person .
{ ?x a :Person } => { ?x a :Agent } .
:bob = :robert .
@forAll :x .
{ :premise :p ?y } log:implies { :conclusion :q ?y } .
:carol a :Person ; :knows :alice .
:dave :says { :sky :is :blue } .
"""
    rows, skips = parse_turtle_with_skips(n3)
    spo_rows = {(s, p, o) for (s, p, o, *_rest) in rows}
    assert ("http://e.org/alice", RDF_TYPE, "http://e.org/Person") in spo_rows
    assert ("http://e.org/carol", "http://e.org/knows",
            "http://e.org/alice") in spo_rows
    assert ("http://e.org/bob", OWL_SAME_AS, "http://e.org/robert") in spo_rows
    # 3 rules/quantifiers + 1 formula object = 4 skips, no Agent triples
    assert len(skips) == 4
    assert not any("Agent" in o for (_s, _p, o) in spo_rows)
    # extractor surface: triples AND a skip row from the same span
    from rdf_dtdl_fabric_ontology_converter_spark.operators.extract import (
        _parse_span)
    fmt, rows2, err = _parse_span(n3)
    assert fmt == "turtle" and len(rows2) == len(rows)
    assert err is not None and "N3-only" in err


def test_microdata_itemref():
    """WHATWG §5.2 itemref: an item's properties include those crawled
    from the id-referenced subtrees — shared between items, forward or
    backward references, cycles terminate (spec's band/name example)."""
    from rdf_dtdl_fabric_ontology_converter_spark.functions.htmlrdf import (
        parse_microdata)
    html = """<!DOCTYPE html>
<html><body>
 <div itemscope itemtype="https://schema.org/Person"
      itemid="http://e.org/amanda" itemref="a b"></div>
 <p id="a">Name: <span itemprop="name">Amanda</span></p>
 <div id="b" itemprop="band" itemscope
      itemtype="https://schema.org/MusicGroup" itemref="c"></div>
 <div id="c">
  <p>Band: <span itemprop="name">Jazz Band</span></p>
  <p>Size: <span itemprop="size">12</span> players</p>
 </div>
</body></html>"""
    got = spo(parse_microdata(html))
    amanda = "http://e.org/amanda"
    assert (amanda, "https://schema.org/name", "Amanda") in got
    band = [o for (s, p, o) in got
            if s == amanda and p == "https://schema.org/band"][0]
    assert band.startswith("_:")
    assert (band, RDF_TYPE, "https://schema.org/MusicGroup") in got
    assert (band, "https://schema.org/name", "Jazz Band") in got
    assert (band, "https://schema.org/size", "12") in got
    # the band's itemref-crawled props must NOT leak onto amanda
    assert (amanda, "https://schema.org/size", "12") not in got
    # self-referential itemref cycle terminates with the prop exactly once
    cyc = ('<div itemscope itemid="http://e.org/x" itemref="z"></div>'
           '<div id="z" itemref="z"><span itemprop="p">v</span></div>')
    rows = parse_microdata(cyc)
    assert [r[:3] for r in rows].count(("http://e.org/x", "p", "v")) == 1


# --- property-based round-trips (beyond the reference's test strategy:
# it has no randomized tests; hypothesis shakes the tokenizer escape paths)

from hypothesis import given, settings
from hypothesis import strategies as st


def _ttl_escape(s: str) -> str:
    return (s.replace("\\", "\\\\").replace('"', '\\"')
            .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t"))


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=60))
def test_turtle_literal_roundtrip_property(s):
    ttl = f'<http://s> <http://p> "{_ttl_escape(s)}" .'
    rows = parse_turtle(ttl)
    assert len(rows) == 1
    assert rows[0][2] == s and rows[0][3] == "literal"


@settings(max_examples=100, deadline=None)
@given(st.lists(
    st.tuples(st.sampled_from(["http://a", "http://b", "_:x"]),
              st.just("http://p"),
              st.text(max_size=30),
              st.sampled_from(["globalId", "localId",
                               "http://www.w3.org/2001/XMLSchema#string"]),
              st.sampled_from(["", "en"]),
              st.sampled_from(["", "http://g"])),
    min_size=1, max_size=10))
def test_hext_roundtrip_property(rows):
    import json as _json
    from rdf_dtdl_fabric_ontology_converter_spark.functions.hext import parse_hext
    text = "\n".join(_json.dumps(list(r)) for r in rows)
    got = parse_hext(text)
    assert len(got) == len(rows)
    for (s, p, v, dt, lang, g), (gs, gp, gv, kind, gdt, glang, gctx) in zip(
            rows, got):
        assert (gs, gp, gv) == (s, p, v)
        assert kind == {"globalId": "iri", "localId": "bnode"}.get(
            dt, "literal")
        assert glang == (lang or None)
        assert gctx == (g or None)


def test_rdfa_inlist_and_xmlns():
    """@inlist builds rdf:first/rest chains per (subject, predicate) in
    document order (RDFa 1.1 §7.5 step 11 list semantics, common-case);
    xmlns:foo declarations act as prefix mappings (RDFa 1.0 back-compat)."""
    from rdf_dtdl_fabric_ontology_converter_spark.functions.htmlrdf import (
        RDF_FIRST, RDF_NIL, RDF_REST, parse_rdfa)
    html = """<html><body vocab="http://purl.org/dc/terms/"
      prefix="ex: http://example.org/">
    <p about="ex:doc">
      <span property="creator" inlist content="Alice"></span>
      <span property="creator" inlist>Bob</span>
      <a rel="references" inlist href="http://example.org/r1">r1</a>
      <a rel="references" inlist href="http://example.org/r2">r2</a>
    </p>
    <p xmlns:foaf="http://xmlns.com/foaf/0.1/" about="ex:alice"
       property="foaf:name">Alice P</p>
    </body></html>"""
    triples = parse_rdfa(html)
    by_sp = {}
    for s, p, o, k, *_ in triples:
        by_sp.setdefault((s, p), []).append((o, k))

    # xmlns: prefix resolved
    assert by_sp[("http://example.org/alice",
                  "http://xmlns.com/foaf/0.1/name")] == \
        [("Alice P", "literal")]

    def walk(head):
        out = []
        node = head
        while node != RDF_NIL:
            (first, _), = by_sp[(node, RDF_FIRST)]
            out.append(first)
            (node, _), = by_sp[(node, RDF_REST)]
        return out

    (creators_head, k), = by_sp[("http://example.org/doc",
                                 "http://purl.org/dc/terms/creator")]
    assert k == "bnode" and walk(creators_head) == ["Alice", "Bob"]
    (refs_head, _), = by_sp[("http://example.org/doc",
                             "http://purl.org/dc/terms/references")]
    assert walk(refs_head) == ["http://example.org/r1",
                               "http://example.org/r2"]


def test_rdfa_initial_context_and_base():
    """RDFa 1.1 initial context: dc:/foaf:/schema: work UNDECLARED
    (locally-declared prefixes win); @about/@resource/@href resolve
    relative IRIs against <base href>, and @vocab does NOT apply to
    @about (SafeCURIEorCURIEorIRI grammar)."""
    from rdf_dtdl_fabric_ontology_converter_spark.functions.htmlrdf import (
        parse_rdfa)
    html = ('<html><head><base href="http://ex.org/dir/page"></head>'
            '<body vocab="http://schema.org/">'
            '<div about="#me" property="dc:title">T</div>'
            '<div about="http://ex.org/a" property="foaf:name">F</div>'
            '<p prefix="dc: http://other.org/" about="http://ex.org/b"'
            '   property="dc:title">local wins</p>'
            '<a about="http://ex.org/c" property="name" href="../up">L</a>'
            "</body></html>")
    got = spo(parse_rdfa(html))
    # relative @about resolved against base, initial-context dc: prefix
    assert ("http://ex.org/dir/page#me",
            "http://purl.org/dc/terms/title", "T") in got
    assert ("http://ex.org/a", "http://xmlns.com/foaf/0.1/name", "F") in got
    # locally-declared dc: overrides the initial context
    assert ("http://ex.org/b", "http://other.org/title", "local wins") in got
    # relative @href resolved against base (../up from /dir/page)
    assert ("http://ex.org/c", "http://schema.org/name",
            "http://ex.org/up") in got


def test_microdata_base_href():
    """Microdata itemid and href/src property values resolve against
    <base href>."""
    from rdf_dtdl_fabric_ontology_converter_spark.functions.htmlrdf import (
        parse_microdata)
    html = ('<html><head><base href="http://ex.org/dir/"></head><body>'
            '<div itemscope itemtype="https://schema.org/Thing"'
            '     itemid="things/1">'
            '<a itemprop="url" href="../about">x</a></div>'
            "</body></html>")
    got = spo(parse_microdata(html))
    assert ("http://ex.org/dir/things/1", RDF_TYPE,
            "https://schema.org/Thing") in got
    assert ("http://ex.org/dir/things/1", "https://schema.org/url",
            "http://ex.org/about") in got


@given(st.integers(1, 8), st.integers(1, 4), st.randoms())
@settings(max_examples=25, deadline=None)
def test_n3_rule_interleaving_property(n_stmts, n_rules, rnd):
    """Property: interleaving N3 rules anywhere between plain statements
    never errors, preserves exactly the plain triples, and records one
    skip per rule."""
    from rdf_dtdl_fabric_ontology_converter_spark.functions.turtle import (
        parse_turtle_with_skips)
    stmts = [f"<http://e.org/s{i}> <http://e.org/p> <http://e.org/o{i}> ."
             for i in range(n_stmts)]
    rules = [("{ ?x <http://e.org/p> ?y } => "
              "{ ?y <http://e.org/q> ?x } .")] * n_rules
    mixed = stmts + rules
    rnd.shuffle(mixed)
    rows, skips = parse_turtle_with_skips("\n".join(mixed))
    assert len(skips) == n_rules
    assert {(s, o) for (s, _p, o, *_r) in rows} == {
        (f"http://e.org/s{i}", f"http://e.org/o{i}")
        for i in range(n_stmts)}


_TAG_SOUP = st.lists(st.sampled_from([
    "<div itemscope>", "</div>", "<span itemprop='p'>", "</span>",
    "<p id='a'>", "</p>", "<div itemref='a b'>", "<base href='/x/'>",
    "<div about='#m' property='dc:title'>", "<div vocab='http://s.o/'>",
    "text chunk", "<img src='i.png' itemprop='im'>", "<b>", "</i>",
    "<div typeof='Thing'>", "<a href='u' rel='x:y'>", "&amp;", "<!-- c -->",
]), min_size=1, max_size=30)


@given(_TAG_SOUP)
@settings(max_examples=60, deadline=None)
def test_html_parsers_never_crash_on_tag_soup(parts):
    """Property: arbitrarily nested/unbalanced markup either parses to
    triples or raises the typed HtmlRdfParseError — never an unhandled
    exception (the extractor turns the typed error into a skip row)."""
    from rdf_dtdl_fabric_ontology_converter_spark.functions.htmlrdf import (
        HtmlRdfParseError, parse_microdata, parse_rdfa)
    doc = "<html><body>" + "".join(parts) + "</body></html>"
    for parse in (parse_rdfa, parse_microdata):
        try:
            rows = parse(doc)
            assert isinstance(rows, list) and rows
            assert all(len(r) == 7 for r in rows)
        except HtmlRdfParseError:
            pass


# --- full-document turtle round-trip (round-4 verdict item 8): generate a
# triple SET, render it as grouped Turtle (;/, groupings, `a`, comments,
# datatypes, langs, bnodes), parse it back, assert set equality. Locks the
# hand-written grammar against regression while adjacent code changes.

_IRI_CHARS = "abcdefghij0123456789/#-_.~"
_iri = st.builds(lambda s: "http://e.org/" + s,
                 st.text(alphabet=_IRI_CHARS, min_size=1, max_size=10))
_bnode = st.builds(lambda s: "_:" + s,
                   st.from_regex(r"[A-Za-z][A-Za-z0-9]{0,6}",
                                 fullmatch=True))
_lang = st.from_regex(r"[a-z]{2}(-[a-z0-9]{1,4})?", fullmatch=True)
_RDF_TYPE_IRI = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_obj = st.one_of(
    st.tuples(_iri, st.just("iri"), st.none(), st.none()),
    st.tuples(_bnode, st.just("bnode"), st.none(), st.none()),
    st.tuples(st.text(max_size=25), st.just("literal"), st.none(),
              st.one_of(st.none(), _lang)),
    st.tuples(st.text(max_size=25), st.just("literal"), _iri, st.none()),
)

_doc_triples = st.lists(
    st.tuples(st.one_of(_iri, _bnode),             # subj
              st.one_of(_iri, st.just(_RDF_TYPE_IRI)),  # pred
              _obj),
    min_size=1, max_size=12)


def _render_term(obj, kind, dt, lang):
    if kind == "iri":
        return f"<{obj}>"
    if kind == "bnode":
        return obj
    lit = f'"{_ttl_escape(obj)}"'
    if dt:
        return f"{lit}^^<{dt}>"
    if lang:
        return f"{lit}@{lang}"
    return lit


def _render_doc(triples, use_groups: bool, use_a: bool) -> str:
    lines = ["# generated by the round-trip fuzz", ""]
    if not use_groups:
        for s, p, (o, k, dt, lg) in triples:
            subj = s if s.startswith("_:") else f"<{s}>"
            pred = ("a" if use_a and p == _RDF_TYPE_IRI else f"<{p}>")
            lines.append(f"{subj} {pred} {_render_term(o, k, dt, lg)} .")
        return "\n".join(lines) + "\n"
    by_subj = {}
    for s, p, obj in triples:
        by_subj.setdefault(s, {}).setdefault(p, []).append(obj)
    for s, preds in by_subj.items():
        subj = s if s.startswith("_:") else f"<{s}>"
        parts = []
        for p, objs in preds.items():
            pred = ("a" if use_a and p == _RDF_TYPE_IRI else f"<{p}>")
            rendered = " , ".join(_render_term(*o) for o in objs)
            parts.append(f"{pred} {rendered}")
        lines.append(f"{subj} " + " ;\n    ".join(parts) + " .")
    return "\n".join(lines) + "\n"


@settings(max_examples=150, deadline=None)
@given(_doc_triples, st.booleans(), st.booleans())
def test_turtle_document_roundtrip_property(triples, use_groups, use_a):
    text = _render_doc(triples, use_groups, use_a)
    got = {(s, p, o, k, dt, lg)
           for (s, p, o, k, dt, lg, _g) in parse_turtle(text)}
    want = {(s, p, o, k, dt, lg)
            for (s, p, (o, k, dt, lg)) in triples}
    assert got == want
