"""Scored conformance corpus for the RDFa 1.1 / microdata span parsers.

The sandbox has no network, so the OFFICIAL W3C RDFa 1.1 test suite and
microdata-to-RDF suite cannot be vendored; this module instead encodes a
golden corpus of cases AUTHORED FROM THE PUBLIC SPECS (RDFa 1.1 Core/Lite
processing sequence; WHATWG microdata + the W3C microdata-to-RDF note),
each modeled on the official suites' patterns. Every case states the
SPEC-expected triples; the scorecard pins which cases the stdlib parsers
currently pass (``PINNED_PASS_*``) so:

- a regression in any passing case fails the build, and
- the conformance boundary of the documented subset
  (``functions/htmlrdf.py`` module docstring) is MEASURED, not asserted.

Known-fail cases are the subset residue, each annotated with the gap.
Comparison is on (subj, pred, obj) with blank-node isomorphism (brute
bijection over ≤4 labels); cases whose point is a datatype/lang carry an
extra attribute probe.
"""

from __future__ import annotations

from itertools import permutations

import pytest

from rdf_dtdl_fabric_ontology_converter_spark.functions.htmlrdf import (
    HtmlRdfParseError, parse_microdata, parse_rdfa)

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"
S = "http://schema.org/"
EX = "http://example.org/"
DOC = "http://example.com/doc"


def _spo(rows):
    return {(s, p, o) for (s, p, o, k, dt, lg, g) in rows}


def _bnodes(triples):
    out = []
    for s, p, o in triples:
        for t in (s, o):
            if t.startswith("_:") and t not in out:
                out.append(t)
    return out


def _iso_match(got: set, want: set) -> bool:
    """Set equality under some bijection of blank-node labels."""
    gb, wb = _bnodes(sorted(got)), _bnodes(sorted(want))
    if len(gb) != len(wb):
        return False
    if not gb:
        return got == want
    if len(gb) > 4:
        raise ValueError("case has too many bnodes for brute isomorphism")
    for perm in permutations(wb):
        m = dict(zip(gb, perm))

        def r(t):
            return m.get(t, t)

        if {(r(s), p, r(o)) for (s, p, o) in got} == want:
            return True
    return False


# ---------------------------------------------------------------------------
# RDFa 1.1 cases (patterned after the rdfa.info test-suite families)
# ---------------------------------------------------------------------------
# (case_id, html, expected {(s,p,o)}, attr_probe or None)
# attr_probe: (pred, expected_datatype, expected_lang) asserted on the one
# triple with that predicate.

RDFA_CASES = [
    ("r01_about_property",
     f'<div about="{EX}s"><span property="{EX}p">v</span></div>',
     {(f"{EX}s", f"{EX}p", "v")}, None),

    ("r02_content_override",
     f'<meta about="{EX}s" property="{EX}p" content="c">ignored</meta>',
     {(f"{EX}s", f"{EX}p", "c")}, None),

    ("r03_typed_literal",
     f'<span about="{EX}s" property="{EX}p" datatype="{XSD}integer">7'
     '</span>',
     {(f"{EX}s", f"{EX}p", "7")}, (f"{EX}p", f"{XSD}integer", None)),

    ("r04_typeof_with_about",
     f'<div about="{EX}s" typeof="{EX}T"></div>',
     {(f"{EX}s", f"{RDF}type", f"{EX}T")}, None),

    ("r05_bare_typeof_bnode",
     f'<div typeof="{EX}T"><span property="{EX}p">v</span></div>',
     {("_:b0", f"{RDF}type", f"{EX}T"), ("_:b0", f"{EX}p", "v")}, None),

    ("r06_resource_chaining",
     f'<div about="{EX}s"><div property="{EX}p" resource="{EX}o">'
     f'<span property="{EX}q">v</span></div></div>',
     {(f"{EX}s", f"{EX}p", f"{EX}o"), (f"{EX}o", f"{EX}q", "v")}, None),

    ("r07_href_object",
     f'<div about="{EX}s"><a property="{EX}p" href="{EX}o">x</a></div>',
     {(f"{EX}s", f"{EX}p", f"{EX}o")}, None),

    ("r08_src_object",
     f'<div about="{EX}s"><img property="{EX}p" src="{EX}o.png"></div>',
     {(f"{EX}s", f"{EX}p", f"{EX}o.png")}, None),

    ("r09_vocab_inherit_override",
     f'<div vocab="{S}" about="{EX}s"><span property="name">a</span>'
     f'<div vocab="{EX}"><span property="name">b</span></div></div>',
     {(f"{EX}s", f"{S}name", "a"), (f"{EX}s", f"{EX}name", "b")}, None),

    ("r10_prefix_curie",
     f'<div prefix="ex: {EX}" about="[ex:s]">'
     '<span property="ex:p">v</span></div>',
     {(f"{EX}s", f"{EX}p", "v")}, None),

    ("r11_initial_context_prefix",
     f'<div about="{EX}s"><span property="dc:title">t</span></div>',
     {(f"{EX}s", "http://purl.org/dc/terms/title", "t")}, None),

    ("r12_safe_curie_undefined_prefix",
     # an undefined prefix inside a safe CURIE is IGNORED (never the
     # literal IRI "nope:s"); the element then behaves as if @about were
     # absent, so the descendant literal hangs off a fresh bnode
     f'<div about="[nope:s]"><span property="{EX}p">v</span></div>'
     f'<div about="{EX}ok"><span property="{EX}p">w</span></div>',
     {("_:b0", f"{EX}p", "v"), (f"{EX}ok", f"{EX}p", "w")}, None),

    ("r13_base_resolution",
     f'<html><head><base href="{DOC}"></head><body>'
     f'<div about="#frag"><span property="{EX}p">v</span></div>'
     '</body></html>',
     {(f"{DOC}#frag", f"{EX}p", "v")}, None),

    ("r14_lang_inherit",
     f'<div lang="en" about="{EX}s"><span property="{EX}p">v</span></div>',
     {(f"{EX}s", f"{EX}p", "v")}, (f"{EX}p", None, "en")),

    ("r16_rel_curie",
     f'<div prefix="ex: {EX}" about="[ex:s]">'
     f'<a rel="ex:r" href="{EX}o">x</a></div>',
     {(f"{EX}s", f"{EX}r", f"{EX}o")}, None),

    ("r17_rev_inverse",
     f'<div prefix="ex: {EX}" about="[ex:s]">'
     f'<a rev="ex:r" href="{EX}o">x</a></div>',
     {(f"{EX}o", f"{EX}r", f"{EX}s")}, None),

    ("r18_bare_rel_ignored",
     f'<div about="{EX}s"><a rel="nofollow" href="{EX}o">x</a>'
     f'<span property="{EX}p">v</span></div>',
     {(f"{EX}s", f"{EX}p", "v")}, None),

    ("r19_incomplete_triple",
     f'<div prefix="ex: {EX}" about="[ex:a]" rel="ex:knows">'
     '<p about="[ex:b]">x</p></div>',
     {(f"{EX}a", f"{EX}knows", f"{EX}b")}, None),

    ("r20_inlist_literals",
     f'<div prefix="ex: {EX}" about="[ex:s]">'
     '<span inlist="" property="ex:v">A</span>'
     '<span inlist="" property="ex:v">B</span></div>',
     {(f"{EX}s", f"{EX}v", "_:b0"),
      ("_:b0", f"{RDF}first", "A"), ("_:b0", f"{RDF}rest", "_:b1"),
      ("_:b1", f"{RDF}first", "B"), ("_:b1", f"{RDF}rest", f"{RDF}nil")},
     None),

    ("r22_typeof_on_resource_object",
     f'<div prefix="ex: {EX}" about="[ex:s]">'
     f'<a rel="ex:r" href="{EX}o" typeof="ex:T">x</a></div>',
     {(f"{EX}s", f"{EX}r", f"{EX}o"),
      (f"{EX}o", f"{RDF}type", f"{EX}T")}, None),

    ("r23_multi_property",
     f'<div about="{EX}s">'
     f'<span property="{EX}p {EX}q">v</span></div>',
     {(f"{EX}s", f"{EX}p", "v"), (f"{EX}s", f"{EX}q", "v")}, None),

    ("r24_multi_typeof",
     f'<div about="{EX}s" typeof="{EX}T {EX}U"></div>',
     {(f"{EX}s", f"{RDF}type", f"{EX}T"),
      (f"{EX}s", f"{RDF}type", f"{EX}U")}, None),

    ("r25_property_typeof_bnode_chain",
     f'<div about="{EX}s"><div property="{EX}p" typeof="{EX}T">'
     f'<span property="{EX}q">v</span></div></div>',
     {(f"{EX}s", f"{EX}p", "_:b0"), ("_:b0", f"{RDF}type", f"{EX}T"),
      ("_:b0", f"{EX}q", "v")}, None),

    ("r26_xmlns_backcompat",
     f'<div xmlns:ex="{EX}" about="[ex:s]">'
     '<span property="ex:p">v</span></div>',
     {(f"{EX}s", f"{EX}p", "v")}, None),

    ("r28_empty_datatype_plain",
     f'<span about="{EX}s" property="{EX}p" datatype="">txt</span>',
     {(f"{EX}s", f"{EX}p", "txt")}, (f"{EX}p", None, None)),

    ("r30_term_without_vocab_ignored",
     f'<div about="{EX}s"><span property="name">x</span>'
     f'<span property="{EX}p">v</span></div>',
     {(f"{EX}s", f"{EX}p", "v")}, None),

    ("r31_time_datetime_content",
     f'<div about="{EX}s"><time property="{EX}p" '
     'datetime="2026-01-01">New Year</time></div>',
     # RDFa Core: @datetime provides the literal (host-language feature)
     # with its datatype sniffed from the lexical form
     {(f"{EX}s", f"{EX}p", "2026-01-01")},
     (f"{EX}p", f"{XSD}date", None)),

    ("r32_about_overrides_inherited_subject",
     f'<div about="{EX}s"><div about="{EX}t">'
     f'<span property="{EX}p">v</span></div></div>',
     {(f"{EX}t", f"{EX}p", "v")}, None),

    # round-5 additions: harder processing-sequence corners
    ("r33_typed_resource_object",
     f'<div about="{EX}s"><span property="{EX}p" typeof="{EX}T" '
     f'resource="{EX}o">x</span></div>',
     {(f"{EX}s", f"{EX}p", f"{EX}o"),
      (f"{EX}o", f"{RDF}type", f"{EX}T")}, None),

    ("r34_datatype_curie_content",
     # xsd: comes from the RDFa 1.1 initial context
     f'<span about="{EX}s" property="{EX}p" datatype="xsd:integer" '
     'content="42">forty-two</span>',
     {(f"{EX}s", f"{EX}p", "42")}, (f"{EX}p", f"{XSD}integer", None)),

    ("r35_inlist_rel_resources",
     # @inlist on @rel: descendant link targets collected into ONE rdf:List
     f'<div about="{EX}s" rel="schema:item" inlist="">'
     f'<a href="{EX}o1">1</a><a href="{EX}o2">2</a></div>',
     {(f"{EX}s", f"{S}item", "_:b0"),
      ("_:b0", f"{RDF}first", f"{EX}o1"), ("_:b0", f"{RDF}rest", "_:b1"),
      ("_:b1", f"{RDF}first", f"{EX}o2"),
      ("_:b1", f"{RDF}rest", f"{RDF}nil")}, None),

    ("r36_empty_about_is_base",
     f'<html><head><base href="{DOC}"></head><body>'
     f'<span about="" property="{EX}p">v</span></body></html>',
     {(DOC, f"{EX}p", "v")}, None),

    ("r37_safe_curie_resource",
     f'<div prefix="ex: {EX}" about="{EX}s">'
     f'<span property="{EX}p" resource="[ex:o]">x</span></div>',
     {(f"{EX}s", f"{EX}p", f"{EX}o")}, None),

    ("r38_uses_vocabulary",
     # RDFa 1.1 Core step 2: @vocab asserts rdfa:usesVocabulary on the
     # document IRI (here known via <base href>)
     f'<html><head><base href="{DOC}"></head><body vocab="{S}">'
     f'<span about="{EX}s" property="name">n</span></body></html>',
     {(DOC, "http://www.w3.org/ns/rdfa#usesVocabulary", S),
      (f"{EX}s", f"{S}name", "n")}, None),

    ("r39_content_inherits_lang",
     f'<div lang="fr" about="{EX}s">'
     f'<span property="{EX}p" content="chat">cat</span></div>',
     {(f"{EX}s", f"{EX}p", "chat")}, (f"{EX}p", None, "fr")),
]

# Parser output observed to match the spec-expected triples; a case
# leaving this set is a REGRESSION. Residue (documented subset gaps) is
# annotated below.
RDFA_CASES.extend([
    # late round-5 boundary probes, all spec-derived
    ("r40_typed_resource_object_href",
     f'<div about="{EX}s"><a property="{EX}p" typeof="{EX}T" '
     f'href="{EX}o">x</a></div>',
     {(f"{EX}o", f"{RDF}type", f"{EX}T"),
      (f"{EX}s", f"{EX}p", f"{EX}o")}, None),
    ("r41_about_safecurie_bnode",
     f'<div about="[_:x]"><span property="{EX}p">v</span></div>',
     {("_:b0", f"{EX}p", "v")}, None),
    ("r42_xml_lang",
     f'<div about="{EX}s" xml:lang="de"><span property="{EX}p">v</span>'
     '</div>',
     {(f"{EX}s", f"{EX}p", "v")}, (f"{EX}p", None, "de")),
    ("r43_meta_content_lang",
     f'<meta about="{EX}s" property="{EX}p" content="c" lang="fr">',
     {(f"{EX}s", f"{EX}p", "c")}, (f"{EX}p", None, "fr")),
    ("r44_rel_multiple_curies",
     f'<div prefix="ex: {EX}" about="{EX}s">'
     f'<a rel="ex:p ex:q" href="{EX}o">x</a></div>',
     {(f"{EX}s", f"{EX}p", f"{EX}o"),
      (f"{EX}s", f"{EX}q", f"{EX}o")}, None),
])


PINNED_PASS_RDFA = {
    "r40_typed_resource_object_href", "r41_about_safecurie_bnode",
    "r42_xml_lang", "r43_meta_content_lang", "r44_rel_multiple_curies",
    "r01_about_property", "r02_content_override", "r03_typed_literal",
    "r04_typeof_with_about", "r05_bare_typeof_bnode",
    "r06_resource_chaining", "r07_href_object", "r08_src_object",
    "r09_vocab_inherit_override", "r10_prefix_curie",
    "r11_initial_context_prefix", "r12_safe_curie_undefined_prefix",
    "r13_base_resolution", "r14_lang_inherit", "r16_rel_curie",
    "r17_rev_inverse", "r18_bare_rel_ignored", "r19_incomplete_triple",
    "r20_inlist_literals", "r22_typeof_on_resource_object",
    "r23_multi_property", "r24_multi_typeof",
    "r25_property_typeof_bnode_chain", "r26_xmlns_backcompat",
    "r28_empty_datatype_plain", "r30_term_without_vocab_ignored",
    "r31_time_datetime_content", "r32_about_overrides_inherited_subject",
    "r33_typed_resource_object", "r34_datatype_curie_content",
    "r35_inlist_rel_resources", "r36_empty_about_is_base",
    "r37_safe_curie_resource", "r38_uses_vocabulary",
    "r39_content_inherits_lang",
}

# ---------------------------------------------------------------------------
# Microdata cases (patterned after the microdata-to-RDF note's examples)
# ---------------------------------------------------------------------------

MD_CASES = [
    ("m01_basic_item",
     f'<div itemscope itemtype="{S}Person">'
     '<span itemprop="name">Alice</span></div>',
     {("_:b0", f"{RDF}type", f"{S}Person"),
      ("_:b0", f"{S}name", "Alice")}, None),

    ("m02_a_href_value",
     f'<div itemscope itemtype="{S}Person">'
     f'<a itemprop="url" href="{EX}a">x</a></div>',
     {("_:b0", f"{RDF}type", f"{S}Person"),
      ("_:b0", f"{S}url", f"{EX}a")}, None),

    ("m03_img_src_value",
     f'<div itemscope itemtype="{S}Person">'
     f'<img itemprop="image" src="{EX}i.png"></div>',
     {("_:b0", f"{RDF}type", f"{S}Person"),
      ("_:b0", f"{S}image", f"{EX}i.png")}, None),

    ("m04_meta_content",
     f'<div itemscope itemtype="{S}Person">'
     '<meta itemprop="age" content="30"></div>',
     {("_:b0", f"{RDF}type", f"{S}Person"),
      ("_:b0", f"{S}age", "30")}, None),

    ("m05_time_datetime",
     f'<div itemscope itemtype="{S}Event">'
     '<time itemprop="startDate" datetime="2026-01-01">jan</time></div>',
     {("_:b0", f"{RDF}type", f"{S}Event"),
      ("_:b0", f"{S}startDate", "2026-01-01")}, None),

    ("m06_nested_item",
     f'<div itemscope itemtype="{S}Person">'
     f'<div itemprop="address" itemscope itemtype="{S}PostalAddress">'
     '<span itemprop="addressLocality">Town</span></div></div>',
     {("_:b0", f"{RDF}type", f"{S}Person"),
      ("_:b0", f"{S}address", "_:b1"),
      ("_:b1", f"{RDF}type", f"{S}PostalAddress"),
      ("_:b1", f"{S}addressLocality", "Town")}, None),

    ("m07_itemid",
     f'<div itemscope itemtype="{S}Book" itemid="{EX}book1">'
     '<span itemprop="name">B</span></div>',
     {(f"{EX}book1", f"{RDF}type", f"{S}Book"),
      (f"{EX}book1", f"{S}name", "B")}, None),

    ("m08_itemref_backward",
     '<p id="shared"><span itemprop="name">N</span></p>'
     f'<div itemscope itemtype="{S}Person" itemref="shared"></div>',
     {("_:b0", f"{RDF}type", f"{S}Person"),
      ("_:b0", f"{S}name", "N")}, None),

    ("m09_itemref_forward",
     f'<div itemscope itemtype="{S}Person" itemref="sh2"></div>'
     '<p id="sh2"><span itemprop="name">M</span></p>',
     {("_:b0", f"{RDF}type", f"{S}Person"),
      ("_:b0", f"{S}name", "M")}, None),

    ("m10_multi_itemprop",
     f'<div itemscope itemtype="{S}Person">'
     '<span itemprop="name alternateName">A</span></div>',
     {("_:b0", f"{RDF}type", f"{S}Person"),
      ("_:b0", f"{S}name", "A"),
      ("_:b0", f"{S}alternateName", "A")}, None),

    ("m11_multi_itemtype",
     f'<div itemscope itemtype="{S}Person {S}Author">'
     '<span itemprop="name">A</span></div>',
     {("_:b0", f"{RDF}type", f"{S}Person"),
      ("_:b0", f"{RDF}type", f"{S}Author"),
      ("_:b0", f"{S}name", "A")}, None),

    ("m12_base_itemid",
     f'<html><head><base href="{DOC}"></head><body>'
     f'<div itemscope itemtype="{S}Book" itemid="#b">'
     '<span itemprop="name">B</span></div></body></html>',
     {(f"{DOC}#b", f"{RDF}type", f"{S}Book"),
      (f"{DOC}#b", f"{S}name", "B")}, None),

    ("m13_data_value",
     f'<div itemscope itemtype="{S}Product">'
     '<data itemprop="productID" value="9-99">nine</data></div>',
     {("_:b0", f"{RDF}type", f"{S}Product"),
      ("_:b0", f"{S}productID", "9-99")}, None),

    ("m14_absolute_itemprop",
     f'<div itemscope itemtype="{S}Book">'
     '<span itemprop="http://purl.org/dc/terms/title">T</span></div>',
     {("_:b0", f"{RDF}type", f"{S}Book"),
      ("_:b0", "http://purl.org/dc/terms/title", "T")}, None),

    ("m15_hash_vocab",
     f'<div itemscope itemtype="{EX}vocab#Thing">'
     '<span itemprop="label">L</span></div>',
     # fragment vocabularies: property replaces the fragment
     {("_:b0", f"{RDF}type", f"{EX}vocab#Thing"),
      ("_:b0", f"{EX}vocab#label", "L")}, None),

    ("m16_itemref_cycle_safe",
     f'<div id="x" itemref="x"><div itemscope itemtype="{S}Person" '
     'itemref="x"><span itemprop="name">C</span></div></div>',
     {("_:b0", f"{RDF}type", f"{S}Person"),
      ("_:b0", f"{S}name", "C")}, None),

    # round-5 additions
    ("m17_link_href_value",
     f'<div itemscope itemtype="{S}Person">'
     f'<link itemprop="url" href="{EX}a"></div>',
     {("_:b0", f"{RDF}type", f"{S}Person"),
      ("_:b0", f"{S}url", f"{EX}a")}, None),

    ("m18_literal_language",
     # microdata-to-RDF §4.3: plain literals carry the in-scope language
     f'<div lang="fr" itemscope itemtype="{S}Person">'
     '<span itemprop="name">Alice</span></div>',
     {("_:b0", f"{RDF}type", f"{S}Person"),
      ("_:b0", f"{S}name", "Alice")}, (f"{S}name", None, "fr")),

    ("m19_itemref_shared_between_items",
     '<p id="sh"><span itemprop="name">N</span></p>'
     f'<div itemscope itemtype="{S}Person" itemref="sh"></div>'
     f'<div itemscope itemtype="{S}Author" itemref="sh"></div>',
     {("_:b0", f"{RDF}type", f"{S}Person"), ("_:b0", f"{S}name", "N"),
      ("_:b1", f"{RDF}type", f"{S}Author"),
      ("_:b1", f"{S}name", "N")}, None),

    ("m20_object_data_value",
     f'<div itemscope itemtype="{S}Product">'
     f'<object itemprop="spec" data="{EX}spec.pdf"></object></div>',
     {("_:b0", f"{RDF}type", f"{S}Product"),
      ("_:b0", f"{S}spec", f"{EX}spec.pdf")}, None),

    ("m21_time_datatype_sniffed",
     # microdata-to-RDF §4.3: time values are typed by lexical form
     f'<div itemscope itemtype="{S}Event">'
     '<time itemprop="startDate" datetime="2026-01-01">jan</time></div>',
     {("_:b0", f"{RDF}type", f"{S}Event"),
      ("_:b0", f"{S}startDate", "2026-01-01")},
     (f"{S}startDate", f"{XSD}date", None)),

    ("m22_nested_itemid_object",
     f'<div itemscope itemtype="{S}Person">'
     f'<div itemprop="address" itemscope itemtype="{S}PostalAddress" '
     f'itemid="{EX}addr1"><span itemprop="addressLocality">T</span>'
     '</div></div>',
     {("_:b0", f"{RDF}type", f"{S}Person"),
      ("_:b0", f"{S}address", f"{EX}addr1"),
      (f"{EX}addr1", f"{RDF}type", f"{S}PostalAddress"),
      (f"{EX}addr1", f"{S}addressLocality", "T")}, None),
]

MD_CASES.extend([
    ("m23_audio_src_value",
     f'<div itemscope itemtype="{S}T">'
     f'<audio itemprop="clip" src="{EX}a.mp3"></audio></div>',
     {("_:b0", f"{RDF}type", f"{S}T"),
      ("_:b0", f"{S}clip", f"{EX}a.mp3")}, None),
    ("m24_itemtype_whitespace_tokens",
     f'<div itemscope itemtype="  {S}A   {S}B ">'
     '<span itemprop="name">x</span></div>',
     {("_:b0", f"{RDF}type", f"{S}A"), ("_:b0", f"{RDF}type", f"{S}B"),
      ("_:b0", f"{S}name", "x")}, None),
    ("m25_itemprop_outside_itemscope_ignored",
     '<div><span itemprop="name">x</span></div>'
     f'<div itemscope itemtype="{S}T"><span itemprop="ok">y</span></div>',
     {("_:b0", f"{RDF}type", f"{S}T"), ("_:b0", f"{S}ok", "y")}, None),
])


PINNED_PASS_MD = {
    "m23_audio_src_value", "m24_itemtype_whitespace_tokens",
    "m25_itemprop_outside_itemscope_ignored",
    "m01_basic_item", "m02_a_href_value", "m03_img_src_value",
    "m04_meta_content", "m05_time_datetime", "m06_nested_item",
    "m07_itemid", "m08_itemref_backward", "m09_itemref_forward",
    "m10_multi_itemprop", "m11_multi_itemtype", "m12_base_itemid",
    "m13_data_value", "m14_absolute_itemprop", "m15_hash_vocab",
    "m16_itemref_cycle_safe", "m17_link_href_value",
    "m18_literal_language", "m19_itemref_shared_between_items",
    "m20_object_data_value", "m21_time_datatype_sniffed",
    "m22_nested_itemid_object",
}

# conformance floor over the whole corpus: regressions below this fail
# even if the pinned set were edited carelessly
MIN_SCORE = 0.85


def _run_case(parser, html, want, probe):
    try:
        rows = parser(html)
    except HtmlRdfParseError:
        rows = []
    got = _spo(rows)
    if not _iso_match(got, want):
        return False, got
    if probe is not None:
        pred, want_dt, want_lang = probe
        hits = [(dt, lg) for (s, p, o, k, dt, lg, g) in rows if p == pred]
        if len(hits) != 1 or hits[0] != (want_dt, want_lang):
            return False, got
    return True, got


@pytest.mark.parametrize("case_id,html,want,probe",
                         RDFA_CASES, ids=[c[0] for c in RDFA_CASES])
def test_rdfa_conformance_case(case_id, html, want, probe):
    ok, got = _run_case(parse_rdfa, html, want, probe)
    if case_id in PINNED_PASS_RDFA:
        assert ok, f"{case_id} regressed: got {sorted(got)}"
    else:
        pytest.xfail(f"{case_id}: documented subset gap")


@pytest.mark.parametrize("case_id,html,want,probe",
                         MD_CASES, ids=[c[0] for c in MD_CASES])
def test_microdata_conformance_case(case_id, html, want, probe):
    ok, got = _run_case(parse_microdata, html, want, probe)
    if case_id in PINNED_PASS_MD:
        assert ok, f"{case_id} regressed: got {sorted(got)}"
    else:
        pytest.xfail(f"{case_id}: documented subset gap")


def test_conformance_scorecard():
    """The headline number: fraction of spec-derived cases passing."""
    results = {}
    for cid, html, want, probe in RDFA_CASES:
        results[cid] = _run_case(parse_rdfa, html, want, probe)[0]
    for cid, html, want, probe in MD_CASES:
        results[cid] = _run_case(parse_microdata, html, want, probe)[0]
    passing = {c for c, ok in results.items() if ok}
    score = len(passing) / len(results)
    # pinned cases must all pass; new passes should be promoted into the
    # pinned set (we fail to force the promotion, keeping the pin exact)
    assert PINNED_PASS_RDFA | PINNED_PASS_MD <= passing, \
        sorted((PINNED_PASS_RDFA | PINNED_PASS_MD) - passing)
    assert score >= MIN_SCORE, f"conformance score {score:.2f}"
    extra = passing - PINNED_PASS_RDFA - PINNED_PASS_MD
    assert not extra, f"promote newly-passing cases into the pin: {extra}"
