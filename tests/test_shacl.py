"""SHACL-lite shape validation (operators/shacl.py).

Declarative twin of the reference's hand-coded validator families
(src/core/validators/ → operators/validate.py): node shapes targeted by
class, counting + value constraints, flattened validation report.
"""

from __future__ import annotations

import pytest

from rdf_dtdl_fabric_ontology_converter_spark.operators.shacl import (
    RDF_TYPE, XSD_STRING, conforms, validate_shapes)

EX = "http://example.org/"
LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
SUB = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"


def _triples(spark, rows):
    full = [(s, p, o, k, dt, None, None) for (s, p, o, k, dt) in rows]
    return spark.createDataFrame(
        full, "subj string, pred string, obj string, obj_kind string, "
              "obj_datatype string, lang string, graph_ctx string")


@pytest.fixture(scope="module")
def kg(spark):
    rows = [
        # three nations; n1 fine, n2 has two labels, n3 has none
        (f"{EX}n1", RDF_TYPE, f"{EX}Nation", "iri", None),
        (f"{EX}n2", RDF_TYPE, f"{EX}Nation", "iri", None),
        (f"{EX}n3", RDF_TYPE, f"{EX}Nation", "iri", None),
        (f"{EX}n1", LABEL, "one", "literal", None),
        (f"{EX}n2", LABEL, "two", "literal", None),
        (f"{EX}n2", LABEL, "deux", "literal", None),
        # region links: n1 -> typed region, n2 -> untyped thing
        (f"{EX}n1", f"{EX}inRegion", f"{EX}r1", "iri", None),
        (f"{EX}n2", f"{EX}inRegion", f"{EX}zzz", "iri", None),
        (f"{EX}r1", RDF_TYPE, f"{EX}Region", "iri", None),
        # population: literal int on n1, NON-literal on n3
        (f"{EX}n1", f"{EX}pop", "41", "literal", XSD_INT),
        (f"{EX}n3", f"{EX}pop", f"{EX}oops", "iri", None),
        # subclass data for the closure variant
        (f"{EX}MicroRegion", SUB, f"{EX}Region", "iri", None),
        (f"{EX}m1", RDF_TYPE, f"{EX}MicroRegion", "iri", None),
        (f"{EX}n3", f"{EX}inRegion", f"{EX}m1", "iri", None),
    ]
    return _triples(spark, rows)


NATION_SHAPE = {
    "shape_id": "NationShape",
    "target_class": f"{EX}Nation",
    "properties": [
        {"path": LABEL, "min_count": 1, "max_count": 1,
         "node_kind": "Literal", "datatype": XSD_STRING},
    ],
}


def _report(kg, shapes, **kw):
    rows = validate_shapes(kg, shapes, **kw).collect()
    return {(r.focus, r.constraint, r.value) for r in rows}


def test_min_and_max_count(kg):
    got = _report(kg, [NATION_SHAPE])
    assert (f"{EX}n3", "minCount:1", None) in got       # zero labels
    assert (f"{EX}n2", "maxCount:1", None) in got       # two labels
    assert not any(f == f"{EX}n1" for (f, _, _) in got)  # n1 conforms


def test_datatype_plain_literal_is_string(kg):
    # plain literals satisfy xsd:string; the IRI value on n3.pop violates
    shape = {"shape_id": "PopShape", "target_class": f"{EX}Nation",
             "properties": [{"path": f"{EX}pop", "datatype": XSD_INT}]}
    got = _report(kg, [shape])
    assert got == {(f"{EX}n3", f"datatype:{XSD_INT}", f"{EX}oops")}


def test_node_kind(kg):
    shape = {"shape_id": "K", "target_class": f"{EX}Nation",
             "properties": [{"path": f"{EX}pop", "node_kind": "Literal"}]}
    got = _report(kg, [shape])
    assert got == {(f"{EX}n3", "nodeKind:Literal", f"{EX}oops")}
    with pytest.raises(ValueError, match="node_kind"):
        validate_shapes(kg, [{"shape_id": "B", "target_class": f"{EX}Nation",
                              "properties": [{"path": f"{EX}pop",
                                              "node_kind": "Uri"}]}])


def test_class_constraint_direct_and_closure(kg):
    shape = {"shape_id": "R", "target_class": f"{EX}Nation",
             "properties": [{"path": f"{EX}inRegion",
                             "class": f"{EX}Region"}]}
    got = _report(kg, [shape])
    # zzz untyped, m1 typed only as MicroRegion -> both violate directly
    assert got == {(f"{EX}n2", f"class:{EX}Region", f"{EX}zzz"),
                   (f"{EX}n3", f"class:{EX}Region", f"{EX}m1")}
    # with the rdfs:subClassOf closure, MicroRegion counts as Region
    got2 = _report(kg, [shape], subclass_closure=True)
    assert got2 == {(f"{EX}n2", f"class:{EX}Region", f"{EX}zzz")}


def test_in_pattern_and_length(kg):
    shape = {"shape_id": "L", "target_class": f"{EX}Nation",
             "properties": [
                 {"path": LABEL, "in": ["one", "two"],
                  "pattern": "^[a-z]+$", "min_length": 3, "max_length": 3},
             ]}
    got = _report(kg, [shape])
    assert (f"{EX}n2", "in", "deux") in got
    assert (f"{EX}n2", "maxLength:3", "deux") in got
    # all labels match the pattern and min_length
    assert not any(c.startswith("pattern") or c.startswith("minLength")
                   for (_, c, _) in got)


def test_set_semantics_duplicate_triples_count_once(spark):
    rows = [
        (f"{EX}a", RDF_TYPE, f"{EX}T", "iri", None),
        (f"{EX}a", LABEL, "x", "literal", None),
        (f"{EX}a", LABEL, "x", "literal", None),  # same statement twice
    ]
    kg = _triples(spark, rows)
    shape = {"shape_id": "S", "target_class": f"{EX}T",
             "properties": [{"path": LABEL, "max_count": 1}]}
    assert validate_shapes(kg, [shape]).count() == 0


def test_conforms_and_errors(kg):
    assert conforms(kg, [NATION_SHAPE]) is False
    ok = {"shape_id": "OK", "target_class": f"{EX}Nation",
          "properties": [{"path": LABEL, "max_count": 5}]}
    assert conforms(kg, [ok]) is True
    with pytest.raises(ValueError, match="empty"):
        validate_shapes(kg, [])
    with pytest.raises(ValueError, match="duplicate"):
        validate_shapes(kg, [ok, ok])


def test_target_subjects_and_objects_of(kg):
    # everything that HAS an inRegion arc needs a type (n1,n2,n3 typed: ok)
    s1 = {"shape_id": "S", "target_subjects_of": f"{EX}inRegion",
          "properties": [{"path": RDF_TYPE, "min_count": 1}]}
    assert validate_shapes(kg, [s1]).count() == 0
    # everything POINTED AT by inRegion needs a label: none have one
    s2 = {"shape_id": "O", "target_objects_of": f"{EX}inRegion",
          "properties": [{"path": LABEL, "min_count": 1}]}
    got = {r.focus for r in validate_shapes(kg, [s2]).collect()}
    assert got == {f"{EX}r1", f"{EX}zzz", f"{EX}m1"}


def test_target_node_explicit(kg):
    s = {"shape_id": "N", "target_node": [f"{EX}n3", f"{EX}n1"],
         "properties": [{"path": LABEL, "min_count": 1}]}
    got = {r.focus for r in validate_shapes(kg, [s]).collect()}
    assert got == {f"{EX}n3"}


def test_exactly_one_target_kind(kg):
    with pytest.raises(ValueError, match="exactly one"):
        validate_shapes(kg, [{"shape_id": "B", "properties": []}])
    with pytest.raises(ValueError, match="exactly one"):
        validate_shapes(kg, [{"shape_id": "B2",
                              "target_class": f"{EX}Nation",
                              "target_node": [f"{EX}n1"],
                              "properties": []}])


def test_sparql_constraint(kg):
    # SHACL-SPARQL: nations whose inRegion target is NOT a typed Region
    q = """PREFIX ex: <http://example.org/>
           SELECT ?focus WHERE {
             ?focus ex:inRegion ?r .
             FILTER NOT EXISTS { ?r a ex:Region }
           }"""
    s = {"shape_id": "Q", "target_class": f"{EX}Nation", "sparql": q}
    got = {r.focus for r in validate_shapes(kg, [s]).collect()}
    assert got == {f"{EX}n2", f"{EX}n3"}
    rows = validate_shapes(kg, [s]).collect()
    assert all((r.constraint, r.path) == ("sparql", "sparql") for r in rows)
    # the target still scopes the query: target only n2 via targetNode
    s2 = {"shape_id": "Q2", "target_node": [f"{EX}n2"], "sparql": q}
    assert {r.focus for r in validate_shapes(kg, [s2]).collect()} == \
        {f"{EX}n2"}
    with pytest.raises(ValueError, match="focus"):
        validate_shapes(kg, [{"shape_id": "B", "target_class": f"{EX}Nation",
                              "sparql": "SELECT ?x WHERE { ?x ?p ?o }"}])
    with pytest.raises(ValueError, match="no constraints"):
        validate_shapes(kg, [{"shape_id": "E",
                              "target_class": f"{EX}Nation"}])


def test_closed_shape(kg):
    s = {"shape_id": "C", "target_class": f"{EX}Nation", "closed": True,
         "properties": [{"path": LABEL, "min_count": 0}],
         "ignored": [f"{EX}pop"]}
    got = {(r.focus, r.value) for r in validate_shapes(kg, [s]).collect()
           if r.constraint == "closed"}
    # inRegion is undeclared on n1/n2/n3; pop is ignored; rdf:type free
    assert got == {(f"{EX}n1", f"{EX}inRegion"),
                   (f"{EX}n2", f"{EX}inRegion"),
                   (f"{EX}n3", f"{EX}inRegion")}


def test_validate_job_cli_end_to_end(spark, tmp_path, capsys):
    import json
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    try:
        import corpus
    finally:
        sys.path.pop(0)
    from rdf_dtdl_fabric_ontology_converter_spark import validate_job
    from rdf_dtdl_fabric_ontology_converter_spark.sources.documents import (
        docs_from_payloads)
    docs = docs_from_payloads(spark, {"r": corpus.TTL["simple"]})
    in_path = str(tmp_path / "docs")
    docs.write.parquet(in_path)
    shapes = [{"shape_id": "ClassShape",
               "target_class": "http://www.w3.org/2002/07/owl#Class",
               "properties": [
                   {"path": "http://www.w3.org/2000/01/rdf-schema#label",
                    "min_count": 1}]}]
    sp = tmp_path / "shapes.json"
    sp.write_text(json.dumps(shapes))
    out = str(tmp_path / "report")
    rc = validate_job.main(["--input", in_path, "--shapes", str(sp),
                            "--output", out, "--fail-on-violation",
                            "--shuffle-partitions", "4"],
                           existing_spark=spark)
    rep = spark.read.parquet(out)
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    if summary["violations"]:
        assert rc == 4 and rep.count() == summary["violations"]
        assert not summary["conforms"]
    else:
        assert rc == 0 and rep.count() == 0 and summary["conforms"]


def test_multiple_shapes_union(kg):
    shapes = [NATION_SHAPE,
              {"shape_id": "RegionShape", "target_class": f"{EX}Region",
               "properties": [{"path": LABEL, "min_count": 1}]}]
    got = _report(kg, shapes)
    # r1 has no label -> RegionShape violation alongside NationShape's
    assert (f"{EX}r1", "minCount:1", None) in got
    assert (f"{EX}n3", "minCount:1", None) in got


def test_has_value(kg):
    s = {"shape_id": "HV", "target_class": f"{EX}Nation",
         "properties": [{"path": LABEL, "has_value": "one"}]}
    got = _report(kg, [s])
    assert got == {(f"{EX}n2", "hasValue:one", None),
                   (f"{EX}n3", "hasValue:one", None)}  # n3: zero labels


def test_or_and_not_value_wise(kg):
    # pop is either an integer literal or an IRI -> both rows conform
    ok = {"shape_id": "OR1", "target_class": f"{EX}Nation",
          "properties": [{"path": f"{EX}pop",
                          "or": [{"datatype": XSD_INT},
                                 {"node_kind": "IRI"}]}]}
    assert validate_shapes(kg, [ok]).count() == 0
    # neither a string literal nor all-digits: the IRI value violates
    bad = {"shape_id": "OR2", "target_class": f"{EX}Nation",
           "properties": [{"path": f"{EX}pop",
                           "or": [{"datatype": XSD_STRING},
                                  {"pattern": "^\\d+$"}]}]}
    got = _report(kg, [bad])
    assert got == {(f"{EX}n3", "or", f"{EX}oops")}
    # sh:not: labels must NOT be >= 4 chars
    neg = {"shape_id": "NOT", "target_class": f"{EX}Nation",
           "properties": [{"path": LABEL, "not": {"min_length": 4}}]}
    got2 = _report(kg, [neg])
    assert got2 == {(f"{EX}n2", "not", "deux")}
    # guards: non-value-wise or empty branches raise
    with pytest.raises(ValueError, match="value-wise"):
        validate_shapes(kg, [{"shape_id": "G", "target_class": f"{EX}Nation",
                              "properties": [{"path": LABEL,
                                              "or": [{"min_count": 1}]}]}])
    with pytest.raises(ValueError, match="empty or/not"):
        validate_shapes(kg, [{"shape_id": "G2", "target_class": f"{EX}Nation",
                              "properties": [{"path": LABEL, "not": {}}]}])


def test_property_pair_constraints(spark):
    P, Q = f"{EX}p", f"{EX}q"
    rows = [
        (f"{EX}s1", RDF_TYPE, f"{EX}T", "iri", None),
        (f"{EX}s2", RDF_TYPE, f"{EX}T", "iri", None),
        (f"{EX}s1", P, "a", "literal", None),
        (f"{EX}s1", Q, "a", "literal", None),
        (f"{EX}s2", P, "b", "literal", None),
        (f"{EX}s2", Q, "c", "literal", None),
    ]
    kg = _triples(spark, rows)
    eq = {"shape_id": "EQ", "target_class": f"{EX}T",
          "properties": [{"path": P, "equals": Q}]}
    got = _report(kg, [eq])
    # s1's sets are equal; s2 has b only at P and c only at Q
    assert got == {(f"{EX}s2", f"equals:{Q}", "b"),
                   (f"{EX}s2", f"equals:{Q}", "c")}
    dis = {"shape_id": "DIS", "target_class": f"{EX}T",
           "properties": [{"path": P, "disjoint": Q}]}
    got2 = _report(kg, [dis])
    assert got2 == {(f"{EX}s1", f"disjoint:{Q}", "a")}


def test_less_than_lexical_vs_numeric(spark):
    LO, HI = f"{EX}lo", f"{EX}hi"
    rows = [
        (f"{EX}s1", RDF_TYPE, f"{EX}T", "iri", None),
        (f"{EX}s1", LO, "2", "literal", XSD_INT),
        (f"{EX}s1", HI, "10", "literal", XSD_INT),
        (f"{EX}s2", RDF_TYPE, f"{EX}T", "iri", None),
        (f"{EX}s2", LO, "x", "literal", None),
        (f"{EX}s2", HI, "10", "literal", XSD_INT),
    ]
    kg = _triples(spark, rows)
    # lexical: "2" < "10" is FALSE -> violation; numeric: 2 < 10 passes
    lex = {"shape_id": "LT", "target_class": f"{EX}T",
           "properties": [{"path": LO, "less_than": HI}]}
    assert (f"{EX}s1", f"lessThan:{HI}", "2") in _report(kg, [lex])
    num = {"shape_id": "LTN", "target_class": f"{EX}T",
           "properties": [{"path": LO, "less_than": HI, "numeric": True}]}
    got = _report(kg, [num])
    assert (f"{EX}s1", f"lessThan:{HI}", "2") not in got
    # uncastable value can never satisfy a numeric less_than
    assert (f"{EX}s2", f"lessThan:{HI}", "x") in got


def _triples_lang(spark, rows):
    """rows = (s, p, o, kind, dt, lang)."""
    full = [(s, p, o, k, dt, lg, None) for (s, p, o, k, dt, lg) in rows]
    return spark.createDataFrame(
        full, "subj string, pred string, obj string, obj_kind string, "
              "obj_datatype string, lang string, graph_ctx string")


RDF_LANGSTRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"


def test_unique_lang_and_langstring_datatype(spark):
    rows = [
        (f"{EX}a", RDF_TYPE, f"{EX}T", "iri", None, None),
        (f"{EX}a", LABEL, "chat", "literal", None, "en"),
        (f"{EX}a", LABEL, "cat", "literal", None, "en"),   # second @en
        (f"{EX}a", LABEL, "chat", "literal", None, "fr"),  # fine
        (f"{EX}b", RDF_TYPE, f"{EX}T", "iri", None, None),
        (f"{EX}b", LABEL, "dog", "literal", None, None),   # untagged exempt
        (f"{EX}b", LABEL, "hund", "literal", None, None),
    ]
    kg = _triples_lang(spark, rows)
    s = {"shape_id": "UL", "target_class": f"{EX}T",
         "properties": [{"path": LABEL, "unique_lang": True}]}
    got = _report(kg, [s])
    assert got == {(f"{EX}a", "uniqueLang", "en")}
    # RDF 1.1: "chat"@en's datatype is rdf:langString, NOT xsd:string
    dt_s = {"shape_id": "DT", "target_class": f"{EX}T",
            "properties": [{"path": LABEL, "datatype": XSD_STRING}]}
    got2 = _report(kg, [dt_s])
    assert (f"{EX}a", f"datatype:{XSD_STRING}", "chat") in got2
    assert not any(f == f"{EX}b" for (f, _, _) in got2)
    dt_l = {"shape_id": "DL", "target_class": f"{EX}T",
            "properties": [{"path": LABEL, "datatype": RDF_LANGSTRING}]}
    got3 = _report(kg, [dt_l])
    assert {v for (f, _, v) in got3 if f == f"{EX}b"} == {"dog", "hund"}
    # lang is part of the term key: "chat"@en vs "chat"@fr = two values
    cnt = {"shape_id": "C", "target_class": f"{EX}T",
           "properties": [{"path": LABEL, "max_count": 2}]}
    got4 = _report(kg, [cnt])
    assert (f"{EX}a", "maxCount:2", None) in got4
