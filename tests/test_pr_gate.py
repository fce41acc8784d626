"""Triple P/R gate vs the reference's emitted triples (BASELINE.json:
P/R ≥ 0.95, exact on fixtures).

rdflib is not installed in this container, so the expected (subj, pred,
obj) sets are hand-derived from the fixture payloads — they are exactly
what rdflib parses for these fixtures (triple counts cross-checked against
the reference's own assertions, e.g. tests/rdf/test_converter.py:69-87).
"""

import corpus
from rdf_dtdl_fabric_ontology_converter_spark.functions.turtle import parse_turtle

EX = "http://example.org/"
RDF_T = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
OWL = "http://www.w3.org/2002/07/owl#"
XSD = "http://www.w3.org/2001/XMLSchema#"

EXPECTED = {
    "simple": {
        (EX + "Person", RDF_T, OWL + "Class"),
        (EX + "Person", RDFS + "label", "Person"),
        (EX + "Person", RDFS + "comment", "A human being"),
        (EX + "Organization", RDF_T, OWL + "Class"),
        (EX + "Organization", RDFS + "label", "Organization"),
        (EX + "name", RDF_T, OWL + "DatatypeProperty"),
        (EX + "name", RDFS + "domain", EX + "Person"),
        (EX + "name", RDFS + "range", XSD + "string"),
        (EX + "age", RDF_T, OWL + "DatatypeProperty"),
        (EX + "age", RDFS + "domain", EX + "Person"),
        (EX + "age", RDFS + "range", XSD + "integer"),
        (EX + "worksFor", RDF_T, OWL + "ObjectProperty"),
        (EX + "worksFor", RDFS + "domain", EX + "Person"),
        (EX + "worksFor", RDFS + "range", EX + "Organization"),
    },
    "inheritance": {
        (EX + "Animal", RDF_T, OWL + "Class"),
        (EX + "Mammal", RDF_T, OWL + "Class"),
        (EX + "Mammal", RDFS + "subClassOf", EX + "Animal"),
        (EX + "Dog", RDF_T, OWL + "Class"),
        (EX + "Dog", RDFS + "subClassOf", EX + "Mammal"),
    },
    "multiple_domains": {
        (EX + "Person", RDF_T, OWL + "Class"),
        (EX + "Organization", RDF_T, OWL + "Class"),
        (EX + "name", RDF_T, OWL + "DatatypeProperty"),
        (EX + "name", RDFS + "domain", EX + "Person"),
        (EX + "name", RDFS + "domain", EX + "Organization"),
        (EX + "name", RDFS + "range", XSD + "string"),
    },
    "functional_property": {
        (EX + "Person", RDF_T, OWL + "Class"),
        (EX + "ssn", RDF_T, OWL + "DatatypeProperty"),
        (EX + "ssn", RDF_T, OWL + "FunctionalProperty"),
        (EX + "ssn", RDFS + "domain", EX + "Person"),
        (EX + "ssn", RDFS + "range", XSD + "string"),
    },
    "external_import": {
        (EX + "ontology", RDF_T, OWL + "Ontology"),
        (EX + "ontology", OWL + "imports", "http://xmlns.com/foaf/0.1/"),
        (EX + "Person", RDF_T, OWL + "Class"),
    },
    "missing_range": {
        (EX + "Person", RDF_T, OWL + "Class"),
        (EX + "name", RDF_T, OWL + "DatatypeProperty"),
        (EX + "name", RDFS + "domain", EX + "Person"),
    },
}


def pr(got: set, expected: set) -> tuple[float, float]:
    tp = len(got & expected)
    precision = tp / len(got) if got else 1.0
    recall = tp / len(expected) if expected else 1.0
    return precision, recall


def test_triple_pr_exact_on_fixtures():
    """P = R = 1.0 on every hand-derived fixture (gate floor is 0.95)."""
    totals = [0, 0, 0]  # tp, got, expected
    for name, expected in EXPECTED.items():
        got = {(s, p, o) for (s, p, o, *_r) in parse_turtle(corpus.TTL[name])}
        p, r = pr(got, expected)
        assert p == 1.0 and r == 1.0, (name, got ^ expected)
        totals[0] += len(got & expected)
        totals[1] += len(got)
        totals[2] += len(expected)
    micro_p = totals[0] / totals[1]
    micro_r = totals[0] / totals[2]
    assert micro_p >= 0.95 and micro_r >= 0.95


def test_union_domain_bnode_structure():
    """Bnode-structured fixtures: IRI-terminal triples exact; bnode-labelled
    triples structurally equivalent (labels are skolemized per parse)."""
    got = parse_turtle(corpus.TTL["union_domain"])
    iri_terms = {(s, p, o) for (s, p, o, *_r) in got
                 if not s.startswith("_:") and not str(o).startswith("_:")}
    assert (EX + "name", RDF_T, OWL + "DatatypeProperty") in iri_terms
    assert (EX + "name", RDFS + "range", XSD + "string") in iri_terms
    firsts = {o for (_s, p, o, *_r) in got
              if p == "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"}
    assert firsts == {EX + "Person", EX + "Organization"}
