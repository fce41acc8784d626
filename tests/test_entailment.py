"""RDFS entailment materialization + SPARQL CONSTRUCT (operators/entailment.py).

The reference applies these semantics procedurally during conversion
(class_resolver.py subClassOf walks, property_extractor.py domain/range
reads); here they materialize as triples so any downstream operator sees
the inferred graph.
"""

from __future__ import annotations

import pytest

from rdf_dtdl_fabric_ontology_converter_spark.operators.entailment import (
    RDF_TYPE, RDFS_DOMAIN, RDFS_RANGE, RDFS_SUBCLASS, RDFS_SUBPROP,
    construct, rdfs_entailment)

EX = "http://example.org/"


@pytest.fixture(scope="module")
def triples(spark):
    def iri(s, p, o):
        return (EX + s, p if p.startswith("http") else EX + p,
                o if o.startswith("http") else EX + o, "iri")

    rows = [
        # property hierarchy: hasDog ⊑ hasPet ⊑ hasAnimal
        iri("hasDog", RDFS_SUBPROP, "hasPet"),
        iri("hasPet", RDFS_SUBPROP, "hasAnimal"),
        iri("hasPet", RDFS_DOMAIN, "PetOwner"),
        iri("hasPet", RDFS_RANGE, "Pet"),
        # class hierarchy: Dog ⊑ Mammal ⊑ Animal
        iri("Dog", RDFS_SUBCLASS, "Mammal"),
        iri("Mammal", RDFS_SUBCLASS, "Animal"),
        # instances
        iri("alice", "hasDog", "rex"),
        iri("rex", RDF_TYPE, "Dog"),
        iri("bob", RDF_TYPE, "Mammal"),
        # a literal-valued statement whose predicate has a range:
        # rdfs3 must NOT type the literal
        iri("name", RDFS_RANGE, "Label"),
        (EX + "alice", EX + "name", "Alice", "literal"),
    ]
    return spark.createDataFrame(rows, ["subj", "pred", "obj", "obj_kind"])


def _spo_set(df):
    return {(r.subj, r.pred, r.obj) for r in df.collect()}


def test_full_entailment(triples):
    got = _spo_set(rdfs_entailment(triples))
    expected = {
        # rdfs5: two-hop subPropertyOf closure
        (EX + "hasDog", RDFS_SUBPROP, EX + "hasAnimal"),
        # rdfs7: inherited statements (both levels)
        (EX + "alice", EX + "hasPet", EX + "rex"),
        (EX + "alice", EX + "hasAnimal", EX + "rex"),
        # rdfs2 via the INHERITED hasPet statement
        (EX + "alice", RDF_TYPE, EX + "PetOwner"),
        # rdfs3 via the inherited statement (rex is an IRI object)
        (EX + "rex", RDF_TYPE, EX + "Pet"),
        # rdfs11: two-hop subClassOf closure
        (EX + "Dog", RDFS_SUBCLASS, EX + "Animal"),
        # rdfs9: asserted types up the closed hierarchy
        (EX + "rex", RDF_TYPE, EX + "Mammal"),
        (EX + "rex", RDF_TYPE, EX + "Animal"),
        (EX + "bob", RDF_TYPE, EX + "Animal"),
    }
    assert got == expected


def test_literal_object_never_typed_by_rdfs3(triples):
    got = _spo_set(rdfs_entailment(triples, rules=("rdfs3",)))
    assert got == set()  # the only ranged statement with a match is literal


def test_rule_subset_and_include_input(triples):
    got = _spo_set(rdfs_entailment(triples, rules=("rdfs9", "rdfs11")))
    assert got == {
        (EX + "Dog", RDFS_SUBCLASS, EX + "Animal"),
        (EX + "rex", RDF_TYPE, EX + "Mammal"),
        (EX + "rex", RDF_TYPE, EX + "Animal"),
        (EX + "bob", RDF_TYPE, EX + "Animal"),
    }
    full = rdfs_entailment(triples, include_input=True)
    base = {(r.subj, r.pred, r.obj)
            for r in triples.select("subj", "pred", "obj").collect()}
    assert _spo_set(full) == base | _spo_set(rdfs_entailment(triples))


def test_inferred_excludes_asserted(triples, spark):
    # asserting one of the inferences removes it from the inferred-only set
    extra = spark.createDataFrame(
        [(EX + "rex", RDF_TYPE, EX + "Mammal", "iri")],
        ["subj", "pred", "obj", "obj_kind"])
    got = _spo_set(rdfs_entailment(triples.unionByName(extra)))
    assert (EX + "rex", RDF_TYPE, EX + "Mammal") not in got
    assert (EX + "rex", RDF_TYPE, EX + "Animal") in got


def test_unknown_rule_raises(triples):
    with pytest.raises(ValueError, match="unknown rules"):
        rdfs_entailment(triples, rules=("rdfs2", "owl_sameas"))


def test_no_obj_kind_falls_back_to_scheme_shape(spark):
    rows = [
        ("p", RDFS_RANGE, "http://example.org/C"),
        ("s", "p", "http://example.org/thing"),
        ("s2", "p", "just a literal"),
    ]
    t = spark.createDataFrame(rows, ["subj", "pred", "obj"])
    got = _spo_set(rdfs_entailment(t, rules=("rdfs3",)))
    assert got == {("http://example.org/thing", RDF_TYPE,
                    "http://example.org/C")}


@pytest.fixture(scope="module")
def owl_triples(spark):
    from rdf_dtdl_fabric_ontology_converter_spark.operators.entailment import (
        OWL_FUNCTIONAL, OWL_INVERSE, OWL_SYMMETRIC, OWL_TRANSITIVE)
    rows = [
        # hasPart inverseOf partOf; one statement in each direction
        (EX + "hasPart", OWL_INVERSE, EX + "partOf", "iri"),
        (EX + "car", EX + "hasPart", EX + "wheel", "iri"),
        (EX + "engine", EX + "partOf", EX + "car", "iri"),
        # knows: symmetric AND transitive — chain a-b-c must become
        # full undirected reachability incl. self-loops
        (EX + "knows", RDF_TYPE, OWL_SYMMETRIC, "iri"),
        (EX + "knows", RDF_TYPE, OWL_TRANSITIVE, "iri"),
        (EX + "a", EX + "knows", EX + "b", "iri"),
        (EX + "b", EX + "knows", EX + "c", "iri"),
        # functional property with a two-value conflict (IRIs) and a
        # literal-valued conflict that must NOT produce sameAs
        (EX + "capital", RDF_TYPE, OWL_FUNCTIONAL, "iri"),
        (EX + "fr", EX + "capital", EX + "paris1", "iri"),
        (EX + "fr", EX + "capital", EX + "paris2", "iri"),
        (EX + "motto", RDF_TYPE, OWL_FUNCTIONAL, "iri"),
        (EX + "fr", EX + "motto", "liberte", "literal"),
        (EX + "fr", EX + "motto", "egalite", "literal"),
    ]
    return spark.createDataFrame(rows, ["subj", "pred", "obj", "obj_kind"])


def test_owl_entailment(owl_triples):
    from rdf_dtdl_fabric_ontology_converter_spark.operators.entailment import (
        OWL_SAMEAS, owl_entailment)
    got = _spo_set(owl_entailment(owl_triples))
    people = [EX + x for x in "abc"]
    knows_closure = {(s, EX + "knows", o) for s in people for o in people}
    knows_closure -= {(EX + "a", EX + "knows", EX + "b"),
                      (EX + "b", EX + "knows", EX + "c")}  # asserted
    expected = knows_closure | {
        # inverse, both declaration directions
        (EX + "wheel", EX + "partOf", EX + "car"),
        (EX + "car", EX + "hasPart", EX + "engine"),
        # functional conflict -> sameAs both orders; literal conflict: none
        (EX + "paris1", OWL_SAMEAS, EX + "paris2"),
        (EX + "paris2", OWL_SAMEAS, EX + "paris1"),
    }
    assert got == expected


def test_owl_rule_subsets(owl_triples):
    from rdf_dtdl_fabric_ontology_converter_spark.operators.entailment import (
        owl_entailment)
    # transitive WITHOUT symmetric: only the directed a->c hop appears
    got = _spo_set(owl_entailment(owl_triples, rules=("transitive",)))
    assert got == {(EX + "a", EX + "knows", EX + "c")}
    with pytest.raises(ValueError, match="unknown rules"):
        owl_entailment(owl_triples, rules=("prp-trp",))


def test_owl_feeds_sameas_canonicalization(owl_triples):
    """The functional-property sameAs pairs drive the north-rule
    canonicalization: both capital IRIs collapse to one canonical id."""
    from pyspark.sql import functions as F
    from rdf_dtdl_fabric_ontology_converter_spark.operators.canon import (
        sameas_components)
    from rdf_dtdl_fabric_ontology_converter_spark.operators.entailment import (
        owl_entailment)
    inferred = owl_entailment(owl_triples, rules=("functional_sameas",)) \
        .withColumn("obj_kind", F.lit("iri"))
    canon = {r.member: r.canonical
             for r in sameas_components(inferred).collect()}
    assert canon[EX + "paris1"] == canon[EX + "paris2"]


def test_construct_from_bgp(triples, spark):
    from rdf_dtdl_fabric_ontology_converter_spark.operators.bgp import match_bgp
    sol = match_bgp(triples.select("subj", "pred", "obj"),
                    [("?x", RDF_TYPE, EX + "Dog")])
    out = construct(sol, [("?x", RDF_TYPE, EX + "Pet"),
                          (EX + "zoo", EX + "houses", "?x")])
    assert _spo_set(out) == {
        (EX + "rex", RDF_TYPE, EX + "Pet"),
        (EX + "zoo", EX + "houses", EX + "rex"),
    }


def test_construct_drops_null_bindings(spark):
    bindings = spark.createDataFrame(
        [("a", "l1"), ("b", None)], ["c", "l"])
    out = construct(bindings, [("?c", EX + "label", "?l")])
    assert _spo_set(out) == {("a", EX + "label", "l1")}


def test_construct_unknown_variable_raises(spark):
    bindings = spark.createDataFrame([("a",)], ["c"])
    with pytest.raises(ValueError, match="template variable"):
        construct(bindings, [("?c", EX + "p", "?missing")])
    with pytest.raises(ValueError, match="empty template"):
        construct(bindings, [])


def test_job_cli_entailment_layer_creates_inferred_entity(spark, tmp_path):
    """--entailment rdfs makes an entity that exists ONLY via inference:
    X's rdf:type owl:Class arrives through an rdfs9 hop (X a MetaA,
    MetaA ⊑ owl:Class). Without the flag X is not an entity."""
    import json

    from rdf_dtdl_fabric_ontology_converter_spark.job import main as job_main
    from rdf_dtdl_fabric_ontology_converter_spark.sources.documents import (
        docs_from_payloads)
    ttl = ("@prefix ex: <http://example.org/> .\n"
           "@prefix owl: <http://www.w3.org/2002/07/owl#> .\n"
           "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n"
           "ex:MetaA rdfs:subClassOf owl:Class .\n"
           "ex:X a ex:MetaA .\n"
           'ex:X rdfs:label "ex x" .\n')
    docs = docs_from_payloads(spark, {"m": ttl})
    in_path = str(tmp_path / "docs")
    docs.write.parquet(in_path)

    def run(out_name, extra_flags):
        out = str(tmp_path / out_name)
        assert job_main(["--input", in_path, "--output", out,
                         "--shuffle-partitions", "4"] + extra_flags) == 0
        return {r["name"]
                for r in spark.read.parquet(f"{out}/entity_types").collect()}

    assert "X" not in run("out_plain", [])
    with_inference = run("out_entailed", ["--entailment", "rdfs"])
    assert "X" in with_inference


# --- property-based: stratified pass == naive fixpoint -------------------
#
# The one subtle claim in rdfs_entailment is that its SINGLE stratified
# pass reaches the naive iterate-until-fixpoint result (for non-meta
# schemas, i.e. the reserved RDFS predicates never appear as objects of
# subPropertyOf — the generator respects that, as the docstring requires).

def _naive_rdfs_fixpoint(rows):
    """Reference implementation: apply all six rules until nothing new."""
    facts = {(s, p, o, k) for s, p, o, k in rows}

    def spo(fs):
        return {(s, p, o) for s, p, o, _ in fs}

    while True:
        new = set()
        subp = {(s, o) for s, p, o, _ in facts if p == RDFS_SUBPROP}
        sub = {(s, o) for s, p, o, _ in facts if p == RDFS_SUBCLASS}
        dom = {(s, o) for s, p, o, _ in facts if p == RDFS_DOMAIN}
        rng = {(s, o) for s, p, o, _ in facts if p == RDFS_RANGE}
        for a, b in subp:
            for b2, c in subp:
                if b == b2:
                    new.add((a, RDFS_SUBPROP, c, "iri"))       # rdfs5
        for s, p, o, k in facts:
            for p1, q in subp:
                if p == p1:
                    new.add((s, q, o, k))                       # rdfs7
            for p1, c in dom:
                if p == p1:
                    new.add((s, RDF_TYPE, c, "iri"))            # rdfs2
            for p1, c in rng:
                if p == p1 and k == "iri":
                    new.add((o, RDF_TYPE, c, "iri"))            # rdfs3
            for a, b in sub:
                if p == RDF_TYPE and o == a:
                    new.add((s, RDF_TYPE, b, "iri"))            # rdfs9
        for a, b in sub:
            for b2, c in sub:
                if b == b2:
                    new.add((a, RDFS_SUBCLASS, c, "iri"))       # rdfs11
        if spo(new) <= spo(facts):
            return spo(facts)
        facts |= new


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False

if HAVE_HYPOTHESIS:
    _props = st.sampled_from([EX + p for p in ("p1", "p2", "p3")])
    _classes = st.sampled_from([EX + c for c in ("K1", "K2", "K3", "K4")])
    _ents = st.sampled_from([EX + e for e in ("e1", "e2", "e3")])

    _triple = st.one_of(
        st.tuples(_props, st.just(RDFS_SUBPROP), _props, st.just("iri")),
        st.tuples(_classes, st.just(RDFS_SUBCLASS), _classes,
                  st.just("iri")),
        st.tuples(_props, st.just(RDFS_DOMAIN), _classes, st.just("iri")),
        st.tuples(_props, st.just(RDFS_RANGE), _classes, st.just("iri")),
        st.tuples(_ents, _props, _ents, st.just("iri")),
        st.tuples(_ents, _props, st.just("some literal"),
                  st.just("literal")),
        st.tuples(_ents, st.just(RDF_TYPE), _classes, st.just("iri")),
    )

    @settings(max_examples=12, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(st.lists(_triple, min_size=1, max_size=12, unique=True))
    def test_stratified_pass_equals_naive_fixpoint(spark_session_keeper,
                                                   rows):
        spark = spark_session_keeper
        t = spark.createDataFrame(rows, ["subj", "pred", "obj", "obj_kind"])
        got = _spo_set(rdfs_entailment(t, include_input=True))
        assert got == _naive_rdfs_fixpoint(rows)

    @pytest.fixture(scope="module")
    def spark_session_keeper(spark):
        return spark
