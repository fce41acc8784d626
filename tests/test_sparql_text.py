"""SPARQL text front-end (functions/sparql.py + operators/sparql.py).

The parser maps a SPARQL 1.1 subset 1:1 onto the BGP operator layer;
these tests check (a) pure parsing without a session, (b) end-to-end
equivalence: the text query returns exactly what the hand-built
match_bgp call returns.
"""

from __future__ import annotations

import pytest

from rdf_dtdl_fabric_ontology_converter_spark.functions.sparql import (
    RDF_TYPE, SparqlError, parse)
from rdf_dtdl_fabric_ontology_converter_spark.operators.sparql import (
    sparql_query)

SUB = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
CLS = "http://www.w3.org/2002/07/owl#Class"

PFX = """
PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
PREFIX owl: <http://www.w3.org/2002/07/owl#>
PREFIX ex: <ex:>
"""


# ---------------------------------------------------------------- parsing
def test_parse_basic_select():
    spec = parse(PFX + """
      SELECT DISTINCT ?c ?l WHERE {
        ?c a owl:Class ; rdfs:label ?l .
      } ORDER BY DESC(?l) LIMIT 5 OFFSET 2
    """)
    assert spec["form"] == "select" and spec["distinct"]
    assert spec["group"].patterns == [
        ("?c", RDF_TYPE, "http://www.w3.org/2002/07/owl#Class"),
        ("?c", LABEL, "?l")]
    assert spec["select"] == ["c", "l"]
    assert spec["order"] == [("l", True)]
    assert (spec["limit"], spec["offset"]) == (5, 2)


def test_parse_object_list_and_paths():
    spec = parse(PFX + "SELECT * WHERE { ?x ex:p ex:a , ex:b . "
                       "?x rdfs:subClassOf+ ?y . ?z ^ex:q|ex:r ?x }")
    pats = spec["group"].patterns
    assert ("?x", "ex:p", "ex:a") in pats and ("?x", "ex:p", "ex:b") in pats
    assert ("?x", SUB + "+", "?y") in pats
    assert ("?z", "^ex:q|ex:r", "?x") in pats


def test_parse_sequence_paths():
    # desugar: fresh intermediate per hop, object lists get their own
    spec = parse(PFX + "SELECT ?x ?y WHERE { ?x ex:p/ex:q ?y }")
    pats = spec["group"].patterns
    assert len(pats) == 2
    (s1, p1, o1), (s2, p2, o2) = pats
    assert (s1, p1) == ("?x", "ex:p") and (p2, o2) == ("ex:q", "?y")
    assert o1 == s2 and o1.startswith("?_pp")
    # three hops, inverse + closure elements keep their own operators
    spec2 = parse(PFX + "SELECT * WHERE { ?x ^ex:a/ex:b+/ex:c ?y }")
    ps = [p for _, p, _ in spec2["group"].patterns]
    assert ps == ["^ex:a", "ex:b+", "ex:c"]
    # object list: each object gets its own intermediate chain
    spec3 = parse(PFX + "SELECT * WHERE { ?x ex:p/ex:q ex:o1 , ex:o2 }")
    assert len(spec3["group"].patterns) == 4
    mids = {o for _, p, o in spec3["group"].patterns if p == "ex:p"}
    assert len(mids) == 2
    # precedence guard: | cannot mix with / without parens
    with pytest.raises(SparqlError, match="parenthes"):
        parse(PFX + "SELECT * WHERE { ?x ex:a/ex:b|ex:c ?y }")
    # reserved prefix guard
    with pytest.raises(SparqlError, match="reserved"):
        parse(PFX + "SELECT * WHERE { ?x ex:p ?_pp0 }")


def test_sequence_path_end_to_end(triples):
    # B subClassOf A, A label alpha: ?c subClassOf/label ?l
    out = sparql_query(triples, PFX + """
      SELECT ?c ?l WHERE { ?c rdfs:subClassOf/rdfs:label ?l }
      ORDER BY ?c""")
    assert [tuple(r) for r in out.collect()] == [
        ("ex:B", "alpha"), ("ex:C", "beta")]
    # closure element inside the sequence: C sub+ {B, A} -> labels
    out2 = sparql_query(triples, PFX + """
      SELECT ?l WHERE { ex:C rdfs:subClassOf+/rdfs:label ?l }
      ORDER BY ?l""")
    assert [r.l for r in out2.collect()] == ["alpha", "beta"]
    # hidden intermediates never surface in SELECT *
    out3 = sparql_query(triples, PFX +
                        "SELECT * WHERE { ?c rdfs:subClassOf/rdfs:label ?l }")
    assert sorted(out3.columns) == ["c", "l"]
    # multiset preserved: bnode hop ex:A ex:meta/ex:note -> one row
    out4 = sparql_query(triples, PFX + """
      SELECT ?n WHERE { ex:A <ex:meta>/<ex:note> ?n }""")
    assert [r.n for r in out4.collect()] == ["hi"]


def test_parse_union_distribution():
    spec = parse(PFX + "SELECT * WHERE { ?c rdfs:label ?l . "
                       "{ ?c a owl:Class } UNION { ?c a owl:Thing } }")
    pats, kw = spec["group"].bgp_kwargs()
    assert ("?c", LABEL, "?l") in pats and ("?c", RDF_TYPE, CLS) in pats
    # the shared pattern is distributed into the second branch
    assert kw["union"] == [[("?c", LABEL, "?l"),
                            ("?c", RDF_TYPE, "http://www.w3.org/2002/07/owl#Thing")]]


def test_parse_graph_and_values():
    spec = parse(PFX + """SELECT * WHERE {
        GRAPH ?g { ?s ex:p ?o }
        GRAPH ex:g1 { ?o ex:q ?z }
        VALUES ?s { ex:a ex:b }
    }""")
    pats = spec["group"].patterns
    assert ("?s", "ex:p", "?o", "?g") in pats
    assert ("?o", "ex:q", "?z", "ex:g1") in pats
    assert spec["group"].values == {"s": ["ex:a", "ex:b"]}


def test_parse_filters():
    spec = parse(PFX + """SELECT * WHERE {
        ?c rdfs:label ?l .
        FILTER (?l != "x" && STRLEN(?l) > 2)
        FILTER REGEX(?l, "^a.*")
        FILTER NOT EXISTS { ?c rdfs:subClassOf ?p }
    }""")
    g = spec["group"]
    assert g.filters[0] == "`l` <> 'x' AND length ( `l` ) > 2"
    assert g.filters[1] == "`l` RLIKE '^a.*'"
    assert g.not_exists == [[("?c", SUB, "?p")]]


def test_parse_aggregates():
    spec = parse(PFX + """SELECT ?t (COUNT(*) AS ?n) (SUM(?v) AS ?s)
        WHERE { ?x a ?t . ?x ex:val ?v }
        GROUP BY ?t HAVING (?n > 1)""")
    assert spec["aggs"] == {"n": ("COUNT", "*"), "s": ("SUM", "v")}
    assert spec["group_by"] == ["t"] and spec["having"] == "`n` > 1"


def test_parse_errors_are_named():
    cases = [
        ("SELECT * WHERE { ?s ?p ?o . VALUES ?o { _:b } }", "constants"),
        ("DESCRIBE _:b", "blank nodes"),
        ("CONSTRUCT { ?s <p> [] } WHERE { ?s <p> ?o }", "blank nodes"),
        ('SELECT * WHERE { "x"@en ?p ?o }', "subject position"),
        ('SELECT * WHERE { ?s "x"@en ?o }', "predicate position"),
        ('SELECT * WHERE { ?s ?p ?o . VALUES ?o { "x"@en } }', "VALUES"),
        ("SELECT * WHERE { ?s <p>*? ?o }", "single trailing"),
        ("SELECT ?x WHERE { ?s ?p ?o } GROUP BY", "GROUP BY"),
        ("PREFIX ex: <ex:> SELECT * WHERE { ?s zz:p ?o }", "undeclared"),
        ("CONSTRUCT { ?s <p>+ ?o } WHERE { ?s ?p ?o }", "path"),
        ("CONSTRUCT { } WHERE { ?s ?p ?o }", "empty CONSTRUCT"),
        ("SELECT * WHERE { ?s ?p ?o } JUNK", "trailing"),
        ("SELECT ?x (COUNT(*) AS ?n) WHERE { ?x ?p ?o }", "GROUP BY"),
    ]
    for q, msg in cases:
        with pytest.raises(SparqlError, match=msg):
            parse("PREFIX ex: <ex:>\n" + q if "PREFIX" not in q else q)


def test_parse_render_roundtrip_property():
    """Property test: render a random pattern structure to SPARQL text,
    parse it back, and the pattern list must survive exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    iris = st.sampled_from(["<http://x/a>", "<http://x/b>", "<http://x/c>"])
    vars_ = st.sampled_from(["?v0", "?v1", "?v2"])
    term = st.one_of(iris, vars_)
    pattern = st.tuples(term, st.one_of(iris, st.just("a")), term)
    patterns = st.lists(pattern, min_size=1, max_size=5)

    def norm(t):
        if t == "a":
            return RDF_TYPE
        return t[1:-1] if t.startswith("<") else t

    @settings(max_examples=60, deadline=None)
    @given(patterns)
    def check(pats):
        text = "SELECT * WHERE { " + " . ".join(
            " ".join(p) for p in pats) + " }"
        spec = parse(text)
        assert spec["group"].patterns == [
            (norm(s), norm(pr), norm(o)) for s, pr, o in pats]

    check()


# ------------------------------------------------------------ end-to-end
@pytest.fixture(scope="module")
def triples(spark):
    rows = [
        ("ex:A", RDF_TYPE, CLS, "iri", None, None),
        ("ex:B", RDF_TYPE, CLS, "iri", None, None),
        ("ex:C", RDF_TYPE, CLS, "iri", None, None),
        ("ex:B", SUB, "ex:A", "iri", None, None),
        ("ex:C", SUB, "ex:B", "iri", None, None),
        ("ex:A", LABEL, "alpha", "literal", None, None),
        ("ex:B", LABEL, "beta", "literal", None, None),
        ("ex:A", "ex:meta", "_:m", "bnode", None, None),
        ("_:m", "ex:note", "hi", "literal", None, None),
        ("ex:g1s", "ex:p", "ex:o", "iri", None, "ex:g1"),
    ]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_kind string, "
              "obj_datatype string, graph_ctx string")


def test_sparql_job_cli_end_to_end(spark, tmp_path, capsys):
    """spark-submit sparql subcommand: documents in → solution frame out."""
    import json
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    try:
        import corpus
    finally:
        sys.path.pop(0)
    from rdf_dtdl_fabric_ontology_converter_spark import sparql_job
    from rdf_dtdl_fabric_ontology_converter_spark.sources.documents import (
        docs_from_payloads)
    docs = docs_from_payloads(spark, {"r": corpus.TTL["simple"]})
    in_path = str(tmp_path / "docs")
    docs.write.parquet(in_path)
    out = str(tmp_path / "sol")
    rq = tmp_path / "q.rq"
    rq.write_text(PFX + "SELECT ?c WHERE { ?c a owl:Class } ORDER BY ?c")
    rc = sparql_job.main(["--input", in_path, "--query-file", str(rq),
                          "--output", out, "--show", "2",
                          "--shuffle-partitions", "4"],
                         existing_spark=spark)
    assert rc == 0
    sol = spark.read.parquet(out)
    assert sol.columns == ["c"] and sol.count() >= 1
    lines = [json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()]
    assert lines[-1] == {"columns": ["c"]}
    # ASK exit-code contract: 0 true, 3 false
    rc_t = sparql_job.main(["--input", in_path, "--query",
                            PFX + "ASK { ?c a owl:Class }", "--show", "0"],
                           existing_spark=spark)
    rc_f = sparql_job.main(["--input", in_path, "--query",
                            PFX + "ASK { ?c a owl:Thing }", "--show", "0"],
                           existing_spark=spark)
    assert (rc_t, rc_f) == (0, 3)


def test_select_end_to_end(triples):
    out = sparql_query(triples, PFX + """
      SELECT ?c ?l WHERE {
        ?c a owl:Class .
        OPTIONAL { ?c <http://www.w3.org/2000/01/rdf-schema#label> ?l }
      } ORDER BY ?c
    """)
    assert [tuple(r) for r in out.collect()] == [
        ("ex:A", "alpha"), ("ex:B", "beta"), ("ex:C", None)]


def test_path_and_filter_end_to_end(triples):
    out = sparql_query(triples, PFX + """
      SELECT ?x WHERE {
        ?x rdfs:subClassOf+ ex:A .
        FILTER NOT EXISTS { ?x rdfs:label ?l }
      }""")
    assert [r.x for r in out.collect()] == ["ex:C"]


def test_union_minus_end_to_end(triples):
    out = sparql_query(triples, PFX + """
      SELECT DISTINCT ?c WHERE {
        { ?c a owl:Class } UNION { ?c rdfs:subClassOf ?p }
        MINUS { ?c rdfs:label ?l }
      } ORDER BY ?c""")
    assert [r.c for r in out.collect()] == ["ex:C"]


def test_graph_values_end_to_end(triples):
    out = sparql_query(triples, PFX + """
      SELECT ?s ?g WHERE { GRAPH ?g { ?s ex:p ?o } }""")
    assert [tuple(r) for r in out.collect()] == [("ex:g1s", "ex:g1")]
    out2 = sparql_query(triples, PFX + """
      SELECT ?c WHERE { ?c a owl:Class . VALUES ?c { ex:A ex:Z } }""")
    assert [r.c for r in out2.collect()] == ["ex:A"]


def test_aggregate_end_to_end(triples):
    out = sparql_query(triples, PFX + """
      SELECT ?p (COUNT(*) AS ?n) WHERE { ?s ?p ?o }
      GROUP BY ?p HAVING (?n >= 2) ORDER BY DESC(?n) LIMIT 2""")
    got = [tuple(r) for r in out.collect()]
    assert got[0][1] >= got[1][1] and all(n >= 2 for _, n in got)


def test_filter_inside_groups_end_to_end(triples):
    # OPTIONAL with its own FILTER: only labels matching keep; others NULL
    out = sparql_query(triples, PFX + """
      SELECT ?c ?l WHERE {
        ?c a owl:Class .
        OPTIONAL { ?c rdfs:label ?l FILTER REGEX(?l, "^a") }
      } ORDER BY ?c""")
    assert [tuple(r) for r in out.collect()] == [
        ("ex:A", "alpha"), ("ex:B", None), ("ex:C", None)]
    # UNION with a filtered branch: branch filter applies inside it only
    out2 = sparql_query(triples, PFX + """
      SELECT DISTINCT ?c WHERE {
        { ?c a owl:Class }
        UNION
        { ?c rdfs:label ?l FILTER (?l = "beta") }
      } ORDER BY ?c""")
    assert [r.c for r in out2.collect()] == ["ex:A", "ex:B", "ex:C"]
    # MINUS with an internal FILTER: only matching solutions are removed
    out3 = sparql_query(triples, PFX + """
      SELECT ?c WHERE {
        ?c a owl:Class .
        MINUS { ?c rdfs:label ?l FILTER (?l = "beta") }
      } ORDER BY ?c""")
    assert [r.c for r in out3.collect()] == ["ex:A", "ex:C"]
    # all-filtered UNION raises with guidance (at kwargs-build time)
    spec = parse(PFX + """SELECT * WHERE {
      { ?c rdfs:label ?l FILTER (?l = "a") }
      UNION
      { ?c rdfs:label ?l FILTER (?l = "b") } }""")
    with pytest.raises(SparqlError, match="filter-free"):
        spec["group"].bgp_kwargs()


def test_bind_end_to_end(triples):
    out = sparql_query(triples, PFX + """
      SELECT ?c ?tag WHERE {
        ?c a owl:Class .
        OPTIONAL { ?c rdfs:label ?l }
        BIND (CONTAINS(?l, "a") AS ?has_a)
        BIND (STRLEN(?l) AS ?tag)
        FILTER (?has_a)
      } ORDER BY ?c""")
    got = [tuple(r) for r in out.collect()]
    assert got == [("ex:A", 5), ("ex:B", 4)]  # alpha/beta contain 'a'
    # parse-level guards
    with pytest.raises(SparqlError, match="triple pattern"):
        parse(PFX + "SELECT * WHERE { ?c a owl:Class . "
                    "BIND (STRLEN(?c) AS ?n) ?x <p> ?n }")
    with pytest.raises(SparqlError, match="SELECT only"):
        parse(PFX + "ASK { ?c a owl:Class BIND (1 AS ?one) }")
    with pytest.raises(SparqlError, match="BIND inside"):
        parse(PFX + "SELECT * WHERE { ?c a owl:Class . "
                    "OPTIONAL { ?c rdfs:label ?l BIND (1 AS ?one) } }")


def test_builtin_function_surface(triples):
    # the widened _FN_SQL set: string casts, case mapping, SUBSTR's
    # 1-based indexing, CONCAT/REPLACE/IF/COALESCE, arithmetic tokens
    out = sparql_query(triples, PFX + """
      SELECT ?c ?u ?pre ?fix ?tag WHERE {
        ?c rdfs:label ?l .
        BIND (UCASE(?l) AS ?u)
        BIND (SUBSTR(?l, 1, 3) AS ?pre)
        BIND (CONCAT(STR(?c), "#", REPLACE(?l, "[aeiou]", "_")) AS ?fix)
        BIND (IF(STRLEN(?l) - 1 >= 4, "long", "short") AS ?tag)
        FILTER (STRENDS(?l, "a") && LCASE(?u) = ?l)
      } ORDER BY ?c""")
    got = [tuple(r) for r in out.collect()]
    assert got == [("ex:A", "ALPHA", "alp", "ex:A#_lph_", "long"),
                   ("ex:B", "BETA", "bet", "ex:B#b_t_", "short")]
    # COALESCE over an OPTIONAL-null and boolean literals
    out2 = sparql_query(triples, PFX + """
      SELECT ?c ?name WHERE {
        ?c a owl:Class .
        OPTIONAL { ?c rdfs:label ?l }
        BIND (COALESCE(?l, "unnamed") AS ?name)
        FILTER (true)
      } ORDER BY ?c""")
    assert [r.name for r in out2.collect()] == ["alpha", "beta",
                                                "unnamed"]


def test_construct_end_to_end(triples):
    out = sparql_query(triples, PFX + """
      CONSTRUCT { ?sup <ex:hasSub> ?sub . ?sub a <ex:Sub> }
      WHERE { ?sub rdfs:subClassOf ?sup }""")
    got = {(r.subj, r.pred, r.obj) for r in out.collect()}
    assert got == {("ex:A", "ex:hasSub", "ex:B"), ("ex:B", "ex:hasSub", "ex:C"),
                   ("ex:B", RDF_TYPE, "ex:Sub"), ("ex:C", RDF_TYPE, "ex:Sub")}


def test_ask_and_describe_end_to_end(triples):
    assert sparql_query(triples, PFX +
                        "ASK { ex:C rdfs:subClassOf+ ex:A }") is True
    assert sparql_query(triples, PFX +
                        "ASK { ex:A rdfs:subClassOf ?p }") is False
    out = sparql_query(triples, "DESCRIBE <ex:A>")
    got = {(r.subj, r.pred, r.obj) for r in out.collect()}
    assert ("_:m", "ex:note", "hi") in got  # bnode closure
    assert len(got) == 4
    out2 = sparql_query(triples, PFX + """
      DESCRIBE ?x WHERE { ?x rdfs:label "alpha" }""")
    assert out2.count() == 4


def test_values_rows_parse_and_end_to_end(triples):
    # parse: vars + rows with UNDEF -> None
    spec = parse(PFX + """SELECT * WHERE {
        ?c rdfs:label ?l .
        VALUES (?c ?l) { (ex:A "alpha") (ex:B UNDEF) }
    }""")
    assert spec["group"].values_rows == (
        ["c", "l"], [("ex:A", "alpha"), ("ex:B", None)])
    # end to end: (ex:A, alpha) exact row + every ex:B row via UNDEF
    out = sparql_query(triples, PFX + """
      SELECT ?c ?l WHERE {
        ?c rdfs:label ?l .
        VALUES (?c ?l) { (ex:A "alpha") (ex:B UNDEF) }
      } ORDER BY ?c""")
    assert [tuple(r) for r in out.collect()] == [
        ("ex:A", "alpha"), ("ex:B", "beta")]
    # multiset: a solution compatible with TWO rows appears twice
    out2 = sparql_query(triples, PFX + """
      SELECT ?c WHERE {
        ?c rdfs:label ?l .
        VALUES (?c ?l) { (ex:A "alpha") (ex:A UNDEF) }
      }""")
    assert [r.c for r in out2.collect()] == ["ex:A", "ex:A"]
    # guards
    with pytest.raises(SparqlError, match="row has"):
        parse(PFX + 'SELECT * WHERE { ?c rdfs:label ?l '
                    'VALUES (?c ?l) { (ex:A) } }')
    with pytest.raises(SparqlError, match="one multi-variable"):
        parse(PFX + 'SELECT * WHERE { ?c rdfs:label ?l '
                    'VALUES (?c) { (ex:A) } VALUES (?l) { ("x") } }')
    # joining on an OPTIONAL-introduced variable raises at plan time
    from rdf_dtdl_fabric_ontology_converter_spark.operators.bgp import (
        match_bgp)
    with pytest.raises(ValueError, match="possibly-unbound"):
        match_bgp(triples, [("?c", RDF_TYPE, CLS)],
                  optional=[[("?c", LABEL, "?l")]],
                  values_rows=(["l"], [("alpha",)])).collect()


def test_subquery_end_to_end(triples):
    # per-superclass subclass count via an aggregate subquery, joined
    # back onto the label patterns of the outer group
    out = sparql_query(triples, PFX + """
      SELECT ?sup ?l ?n WHERE {
        ?sup rdfs:label ?l .
        { SELECT ?sup (COUNT(*) AS ?n) WHERE {
            ?sub rdfs:subClassOf ?sup } GROUP BY ?sup }
      } ORDER BY ?sup""")
    assert [tuple(r) for r in out.collect()] == [
        ("ex:A", "alpha", 1), ("ex:B", "beta", 1)]
    # inner modifiers: LIMITed subquery restricts the outer join
    out2 = sparql_query(triples, PFX + """
      SELECT ?c ?l WHERE {
        ?c rdfs:label ?l .
        { SELECT ?c WHERE { ?c a owl:Class } ORDER BY ?c LIMIT 1 }
      }""")
    assert [tuple(r) for r in out2.collect()] == [("ex:A", "alpha")]
    # guards: no shared variable -> product refused; SELECT-only forms
    with pytest.raises(SparqlError, match="sharing no variable"):
        sparql_query(triples, PFX + """
          SELECT * WHERE {
            ?c a owl:Class .
            { SELECT ?z WHERE { ?z rdfs:label ?w } }
          }""").collect()
    with pytest.raises(SparqlError, match="SELECT only"):
        parse(PFX + "ASK { { SELECT ?c WHERE { ?c a owl:Class } } }")


def test_star_and_opt_paths_end_to_end(triples):
    # rdfs:subClassOf* from a constant: C itself plus all ancestors
    out = sparql_query(triples, PFX + """
      SELECT ?y WHERE { ex:C rdfs:subClassOf* ?y } ORDER BY ?y""")
    assert [r.y for r in out.collect()] == ["ex:A", "ex:B", "ex:C"]
    # zero-or-one composes with a second pattern; alternation closes too
    out2 = sparql_query(triples, PFX + """
      SELECT ?c ?l WHERE { ex:B rdfs:subClassOf? ?c . ?c rdfs:label ?l }
      ORDER BY ?c""")
    assert [tuple(r) for r in out2.collect()] == [
        ("ex:A", "alpha"), ("ex:B", "beta")]
    # parse guard: one trailing operator only
    with pytest.raises(SparqlError, match="single trailing"):
        parse(PFX + "SELECT * WHERE { ?x rdfs:subClassOf*+ ?y }")
    spec = parse(PFX + "SELECT * WHERE { ?x ^ex:a|ex:b* ?y }")
    assert spec["group"].patterns == [("?x", "^ex:a|ex:b*", "?y")]


@pytest.fixture(scope="module")
def typed_triples(spark):
    XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"
    XSD_STR = "http://www.w3.org/2001/XMLSchema#string"
    rows = [
        ("ex:a", "ex:age", "5", "literal", XSD_INT, None, None),
        ("ex:b", "ex:age", "5", "literal", None, None, None),  # simple
        ("ex:c", "ex:age", "05", "literal", XSD_INT, None, None),
        ("ex:d", "ex:name", "chat", "literal", None, "en", None),
        ("ex:e", "ex:name", "chat", "literal", None, "FR", None),
        ("ex:f", "ex:name", "chat", "literal", None, None, None),
        ("ex:g", "ex:name", "chat", "literal", XSD_STR, None, None),
    ]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_kind string, "
              "obj_datatype string, lang string, graph_ctx string")


def test_typed_and_lang_literal_matching(typed_triples):
    q = 'PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n'
    # term equality: exact datatype, exact lexical form ("05" != "5")
    out = sparql_query(typed_triples, q + """
      SELECT ?s WHERE { ?s ?p "5"^^xsd:integer }""")
    assert [r.s for r in out.collect()] == ["ex:a"]
    # language tags compare case-insensitively (RDF 1.1 / BCP 47)
    out2 = sparql_query(typed_triples, q + """
      SELECT ?s WHERE { ?s ?p "chat"@fr }""")
    assert [r.s for r in out2.collect()] == ["ex:e"]
    # RDF 1.1: simple literal ≡ xsd:string (both spellings, no lang rows)
    out3 = sparql_query(typed_triples, q + """
      SELECT ?s WHERE { ?s ?p "chat"^^xsd:string } ORDER BY ?s""")
    assert [r.s for r in out3.collect()] == ["ex:f", "ex:g"]
    # plain "5" stays lexical-form matching (documented back-compat)
    out4 = sparql_query(typed_triples, q + """
      SELECT ?s WHERE { ?s ?p "5" } ORDER BY ?s""")
    assert [r.s for r in out4.collect()] == ["ex:a", "ex:b"]


def test_typed_literal_needs_store_columns(triples, spark):
    from rdf_dtdl_fabric_ontology_converter_spark.operators.bgp import match_bgp
    bare = spark.createDataFrame(
        [("ex:a", "ex:p", "5")], ["subj", "pred", "obj"])
    with pytest.raises(ValueError, match="obj_datatype"):
        match_bgp(bare, [("?s", "ex:p",
                          ("lit", "5", "http://x/int", None))]).collect()
    with pytest.raises(ValueError, match="path expression"):
        match_bgp(triples, [("?s", "ex:p+",
                             ("lit", "5", "http://x/int", None))])


def test_blank_node_patterns(triples):
    # [ p o ] in object position: hidden var + emitted inner pattern —
    # ex:A ex:meta _:m . _:m ex:note "hi"
    out = sparql_query(triples, PFX + """
      SELECT ?s WHERE { ?s <ex:meta> [ <ex:note> "hi" ] }""")
    assert [r.s for r in out.collect()] == ["ex:A"]
    # labeled bnode: two patterns connected through _:x, never projected
    out2 = sparql_query(triples, PFX + """
      SELECT ?s ?n WHERE { ?s <ex:meta> _:x . _:x <ex:note> ?n }""")
    assert [tuple(r) for r in out2.collect()] == [("ex:A", "hi")]
    # [] anonymous: plain existential
    out3 = sparql_query(triples, PFX + """
      SELECT ?s WHERE { ?s <ex:meta> [] }""")
    assert [r.s for r in out3.collect()] == ["ex:A"]
    # bnode property list as SUBJECT, with ; inside the brackets
    out4 = sparql_query(triples, PFX + """
      SELECT ?n WHERE { [ <ex:note> ?n ; <ex:note> "hi" ] <ex:note> ?n }""")
    assert [r.n for r in out4.collect()] == ["hi"]
    # hidden vars never surface in SELECT *
    out5 = sparql_query(triples, PFX +
                        "SELECT * WHERE { ?s <ex:meta> [ <ex:note> ?n ] }")
    assert sorted(out5.columns) == ["n", "s"]
    # a bracket outside a triples block is a named error
    with pytest.raises(SparqlError, match="triple patterns"):
        parse(PFX + "SELECT * WHERE { ?s ?p ?o . VALUES ?v { [] } }")


def test_term_accessor_filters(typed_triples, triples):
    q = 'PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n'
    # LANG returns the stored tag verbatim (compare case-insensitively
    # via LCASE, per spec: plain = is case-sensitive, langMatches isn't)
    out = sparql_query(typed_triples, q + """
      SELECT ?s WHERE { ?s ?p ?v . FILTER (LCASE(LANG(?v)) = "fr") }""")
    assert [r.s for r in out.collect()] == ["ex:e"]
    # DATATYPE: explicit datatype, RDF 1.1 defaults for simple/lang rows
    out2 = sparql_query(typed_triples, q + """
      SELECT ?s WHERE { ?s ?p ?v . FILTER (DATATYPE(?v) = xsd:integer) }
      ORDER BY ?s""")
    assert [r.s for r in out2.collect()] == ["ex:a", "ex:c"]
    out3 = sparql_query(typed_triples, q + """
      SELECT ?s WHERE { ?s ?p ?v .
        FILTER (DATATYPE(?v) = xsd:string && ?v = "chat") } ORDER BY ?s""")
    assert [r.s for r in out3.collect()] == ["ex:f", "ex:g"]
    # lang-tagged rows carry rdf:langString (RDF 1.1 §3.3)
    out4 = sparql_query(typed_triples, q + """
      SELECT ?s WHERE { ?s ?p ?v . FILTER (DATATYPE(?v) =
        <http://www.w3.org/1999/02/22-rdf-syntax-ns#langString>) }
      ORDER BY ?s""")
    assert [r.s for r in out4.collect()] == ["ex:d", "ex:e"]
    # isBlank on the main fixture's bnode object; isIRI complement
    out5 = sparql_query(triples, PFX + """
      SELECT ?s WHERE { ?s <ex:meta> ?m . FILTER isBlank(?m) }""")
    assert [r.s for r in out5.collect()] == ["ex:A"]
    out6 = sparql_query(triples, PFX + """
      SELECT ?o WHERE { ex:B ?p ?o . FILTER isIRI(?o) }""")
    assert [r.o for r in out6.collect()] == [CLS, "ex:A"]
    # BIND with an accessor expression
    out7 = sparql_query(typed_triples, q + """
      SELECT ?s ?tag WHERE { ?s ?p ?v . BIND (LANG(?v) AS ?tag)
        FILTER (STRLEN(?tag) > 0) } ORDER BY ?s""")
    assert [tuple(r) for r in out7.collect()] == [
        ("ex:d", "en"), ("ex:e", "FR")]
    # named errors: accessor var not an object binding; HAVING context
    with pytest.raises(Exception, match="object position"):
        sparql_query(triples, PFX + """
          SELECT ?s WHERE { ?s ?p ?o . FILTER isIRI(?s) }""")
    with pytest.raises(SparqlError, match="HAVING"):
        parse(PFX + """SELECT ?t (COUNT(*) AS ?n) WHERE { ?x a ?t }
          GROUP BY ?t HAVING (LANG(?t) = "")""")


def test_langmatches_and_negated_property_set(typed_triples, triples):
    # langMatches: case-insensitive range match, "*" = any tagged
    out = sparql_query(typed_triples, """
      SELECT ?s WHERE { ?s ?p ?v . FILTER LANGMATCHES(LANG(?v), "fr") }""")
    assert [r.s for r in out.collect()] == ["ex:e"]
    out2 = sparql_query(typed_triples, """
      SELECT ?s WHERE { ?s ?p ?v . FILTER LANGMATCHES(LANG(?v), "*") }
      ORDER BY ?s""")
    assert [r.s for r in out2.collect()] == ["ex:d", "ex:e"]
    # negated property set: every edge from ex:A except rdfs:label
    out3 = sparql_query(triples, PFX + """
      SELECT ?o WHERE { ex:A !rdfs:label ?o } ORDER BY ?o""")
    assert [r.o for r in out3.collect()] == ["_:m", CLS]
    # parenthesized mixed set with an inverse atom: the reversed
    # subClassOf edge into A is excluded, the forward non-label edges stay
    out4 = sparql_query(triples, PFX + """
      SELECT ?o WHERE { ex:A !(rdfs:label|^rdfs:subClassOf) ?o }
      ORDER BY ?o""")
    assert [r.o for r in out4.collect()] == ["_:m", CLS]
    # all-inverse set traverses backwards only: edges INTO ex:A whose
    # predicate is anything but rdfs:label — the B subClassOf A edge
    out5 = sparql_query(triples, PFX + """
      SELECT ?x WHERE { ex:A !(^rdfs:label) ?x }""")
    assert [r.x for r in out5.collect()] == ["ex:B"]
    # parse shape incl. trailing closure; guards
    spec = parse(PFX + "SELECT * WHERE { ?x !(ex:a|^ex:b)+ ?y }")
    assert spec["group"].patterns == [("?x", "!ex:a|^ex:b+", "?y")]
    with pytest.raises(SparqlError, match="IRIs"):
        parse(PFX + "SELECT * WHERE { ?x !(?v) ?y }")
    with pytest.raises(SparqlError, match='LANGMATCHES'):
        parse('SELECT * WHERE { ?s ?p ?v . FILTER LANGMATCHES(?v, "en") }')


def test_count_distinct_aggregate(triples):
    # each superclass is re-stated once per matching (sub, label) row;
    # plain COUNT sees the multiset, COUNT(DISTINCT ?sub) the set
    out = sparql_query(triples, PFX + """
      SELECT ?sup (COUNT(DISTINCT ?sub) AS ?n) (COUNT(?sub) AS ?m)
      WHERE { ?sub rdfs:subClassOf ?sup . ?sub a owl:Class .
              ?sup rdfs:label ?l }
      GROUP BY ?sup ORDER BY ?sup""")
    assert [tuple(r) for r in out.collect()] == [
        ("ex:A", 1, 1), ("ex:B", 1, 1)]
    # distinct GROUP_CONCAT collapses duplicates, sorted determinism
    out2 = sparql_query(triples, PFX + """
      SELECT (GROUP_CONCAT(DISTINCT ?t) AS ?ts)
      WHERE { ?c a ?t }""")
    assert [r.ts for r in out2.collect()] == [CLS]
    spec = parse(PFX + """SELECT (SUM(DISTINCT ?v) AS ?s)
      WHERE { ?x <ex:val> ?v }""")
    assert spec["aggs"] == {"s": ("SUM_DISTINCT", "v")}


def test_hash_and_str_builtins(triples):
    # STRBEFORE/STRAFTER on lexical forms; '' when absent (§17.4.3.7/8)
    out = sparql_query(triples, PFX + """
      SELECT ?l ?pre ?post WHERE { ex:A rdfs:label ?l .
        BIND (STRBEFORE(?l, "ph") AS ?pre)
        BIND (STRAFTER(?l, "ph") AS ?post) }""")
    assert [tuple(r) for r in out.collect()] == [("alpha", "al", "a")]
    out2 = sparql_query(triples, PFX + """
      SELECT ?x WHERE { ?x rdfs:label ?l .
        FILTER (STRBEFORE(?l, "zz") = "" && STRAFTER(?l, "lph") = "a") }""")
    assert [r.x for r in out2.collect()] == ["ex:A"]
    # hash builtins match the reference digests of the lexical form
    import hashlib
    md5 = hashlib.md5(b"alpha").hexdigest()
    sha256 = hashlib.sha256(b"alpha").hexdigest()
    out3 = sparql_query(triples, PFX + f"""
      SELECT ?x WHERE {{ ?x rdfs:label ?l .
        FILTER (MD5(?l) = "{md5}" && SHA256(?l) = "{sha256}") }}""")
    assert [r.x for r in out3.collect()] == ["ex:A"]


def test_parse_path_roundtrip_property():
    """Property test over the whole path grammar: render a random path
    spec (optional per-atom ^, alternation, optional negation, optional
    trailing +/*/?) to SPARQL text, parse it, and the operator-layer
    pattern string must match the expected encoding exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    iri = st.sampled_from(["http://x/a", "http://x/b", "http://x/c"])
    atom = st.tuples(st.booleans(), iri)  # (inverted?, iri)
    spec = st.tuples(st.booleans(),                       # negated?
                     st.lists(atom, min_size=1, max_size=3),
                     st.sampled_from(["", "+", "*", "?"]))

    @settings(max_examples=80, deadline=None)
    @given(spec)
    def check(s):
        negated, atoms, op = s
        shown = ["^<%s>" % i if inv else "<%s>" % i for inv, i in atoms]
        if negated:
            text_pred = ("!(" + "|".join(shown) + ")" + op
                         if len(shown) > 1 else "!" + shown[0] + op)
        else:
            text_pred = "|".join(shown) + op
        expected = (("!" if negated else "")
                    + "|".join(("^" + i) if inv else i for inv, i in atoms)
                    + op)
        parsed = parse("SELECT * WHERE { ?s %s ?o }" % text_pred)
        assert parsed["group"].patterns == [("?s", expected, "?o")]

    check()


def test_order_by_expressions(triples):
    # DESC over an expression; plain function call; mixed with a var key
    out = sparql_query(triples, PFX + """
      SELECT ?c ?l WHERE { ?c rdfs:label ?l }
      ORDER BY DESC(STRLEN(?l)) ?c""")
    assert [tuple(r) for r in out.collect()] == [
        ("ex:A", "alpha"), ("ex:B", "beta")]
    out2 = sparql_query(triples, PFX + """
      SELECT ?l WHERE { ?c rdfs:label ?l } ORDER BY STRLEN(?l)""")
    assert [r.l for r in out2.collect()] == ["beta", "alpha"]
    # DESC(?var) keeps the plain-variable path (projection check intact)
    with pytest.raises(SparqlError, match="projection"):
        sparql_query(triples, PFX + """
          SELECT ?l WHERE { ?c rdfs:label ?l } ORDER BY DESC(?c)""")


def test_rdf_list_walk_idiom(spark):
    """The canonical SPARQL list-walking path rdf:rest*/rdf:first over a
    turtle collection: zero-or-more hops down the spine then one first —
    composes the sequence-path desugar with the new * closure."""
    from rdf_dtdl_fabric_ontology_converter_spark.functions.turtle import (
        parse_turtle)
    rows = parse_turtle(
        '@prefix ex: <http://example.org/> .\n'
        'ex:s ex:list ( ex:a ex:b ex:c ) .\n')
    t = spark.createDataFrame(
        [(s, p, o) for (s, p, o, k, dt, lg, g) in rows],
        ["subj", "pred", "obj"])
    out = sparql_query(t, """
      PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
      PREFIX ex: <http://example.org/>
      SELECT ?m WHERE { ex:s ex:list ?l . ?l rdf:rest*/rdf:first ?m }
      ORDER BY ?m""")
    assert [r.m for r in out.collect()] == [
        "http://example.org/a", "http://example.org/b",
        "http://example.org/c"]


def test_having_bare_aggregates(triples):
    # HAVING with a bare COUNT(*) — no alias needed (hidden aggregate)
    out = sparql_query(triples, PFX + """
      SELECT ?sup WHERE { ?sub rdfs:subClassOf ?sup }
      GROUP BY ?sup HAVING (COUNT(*) >= 1) ORDER BY ?sup""")
    assert [r.sup for r in out.collect()] == ["ex:A", "ex:B"]
    # bare agg reuses a same-spec user alias; threshold filters
    out2 = sparql_query(triples, PFX + """
      SELECT ?t (COUNT(?c) AS ?n) WHERE { ?c a ?t }
      GROUP BY ?t HAVING (COUNT(?c) > 2)""")
    assert [tuple(r) for r in out2.collect()] == [(CLS, 3)]
    out3 = sparql_query(triples, PFX + """
      SELECT ?t (COUNT(?c) AS ?n) WHERE { ?c a ?t }
      GROUP BY ?t HAVING (COUNT(?c) > 3)""")
    assert out3.collect() == []
    # no hidden columns leak into the output
    assert out2.columns == ["t", "n"]


def test_sameterm_and_iri_builtin(typed_triples):
    # same lexical form, different datatype: plain = matches, sameTerm
    # (term identity: lexical + datatype + lang + kind) does not
    XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"
    rows = [("ex:a", "ex:age", "5", "literal", XSD_INT, None, None),
            ("ex:a", "ex:age2", "5", "literal", None, None, None),
            ("ex:c", "ex:age", "7", "literal", XSD_INT, None, None),
            ("ex:c", "ex:age2", "7", "literal", XSD_INT, None, None)]
    t = typed_triples.sparkSession.createDataFrame(
        rows, typed_triples.schema)
    q = """
      SELECT ?x WHERE {
        ?x <ex:age> ?v . ?x <ex:age2> ?w . FILTER (%s)
      }"""
    both = sparql_query(t, q % "?v = ?w")
    assert sorted(r.x for r in both.collect()) == ["ex:a", "ex:c"]
    out = sparql_query(t, q % "sameTerm(?v, ?w)")
    assert [r.x for r in out.collect()] == ["ex:c"]
    # IRI()/URI() are identity over the lexical value space
    out2 = sparql_query(t, """
      SELECT ?x WHERE { ?x <ex:age> ?v . FILTER (IRI(?x) = "ex:a") }""")
    assert [r.x for r in out2.collect()] == ["ex:a"]


def test_filter_translation_fuzz(spark):
    """Property test: any FILTER expression the parser accepts must
    translate to SQL that Spark's analyzer accepts — the translator can
    reject (SparqlError) but must never emit unparseable SQL."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import pyspark.sql.functions as F

    str_atom = st.sampled_from(
        ['?l', '"abc"', 'UCASE(?l)', 'LCASE(?l)', 'CONCAT(?l, "x")',
         'STRBEFORE(?l, "a")', 'STRAFTER(?l, "a")', 'SUBSTR(?l, 1, 2)',
         'REPLACE(?l, "a", "b")', 'MD5(?l)', 'STR(?l)'])
    num_atom = st.sampled_from(['3', '-2', 'STRLEN(?l)', 'ABS(-4)',
                                'CEIL(1.2)', 'FLOOR(2.8)', 'ROUND(2.5)'])

    def bools(children):
        leaf = st.one_of(
            st.tuples(st.just('cmp_s'), str_atom, str_atom),
            st.tuples(st.just('cmp_n'), num_atom, num_atom),
            st.tuples(st.just('fn2'),
                      st.sampled_from(['CONTAINS', 'STRSTARTS', 'STRENDS']),
                      str_atom),
            st.just(('regex',)), st.just(('bound',)))
        return st.one_of(
            leaf,
            st.tuples(st.just('and'), children, children),
            st.tuples(st.just('or'), children, children),
            st.tuples(st.just('not'), children))

    expr_tree = st.recursive(bools(st.nothing()), bools, max_leaves=6)

    def render(t):
        k = t[0]
        if k == 'cmp_s':
            return f"({t[1]} != {t[2]})"
        if k == 'cmp_n':
            return f"({t[1]} <= {t[2]})"
        if k == 'fn2':
            return f"{t[1]}({t[2]}, \"a\")"
        if k == 'regex':
            return 'REGEX(?l, "^a.*b$")'
        if k == 'bound':
            return 'BOUND(?l)'
        if k == 'not':
            return f"(!({render(t[1])}))"
        return f"({render(t[1])} {'&&' if k == 'and' else '||'} {render(t[2])})"

    probe = spark.createDataFrame([("abc",)], ["l"])

    @settings(max_examples=25, deadline=None)
    @given(expr_tree)
    def check(tree):
        text = ("SELECT * WHERE { ?s ?p ?l . FILTER (%s) }" % render(tree))
        g = parse(text)["group"]
        sql = " AND ".join(f"({f})" for f in g.filters)
        probe.where(F.expr(sql)).schema  # forces Spark analysis

    check()


def test_parenthesized_paths(triples):
    # standard spelling (a|b)+ — same encoding as the bare a|b+ form
    spec = parse(PFX + "SELECT * WHERE { ?x (ex:a|^ex:b)+ ?y }")
    assert spec["group"].patterns == [("?x", "ex:a|^ex:b+", "?y")]
    # parenthesized alternation INSIDE a sequence is now unambiguous
    out = sparql_query(triples, PFX + """
      SELECT ?l WHERE { ex:C (rdfs:subClassOf|<ex:nope>)+/rdfs:label ?l }
      ORDER BY ?l""")
    assert [r.l for r in out.collect()] == ["alpha", "beta"]
    # the bare ambiguous form still raises, with guidance
    with pytest.raises(SparqlError, match="parenthesize"):
        parse(PFX + "SELECT * WHERE { ?x ex:a|ex:b/ex:c ?y }")


def test_select_scalar_expressions(triples, typed_triples):
    out = sparql_query(triples, PFX + """
      SELECT ?c (STRLEN(?l) AS ?n) (UCASE(?l) AS ?u)
      WHERE { ?c rdfs:label ?l } ORDER BY ?c""")
    assert [tuple(r) for r in out.collect()] == [
        ("ex:A", 5, "ALPHA"), ("ex:B", 4, "BETA")]
    # accessor inside a projection expression (meta vars pend until the
    # group is parsed)
    out2 = sparql_query(typed_triples, """
      SELECT ?s (LANG(?v) AS ?tag) WHERE { ?s <ex:name> ?v .
        FILTER (STRLEN(LANG(?v)) > 0) } ORDER BY ?s""")
    assert [tuple(r) for r in out2.collect()] == [
        ("ex:d", "en"), ("ex:e", "FR")]
    # guard: aggregates don't mix with scalar projections
    with pytest.raises(SparqlError, match="cannot mix"):
        parse("""SELECT (COUNT(*) AS ?n) (STRLEN(?l) AS ?m)
                 WHERE { ?s ?p ?l }""")
    # an aggregate spelled inside the paren still routes to the agg path
    spec = parse("SELECT (MIN(?v) AS ?m) WHERE { ?x <ex:v> ?v }")
    assert spec["aggs"] == {"m": ("MIN", "v")} and not spec["select_exprs"]
