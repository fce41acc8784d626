"""Incremental KG maintenance end-to-end (round-4 verdict item 3).

Oracle: after each ingest, the committed vertex/edge snapshot must equal a
from-scratch batch run over all documents seen so far; prior snapshot
versions stay readable (time travel) and rollback flips the tables back
coherently.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rdf_dtdl_fabric_ontology_converter_spark.plans.incremental_kg import (
    IncrementalKG)
from rdf_dtdl_fabric_ontology_converter_spark.plans.pipeline import (
    run_pipeline)
from rdf_dtdl_fabric_ontology_converter_spark.sources.documents import (
    synth_documents)


def _vertex_rows(df):
    return sorted(
        (r["name"], r["id"], r["base_entity_type_id"], r["n_props"])
        for r in df.select(
            "name", "id", "base_entity_type_id",
            F.size("properties").alias("n_props")).collect())


def _edge_rows(df):
    return sorted((r["rel_key"], r["id"]) for r in
                  df.select("rel_key", "id").collect())


def test_incremental_kg_two_batches(spark, tmp_path):
    docs = synth_documents(spark, 6, classes_per_doc=2)
    batch1 = docs.where(F.col("doc_id") < "doc_0000000003")
    batch2 = docs.where(F.col("doc_id") >= "doc_0000000003")
    docs_path = str(tmp_path / "docs")
    batch1.write.mode("overwrite").parquet(docs_path)

    kg = IncrementalKG(spark, str(tmp_path / "kg"), docs_path)
    info1 = kg.ingest()
    v1 = info1["entity_types"]["snapshot_id"]
    assert info1["n_entity_types"] > 0

    # oracle 1: from-scratch batch run over batch 1
    want1 = run_pipeline(spark, batch1)
    assert _vertex_rows(kg.read_vertices()) == \
        _vertex_rows(want1.entity_types)

    # second document batch arrives; ingest extracts ONLY the new files
    # (stream checkpoint) and commits a NEW snapshot version
    batch2.write.mode("append").parquet(docs_path)
    info2 = kg.ingest()
    v2 = info2["entity_types"]["snapshot_id"]
    assert v2 != v1

    # oracle 2: from-scratch batch run over ALL documents
    want2 = run_pipeline(spark, docs)
    assert _vertex_rows(kg.read_vertices()) == \
        _vertex_rows(want2.entity_types)
    assert _edge_rows(kg.read_edges()) == \
        _edge_rows(want2.relationship_types)

    # the triple log was appended, not rebuilt: exactly the union of both
    # batches' triples, no duplicates from re-extraction of batch 1
    log = spark.read.parquet(str(tmp_path / "kg" / "triples"))
    batch_triples = run_pipeline(spark, docs).triples_prov
    assert log.where(F.col("parse_error").isNull()).count() == \
        batch_triples.count()

    # time travel: v1 still readable and equal to the batch-1 oracle
    assert _vertex_rows(kg.read_vertices(snapshot_id=v1)) == \
        _vertex_rows(want1.entity_types)
    assert [e["snapshot_id"] for e in kg.history()] == [v1, v2]

    # rollback flips vertex AND edge tables to the same ingest's versions
    kg.rollback(v1)
    assert _vertex_rows(kg.read_vertices()) == \
        _vertex_rows(want1.entity_types)
    assert _edge_rows(kg.read_edges()) == \
        _edge_rows(want1.relationship_types)

    # lineage recorded a commit per stage per ingest
    lin = kg.snapshots.lineage()
    assert lin.select("snapshot_id").distinct().count() >= 6


def test_time_travel_sparql(spark, tmp_path):
    """query(text, snapshot_id): the manifest-pinned triple log answers
    SPARQL as of any ingest — an old snapshot cannot see newer docs even
    though the log directory has grown since."""
    from rdf_dtdl_fabric_ontology_converter_spark.sources.documents import (
        docs_from_payloads)
    head = ("@prefix ex: <http://example.org/> .\n"
            "@prefix owl: <http://www.w3.org/2002/07/owl#> .\n")
    docs_path = str(tmp_path / "docs")
    docs_from_payloads(spark, {"d1": head + "ex:A a owl:Class .\n"}) \
        .write.mode("overwrite").parquet(docs_path)
    kg = IncrementalKG(spark, str(tmp_path / "kg"), docs_path)
    kg.ingest()
    t1 = kg.triples_history()[-1]["snapshot_id"]

    docs_from_payloads(spark, {"d2": head + "ex:B a owl:Class .\n"}) \
        .write.mode("append").parquet(docs_path)
    kg.ingest()
    t2 = kg.triples_history()[-1]["snapshot_id"]
    assert t1 != t2

    q = ("PREFIX owl: <http://www.w3.org/2002/07/owl#> "
         "SELECT ?c WHERE { ?c a owl:Class } ORDER BY ?c")
    now = [r.c for r in kg.query(q).collect()]
    old = [r.c for r in kg.query(q, snapshot_id=t1).collect()]
    assert now == ["http://example.org/A", "http://example.org/B"]
    assert old == ["http://example.org/A"]  # time travel: B invisible
    ask = "PREFIX ex: <http://example.org/> ASK { ex:B ?p ?o }"
    assert kg.query(ask) is True
    assert kg.query(ask, snapshot_id=t1) is False
    # rollback pairs the triples pointer with the same ingest's tables
    v1 = kg.history()[0]["snapshot_id"]
    kg.rollback(v1)
    assert [r.c for r in kg.query(q).collect()] == ["http://example.org/A"]


def test_incremental_kg_with_entailment(spark, tmp_path):
    """entailment=('rdfs',) re-infers from the full triple log at every
    snapshot: a class typed owl:Class only via an rdfs9 hop becomes a
    vertex, in both the first and (unchanged-content) second ingest."""
    from rdf_dtdl_fabric_ontology_converter_spark.sources.documents import (
        docs_from_payloads)
    ttl = ("@prefix ex: <http://example.org/> .\n"
           "@prefix owl: <http://www.w3.org/2002/07/owl#> .\n"
           "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n"
           "ex:MetaA rdfs:subClassOf owl:Class .\n"
           "ex:X a ex:MetaA .\n")
    docs = docs_from_payloads(spark, {"m": ttl})
    docs_path = str(tmp_path / "docs")
    docs.write.mode("overwrite").parquet(docs_path)

    kg = IncrementalKG(spark, str(tmp_path / "kg"), docs_path,
                       entailment=("rdfs",))
    kg.ingest()
    names = {r["name"] for r in kg.read_vertices().collect()}
    assert "X" in names

    # plain instance (no entailment) over the same log: X is NOT a vertex
    plain = IncrementalKG(spark, str(tmp_path / "kg2"), docs_path)
    plain.ingest()
    assert "X" not in {r["name"] for r in plain.read_vertices().collect()}
