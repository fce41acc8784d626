"""Metrics / naming / skew-rollup operator tests (A2-A4, P9, salting)."""

import corpus
from pyspark.sql import functions as F

from rdf_dtdl_fabric_ontology_converter_spark.sources.documents import docs_from_payloads
from rdf_dtdl_fabric_ontology_converter_spark.plans.pipeline import run_pipeline
from rdf_dtdl_fabric_ontology_converter_spark.operators.extract import (
    extract_triples, split_errors)
from rdf_dtdl_fabric_ontology_converter_spark.operators.metrics import (
    ontology_name, predicate_stats, salted_count_by, skipped_rollup,
    success_rate, triple_counts)


def test_ontology_name_rule(spark):
    ttl = """
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix ex: <http://example.org/> .
ex:onto a owl:Ontology ; rdfs:label "My IoT Ontology (v2)" .
ex:Thing a owl:Class .
"""
    docs = docs_from_payloads(spark, {"x": ttl})
    clean, _ = split_errors(extract_triples(docs))
    # non-alnum → '_', 100 cap, O_ prefix only when not letter-initial
    assert ontology_name(clean) == "My_IoT_Ontology__v2_"
    docs2 = docs_from_payloads(spark, {"y": corpus.TTL["simple"]})
    clean2, _ = split_errors(extract_triples(docs2))
    assert ontology_name(clean2) == "ImportedOntology"  # no owl:Ontology


def test_counts_rollup_success_rate(spark):
    docs = docs_from_payloads(spark, {
        "ok": corpus.TTL["simple"],
        "skip": corpus.TTL["rel_missing_range"],
    })
    res = run_pipeline(spark, docs)
    tc = {r["doc_id"]: r["n_triples"]
          for r in triple_counts(res.triples_prov).collect()}
    assert tc["ok"] == 14
    roll = {r["item_type"]: r["n"]
            for r in skipped_rollup(res.skipped_items).collect()}
    assert roll.get("relationship") == 1
    rate = success_rate(res.entity_types, res.relationship_types,
                        res.skipped_items)
    # Person (shared URI across docs) + Organization + 1 rel ok, 1 skipped
    assert abs(rate - 3 / 4) < 1e-9


def test_salted_count_matches_plain(spark):
    df = spark.range(10_000).select(
        (F.col("id") % 7).cast("string").alias("k"))
    plain = {r["k"]: r["n"] for r in
             df.groupBy("k").agg(F.count("*").alias("n")).collect()}
    salted = {r["k"]: r["n"] for r in salted_count_by(df, "k", 8).collect()}
    assert plain == salted


def test_predicate_stats_hot_key(spark):
    docs = docs_from_payloads(spark, {"s": corpus.TTL["simple"]})
    clean, _ = split_errors(extract_triples(docs))
    stats = predicate_stats(clean).collect()
    assert stats[0]["pred"].endswith("#type")  # rdf:type dominates
    assert stats[0]["n"] == 5
