"""Unified multi-format corpus + DTDL validator + CDM manifest-ref dedup."""

import json

import corpus
from pyspark.sql import functions as F

from rdf_dtdl_fabric_ontology_converter_spark.sources.documents import docs_from_payloads
from rdf_dtdl_fabric_ontology_converter_spark.plans.unified import run_unified


def test_unified_mixed_corpus(spark):
    payloads = {
        "rdf_doc": corpus.TTL["simple"],
        "dtdl_doc": corpus.DTDL["thermostat"],
        "cdm_doc": json.dumps({
            "jsonSchemaSemanticVersion": "1.0.0",
            "definitions": [{
                "entityName": "Invoice",
                "hasAttributes": [
                    {"name": "invoiceId", "dataType": "guid",
                     "appliedTraits": ["means.identity.entityId"]},
                    {"name": "amount", "dataType": "money"}]}]}),
    }
    docs = docs_from_payloads(spark, payloads)
    res = run_unified(spark, docs)
    names = {r["name"] for r in res.entity_types.collect()}
    assert {"Person", "Organization", "Thermostat", "Invoice"} <= names
    rels = {r["name"] for r in res.relationship_types.collect()}
    assert "worksFor" in rels
    # ids all valid 13-digit strings, no collisions
    ids = [r["id"] for r in res.entity_types.collect()]
    assert len(ids) == len(set(ids))
    assert all(len(i) == 13 and i.isdigit() for i in ids)


def test_cdm_manifest_ref_prefers_definition(spark):
    """A manifest stub for an entity defined elsewhere must not shadow the
    attribute-bearing definition (cross-document entityPath resolution)."""
    from rdf_dtdl_fabric_ontology_converter_spark.operators.cdm import (
        convert_cdm, extract_cdm)
    manifest = json.dumps({
        "manifestName": "M", "jsonSchemaSemanticVersion": "1.0.0",
        "entities": [{"type": "LocalEntity", "entityName": "Person",
                      "entityPath": "Person.cdm.json/Person"}]})
    schema = json.dumps({
        "jsonSchemaSemanticVersion": "1.0.0",
        "definitions": [{"entityName": "Person",
                         "hasAttributes": [{"name": "personId",
                                            "dataType": "string"}]}]})
    # doc_id 'a_manifest' sorts before 'b_schema' — definition must still win
    docs = docs_from_payloads(spark, {"a_manifest": manifest,
                                      "b_schema": schema})
    ents, _, _ = convert_cdm(*extract_cdm(docs))
    person = ents.collect()[0].asDict(recursive=True)
    assert [p["name"] for p in person["properties"]] == ["personId"]


def test_dtdl_validator_rules(spark):
    from rdf_dtdl_fabric_ontology_converter_spark.operators.dtdl import (
        extract_interfaces)
    from rdf_dtdl_fabric_ontology_converter_spark.operators.validate import (
        dtdl_issues)
    payloads = {
        "bad_dtmi": json.dumps({
            "@context": "dtmi:dtdl:context;3", "@id": "dtmi:1bad;1",
            "@type": "Interface", "contents": []}),
        "cycle_a": json.dumps({
            "@context": "dtmi:dtdl:context;3", "@id": "dtmi:com:x:A;1",
            "@type": "Interface", "extends": "dtmi:com:x:B;1"}),
        "cycle_b": json.dumps({
            "@context": "dtmi:dtdl:context;3", "@id": "dtmi:com:x:B;1",
            "@type": "Interface", "extends": "dtmi:com:x:A;1"}),
        "orphan_rel": json.dumps({
            "@context": "dtmi:dtdl:context;3", "@id": "dtmi:com:x:R;1",
            "@type": "Interface",
            "contents": [{"@type": "Relationship", "name": "links",
                          "target": "dtmi:com:x:Nowhere;1"}]}),
        "missing_comp": json.dumps({
            "@context": "dtmi:dtdl:context;3", "@id": "dtmi:com:x:M;1",
            "@type": "Interface",
            "contents": [{"@type": "Component", "name": "c",
                          "schema": "dtmi:com:x:External;1"}]}),
    }
    docs = docs_from_payloads(spark, payloads)
    issues = dtdl_issues(extract_interfaces(docs))
    cats = {(r["category"], r["severity"]) for r in issues.collect()}
    assert ("dtdl:dtmi_format", "error") in cats
    assert ("dtdl:inheritance_cycle", "error") in cats
    assert ("dtdl:orphan_relationship_target", "warning") in cats
    assert ("dtdl:missing_component_schema", "warning") in cats


def test_definition_size_estimate(spark):
    from rdf_dtdl_fabric_ontology_converter_spark.operators.validate import (
        definition_size_estimate)
    from rdf_dtdl_fabric_ontology_converter_spark.plans.pipeline import run_pipeline
    docs = docs_from_payloads(spark, {"s": corpus.TTL["simple"]})
    res = run_pipeline(spark, docs)
    n = definition_size_estimate(res.entity_types, res.relationship_types)
    assert 100 < n < 1_000_000
