"""Per-row span-sequence invariant (north rule / BASELINE.json input_hint):
extraction preserves span-sequence equality on (kind, text, media_ref,
order). The extraction outputs must let a verifier reconstruct, per
document, exactly the ordered span sequence that was consumed — no
reorders, no drops, no duplicates.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdf_dtdl_fabric_ontology_converter_spark.operators.extract import (
    extract_media, extract_triples, split_errors)
from rdf_dtdl_fabric_ontology_converter_spark.sources.documents import (
    span_sequence_key)

TTL_A = ('@prefix ex: <http://example.org/> .\n'
         'ex:A a <http://www.w3.org/2002/07/owl#Class> .')
TTL_B = ('@prefix ex: <http://example.org/> .\n'
         'ex:B a <http://www.w3.org/2002/07/owl#Class> .')
BAD = "@prefix ex: <http://x/> .\nex:a ex:b "  # parse error


@pytest.fixture(scope="module")
def interleaved(spark):
    """Docs interleaving text and media spans, incl. an erroring text span
    — every span kind and outcome appears, in a known order."""
    def span(kind, text, ref, off):
        return {"kind": kind, "text": text, "media_ref": ref, "offset": off}

    rows = [
        ("d1", [span("text", TTL_A, None, 0),
                span("media", None, "m://d1/1", 1),
                span("text", TTL_B, None, 2),
                span("media", None, "m://d1/3", 3)]),
        ("d2", [span("media", None, "m://d2/0", 0),
                span("text", BAD, None, 1),
                span("text", TTL_A, None, 2)]),
    ]
    schema = ("doc_id string, spans array<struct<kind:string,text:string,"
              "media_ref:string,offset:int>>")
    return spark.createDataFrame(rows, schema)


def test_extraction_outputs_reconstruct_the_span_sequence(interleaved):
    """Union the per-span evidence from ALL extraction outputs (clean
    triples, error rows via their uri fragment, media provenance) and
    demand it equals the input's ordered (kind, media_ref, span_idx)
    sequence exactly — order preserved, nothing dropped or duplicated.
    Both text triples/errors and media rows carry the span's ABSOLUTE
    array position (extract.py enumerates the spans array directly)."""
    raw = extract_triples(interleaved)
    clean, errors = split_errors(raw)

    # text spans seen by the parser, at their absolute array positions
    got_text = {(r.doc_id, r.span_idx)
                for r in raw.select("doc_id", "span_idx").dropDuplicates()
                .collect()}
    exp_text = set()
    for row in interleaved.collect():
        for i, s in enumerate(row.spans):
            if s.kind == "text":
                exp_text.add((row.doc_id, i))
    assert got_text == exp_text

    # media spans: absolute array position + ref must round-trip
    media = extract_media(interleaved)
    got_media = {(r.doc_id, r.span_idx, r.media_ref)
                 for r in media.collect()}
    exp_media = set()
    for row in interleaved.collect():
        for i, s in enumerate(row.spans):
            if s.kind == "media":
                exp_media.add((row.doc_id, i, s.media_ref))
    assert got_media == exp_media

    # the erroring span is reported at its exact text ordinal, not lost
    errs = {(r.name, r.uri) for r in errors.collect()}
    assert errs == {("d2", "doc://d2#1")}


def test_span_sequence_key_is_order_and_content_sensitive(interleaved, spark):
    keys = {r.doc_id: r.span_seq_key
            for r in span_sequence_key(interleaved).collect()}
    # stable under physical re-layout (repartition changes nothing logical)
    keys2 = {r.doc_id: r.span_seq_key
             for r in span_sequence_key(interleaved.repartition(7))
             .collect()}
    assert keys == keys2

    # swapping two spans changes the key (order sensitivity)
    swapped = interleaved.withColumn(
        "spans", F.when(F.col("doc_id") == "d1",
                        F.reverse("spans")).otherwise(F.col("spans")))
    keys3 = {r.doc_id: r.span_seq_key
             for r in span_sequence_key(swapped).collect()}
    assert keys3["d1"] != keys["d1"]
    assert keys3["d2"] == keys["d2"]
