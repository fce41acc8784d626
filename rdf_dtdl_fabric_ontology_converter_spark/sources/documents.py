"""Documents source: the engine's input table of interleaved text+media spans.

Input contract (BASELINE.json input_hint):

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

``kind='text'`` spans carry ontology-source fragments (Turtle / JSON-LD /
RDF-XML / DTDL / CDM JSON); ``kind='media'`` spans carry opaque refs that
pass through to provenance only.  Per-row invariant vs the reference:
extraction preserves span-sequence equality on (kind, text, media_ref,
order) — spans are never reordered or dropped.

Also provides a deterministic synthetic corpus generator modelled on the
reference's stress generator ``generate_large_ttl`` (reference:
tests/fixtures/ttl_fixtures.py:191-237) — the benchmark input per
BASELINE.md (seed-fixed, no external data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SPAN_TYPE = T.StructType([
    T.StructField("kind", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("media_ref", T.StringType()),
    T.StructField("offset", T.IntegerType()),
])

DOCUMENTS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("spans", T.ArrayType(SPAN_TYPE)),
])


def read_documents(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Read the documents table.

    ``fmt='iceberg'`` is the production target (catalog table name in
    ``path``); parquet is the local fallback in this sandbox (no Iceberg
    runtime jar is bundled). Catalyst prunes to (doc_id, spans) either way.
    """
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(path)
    return spark.read.parquet(path)


def make_documents(spark: SparkSession, rows: list[tuple[str, list[tuple]]]) -> DataFrame:
    """Build a documents DataFrame from (doc_id, [(kind, text, media_ref)]) rows."""
    data = []
    for doc_id, spans in rows:
        arr = [
            {"kind": k, "text": t, "media_ref": m, "offset": i}
            for i, (k, t, m) in enumerate(spans)
        ]
        data.append({"doc_id": doc_id, "spans": arr})
    return spark.createDataFrame(data, DOCUMENTS_SCHEMA)


def docs_from_payloads(spark: SparkSession, payloads: dict[str, str],
                       interleave_media: bool = True) -> DataFrame:
    """One document per named payload, media spans interleaved.

    Mirrors FIXTURES.md §1 synthesis: alternate text spans with media spans
    whose media_ref = 'media://<doc_id>/<offset>'.
    """
    rows = []
    for doc_id, text in sorted(payloads.items()):
        spans = [("media", None, f"media://{doc_id}/0"),
                 ("text", text, None),
                 ("media", None, f"media://{doc_id}/2")] if interleave_media \
            else [("text", text, None)]
        rows.append((doc_id, spans))
    return make_documents(spark, rows)


# ---------------------------------------------------------------------------
# Deterministic synthetic ontology corpus (benchmark input)
# ---------------------------------------------------------------------------

_SYNTH_HEADER = (
    "@prefix : <http://example.org/large/> .\n"
    "@prefix owl: <http://www.w3.org/2002/07/owl#> .\n"
    "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n"
    "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .\n"
)


def synth_ontology_ttl(doc_idx: int, classes_per_doc: int = 10,
                       props_per_class: int = 5, rels_per_class: int = 2) -> str:
    """One self-contained Turtle fragment per document.

    Same shape as the reference stress generator (classes, C·P string
    properties, C·R relationships to (i+k+1) mod C within the doc), but
    class names are doc-scoped so the corpus scales by row count.
    """
    parts = [_SYNTH_HEADER]
    base = doc_idx * classes_per_doc
    for i in range(classes_per_doc):
        cname = f"Class{base + i:08d}"
        parts.append(f":{cname} a owl:Class .")
        for j in range(props_per_class):
            parts.append(
                f":{cname}_prop{j} a owl:DatatypeProperty ;\n"
                f"    rdfs:domain :{cname} ;\n"
                f"    rdfs:range xsd:string ."
            )
        for k in range(rels_per_class):
            target = f"Class{base + (i + k + 1) % classes_per_doc:08d}"
            parts.append(
                f":{cname}_rel{k} a owl:ObjectProperty ;\n"
                f"    rdfs:domain :{cname} ;\n"
                f"    rdfs:range :{target} ."
            )
    return "\n".join(parts)


def synth_documents(spark: SparkSession, num_docs: int,
                    classes_per_doc: int = 10, props_per_class: int = 5,
                    rels_per_class: int = 2, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic corpus: num_docs rows of interleaved spans.

    Generated executor-side from spark.range (no driver materialization) so
    the same code scales to arbitrarily many documents.
    """
    cpd, ppc, rpc = classes_per_doc, props_per_class, rels_per_class

    def gen(batches):
        import pyarrow as pa
        span_t = pa.struct([("kind", pa.string()), ("text", pa.string()),
                            ("media_ref", pa.string()), ("offset", pa.int32())])
        for batch in batches:
            ids = batch.column("id").to_pylist()
            doc_ids, spans = [], []
            for i in ids:
                did = f"doc_{int(i):010d}"
                text = synth_ontology_ttl(int(i), cpd, ppc, rpc)
                doc_ids.append(did)
                spans.append([
                    {"kind": "media", "text": None,
                     "media_ref": f"media://{did}/0", "offset": 0},
                    {"kind": "text", "text": text, "media_ref": None,
                     "offset": 1},
                    {"kind": "media", "text": None,
                     "media_ref": f"media://{did}/2", "offset": 2},
                ])
            yield pa.RecordBatch.from_arrays(
                [pa.array(doc_ids, pa.string()),
                 pa.array(spans, pa.list_(span_t))],
                names=["doc_id", "spans"])

    # native range partitioning (r6): spark.range can emit the requested
    # partition count directly as contiguous id ranges — the previous
    # .repartition(partitions) paid a round-robin exchange plus the
    # sort-before-repartition pass (guide §2.5) just to spread 8-byte ids
    # that are already evenly spread. Row content is a pure function of id,
    # so downstream results are identical.
    rng = spark.range(0, num_docs, 1, partitions) if partitions \
        else spark.range(num_docs)
    return rng.mapInArrow(gen, DOCUMENTS_SCHEMA)


def span_sequence_key(df: DataFrame) -> DataFrame:
    """Per-row invariant column: hash of the ordered (kind,text,media_ref) seq.

    Used by tests to assert extraction never reorders/drops spans.
    """
    return df.withColumn(
        "span_seq_key",
        F.sha2(F.to_json(F.transform(
            "spans",
            lambda s: F.struct(s["kind"].alias("kind"),
                               s["text"].alias("text"),
                               s["media_ref"].alias("media_ref")),
        )), 256),
    )
