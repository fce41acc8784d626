"""Sinks: vertex/edge table writers + Fabric-definition JSON (S7).

Spark mapping of the reference FabricSerializer
(reference: src/formats/rdf/fabric_serializer.py:32-171): the ≤500-row type
tables (Fabric hard limit — src/constants.py:187-204) are collected to the
driver, topologically sorted (parents before children, Kahn), and emitted
as the {"parts": [...]} base64 structure. A distributed variant keeps the
parts as a DataFrame (base64(to_json(struct))) for corpora materialized to
Iceberg instead of the REST API.
"""

from __future__ import annotations

import base64
import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_table(df: DataFrame, path: str, fmt: str = "parquet",
                mode: str = "overwrite") -> None:
    """Vertex/edge/skipped table writer (Iceberg in production; parquet in
    this sandbox — no Iceberg runtime jar is bundled)."""
    if fmt == "iceberg":
        df.writeTo(path).createOrReplace()
    else:
        df.write.mode(mode).parquet(path)


def _b64(obj) -> str:
    return base64.b64encode(json.dumps(obj, indent=2).encode()).decode()


def _entity_dict(row) -> dict:
    d = {
        "id": row["id"],
        "namespace": row["namespace"],
        "name": row["name"],
        "namespaceType": row["namespace_type"],
        "visibility": row["visibility"],
        "baseEntityTypeId": row["base_entity_type_id"],
    }
    if row["entity_id_parts"]:
        d["entityIdParts"] = list(row["entity_id_parts"])
    if row["display_name_property_id"]:
        d["displayNamePropertyId"] = row["display_name_property_id"]
    props = [{"id": p["id"], "name": p["name"], "valueType": p["valueType"]}
             for p in (row["properties"] or [])]
    if props:
        d["properties"] = props
    ts = [{"id": p["id"], "name": p["name"], "valueType": p["valueType"]}
          for p in (row["timeseries_properties"] or [])]
    if ts:
        d["timeseriesProperties"] = ts
    return d


def _rel_dict(row) -> dict:
    return {
        "id": row["id"],
        "namespace": row["namespace"],
        "name": row["name"],
        "namespaceType": row["namespace_type"],
        "source": {"entityTypeId": row["source_entity_type_id"]},
        "target": {"entityTypeId": row["target_entity_type_id"]},
    }


def _topo_sort(entities: list[dict]) -> list[dict]:
    """Kahn's algorithm, parents before children; deterministic tiebreak by
    id (the reference inherits input-list order — nondeterministic there)."""
    by_id = {e["id"]: e for e in entities}
    in_deg = {e["id"]: 0 for e in entities}
    children: dict[str, list[str]] = {e["id"]: [] for e in entities}
    for e in entities:
        base = e.get("baseEntityTypeId")
        if base and base in by_id:
            in_deg[e["id"]] += 1
            children[base].append(e["id"])
    queue = sorted(i for i, d in in_deg.items() if d == 0)
    out, seen = [], set()
    while queue:
        cur = queue.pop(0)
        if cur in seen:
            continue
        seen.add(cur)
        out.append(by_id[cur])
        ready = []
        for ch in children[cur]:
            in_deg[ch] -= 1
            if in_deg[ch] == 0:
                ready.append(ch)
        queue.extend(sorted(ready))
    for e in sorted(entities, key=lambda x: x["id"]):  # cycles fallback
        if e["id"] not in seen:
            out.append(e)
    return out


def create_definition(entity_types: DataFrame, relationship_types: DataFrame,
                      ontology_name: str = "ImportedOntology") -> dict:
    """Collect the (small, limit-bounded) type tables → Fabric parts dict."""
    ents = [_entity_dict(r) for r in entity_types.collect()]
    rels = [_rel_dict(r) for r in relationship_types.collect()]
    parts = [
        {"path": ".platform",
         "payload": _b64({"metadata": {"type": "Ontology",
                                       "displayName": ontology_name}}),
         "payloadType": "InlineBase64"},
        {"path": "definition.json",
         "payload": base64.b64encode(b"{}").decode(),
         "payloadType": "InlineBase64"},
    ]
    for e in _topo_sort(ents):
        parts.append({"path": f"EntityTypes/{e['id']}/definition.json",
                      "payload": _b64(e), "payloadType": "InlineBase64"})
    for r in sorted(rels, key=lambda x: x["id"]):
        parts.append({"path": f"RelationshipTypes/{r['id']}/definition.json",
                      "payload": _b64(r), "payloadType": "InlineBase64"})
    return {"parts": parts}


def definition_parts_df(entity_types: DataFrame,
                        relationship_types: DataFrame) -> DataFrame:
    """Distributed variant: one part row per type, payload built JVM-side
    with base64(to_json(struct)) — for corpora written to tables rather
    than the (driver-sized) REST definition."""
    ent_payload = F.to_json(F.struct(
        F.col("id"), F.col("namespace"), F.col("name"),
        F.col("namespace_type").alias("namespaceType"),
        F.col("visibility"),
        F.col("base_entity_type_id").alias("baseEntityTypeId"),
        F.col("entity_id_parts").alias("entityIdParts"),
        F.col("display_name_property_id").alias("displayNamePropertyId"),
        F.col("properties"),
        F.col("timeseries_properties").alias("timeseriesProperties")))
    ents = entity_types.select(
        F.concat(F.lit("EntityTypes/"), "id", F.lit("/definition.json"))
        .alias("path"),
        F.base64(ent_payload.cast("binary")).alias("payload"),
        F.lit("InlineBase64").alias("payloadType"))
    rel_payload = F.to_json(F.struct(
        F.col("id"), F.col("namespace"), F.col("name"),
        F.col("namespace_type").alias("namespaceType"),
        F.struct(F.col("source_entity_type_id").alias("entityTypeId"))
        .alias("source"),
        F.struct(F.col("target_entity_type_id").alias("entityTypeId"))
        .alias("target")))
    rels = relationship_types.select(
        F.concat(F.lit("RelationshipTypes/"), "id",
                 F.lit("/definition.json")).alias("path"),
        F.base64(rel_payload.cast("binary")).alias("payload"),
        F.lit("InlineBase64").alias("payloadType"))
    return ents.unionByName(rels)


def write_bucketed(df: DataFrame, table: str, path: str, key: str,
                   buckets: int = 16, sort: bool = True) -> None:
    """Bucketed external table writer: co-locates rows by hash(key) so a
    later equi-join between two tables bucketed the SAME way on the SAME
    key needs NO shuffle (both sides report the bucket spec as their
    output partitioning). This is the pre-shuffle device for repeated
    joins at 100 TB — pay the partitioning once at write time.
    """
    w = df.write.mode("overwrite").option("path", path) \
        .bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.format("parquet").saveAsTable(table)
