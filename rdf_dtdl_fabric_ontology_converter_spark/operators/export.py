"""Reverse exporter (S8) + ontology diff oracle (U3).

Spark mapping of the reference FabricToTTLConverter
(reference: src/formats/rdf/fabric_to_ttl.py:175-339): project the
vertex/edge tables back into triples (owl:Class / owl:DatatypeProperty /
owl:ObjectProperty with rdfs:label/domain/range) and render Turtle with
concat_ws — all JVM-side expressions, no UDFs.

compare_ontologies (fabric_to_ttl.py:387-523) becomes name-set algebra on
DataFrames (exceptAll/intersect) — the round-trip correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import (OWL_CLASS, OWL_DATATYPE_PROPERTY, OWL_OBJECT_PROPERTY,
                RDFS_DOMAIN, RDFS_LABEL, RDFS_RANGE, RDFS_SUBCLASS_OF,
                RDF_TYPE, XSD_NS)

# reverse type map (reference: fabric_to_ttl.py:24-34)
FABRIC_TO_XSD = {
    "String": XSD_NS + "string", "Boolean": XSD_NS + "boolean",
    "DateTime": XSD_NS + "dateTime", "BigInt": XSD_NS + "integer",
    "Double": XSD_NS + "double", "Int": XSD_NS + "integer",
    "Long": XSD_NS + "long", "Float": XSD_NS + "float",
    "Decimal": XSD_NS + "decimal",
}

DEFAULT_BASE = "http://example.org/ontology#"


def _triple(s, p, o, kind="iri"):
    return F.struct(s.alias("subj"), p.alias("pred"), o.alias("obj"),
                    F.lit(kind).alias("obj_kind"))


def export_triples(entity_types: DataFrame, relationship_types: DataFrame,
                   base: str = DEFAULT_BASE) -> DataFrame:
    """vertex/edge tables → triples(subj, pred, obj, obj_kind)."""
    uri = F.concat(F.lit(base), F.col("name"))
    parents = entity_types.select(F.col("id").alias("base_entity_type_id"),
                                  F.concat(F.lit(base), F.col("name"))
                                  .alias("parent_uri"))

    cls = entity_types.select(F.explode(F.array(
        _triple(uri, F.lit(RDF_TYPE), F.lit(OWL_CLASS)),
        _triple(uri, F.lit(RDFS_LABEL), F.col("name"), "literal"),
    )).alias("t")).select("t.*")

    sub = (entity_types.where(F.col("base_entity_type_id").isNotNull())
           .join(F.broadcast(parents), "base_entity_type_id")
           .select(_triple(uri, F.lit(RDFS_SUBCLASS_OF),
                           F.col("parent_uri")).alias("t"))
           .select("t.*"))

    xsd_map = F.create_map(*[F.lit(x) for kv in FABRIC_TO_XSD.items()
                             for x in kv])
    props = (entity_types
             .select(uri.alias("domain_uri"),
                     F.explode(F.concat("properties",
                                        "timeseries_properties")).alias("p"))
             .select("domain_uri",
                     F.concat(F.lit(base), F.col("p.name")).alias("prop_uri"),
                     F.col("p.name").alias("pname"),
                     F.coalesce(xsd_map[F.col("p.valueType")],
                                F.lit(XSD_NS + "string")).alias("xsd")))
    dp = props.select(F.explode(F.array(
        _triple(F.col("prop_uri"), F.lit(RDF_TYPE),
                F.lit(OWL_DATATYPE_PROPERTY)),
        _triple(F.col("prop_uri"), F.lit(RDFS_LABEL), F.col("pname"),
                "literal"),
        _triple(F.col("prop_uri"), F.lit(RDFS_DOMAIN), F.col("domain_uri")),
        _triple(F.col("prop_uri"), F.lit(RDFS_RANGE), F.col("xsd")),
    )).alias("t")).select("t.*")

    ent_uri = entity_types.select(F.col("id").alias("eid"),
                                  F.concat(F.lit(base), F.col("name"))
                                  .alias("euri"))
    rel_uri = F.concat(F.lit(base), F.col("name"))
    op = (relationship_types
          .join(F.broadcast(ent_uri.withColumnRenamed("eid", "source_entity_type_id")
                            .withColumnRenamed("euri", "src_uri")),
                "source_entity_type_id", "left")
          .join(F.broadcast(ent_uri.withColumnRenamed("eid", "target_entity_type_id")
                            .withColumnRenamed("euri", "dst_uri")),
                "target_entity_type_id", "left")
          .select(F.explode(F.array(
              _triple(rel_uri, F.lit(RDF_TYPE), F.lit(OWL_OBJECT_PROPERTY)),
              _triple(rel_uri, F.lit(RDFS_LABEL), F.col("name"), "literal"),
              _triple(rel_uri, F.lit(RDFS_DOMAIN), F.col("src_uri")),
              _triple(rel_uri, F.lit(RDFS_RANGE), F.col("dst_uri")),
          )).alias("t"))
          .select("t.*")
          .where(F.col("obj").isNotNull()))

    return cls.unionByName(sub).unionByName(dp).unionByName(op) \
        .dropDuplicates(["subj", "pred", "obj"])


def render_turtle(triples: DataFrame) -> str:
    """Render exported triples as Turtle text (driver-side; type tables are
    limit-bounded). Terms are emitted as absolute IRIs."""
    lines = (triples
             .select(F.concat(
                 F.lit("<"), "subj", F.lit("> <"), "pred", F.lit("> "),
                 F.when(F.col("obj_kind") == "literal",
                        F.concat(F.lit('"'),
                                 F.regexp_replace("obj", '"', '\\\\"'),
                                 F.lit('"')))
                 .otherwise(F.concat(F.lit("<"), F.col("obj"), F.lit(">"))),
                 F.lit(" .")).alias("line"))
             .orderBy("line")
             .collect())
    return "\n".join(r["line"] for r in lines) + "\n"


def compare_ontologies(triples_a: DataFrame, triples_b: DataFrame) -> dict:
    """U3 set-diff oracle over local names per type family
    (reference: fabric_to_ttl.py:387-523)."""
    def names_of(t: DataFrame, type_uri: str):
        return (t.where((F.col("pred") == RDF_TYPE) &
                        (F.col("obj") == type_uri))
                .select(F.regexp_extract("subj", "([^#/]+)$", 1)
                        .alias("name"))
                .dropDuplicates())

    out = {"identical": True}
    for key, type_uri in [("classes", OWL_CLASS),
                          ("datatype_properties", OWL_DATATYPE_PROPERTY),
                          ("object_properties", OWL_OBJECT_PROPERTY)]:
        a = names_of(triples_a, type_uri)
        b = names_of(triples_b, type_uri)
        only_a = [r["name"] for r in a.exceptAll(b).collect()]
        only_b = [r["name"] for r in b.exceptAll(a).collect()]
        out[key] = {"only_in_first": sorted(only_a),
                    "only_in_second": sorted(only_b),
                    "common": a.intersect(b).count()}
        if only_a or only_b:
            out["identical"] = False
    return out
