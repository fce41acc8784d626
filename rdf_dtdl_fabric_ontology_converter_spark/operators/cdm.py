"""CDM front-end: documents → entities/relationships tables.

Spark mapping of the reference CDMToFabricConverter
(reference: src/formats/cdm/cdm_converter.py:133-359) with
flatten_inheritance=True default:

- inheritance flattening (J9): inherited attributes first, child overrides
  same-name (cdm_converter.py:246-280) — implemented as an iterative
  ancestor-depth closure + a min-depth-wins window per (entity, attr name)
- type mapping via the CDM primitive/semantic dictionaries + trait
  inference (J11; cdm_type_mapper.py:50-210,371-401) — applied in the
  extraction UDF (pure dictionary lookups, no join needed for the
  trait-conditional path)
- entity-typed attributes are dropped from properties
  (cdm_converter.py:297-300)
- relationship endpoint resolution by entity name with hash placeholders
  for unknown endpoints (J10; cdm_converter.py:316-359)
- entityIdParts from is_primary_key attrs, displayName from first
  is_display_name attr (cdm_converter.py:212-223)

IDs: the reference uses per-namespace counters (nondeterministic across
runs); this engine uses the deterministic sha256 scheme keyed
'cdm:<entity name>' (its own tests assert validity/uniqueness only —
tests/cdm/test_cdm_converter.py:344).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from .. import MAX_EXTENDS_DEPTH, NAMESPACE, NAMESPACE_TYPE, VISIBILITY
from ..functions.ids import fabric_id, property_id
from ..functions.names import sanitize_name

ATTR_TYPE = T.StructType([
    T.StructField("name", T.StringType()),
    T.StructField("value_type", T.StringType()),
    T.StructField("is_entity_ref", T.BooleanType()),
    T.StructField("is_pk", T.BooleanType()),
    T.StructField("is_display", T.BooleanType()),
    T.StructField("pos", T.IntegerType()),
])

ATTR_ARRAY = ("array<struct<name:string,value_type:string,"
              "is_entity_ref:boolean,is_pk:boolean,is_display:boolean,"
              "pos:int>>")

CDM_ENTITIES_SCHEMA = T.StructType([
    T.StructField("entity_name", T.StringType()),
    T.StructField("extends", T.StringType()),
    T.StructField("attributes", T.ArrayType(ATTR_TYPE)),
    T.StructField("dialect", T.StringType()),
    T.StructField("doc_id", T.StringType()),
    T.StructField("span_idx", T.IntegerType()),
    T.StructField("parse_error", T.StringType()),
])

CDM_RELS_SCHEMA = T.StructType([
    T.StructField("name", T.StringType()),
    T.StructField("from_entity", T.StringType()),
    T.StructField("from_attribute", T.StringType()),
    T.StructField("to_entity", T.StringType()),
    T.StructField("to_attribute", T.StringType()),
    T.StructField("doc_id", T.StringType()),
    T.StructField("span_idx", T.IntegerType()),
])


def extract_cdm(documents: DataFrame) -> tuple[DataFrame, DataFrame]:
    """documents → (cdm entity rows, cdm relationship rows)."""

    def run_entities(batches):
        import pyarrow as pa
        from ..functions.cdm import attr_flags, parse_cdm
        from ..functions.typemaps import cdm_map_type
        from .extract import sniff_format
        at = pa.struct([("name", pa.string()), ("value_type", pa.string()),
                        ("is_entity_ref", pa.bool_()), ("is_pk", pa.bool_()),
                        ("is_display", pa.bool_()), ("pos", pa.int32())])
        for batch in batches:
            doc_ids = batch.column("doc_id").to_pylist()
            spans_col = batch.column("spans").to_pylist()
            names, exts, attrs_c, dials, dids, idxs, errs = \
                [], [], [], [], [], [], []
            for doc_id, spans in zip(doc_ids, spans_col):
                if spans is None:
                    continue
                for idx, span in enumerate(spans):
                    if span["kind"] != "text" or not span["text"]:
                        continue
                    if sniff_format(span["text"]) != "cdm":
                        continue
                    try:
                        ents, _ = parse_cdm(span["text"])
                    except Exception as e:
                        names.append(None); exts.append(None)
                        attrs_c.append(None); dials.append(None)
                        dids.append(doc_id); idxs.append(idx)
                        errs.append(f"{type(e).__name__}: {e}")
                        continue
                    for ent in ents:
                        rows = []
                        for a in ent["attributes"]:
                            pk, dn = attr_flags(a)
                            rows.append({
                                "name": a["name"],
                                "value_type": cdm_map_type(a["data_type"],
                                                           a["traits"]),
                                "is_entity_ref": a["data_type"].lower() in
                                ("entity", "entityreference"),
                                "is_pk": pk, "is_display": dn,
                                "pos": a["pos"]})
                        names.append(ent["name"]); exts.append(ent["extends"])
                        attrs_c.append(rows); dials.append(ent["dialect"])
                        dids.append(doc_id); idxs.append(idx); errs.append(None)
            yield pa.RecordBatch.from_arrays(
                [pa.array(names, pa.string()), pa.array(exts, pa.string()),
                 pa.array(attrs_c, pa.list_(at)), pa.array(dials, pa.string()),
                 pa.array(dids, pa.string()), pa.array(idxs, pa.int32()),
                 pa.array(errs, pa.string())],
                names=[f.name for f in CDM_ENTITIES_SCHEMA.fields])

    def run_rels(batches):
        import pyarrow as pa
        from ..functions.cdm import parse_cdm
        from .extract import sniff_format
        for batch in batches:
            doc_ids = batch.column("doc_id").to_pylist()
            spans_col = batch.column("spans").to_pylist()
            cols = {k: [] for k in ("name", "from_entity", "from_attribute",
                                    "to_entity", "to_attribute", "doc_id",
                                    "span_idx")}
            for doc_id, spans in zip(doc_ids, spans_col):
                if spans is None:
                    continue
                for idx, span in enumerate(spans):
                    if span["kind"] != "text" or not span["text"]:
                        continue
                    if sniff_format(span["text"]) != "cdm":
                        continue
                    try:
                        _, rels = parse_cdm(span["text"])
                    except Exception:
                        continue
                    for r in rels:
                        cols["name"].append(r["name"])
                        cols["from_entity"].append(r["from_entity"])
                        cols["from_attribute"].append(r["from_attribute"])
                        cols["to_entity"].append(r["to_entity"])
                        cols["to_attribute"].append(r["to_attribute"])
                        cols["doc_id"].append(doc_id)
                        cols["span_idx"].append(idx)
            yield pa.RecordBatch.from_arrays(
                [pa.array(cols["name"], pa.string()),
                 pa.array(cols["from_entity"], pa.string()),
                 pa.array(cols["from_attribute"], pa.string()),
                 pa.array(cols["to_entity"], pa.string()),
                 pa.array(cols["to_attribute"], pa.string()),
                 pa.array(cols["doc_id"], pa.string()),
                 pa.array(cols["span_idx"], pa.int32())],
                names=[f.name for f in CDM_RELS_SCHEMA.fields])

    return (documents.mapInArrow(run_entities, CDM_ENTITIES_SCHEMA),
            documents.mapInArrow(run_rels, CDM_RELS_SCHEMA))


def _dedup_entities(ents: DataFrame) -> DataFrame:
    """One row per entity name. Manifest entries are *references* to entity
    definitions living in other documents (reference resolves entityPath
    across files — cdm_parser.py:634-748); here the cross-document join is
    by name, and the attribute-bearing definition wins over manifest stubs.
    """
    w = Window.partitionBy("entity_name").orderBy(
        F.desc(F.size(F.coalesce("attributes",
                                 F.array().cast(ATTR_ARRAY)))),
        "doc_id", "span_idx")
    return (ents.where(F.col("parse_error").isNull())
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1).drop("rn", "parse_error"))


def convert_cdm(cdm_entities: DataFrame, cdm_rels: DataFrame,
                flatten_inheritance: bool = True
                ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """→ (entity_types, relationship_types, skipped) in the shared schema."""
    ents = _dedup_entities(cdm_entities).localCheckpoint()
    ents = ents.withColumn(
        "fabric_id", fabric_id(F.concat(F.lit("cdm:"), "entity_name")))

    skipped = (cdm_entities.where(F.col("parse_error").isNotNull())
               .select(F.lit("entity").alias("item_type"),
                       F.col("doc_id").alias("name"),
                       F.col("parse_error").alias("reason"),
                       F.concat(F.lit("doc://"), "doc_id").alias("uri")))

    # J9: ancestor chain with depth (0 = self) for attribute flattening
    self_rows = ents.select("entity_name",
                            F.col("entity_name").alias("src"),
                            F.lit(0).alias("depth"))
    edges = (ents.where(F.col("extends").isNotNull())
             .select("entity_name", F.col("extends").alias("src"))
             .join(ents.select(F.col("entity_name").alias("src")),
                   "src", "left_semi"))
    chain = self_rows
    cur = edges.withColumn("depth", F.lit(1))
    for d in range(1, MAX_EXTENDS_DEPTH + 1):
        if cur.isEmpty():
            break
        chain = chain.unionByName(cur).dropDuplicates(
            ["entity_name", "src"]).localCheckpoint()
        cur = (cur.alias("a")
               .join(edges.alias("b"),
                     F.col("a.src") == F.col("b.entity_name"))
               .select(F.col("a.entity_name").alias("entity_name"),
                       F.col("b.src").alias("src"))
               .withColumn("depth", F.lit(d + 1))
               .join(chain, ["entity_name", "src"], "left_anti"))

    attrs = (ents.select("entity_name",
                         F.explode("attributes").alias("a"))
             .select("entity_name", "a.*"))
    if flatten_inheritance:
        # pull ancestor attributes onto each entity; child (min depth) wins
        lineage = chain.select("entity_name", "src", "depth")
        flat = (lineage
                .join(attrs.withColumnRenamed("entity_name", "src"), "src")
                .withColumn("rnk", F.row_number().over(
                    Window.partitionBy("entity_name", "name")
                    .orderBy("depth", "pos")))
                .where(F.col("rnk") == 1)
                .drop("rnk", "src"))
        base_col = F.lit(None).cast("string")
    else:
        flat = attrs.withColumn("depth", F.lit(0))
        parent_ids = ents.select(F.col("entity_name").alias("extends"),
                                 F.col("fabric_id").alias("base_id"))
        base_col = None  # joined below

    props = (flat.where(~F.col("is_entity_ref"))
             .join(ents.select("entity_name", "fabric_id"), "entity_name")
             .withColumn("prop_id", property_id(F.col("fabric_id"),
                                                F.col("name"))))

    prop_struct = F.struct(F.col("prop_id").alias("id"),
                           sanitize_name(F.col("name"), 90).alias("name"),
                           F.col("value_type").alias("valueType"))
    # reference order: most-distant ancestor attrs first, child's own last;
    # an override moves the attr to the child's position → sort by
    # (-depth, pos) after min-depth-wins
    per_ent = (props.groupBy("entity_name")
               .agg(F.array_sort(F.collect_list(
                   F.struct((-F.col("depth")).alias("negd"), F.col("pos"),
                            prop_struct.alias("p")))).alias("ps"),
                    F.array_sort(F.collect_list(F.when(
                        F.col("is_pk"),
                        F.struct(F.col("pos"), F.col("prop_id").alias("id")))))
                    .alias("pks"),
                    F.min(F.when(F.col("is_display"),
                                 F.struct(F.col("pos"),
                                          F.col("prop_id").alias("id"))))
                    .alias("dn"))
               .select("entity_name",
                       F.transform("ps", lambda x: x["p"]).alias("properties"),
                       F.transform("pks", lambda x: x["id"])
                       .alias("entity_id_parts"),
                       F.col("dn.id").alias("display_name_property_id")))

    empty_props = F.array().cast(
        "array<struct<id:string,name:string,valueType:string>>")
    out = (ents.join(per_ent, "entity_name", "left"))
    if flatten_inheritance:
        out = out.withColumn("base_entity_type_id", base_col)
    else:
        out = (out.join(F.broadcast(parent_ids), "extends", "left")
               .withColumnRenamed("base_id", "base_entity_type_id"))

    entity_types = out.select(
        F.col("fabric_id").alias("id"),
        sanitize_name(F.col("entity_name"), 90).alias("name"),
        F.lit(NAMESPACE).alias("namespace"),
        F.lit(NAMESPACE_TYPE).alias("namespace_type"),
        F.lit(VISIBILITY).alias("visibility"),
        "base_entity_type_id",
        F.coalesce("entity_id_parts", F.array().cast("array<string>"))
        .alias("entity_id_parts"),
        "display_name_property_id",
        F.coalesce("properties", empty_props).alias("properties"),
        empty_props.alias("timeseries_properties"),
        F.concat(F.lit("cdm:"), "entity_name").alias("class_uri"),
    )

    # J10: endpoint resolution by name; unknown endpoints get hash
    # placeholder ids (same scheme → still deterministic)
    rels = (cdm_rels.dropDuplicates(
        ["name", "from_entity", "to_entity", "from_attribute", "to_attribute"])
        .withColumn("source_entity_type_id",
                    fabric_id(F.concat(F.lit("cdm:"), "from_entity")))
        .withColumn("target_entity_type_id",
                    fabric_id(F.concat(F.lit("cdm:"), "to_entity")))
        .select(
            fabric_id(F.concat(F.lit("cdmrel:"), "name", F.lit("|"),
                               "from_entity", F.lit("->"), "to_entity"))
            .alias("id"),
            sanitize_name(F.col("name"), 90).alias("name"),
            F.lit(NAMESPACE).alias("namespace"),
            F.lit(NAMESPACE_TYPE).alias("namespace_type"),
            "source_entity_type_id", "target_entity_type_id",
            F.concat("from_entity", F.lit("->"), "to_entity").alias("rel_key"),
        ))
    return entity_types, rels, skipped
