"""Pre-flight validation: 11 rule families → one issues DataFrame.

Spark mapping of the reference PreflightValidator
(reference: src/formats/rdf/preflight_validator.py:262-656): every rule is
a filter+project over the triples DataFrame, unioned into
issues(category, severity, message, uri). Severity rollup is a groupBy;
"seamless" iff zero errors+warnings (preflight_validator.py:652-656).

Also the Fabric limits validator (reference:
src/core/validators/fabric_limits.py:130-404): aggregate checks against the
hard caps with the reference's 90% warning tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import (MAX_ENTITY_TYPES, MAX_PROPERTIES_PER_ENTITY,
                MAX_RELATIONSHIP_TYPES, OWL_DATATYPE_PROPERTY, OWL_NS,
                OWL_OBJECT_PROPERTY, OWL_RESTRICTION, RDFS_DOMAIN, RDFS_RANGE,
                RDF_NS, RDF_PROPERTY, RDF_TYPE, XSD_NS)
from ..functions.names import local_name

SUPPORTED_XSD = [XSD_NS + t for t in (
    "string", "boolean", "dateTime", "date", "dateTimeStamp", "integer",
    "int", "long", "double", "float", "decimal", "anyURI", "time")]

_CHARACTERISTICS = ["FunctionalProperty", "InverseFunctionalProperty",
                    "SymmetricProperty", "AsymmetricProperty",
                    "TransitiveProperty", "ReflexiveProperty",
                    "IrreflexiveProperty"]


def _issue(df: DataFrame, category: str, severity: str, message,
           uri=None) -> DataFrame:
    return df.select(
        F.lit(category).alias("category"),
        F.lit(severity).alias("severity"),
        (message if not isinstance(message, str) else F.lit(message))
        .alias("message"),
        (uri if uri is not None else F.lit(None).cast("string")).alias("uri"))


def _subjects_of_type(triples: DataFrame, type_uri: str) -> DataFrame:
    return (triples.where((F.col("pred") == RDF_TYPE) &
                          (F.col("obj") == type_uri))
            .select("subj").dropDuplicates())


def preflight_issues(triples: DataFrame) -> DataFrame:
    """→ issues(category, severity, message, uri)."""
    t = triples
    name = local_name(F.col("subj"))

    imports = _issue(
        t.where(F.col("pred") == OWL_NS + "imports"),
        "external_import", "warning",
        F.concat(F.lit("External import detected: "), F.col("obj")),
        F.col("obj"))

    complex_exprs = [
        _issue(t.where(F.col("pred") == OWL_NS + kind)
               .select("subj").dropDuplicates(),
               "complex_class_expression", "warning",
               F.lit(f"owl:{kind} class expression"), F.col("subj"))
        for kind in ("intersectionOf", "complementOf", "oneOf")
    ]  # unionOf is supported → not flagged (preflight_validator.py:347)

    restrictions = _issue(
        _subjects_of_type(t, OWL_RESTRICTION),
        "property_restriction", "warning",
        F.lit("OWL restriction"), F.col("subj"))

    characteristics = [
        _issue(_subjects_of_type(t, OWL_NS + c)
               .where(~F.col("subj").startswith("_:")),
               "property_characteristic", "info",
               F.concat(F.lit(f"Property characteristic '{c}' on '"),
                        name, F.lit("'")), F.col("subj"))
        for c in _CHARACTERISTICS
    ]

    chains = [
        _issue(t.where(F.col("pred") == OWL_NS + "propertyChainAxiom"),
               "property_chain", "warning",
               F.lit("Property chain axiom"), F.col("subj")),
        _issue(t.where(F.col("pred") == OWL_NS + "equivalentProperty"),
               "property_chain", "info",
               F.lit("Equivalent property"), F.col("subj")),
        _issue(t.where(F.col("pred") == OWL_NS + "inverseOf"),
               "property_chain", "info",
               F.lit("Inverse property"), F.col("subj")),
    ]

    axioms = [
        _issue(t.where((F.col("pred") == OWL_NS + "equivalentClass") &
                       ~F.col("subj").startswith("_:")),
               "class_axiom", "info", F.lit("Equivalent class"),
               F.col("subj")),
        _issue(t.where((F.col("pred") == OWL_NS + "disjointWith") &
                       ~F.col("subj").startswith("_:")),
               "class_axiom", "info", F.lit("Disjoint classes"),
               F.col("subj")),
    ]

    # missing domain/range on declared properties
    props = (_subjects_of_type(t, OWL_DATATYPE_PROPERTY)
             .unionByName(_subjects_of_type(t, OWL_OBJECT_PROPERTY))
             .unionByName(_subjects_of_type(t, RDF_PROPERTY))
             .where(~F.col("subj").startswith("_:"))
             .dropDuplicates())
    doms = t.where(F.col("pred") == RDFS_DOMAIN).select("subj").dropDuplicates()
    rngs = t.where(F.col("pred") == RDFS_RANGE).select("subj").dropDuplicates()
    missing = [
        _issue(props.join(doms, "subj", "left_anti"),
               "missing_signature", "warning",
               F.concat(F.lit("Property '"), name,
                        F.lit("' missing domain")), F.col("subj")),
        _issue(props.join(rngs, "subj", "left_anti"),
               "missing_signature", "warning",
               F.concat(F.lit("Property '"), name,
                        F.lit("' missing range")), F.col("subj")),
    ]

    unsupported_dt = _issue(
        t.where((F.col("pred") == RDFS_RANGE) &
                F.col("obj").startswith(XSD_NS) &
                ~F.col("obj").isin(SUPPORTED_XSD))
        .join(_subjects_of_type(t, OWL_DATATYPE_PROPERTY), "subj",
              "left_semi")
        .select("subj", "obj").dropDuplicates(),
        "unsupported_datatype", "info",
        F.concat(F.lit("Unsupported XSD datatype: "), local_name(F.col("obj"))),
        F.col("subj"))

    individuals = [
        _issue(_subjects_of_type(t, OWL_NS + "NamedIndividual"),
               "individual", "info", F.lit("Named individual"),
               F.col("subj")),
        _issue(t.where(F.col("pred") == OWL_NS + "sameAs"),
               "individual", "info", F.lit("owl:sameAs statement"),
               F.col("subj")),
        _issue(t.where(F.col("pred") == OWL_NS + "differentFrom"),
               "individual", "info", F.lit("owl:differentFrom statement"),
               F.col("subj")),
    ]

    annotations = _issue(
        _subjects_of_type(t, OWL_NS + "AnnotationProperty"),
        "annotation", "info", F.lit("Custom annotation property"),
        F.col("subj"))

    reification = _issue(
        _subjects_of_type(t, RDF_NS + "Statement"),
        "reification", "warning", F.lit("Reified statement"),
        F.col("subj"))

    out = imports
    for df in (complex_exprs + [restrictions] + characteristics + chains +
               axioms + missing + [unsupported_dt] + individuals +
               [annotations, reification]):
        out = out.unionByName(df)
    return out


def severity_rollup(issues: DataFrame) -> DataFrame:
    return issues.groupBy("severity").agg(F.count("*").alias("n"))


def can_import_seamlessly(issues: DataFrame) -> bool:
    """Seamless iff zero errors and zero warnings."""
    bad = issues.where(F.col("severity").isin("error", "warning")).limit(1)
    return bad.isEmpty()


def fabric_limit_issues(entity_types: DataFrame,
                        relationship_types: DataFrame) -> DataFrame:
    """Hard-cap checks with the 90% warning tier
    (reference: fabric_limits.py:146-292)."""
    spark = entity_types.sparkSession

    def count_issue(n, cap, label):
        if n > cap:
            return [(f"limit:{label}", "error",
                     f"{label} count {n} exceeds limit {cap}", None)]
        if n > cap * 0.9:
            return [(f"limit:{label}", "warning",
                     f"{label} count {n} above 90% of limit {cap}", None)]
        return []

    rows = []
    rows += count_issue(entity_types.count(), MAX_ENTITY_TYPES,
                        "entity_types")
    rows += count_issue(relationship_types.count(), MAX_RELATIONSHIP_TYPES,
                        "relationship_types")
    schema = "category string, severity string, message string, uri string"
    over_props = (entity_types
                  .where(F.size("properties") +
                         F.size("timeseries_properties")
                         > MAX_PROPERTIES_PER_ENTITY)
                  .select(F.lit("limit:properties_per_entity")
                          .alias("category"),
                          F.lit("error").alias("severity"),
                          F.concat(F.lit("entity '"), F.col("name"),
                                   F.lit("' exceeds property limit"))
                          .alias("message"),
                          F.col("id").alias("uri")))
    return spark.createDataFrame(rows, schema).unionByName(over_props)


# ---------------------------------------------------------------------------
# DTDL validator (reference: src/formats/dtdl/dtdl_validator.py:140-240)
# ---------------------------------------------------------------------------

DTMI_REGEX = (r"^dtmi:[A-Za-z][A-Za-z0-9_]*(:[A-Za-z_][A-Za-z0-9_]*)*"
              r"(;[1-9][0-9]{0,8}(\.[1-9][0-9]{0,5})?)?$")
MAX_INTERFACE_DTMI_LENGTH = 128


def dtdl_issues(interfaces: DataFrame) -> DataFrame:
    """Interface rows (operators.dtdl.INTERFACES_SCHEMA) → issues DataFrame.

    Rule families from the reference DTDL validator: DTMI format + length,
    duplicate DTMIs, inheritance cycles (via bounded closure), orphan
    relationship targets, missing component schemas.
    """
    good = interfaces.where(F.col("parse_error").isNull())
    dtmis = good.select("dtmi").dropDuplicates()

    bad_dtmi = _issue(
        good.where(~F.col("dtmi").rlike(DTMI_REGEX))
        .select("dtmi").dropDuplicates(),
        "dtdl:dtmi_format", "error",
        F.concat(F.lit("Invalid DTMI: "), F.col("dtmi")), F.col("dtmi"))

    long_dtmi = _issue(
        good.where(F.length("dtmi") > MAX_INTERFACE_DTMI_LENGTH)
        .select("dtmi").dropDuplicates(),
        "dtdl:dtmi_length", "error",
        F.concat(F.lit("Interface DTMI exceeds 128 chars: "), F.col("dtmi")),
        F.col("dtmi"))

    dupes = _issue(
        good.groupBy("dtmi").agg(F.count("*").alias("n"))
        .where(F.col("n") > 1)
        .select("dtmi"),
        "dtdl:duplicate_dtmi", "error",
        F.concat(F.lit("Duplicate DTMI: "), F.col("dtmi")), F.col("dtmi"))

    # inheritance cycles: dtmi reaches itself through extends edges
    from .dtdl import ancestor_closure
    closure = ancestor_closure(good)
    cycles = _issue(
        closure.where(F.col("dtmi") == F.col("ancestor"))
        .select("dtmi").dropDuplicates()
        .withColumnRenamed("dtmi", "subj"),
        "dtdl:inheritance_cycle", "error",
        F.concat(F.lit("Inheritance cycle through: "), F.col("subj")),
        F.col("subj"))

    contents = (good.select("dtmi", F.explode("contents").alias("c"))
                .select("dtmi", "c.*"))
    rel_targets = (contents
                   .where((F.col("content_type") == "Relationship") &
                          F.col("target").isNotNull())
                   .select("dtmi", F.col("target").alias("ref"),
                           F.col("name")))
    orphans = _issue(
        rel_targets.join(dtmis.withColumnRenamed("dtmi", "ref"),
                         "ref", "left_anti")
        .withColumnRenamed("dtmi", "subj"),
        "dtdl:orphan_relationship_target", "warning",
        F.concat(F.lit("Relationship '"), F.col("name"),
                 F.lit("' targets undefined interface "), F.col("ref")),
        F.col("ref"))

    comp_refs = (contents
                 .where(F.col("content_type") == "Component")
                 .select("dtmi", F.col("schema_kind").alias("ref"),
                         F.col("name")))
    missing_comp = _issue(
        comp_refs.join(dtmis.withColumnRenamed("dtmi", "ref"),
                       "ref", "left_anti")
        .withColumnRenamed("dtmi", "subj"),
        "dtdl:missing_component_schema", "warning",
        F.concat(F.lit("Component '"), F.col("name"),
                 F.lit("' schema not defined in ontology: "), F.col("ref")),
        F.col("ref"))

    out = bad_dtmi
    for df in (long_dtmi, dupes, cycles, orphans, missing_comp):
        out = out.unionByName(df)
    return out


def definition_size_estimate(entity_types: DataFrame,
                             relationship_types: DataFrame) -> int:
    """A7: estimated serialized definition bytes vs the 1 MB Fabric cap
    (reference: fabric_limits.py:294-367) — sum of JSON payload lengths."""
    from ..sources.sinks import definition_parts_df
    parts = definition_parts_df(entity_types, relationship_types)
    row = parts.agg(F.sum(F.length("payload")).alias("bytes")).first()
    return int(row["bytes"] or 0)


# ---------------------------------------------------------------------------
# CDM validator (reference: src/formats/cdm/cdm_validator.py:180-400)
# ---------------------------------------------------------------------------

def cdm_issues(cdm_entities: DataFrame) -> DataFrame:
    """CDM entity rows (operators.cdm.CDM_ENTITIES_SCHEMA) → issues.

    Rule families: duplicate entity names, entities with no attributes,
    entities with no primary-key attribute, entity-reference typed
    attributes (converted to relationships, flagged info), parse errors.
    """
    good = cdm_entities.where(F.col("parse_error").isNull())

    parse_errs = _issue(
        cdm_entities.where(F.col("parse_error").isNotNull()),
        "cdm:parse", "error", F.col("parse_error"),
        F.concat(F.lit("doc://"), F.col("doc_id")))

    dupes = _issue(
        good.groupBy("entity_name").agg(F.count("*").alias("n"))
        .where(F.col("n") > 1).select("entity_name"),
        "cdm:duplicate_entity", "warning",
        F.concat(F.lit("Duplicate entity name: '"), F.col("entity_name"),
                 F.lit("'")), F.col("entity_name"))

    no_attrs = _issue(
        good.where(F.size(F.coalesce("attributes", F.array())) == 0)
        .select("entity_name").dropDuplicates(),
        "cdm:empty_entity", "warning",
        F.concat(F.lit("Entity '"), F.col("entity_name"),
                 F.lit("' has no attributes")), F.col("entity_name"))

    has_pk = F.exists("attributes", lambda a: a["is_pk"])
    no_pk = _issue(
        good.where(F.size(F.coalesce("attributes", F.array())) > 0)
        .where(~has_pk)
        .select("entity_name").dropDuplicates(),
        "cdm:no_primary_key", "info",
        F.concat(F.lit("Entity '"), F.col("entity_name"),
                 F.lit("' has no primary key attribute")),
        F.col("entity_name"))

    ent_refs = _issue(
        good.select("entity_name",
                    F.explode("attributes").alias("a"))
        .where(F.col("a.is_entity_ref"))
        .select("entity_name", F.col("a.name").alias("attr")),
        "cdm:entity_reference", "info",
        F.concat(F.lit("Attribute '"), F.col("attr"),
                 F.lit("' is an entity reference (modeled as relationship)")),
        F.col("entity_name"))

    out = parse_errs
    for df in (dupes, no_attrs, no_pk, ent_refs):
        out = out.unionByName(df)
    return out
