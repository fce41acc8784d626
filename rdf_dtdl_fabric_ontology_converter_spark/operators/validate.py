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
