"""Conversion metrics + ontology naming (A2-A4, P9) and skew-safe rollups.

- ontology_name: first owl:Ontology subject's rdfs:label, sanitized with
  the 100-char 'O_' rule (reference: src/formats/rdf/rdf_converter.py:715-728)
- skipped-by-type rollup / success rate (reference:
  src/shared/models/conversion.py:87-122)
- salted_count_by: the north rule's hot-predicate-skew defense made
  explicit — two-phase aggregation with a salt column so one dominant key
  (rdf:type is typically >30% of a triple corpus) cannot pin a single
  reducer. With AQE skew handling this matters for the *partial* phase:
  the salt spreads map-side combine state and the final merge is tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import OWL_ONTOLOGY, RDFS_LABEL, RDF_TYPE


def ontology_name(triples: DataFrame, default: str = "ImportedOntology") -> str:
    """First owl:Ontology subject's label → Fabric-safe name (driver-side;
    there is at most a handful of ontology headers per corpus)."""
    onts = (triples
            .where((F.col("pred") == RDF_TYPE) &
                   (F.col("obj") == OWL_ONTOLOGY))
            .select("subj").orderBy("subj").limit(1))
    row = (onts.join(triples.where(F.col("pred") == RDFS_LABEL), "subj")
           .select(F.min("obj").alias("label")).first())
    if row is None or row["label"] is None:
        return default
    name = "".join(c if c.isalnum() or c == "_" else "_"
                   for c in row["label"])[:100]
    if name and not name[0].isalpha():
        name = "O_" + name
    return name or default


def skipped_rollup(skipped: DataFrame) -> DataFrame:
    """A3: skipped-by-type counts."""
    return skipped.groupBy("item_type").agg(F.count("*").alias("n"))


def success_rate(entity_types: DataFrame, relationship_types: DataFrame,
                 skipped: DataFrame) -> float:
    """A4: (entities + rels) / (entities + rels + skipped)."""
    ok = entity_types.count() + relationship_types.count()
    bad = skipped.count()
    return ok / (ok + bad) if (ok + bad) else 1.0


def triple_counts(triples_prov: DataFrame) -> DataFrame:
    """A2: per-document triple counts."""
    return triples_prov.groupBy("doc_id").agg(F.count("*").alias("n_triples"))


def salted_count_by(df: DataFrame, key: str, n_salt: int = 16) -> DataFrame:
    """Two-phase count-by-key with salting (hot-key skew defense):

        phase 1: groupBy(key, salt) — partials spread over n_salt reducers
        phase 2: groupBy(key)       — merges n_salt tiny partials

    Equivalent to ``df.groupBy(key).count()`` but a key holding most of the
    rows (rdf:type) costs at most 1/n_salt of a reducer per phase-1 task.
    """
    salted = df.withColumn("_salt", F.pmod(F.hash(F.monotonically_increasing_id()),
                                           F.lit(n_salt)))
    partial = salted.groupBy(key, "_salt").agg(F.count("*").alias("_c"))
    return partial.groupBy(key).agg(F.sum("_c").alias("n"))


def predicate_stats(triples: DataFrame, n_salt: int = 16) -> DataFrame:
    """Hot-predicate distribution (salted): the observability view for
    choosing skew strategies at corpus scale."""
    return salted_count_by(triples, "pred", n_salt).orderBy(F.desc("n"))


def compliance_report(issues: DataFrame) -> DataFrame:
    """Severity/category rollup of validation issues with an example row —
    the distributed twin of the reference's compliance report generator
    (reference: src/core/compliance/report_generator.py:259-360, which
    renders per-construct issue lists + statistics driver-side)."""
    return (issues
            .groupBy("severity", "category")
            .agg(F.count("*").alias("n"),
                 F.min("message").alias("example_message"))
            .orderBy("severity", F.desc("n"), "category"))
