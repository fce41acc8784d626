"""spark-submit entry point (SURVEY §3.1 lifecycle equivalent).

    spark-submit --py-files engine.zip -m rdf_dtdl_fabric_ontology_converter_spark.job \
        --input  <documents table path (parquet|iceberg)> \
        --output <output root> \
        [--checkpoint-root <path>]   stage snapshots + lineage + exact resume
        [--dtdl-component skip|flatten|separate]
        [--dtdl-command skip|property]
        [--scaled-decimal json_string|structured|calculated]
        [--definition-json <path>]   driver-side Fabric definition file

Writes entity_types/, relationship_types/, skipped_items/, issues/ under
the output root and prints a one-line JSON metrics summary.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True)
    p.add_argument("--input-format", default="parquet",
                   choices=["parquet", "iceberg"])
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint-root", default=None)
    p.add_argument("--dtdl-component", default="skip",
                   choices=["skip", "flatten", "separate"])
    p.add_argument("--dtdl-command", default="skip",
                   choices=["skip", "property", "entity"])
    p.add_argument("--scaled-decimal", default="json_string",
                   choices=["json_string", "structured", "calculated"])
    p.add_argument("--definition-json", default=None)
    p.add_argument("--dtmi-mapping", action="store_true",
                   help="also write the dtmi→fabric-id mapping table")
    p.add_argument("--ontology-name", default=None,
                   help="definition display name (default: first "
                        "owl:Ontology label in the corpus)")
    p.add_argument("--shuffle-partitions", type=int, default=200)
    args = p.parse_args(argv)

    from .operators.dtdl import DtdlModes
    from .operators.metrics import ontology_name, skipped_rollup, success_rate
    from .operators.validate import definition_schema_issues, preflight_issues
    from .plans.unified import run_unified
    from .session import build_session
    from .sources.documents import read_documents
    from .sources.sinks import (create_definition, definition_parts_df,
                                write_table)

    from pyspark.sql import SparkSession
    existing = SparkSession.getActiveSession()
    spark = existing or build_session(
        app="kg-construct", shuffle_partitions=args.shuffle_partitions)
    t0 = time.time()
    docs = read_documents(spark, args.input, args.input_format)

    modes = DtdlModes(component=args.dtdl_component,
                      command=args.dtdl_command,
                      scaled_decimal=args.scaled_decimal)

    uni = run_unified(spark, docs, modes)
    triples = uni.rdf.triples
    if args.checkpoint_root:
        from .plans.checkpoint import CheckpointManager
        cp = CheckpointManager(spark, args.checkpoint_root)
        ents = cp.stage("unified_entities", lambda: uni.entity_types)
        rels = cp.stage("unified_relationships",
                        lambda: uni.relationship_types)
        skipped = cp.stage("unified_skipped", lambda: uni.skipped_items)
        issues = cp.stage("issues", lambda: preflight_issues(triples))
    else:
        ents, rels, skipped = (uni.entity_types, uni.relationship_types,
                               uni.skipped_items)
        issues = preflight_issues(triples)

    write_table(ents, f"{args.output}/entity_types")
    write_table(rels, f"{args.output}/relationship_types")
    write_table(skipped, f"{args.output}/skipped_items")
    # structural re-validation of the engine's own serialized output
    # (reference: src/core/validators/fabric_schema.py) — catches sink
    # regressions before any upload
    schema_issues = definition_schema_issues(definition_parts_df(ents, rels))
    all_issues = issues.unionByName(schema_issues)
    write_table(all_issues, f"{args.output}/issues")
    from .operators.metrics import compliance_report
    write_table(compliance_report(all_issues), f"{args.output}/compliance")
    if args.dtmi_mapping:
        from .operators.dtdl import dtmi_mapping
        write_table(dtmi_mapping(ents), f"{args.output}/dtmi_mapping")

    if args.definition_json:
        # explicit name wins, like the reference CLI's --ontology-name
        # (reference: src/app/cli/commands/unified/convert.py:263)
        name = args.ontology_name or ontology_name(triples)
        definition = create_definition(ents, rels, name)
        with open(args.definition_json, "w") as f:
            json.dump(definition, f, indent=2)

    summary = {
        "entity_types": ents.count(),
        "relationship_types": rels.count(),
        "skipped": skipped.count(),
        "skipped_by_type": {r["item_type"]: r["n"]
                            for r in skipped_rollup(skipped).collect()},
        "success_rate": round(success_rate(ents, rels, skipped), 4),
        "wall_sec": round(time.time() - t0, 2),
    }
    print(json.dumps(summary))
    if existing is None:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
