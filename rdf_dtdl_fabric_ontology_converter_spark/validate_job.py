"""spark-submit entry point for batch SHACL validation of a corpus.

    spark-submit --py-files engine.zip run_job.py validate \
        --input <documents table path (parquet|iceberg)> \
        --shapes <shapes.json> [--output <parquet dir>] \
        [--subclass-closure] [--entailment rdfs|owl|owl,rdfs] \
        [--fail-on-violation] [--input-format ...] [--shuffle-partitions N]

``shapes.json`` is a JSON array of shape dicts in the
``operators/shacl.validate_shapes`` format (the declarative twin of the
reference's validator configs). Prints a one-line JSON summary
``{"violations": N, "conforms": bool, "by_constraint": {...}}``;
``--fail-on-violation`` exits 4 when the report is non-empty — the CI
gate form, mirroring the reference CLI's nonzero-on-failure convention
(src/cli.py)."""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None, existing_spark=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True)
    p.add_argument("--input-format", default="parquet",
                   choices=["parquet", "iceberg"])
    p.add_argument("--shapes", required=True,
                   help="JSON file: array of shape dicts")
    p.add_argument("--output", default=None,
                   help="parquet dir for the violation report")
    p.add_argument("--subclass-closure", action="store_true",
                   help="widen sh:class via rdfs:subClassOf closure")
    p.add_argument("--entailment", default="",
                   help="materialize reasoning layers before validating")
    p.add_argument("--fail-on-violation", action="store_true",
                   help="exit 4 if any violation exists (CI gate)")
    p.add_argument("--shuffle-partitions", type=int, default=200)
    args = p.parse_args(argv)
    shapes = json.load(open(args.shapes, encoding="utf-8"))
    if not isinstance(shapes, list):
        print("validate: shapes file must be a JSON array", file=sys.stderr)
        return 2

    from .operators.extract import extract_triples, split_errors
    from .operators.shacl import validate_shapes
    from .session import build_session
    from .sources.documents import read_documents

    spark = existing_spark or build_session(
        app="shacl-validate", shuffle_partitions=args.shuffle_partitions)
    docs = read_documents(spark, args.input, args.input_format)
    clean, _ = split_errors(extract_triples(docs))
    layers = tuple(s for s in args.entailment.split(",") if s)
    if layers:
        from .operators.entailment import augment_with_entailment
        clean = augment_with_entailment(clean, layers=layers)
    # every shape's constraint frames share the one extraction pass
    clean = clean.localCheckpoint(eager=False)
    report = validate_shapes(clean, shapes,
                             subclass_closure=args.subclass_closure)
    if args.output:
        report.write.mode("overwrite").parquet(args.output)
        report = spark.read.parquet(args.output)  # count what was written
    from pyspark.sql import functions as F
    by_c = {r["constraint"]: r["n"] for r in
            report.groupBy("constraint").agg(F.count("*").alias("n"))
            .collect()}
    total = sum(by_c.values())
    print(json.dumps({"violations": total, "conforms": total == 0,
                      "by_constraint": by_c}))
    return 4 if (args.fail_on_violation and total) else 0


if __name__ == "__main__":
    sys.exit(main())
