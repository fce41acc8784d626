"""spark-submit entry point for ad-hoc SPARQL over a documents corpus.

Launched through the repo-root ``run_job.py`` primary script, package
shipped via --py-files (same launch contract as the kg/curate jobs):

    spark-submit --py-files engine.zip run_job.py sparql \
        --input  <documents table path (parquet|iceberg)> \
        (--query '<SPARQL text>' | --query-file <path.rq>) \
        [--output <parquet dir>]     write the solution frame
        [--show N]                   print up to N rows as JSON lines
        [--entailment rdfs|owl|owl,rdfs]  query the inferred graph
        [--input-format parquet|iceberg] [--shuffle-partitions N]

Extraction runs once (documents → triples, clean rows only), optionally
augmented with the materialized entailment layers, then the query text
goes through functions/sparql.parse → operators/sparql.sparql_query.
SELECT/DESCRIBE write/print a frame; ASK prints ``{"ask": true|false}``.
Exit code 0 on success, 3 for an ASK that answered false (scriptable),
2 for bad usage — mirroring the reference CLI's nonzero-on-failure
convention (src/cli.py)."""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None, existing_spark=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True)
    p.add_argument("--input-format", default="parquet",
                   choices=["parquet", "iceberg"])
    q = p.add_mutually_exclusive_group(required=True)
    q.add_argument("--query", default=None, help="SPARQL text inline")
    q.add_argument("--query-file", default=None, help="path to a .rq file")
    p.add_argument("--output", default=None,
                   help="parquet dir for the solution frame")
    p.add_argument("--show", type=int, default=None, metavar="N",
                   help="print up to N solution rows as JSON lines")
    p.add_argument("--entailment", default="",
                   help="comma-set of layers to materialize first: "
                        "'rdfs', 'owl', or 'owl,rdfs'")
    p.add_argument("--shuffle-partitions", type=int, default=200)
    args = p.parse_args(argv)
    if args.output is None and args.show is None:
        p.error("need --output and/or --show (a query with no sink "
                "does no work)")
    text = args.query if args.query is not None else \
        open(args.query_file, encoding="utf-8").read()

    from .operators.extract import extract_triples, split_errors
    from .operators.sparql import sparql_query
    from .session import build_session
    from .sources.documents import read_documents

    spark = existing_spark or build_session(
        app="sparql-job", shuffle_partitions=args.shuffle_partitions)
    docs = read_documents(spark, args.input, args.input_format)
    clean, _ = split_errors(extract_triples(docs))
    layers = tuple(s for s in args.entailment.split(",") if s)
    if layers:
        from .operators.entailment import augment_with_entailment
        clean = augment_with_entailment(clean, layers=layers)
    # one extraction pass feeds every pattern branch of the query
    clean = clean.localCheckpoint(eager=False)
    result = sparql_query(clean, text)
    if isinstance(result, bool):
        print(json.dumps({"ask": result}))
        return 0 if result else 3
    if args.output:
        result.write.mode("overwrite").parquet(args.output)
    if args.show is not None:
        for row in result.limit(args.show).collect():
            print(json.dumps(row.asDict(), default=str))
    print(json.dumps({"columns": result.columns}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
