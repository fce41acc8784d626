"""spark-submit entry point for the corpus-curation funnel.

    spark-submit --py-files engine.zip run_job.py curate \
        --input  <documents table path (parquet)> \
        --eval   <benchmark/eval documents path (parquet)> \
        --output <output root> \
        [--checkpoint-root <path>]  per-stage snapshots + lineage + resume
        [--rates '{"en": 700, "de": 700}']  permille per stratum (JSON)
        [--default-rate 500]  [--budget 100000]  [--seed ""]
        [--min-tok 20]  [--rep-factor 8]  [--ngram 4]
        [--shuffle-partitions 200]

Runs quality filter → exact dedup → decontamination → deterministic
stratified sampling → token-budget shard packing (operators/curate.py),
writes ``assignments/`` (doc_id, lang, n_tok, shard_id) under the output
root, and prints the one-line JSON funnel (per-stage survivor counts).
With ``--checkpoint-root`` every stage is snapshot-committed and a rerun
resumes from the last committed stage; per-partition survivor counts land
in the ``_lineage`` table.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True)
    p.add_argument("--eval", dest="eval_path", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint-root", default=None)
    p.add_argument("--rates", default="{}",
                   help="JSON object: stratum -> permille")
    p.add_argument("--default-rate", type=int, default=1000)
    p.add_argument("--budget", type=int, default=100_000)
    p.add_argument("--seed", default="")
    p.add_argument("--min-tok", type=int, default=20)
    p.add_argument("--rep-factor", type=int, default=8)
    p.add_argument("--ngram", type=int, default=4)
    p.add_argument("--shuffle-partitions", type=int, default=200)
    args = p.parse_args(argv)

    from .session import build_session
    from .operators.curate import curate_corpus
    from .plans.checkpoint import run_curation_checkpointed

    from pyspark.sql import SparkSession
    existing = SparkSession.getActiveSession()
    spark = existing or build_session(
        app="curate_job", shuffle_partitions=args.shuffle_partitions)
    try:
        docs = spark.read.parquet(args.input)
        ev = spark.read.parquet(args.eval_path)
        rates = {k: int(v) for k, v in json.loads(args.rates).items()}
        params = dict(rates=rates, default_permille=args.default_rate,
                      budget=args.budget, min_tok=args.min_tok,
                      rep_factor=args.rep_factor, ngram=args.ngram,
                      seed=args.seed)
        if args.checkpoint_root:
            _cp, assignments = run_curation_checkpointed(
                spark, docs, ev, args.checkpoint_root, **params)
            assignments.write.mode("overwrite").parquet(
                args.output.rstrip("/") + "/assignments")
            # funnel from the committed snapshots' own counts — including
            # n_in, pinned at first-run time (a resume against a changed
            # --input must not mix counts from two corpora)
            counts = {s: _cp.snapshot_info(s)["rows"]
                      for s in ("A_quality", "B_exact_dedup",
                                "C_decontaminate", "D_sample", "E_pack")}
            funnel = {"n_in": _cp.snapshot_info("00_input")["rows"],
                      "n_quality": counts["A_quality"],
                      "n_unique": counts["B_exact_dedup"],
                      "n_clean": counts["C_decontaminate"],
                      "n_sampled": counts["D_sample"]}
        else:
            assignments, funnel_df = curate_corpus(docs, ev, **params)
            assignments.write.mode("overwrite").parquet(
                args.output.rstrip("/") + "/assignments")
            funnel = funnel_df.collect()[0].asDict()
        print(json.dumps({"funnel": funnel, "output": args.output}))
        return 0
    finally:
        if existing is None:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
