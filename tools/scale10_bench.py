"""Dedup-family 10x scale-proof bench (round-3 item 7).

Builds an sf1-equivalent documents corpus (10x the sf0.1 table: each copy
gets a copy-specific LETTER ROTATION — a character bijection, so text
length, token counts, and the intra-copy duplicate structure are EXACTLY
preserved while cross-copy shingles never collide. Near-duplicate
structure, and therefore candidate-pair counts and shingle volume, scale
exactly 10x — the fair scaling corpus) and runs the dedup family at sf0.1
and at 10x, interleaved, medians of N reps.

Prints one JSON line:
  {"queries": {name: {"sf01_med": s, "sf1eq_med": s, "ratio": r,
               "exchanges_sf01": n, "exchanges_sf1eq": n}},
   "docs": {"sf01": n, "sf1eq": n}, "reps": N}

A ratio <= ~10 (docs grew 10x) with identical exchange counts is the
near-linear evidence; superlinear growth or extra exchanges at 10x would
flag a plan that does not survive scale-up.

Usage: python tools/scale10_bench.py [reps] [out_dir]
"""

from __future__ import annotations

import json
import re
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from rdf_dtdl_fabric_ontology_converter_spark.session import build_session  # noqa: E402

SF01 = "/root/testdata/sf0.1"
QUERIES = ["dedup_exact", "dedup_simhash", "dedup_minhash_lsh",
           "dedup_ngram_jaccard", "dedup_clusters", "dedup_pipeline"]


ROT_SRC = "etaoinshrd"  # 10 frequent letters; copy i rotates them by i


def build_corpus(out_dir: str) -> str:
    """10 letter-rotated copies of the sf0.1 documents table ->
    out_dir/documents.parquet (copy 0 is the original)."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    dst = out / "documents.parquet"
    if not dst.exists():
        con = duckdb.connect()
        cases = " ".join(
            f"WHEN t.i = {i} THEN translate(d.text, '{ROT_SRC}', "
            f"'{ROT_SRC[i:] + ROT_SRC[:i]}')"
            for i in range(1, 10))
        con.execute(f"""
        COPY (
          SELECT d.doc_id * 10 + t.i AS doc_id,
                 CASE WHEN t.i = 0 THEN d.text {cases} END AS text,
                 d.lang, d.source, d.n_chars
          FROM read_parquet('{SF01}/documents.parquet') d,
               (SELECT unnest(range(10)) AS i) t
        ) TO '{dst}' (FORMAT PARQUET)
        """)
        con.close()
    return str(out)


def n_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"Exchange (?:hash|range|Single)", plan))


CURATE_QUERIES = ["chunk_dedup", "decontaminate", "sample_stratified",
                  "pack_shards", "curate_corpus"]


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1eq"
    global QUERIES
    if len(sys.argv) > 3 and sys.argv[3] == "curate":
        QUERIES = CURATE_QUERIES
    sf1eq = build_corpus(out_dir)

    spark = build_session(app="scale10", master="local[32]",
                          shuffle_partitions=64,
                          extra={"spark.ui.enabled": "false",
                                 "spark.driver.memory": "16g"})
    qs = entrymod.queries()

    times: dict[str, dict[str, list[float]]] = {
        q: {"sf01": [], "sf1eq": []} for q in QUERIES}
    # warmup: one small run to absorb codegen/python-worker ramp
    qs["dedup_exact"](spark, SF01).write.format("noop") \
        .mode("overwrite").save()

    for rep in range(reps):
        for sf_name, sf_dir in (("sf01", SF01), ("sf1eq", sf1eq)):
            for q in QUERIES:
                t0 = time.time()
                qs[q](spark, sf_dir).write.format("noop") \
                    .mode("overwrite").save()
                times[q][sf_name].append(round(time.time() - t0, 2))
                print(f"rep{rep} {sf_name} {q}: {times[q][sf_name][-1]}s",
                      file=sys.stderr)

    result = {"queries": {}, "reps": reps}
    for q in QUERIES:
        m01 = statistics.median(times[q]["sf01"])
        m10 = statistics.median(times[q]["sf1eq"])
        result["queries"][q] = {
            "sf01_med": m01, "sf1eq_med": m10,
            "ratio": round(m10 / m01, 2) if m01 else None,
            "sf01_all": times[q]["sf01"], "sf1eq_all": times[q]["sf1eq"],
            "exchanges_sf01": n_exchanges(qs[q](spark, SF01)),
            "exchanges_sf1eq": n_exchanges(qs[q](spark, sf1eq)),
        }
    import pyspark.sql.functions as F  # noqa: F401
    result["docs"] = {
        "sf01": spark.read.parquet(f"{SF01}/documents.parquet").count(),
        "sf1eq": spark.read.parquet(f"{sf1eq}/documents.parquet").count(),
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
