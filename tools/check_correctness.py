"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its oracle_sql()
twin on DuckDB over the same sf dir, then compares row count, column names,
and an order-insensitive value multiset (values stringified, floats rounded).

Usage: python tools/check_correctness.py [--json OUT.json] [--tail]
           [sf_dir] [query ...]

``--tail`` selects only the queries past the driver's 50-entry window
(the ones the per-round driver harness does not verify — round-4 ADVICE);
``--json`` records per-query results in a driver-shaped artifact so each
round can commit e.g. CORRECTNESS_TAIL_r05.json alongside the driver's
file.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from rdf_dtdl_fabric_ontology_converter_spark.session import build_session  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    """Stringify a cell the way a rendering-strict harness would.

    Crucially int-vs-float is NOT blurred: a DuckDB HUGEINT sum that
    surfaces as float64 through the pandas fetch path renders "3.0" while
    Spark's bigint renders "3" — so a type divergence that would fail the
    driver's value-hash also fails here.  Non-integral floats are rounded
    to 4 decimals to tolerate engine float jitter only.
    """
    import datetime
    import decimal
    if v is None:
        return ""
    if isinstance(v, float):
        if v != v:  # NaN (pandas NULL in a float column)
            return ""
        if v == int(v) and abs(v) < 1e15:
            return f"{v:.1f}"
        return f"{v:.4f}"
    if isinstance(v, decimal.Decimal):
        f = float(v)
        if f == int(f) and abs(f) < 1e15:
            return f"{f:.1f}"
        return f"{f:.4f}"
    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat()
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main():
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    tail_only = "--tail" in argv
    if tail_only:
        argv.remove("--tail")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    spark = build_session(master="local[8]", shuffle_partitions=8,
                          extra={"spark.ui.enabled": "false"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if tail_only:
        only |= set(list(qs)[50:])
    failures = []
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failures.append(name)
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": None,
                             "oracle_rows": None,
                             "err": f"spark {type(e).__name__}: {e}"}
            continue
        spark_t = time.time() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows-only check, {len(srows)} rows "
                  f"({spark_t:.1f}s)")
            if len(srows) == 0:
                failures.append(name)
            results[name] = {"rows_match": len(srows) > 0,
                             "schema_match": None, "hash_match": None,
                             "spark_rows": len(srows), "oracle_rows": None,
                             "err": None}
            continue
        try:
            # fetch via pandas (like the driver) so HUGEINT/decimal sums
            # surface as float64 instead of being silently coerced to int
            pdf = con.execute(oracles[name]).df()
            dcols = [str(c) for c in pdf.columns]
            drows = list(pdf.itertuples(index=False, name=None))
        except Exception as e:
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            failures.append(name)
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": len(srows),
                             "oracle_rows": None,
                             "err": f"duckdb {type(e).__name__}: {e}"}
            continue
        ok_cols = sorted(scols) == sorted(dcols)
        s_n, d_n = norm_rows(scols, srows), norm_rows(dcols, drows)
        ok_vals = s_n == d_n
        status = "PASS" if (ok_cols and ok_vals) else "FAIL"
        print(f"{status} {name}: spark={len(srows)} duck={len(drows)} "
              f"cols={'ok' if ok_cols else f'{sorted(scols)} vs {sorted(dcols)}'} "
              f"({spark_t:.1f}s)")
        results[name] = {"rows_match": len(srows) == len(drows),
                         "schema_match": ok_cols, "hash_match": ok_vals,
                         "spark_rows": len(srows),
                         "oracle_rows": len(drows), "err": None}
        if status == "FAIL":
            failures.append(name)
            if ok_cols and not ok_vals:
                sonly = [r for r in s_n if r not in set(map(tuple, d_n))][:3]
                donly = [r for r in d_n if r not in set(map(tuple, s_n))][:3]
                print(f"   spark-only: {sonly}")
                print(f"   duck-only:  {donly}")
    print("----")
    print("FAILURES:", failures if failures else "none")
    if json_out:
        import json
        Path(json_out).write_text(json.dumps(results, indent=1))
        print(f"wrote {json_out}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
