"""Real `spark-submit --py-files` launch (north rule: the pipeline is
"launched by spark-submit --py-files on a multi-executor cluster").

Everything else in the suite drives the job mains in-process; this test
launches the actual binary with the package shipped ONLY as a zip —
the subprocess cwd is a temp dir and PYTHONPATH is scrubbed, so both the
driver import of the package and the executor-side imports inside the
Arrow extraction UDF must resolve from the --py-files archive, exactly
as they would on a cluster. This is what caught the old documented
``spark-submit -m package.job`` invocation being impossible (spark-submit
has no module mode).
"""

import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

import corpus  # noqa: E402


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit binary not available")
def test_spark_submit_pyfiles_end_to_end(spark, tmp_path):
    # input docs written with the in-process session (input prep only)
    from rdf_dtdl_fabric_ontology_converter_spark.sources.documents import (
        docs_from_payloads)
    docs = docs_from_payloads(spark, {
        "r": corpus.TTL["simple"],
        "d": corpus.DTDL["thermostat"],
    })
    in_path = str(tmp_path / "docs")
    docs.write.parquet(in_path)

    sys.path.insert(0, str(REPO / "tools"))
    try:
        from make_pyfiles_zip import build
    finally:
        sys.path.pop(0)
    zip_path = build(str(tmp_path / "engine.zip"))

    out = str(tmp_path / "out")
    deff = str(tmp_path / "definition.json")
    workdir = tmp_path / "launch_cwd"
    workdir.mkdir()
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         # size the driver like any real submit would: local-mode runs the
         # whole pipeline (driver + 4 executor threads) in one JVM, and at
         # spark-submit's 1g default the kg job's execution-memory pool
         # starves (TaskMemoryManager page-allocation thrash -> heartbeat
         # timeout -> abort) regardless of commit — reproduced identically
         # on builds months apart. 4g matches the in-process test fixture.
         "--driver-memory", "4g",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         str(REPO / "run_job.py"), "kg",
         "--input", in_path, "--output", out,
         "--definition-json", deff,
         "--ontology-name", "SubmitOnto",
         "--shuffle-partitions", "4"],
        cwd=str(workdir), env=env,
        capture_output=True, text=True, timeout=420)
    assert proc.returncode == 0, proc.stderr[-4000:]

    # the job prints its one-line JSON summary on stdout
    summary = None
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and '"entity_types"' in line:
            summary = json.loads(line)
    assert summary is not None, proc.stdout[-2000:]
    assert summary["entity_types"] == 3  # Person, Organization, Thermostat

    ents = spark.read.parquet(f"{out}/entity_types")
    assert {r["name"] for r in ents.collect()} == \
        {"Person", "Organization", "Thermostat"}
    d = json.load(open(deff))
    assert d["parts"][0]["path"] == ".platform"


def test_run_job_rejects_unknown_subcommand():
    sys.path.insert(0, str(REPO))
    try:
        import run_job
    finally:
        sys.path.pop(0)
    assert run_job.main(["frobnicate", "--input", "x"]) == 2
