"""spark-submit primary script for the engine's batch jobs.

spark-submit runs a SCRIPT, not a module (there is no ``-m``), and a file
inside a package cannot be that script because its relative imports need
package context. This launcher is the primary script; the package itself
ships via --py-files:

    python tools/make_pyfiles_zip.py /tmp/engine.zip
    spark-submit --master <url> --py-files /tmp/engine.zip run_job.py \
        kg --input <docs parquet|iceberg> --output <root> [job.py flags...]
    spark-submit --master <url> --py-files /tmp/engine.zip run_job.py \
        curate --input <docs> --eval <eval docs> --output <root> [...]
    spark-submit --master <url> --py-files /tmp/engine.zip run_job.py \
        sparql --input <docs> --query '<SPARQL text>' [--show N] [...]
    spark-submit --master <url> --py-files /tmp/engine.zip run_job.py \
        validate --input <docs> --shapes shapes.json [--fail-on-violation]

Subcommands map to the job mains (kg → job.py, curate → curate_job.py,
sparql → sparql_job.py, validate → validate_job.py); all remaining args pass through unchanged, so each job's
own --help and config-file handling keep working. Defaults to ``kg`` when
the first arg is a flag, preserving old invocations.

The end-to-end launch (zip → spark-submit → executors importing the
package from the zip inside Arrow UDFs) is exercised by
tests/test_spark_submit.py.
"""

import sys


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    cmd = "kg"
    if argv and not argv[0].startswith("-"):
        cmd = argv.pop(0)
    if cmd == "kg":
        from rdf_dtdl_fabric_ontology_converter_spark.job import main as run
    elif cmd == "curate":
        from rdf_dtdl_fabric_ontology_converter_spark.curate_job import (
            main as run)
    elif cmd == "sparql":
        from rdf_dtdl_fabric_ontology_converter_spark.sparql_job import (
            main as run)
    elif cmd == "validate":
        from rdf_dtdl_fabric_ontology_converter_spark.validate_job import (
            main as run)
    else:
        print(f"unknown subcommand {cmd!r}: expected 'kg', 'curate', "
              "'sparql', or 'validate'", file=sys.stderr)
        return 2
    return run(argv)


if __name__ == "__main__":
    sys.exit(main())
