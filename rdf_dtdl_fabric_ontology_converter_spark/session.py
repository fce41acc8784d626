"""SparkSession factory with the engine's scale-oriented defaults.

Defaults chosen for the 100 TB design point and scaled down by caller for
local runs: AQE on (runtime re-plan, skew-join splitting, broadcast
conversion), Arrow on (all Python crossings are vectorized), shuffle
partitions sized by the caller.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def build_session(app: str = "fabric-ontology-spark", master: str | None = None,
                  shuffle_partitions: int = 32, extra: dict | None = None) -> SparkSession:
    b = (SparkSession.builder.appName(app)
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
         # size-first coalescing: tiny dimension shuffles (class tables,
         # type dictionaries, iterative-loop rounds) collapse to one task
         # instead of `defaultParallelism` empty tasks; large shuffles are
         # still split by the 64 MB advisory size. Measured ~20% off the
         # latency-bound KG pipeline cold time, neutral (within host
         # noise) on the 14M-triple extraction job.
         .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
                 "false")
         .config("spark.sql.adaptive.skewJoin.enabled", "true")
         # PySpark 4's DataFrame debugging context (enabled by default)
         # walks the Python stack AND makes two extra py4j round-trips on
         # EVERY DataFrame/Column API call to record the user call site
         # for error messages. The KG pipeline builds plans with ~2,600
         # API calls per run (cProfile: 5,215 py4j sends), so on a busy
         # driver host the bookkeeping amplifies badly — measured 3.3×
         # on the entity pipeline under full CPU contention (55.6→16.9 s
         # cold) — while on a quiet host it is within noise. A shared
         # cluster driver is the busy case, so default off. Errors keep
         # the full JVM-side query context; only the Python source-line
         # annotation is dropped. Re-enable via `extra` for debugging.
         .config("spark.python.sql.dataFrameDebugging.enabled", "false")
         .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.showConsoleProgress", "false"))
    if master:
        b = b.master(master)
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
