"""Streaming corpus curation: stateless filters over a document ingest
stream (Structured Streaming twins of operators/curate.py).

Decontamination and stratified sampling are pure per-row decisions
(against a broadcast benchmark set / a hash bucket), so unlike the
stateful dedup in streaming/windows.py they need NO watermark and NO
state store — every micro-batch filters independently and exactly-once
falls out of the file-sink commit log alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.dedup import shingle_rows, shingles
from ..operators.curate import sample_bucket, sample_rate
from .windows import DOCS_STREAM_SCHEMA


def stream_decontaminate(docs: DataFrame, eval_docs: DataFrame, n: int = 4,
                         text_col: str = "text") -> DataFrame:
    """Streaming decontamination filter: drop any streamed document that
    shares a token ``n``-gram with the static benchmark set.

    The eval side is a batch DataFrame reduced to its distinct shingles
    and broadcast; the stream side carries its shingles as an ARRAY
    column (the narrow :func:`..operators.dedup.shingles` form — window
    functions are not available on streams) and a stream-static LEFT ANTI
    join on ``array_contains`` removes contaminated documents. Stateless:
    no watermark, bounded memory by construction.
    """
    ev = (shingle_rows(eval_docs, text_col, "doc_id", n)
          .select("sh").dropDuplicates())
    withsh = docs.withColumn("_sh_arr", shingles(F.col(text_col), n))
    clean = withsh.join(F.broadcast(ev),
                        F.expr("array_contains(_sh_arr, sh)"), "left_anti")
    return clean.drop("_sh_arr")


def stream_sample_stratified(docs: DataFrame, rates: dict[str, int],
                             default_permille: int = 0,
                             stratum_col: str = "lang",
                             key_col: str = "doc_id",
                             seed: str = "") -> DataFrame:
    """Streaming deterministic stratified sampling: the keep decision is a
    pure function of (seed, key), so a re-delivered document always gets
    the same verdict — idempotent under at-least-once sources. The
    predicate is a narrow projection (no state, no shuffle), applied
    row-by-row as micro-batches arrive; all input columns pass through."""
    return docs.where(sample_bucket(key_col, seed) <
                      sample_rate(rates, default_permille, stratum_col))


def run_decontaminate_stream(spark: SparkSession, in_path: str,
                             eval_path: str, out_path: str,
                             checkpoint: str, n: int = 4):
    """File-source ingest stream → broadcast decontamination filter →
    parquet (append; availableNow for incremental batch-over-stream)."""
    docs = spark.readStream.schema(DOCS_STREAM_SCHEMA).parquet(in_path)
    ev = spark.read.parquet(eval_path)
    clean = stream_decontaminate(docs, ev, n=n)
    return (clean.writeStream
            .format("parquet")
            .option("path", out_path)
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
            .trigger(availableNow=True)
            .start())
