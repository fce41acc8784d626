"""Watermarked streaming windows, embedding near-dup, pandas-UDF cosine."""

import datetime

from pyspark.sql import functions as F


def test_windowed_stream_with_watermark(spark, tmp_path):
    from rdf_dtdl_fabric_ontology_converter_spark.streaming.windows import (
        run_windowed_stream)
    in_path = str(tmp_path / "events")
    out = str(tmp_path / "agg")
    ckpt = str(tmp_path / "ckpt")

    def write_events(rows, mode):
        df = spark.createDataFrame(
            rows, "event_id bigint, ts timestamp, user_id bigint, "
                  "event_type string, value double, props string")
        df.coalesce(1).write.mode(mode).parquet(in_path)

    day1 = datetime.datetime(2026, 1, 1, 10, 0)
    write_events(
        [(i, day1 + datetime.timedelta(minutes=10 * i), 1, "click",
          1.0, "{}") for i in range(6)], "overwrite")
    q = run_windowed_stream(spark, in_path, out, ckpt,
                            window="1 hour", watermark="30 minutes")
    q.awaitTermination(120)

    # a much later batch advances the watermark → day-1 windows emit
    day3 = datetime.datetime(2026, 1, 3, 0, 0)
    write_events([(100, day3, 2, "click", 1.0, "{}")], "append")
    q2 = run_windowed_stream(spark, in_path, out, ckpt,
                             window="1 hour", watermark="30 minutes")
    q2.awaitTermination(120)

    got = spark.read.parquet(out)
    rows = {(r["window_start"].hour, r["n"]) for r in got.collect()}
    # events at 10:00..10:50 → hour-10 window n=6; 11:00?  minutes 0-50 all
    # in hour 10 → one closed window of 6
    assert (10, 6) in rows


def test_embedding_near_duplicates(spark):
    from rdf_dtdl_fabric_ontology_converter_spark.operators.dedup import (
        embedding_near_duplicates)
    import math
    vecs = [(i, [math.cos(i + d) for d in range(8)]) for i in range(20)]
    vecs.append((99, [x * 1.0001 for x in vecs[3][1]]))  # scaled copy of 3
    v = spark.createDataFrame(vecs, "vec_id bigint, embedding array<float>")
    # exhaustive mode
    pairs = embedding_near_duplicates(v, threshold=0.999, n_planes=0)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert (3, 99) in got
    # bucketed mode finds the same pair (identical directions share buckets)
    pairs_b = embedding_near_duplicates(v, threshold=0.999, dim=8,
                                        n_planes=4)
    got_b = {(r["doc_a"], r["doc_b"]) for r in pairs_b.collect()}
    assert (3, 99) in got_b


def test_pandas_cosine_matches_jvm(spark):
    from rdf_dtdl_fabric_ontology_converter_spark.operators.similarity import (
        cosine_topk, cosine_topk_pandas)
    import math
    vecs = [(i, [math.sin(i * d + 1.0) for d in range(16)])
            for i in range(40)]
    v = spark.createDataFrame(vecs, "vec_id bigint, embedding array<float>")
    q = v.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    jvm = [(r["query_id"], r["neighbor_id"], r["rank"])
           for r in cosine_topk(v, q, k=5).collect()]
    pdu = [(r["query_id"], r["neighbor_id"], r["rank"])
           for r in cosine_topk_pandas(v, q, k=5).collect()]
    assert sorted(jvm) == sorted(pdu)
