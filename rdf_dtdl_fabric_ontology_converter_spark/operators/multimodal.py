"""Multimodal media-span processing: opaque binary columns + typed metadata.

Media spans (kind='media') carry refs into object storage; this module
provides the Spark-side plumbing for decode / feature-extract / resize /
frame-sample as Arrow-batched mapInPandas stages:

- schemas and batch shapes are real and tested;
- the actual codec work is stubbed (image/audio libs are not in this
  container) behind ``DECODERS`` — a deterministic fake decoder is used in
  tests, and a NotImplementedError decoder marks the integration point for
  real libs (pillow/torchaudio/pyav) in production.

Scale shape: media payload fetch+decode is the bandwidth hog, so it runs
as a narrow mapInPandas over a repartitioned ref table (no shuffle of the
binary column afterwards — features are extracted in the same pass).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("span_idx", T.IntegerType()),
    T.StructField("media_ref", T.StringType()),
    T.StructField("media_type", T.StringType()),   # image|audio|video|unknown
    T.StructField("payload", T.BinaryType()),      # opaque bytes
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
    T.StructField("decode_error", T.StringType()),
])


def fake_decoder(ref: str, payload: bytes | None) -> dict:
    """Deterministic stand-in decoder: derives metadata + an 8-dim feature
    from md5(ref) — stable across runs, exercises the full batch path."""
    import hashlib
    h = hashlib.md5(ref.encode()).digest()
    return {
        "media_type": ("image", "audio", "video")[h[0] % 3],
        "width": 64 + h[1], "height": 64 + h[2],
        "duration_ms": int.from_bytes(h[3:5], "big"),
        "feature": [b / 255.0 for b in h[:8]],
        "decode_error": None,
    }


def real_decoder(ref: str, payload: bytes | None) -> dict:
    """Integration point for production codecs (pillow / pyav / soundfile).

    Those libraries are not available in this container; wire them here and
    the surrounding Spark plumbing (schema, partitioning, batching) is
    already in place.
    """
    raise NotImplementedError(
        "media codecs not available in this environment; use fake_decoder "
        "or install pillow/pyav and implement here")


DECODERS: dict[str, Callable[[str, bytes | None], dict]] = {
    "fake": fake_decoder,
    "real": real_decoder,
}


def decode_media(media_refs: DataFrame, decoder: str = "fake",
                 partitions: int | None = None) -> DataFrame:
    """media refs (doc_id, span_idx, media_ref) → decoded metadata+feature.

    One narrow Arrow pass; decode errors become rows, not task failures.
    """
    dec = DECODERS[decoder]
    if partitions:
        media_refs = media_refs.repartition(partitions)

    def run(batches):
        import pandas as pd
        cols = [f.name for f in MEDIA_META_SCHEMA.fields]
        for pdf in batches:
            out = []
            for doc_id, idx, ref in zip(pdf["doc_id"], pdf["span_idx"],
                                        pdf["media_ref"]):
                try:
                    d = dec(ref, None)
                    out.append((doc_id, int(idx), ref, d["media_type"], None,
                                d["width"], d["height"], d["duration_ms"],
                                d["feature"], None))
                except Exception as e:  # noqa: BLE001
                    out.append((doc_id, int(idx), ref, "unknown", None,
                                None, None, None, None,
                                f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(out, columns=cols)

    return media_refs.mapInPandas(run, MEDIA_META_SCHEMA)


def frame_sample_plan(decoded: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video rows → one row per sampled frame timestamp (plumbing only;
    frame extraction itself belongs in the decoder)."""
    vids = decoded.where(F.col("media_type") == "video")
    return (vids
            .withColumn("frame_ts_ms",
                        F.explode(F.sequence(
                            F.lit(0),
                            F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                            F.lit(every_ms))))
            .select("doc_id", "span_idx", "media_ref", "frame_ts_ms"))


def media_features_table(documents: DataFrame,
                         decoder: str = "fake") -> DataFrame:
    """documents → per-media-span feature rows (ties into similarity ops)."""
    from .extract import extract_media
    return decode_media(extract_media(documents), decoder=decoder)
