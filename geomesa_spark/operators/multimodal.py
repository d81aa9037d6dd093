"""Multimodal (image/audio/video) column plumbing for the interleaved
corpus.

The corpus carries media as opaque references (``media_ref``) or raw
``binary`` payloads with typed metadata.  Image/audio decode libraries are
NOT in this container, so the decode kernels are STUBBED — clearly marked
— behind deterministic fakes, while everything Spark-side is real and
tested: schemas, Arrow batch shapes, ``mapInPandas`` partition flow,
partitioning by media type, and the UDF signatures a real decoder would
drop into.

Design for 100 TB: media bytes never pass through a shuffle — the
pipeline extracts features partition-local (mapInPandas), writes narrow
feature rows, and joins features back by (doc_id, span_idx) keys only.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: real decoders would be imported here; gate behind import-try so the
#: engine upgrades in place when the libs exist
try:  # pragma: no cover
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

FEATURE_SCHEMA = (
    "doc_id string, span_idx int, media_ref string, kind string, "
    "width int, height int, n_frames int, feature array<float>"
)


def _fake_decode(ref: str) -> tuple[int, int, int]:
    """Deterministic stand-in for image/video header decode: derives fake
    (width, height, n_frames) from the media_ref bytes.  A real build
    replaces this one function with PIL/ffmpeg calls — the surrounding
    batch plumbing does not change."""
    if not HAVE_PIL:
        b = np.frombuffer((ref or "").encode(), dtype=np.uint8).astype(np.uint64)
        powers = np.uint64(131) ** np.arange(len(b), dtype=np.uint64)  # wraps mod 2^64
        h = (b * powers).sum(dtype=np.uint64) if len(b) else np.uint64(0)
        w = int(h % np.uint64(1920)) + 16
        ht = int((h >> np.uint64(16)) % np.uint64(1080)) + 16
        frames = 1
        return w, ht, frames
    raise NotImplementedError("real decoder path: wire PIL here")


def _fake_embedding(ref: str, dim: int = 16) -> np.ndarray:
    """Deterministic fake feature vector (stands in for a CNN/CLIP
    embedding).  Seeded from the ref so tests are stable."""
    seed = sum((i + 1) * b for i, b in enumerate((ref or "").encode())) % (2**32)
    rng = np.random.default_rng(seed)
    v = rng.normal(size=dim)
    return (v / np.linalg.norm(v)).astype(np.float32)


def extract_media_spans(docs: DataFrame) -> DataFrame:
    """One row per image span: (doc_id, span_idx, media_ref) + untouched
    ``spans``.  Same never-rebuild-spans discipline as the geo extractor."""
    d = docs.withColumn(
        "_media",
        F.expr(
            "filter(transform(spans, (s, i) -> struct(i AS span_idx, s.kind AS kind, "
            "s.media_ref AS media_ref)), x -> x.kind = 'image')"
        ),
    )
    d = d.select("*", F.explode("_media").alias("_m")).drop("_media")
    return (
        d.withColumn("span_idx", F.col("_m.span_idx"))
        .withColumn("media_ref", F.col("_m.media_ref"))
        .drop("_m")
    )


def media_features(docs: DataFrame, feature_dim: int = 16) -> DataFrame:
    """Decode + featurize every image span via ``mapInPandas`` — the
    batch-iterator shape a real GPU/CPU decoder pipeline needs (one
    partition = one decode session; batches stream through Arrow).

    Output: FEATURE_SCHEMA rows; media bytes (when present) never leave
    the partition."""
    media = extract_media_spans(docs).select("doc_id", "span_idx", "media_ref")

    def decode_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # a real implementation opens its decoder/session once here
        for pdf in batches:
            n = len(pdf)
            w = np.zeros(n, dtype=np.int32)
            h = np.zeros(n, dtype=np.int32)
            fr = np.zeros(n, dtype=np.int32)
            feats = []
            for i, ref in enumerate(pdf["media_ref"].to_numpy(object)):
                wi, hi, fi = _fake_decode(ref)
                w[i], h[i], fr[i] = wi, hi, fi
                feats.append(_fake_embedding(ref, feature_dim).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "span_idx": pdf["span_idx"].astype("int32"),
                    "media_ref": pdf["media_ref"],
                    "kind": "image",
                    "width": w,
                    "height": h,
                    "n_frames": fr,
                    "feature": feats,
                }
            )

    return media.mapInPandas(decode_partition, schema=FEATURE_SCHEMA)


def resize_stub(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize planning: emits the (scale_x_1000, scale_y_1000) integer plan
    per media row; the pixel work is the stubbed decode stage.  Raises
    clearly when asked to materialize pixels without a decoder."""
    if not HAVE_PIL:
        out = df.withColumn(
            "scale_x_1000", (F.lit(target_w) * 1000 / F.col("width")).cast("int")
        ).withColumn("scale_y_1000", (F.lit(target_h) * 1000 / F.col("height")).cast("int"))
        return out
    raise NotImplementedError("real resize path: wire PIL here")


def frame_sample_plan(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plan for video rows: array of frame indices to keep
    (JVM sequence — no Python)."""
    return df.withColumn(
        "sample_frames",
        F.expr(f"sequence(0, greatest(n_frames - 1, 0), {every_n})"),
    )
