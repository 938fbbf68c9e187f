"""Multimodal column plumbing (north-star extension): image/audio/video
as opaque ``binary`` columns with typed metadata, processed by
Arrow-batched pandas iterators (``mapInPandas``).

The container has no image/audio codecs, so the decode kernels are
deterministic fakes behind ``_decode_stub`` (clearly marked); everything
Spark-side — schema, batch iteration, partitioning, UDF signatures — is
real and tested. Swapping the stub for PIL/librosa is a one-function
change that doesn't touch the plan shape.

Scale notes: mapInPandas streams Arrow batches, so peak memory is
O(batch), not O(partition); binary payloads never pass through Python
row objects. Feature extraction is embarrassingly parallel — no
shuffle at all until a downstream groupBy.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, mime string, n_bytes bigint"
)
FEATURE_SCHEMA = (
    "media_id bigint, kind string, n_bytes bigint, sha256 string, "
    "width int, height int, n_frames int, feature array<float>"
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as opaque media payloads so the
    multimodal path has real (deterministic) data to flow without codec
    libraries. kind cycles by id to exercise per-kind dispatch."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.when(kind == "image", "image/png")
        .when(kind == "audio", "audio/wav")
        .otherwise("video/mp4")
        .alias("mime"),
        F.length(payload).cast("bigint").alias("n_bytes"),
    )


def _decode_stub(payload: bytes, kind: str) -> dict:
    """STUB decode: the real implementation would call PIL / soundfile /
    pyav here. This fake is deterministic in the payload bytes so tests
    are stable: dimensions derive from the sha256 digest."""
    digest = hashlib.sha256(payload).digest()
    if kind == "image":
        return {"width": 64 + digest[0] % 192, "height": 64 + digest[1] % 192, "n_frames": 1}
    if kind == "audio":
        return {"width": 0, "height": 0, "n_frames": 8000 + int.from_bytes(digest[2:4], "big") % 8000}
    return {"width": 320 + digest[0] % 64, "height": 240 + digest[1] % 48, "n_frames": 24 + digest[4] % 240}


def _feature_stub(payload: bytes, dim: int = 8) -> list[float]:
    """STUB feature extractor: 8-dim embedding from sha256 bytes,
    unit-normalized. Replace with a real model batch call."""
    digest = hashlib.sha256(payload).digest()
    raw = [(digest[i] - 127.5) / 127.5 for i in range(dim)]
    norm = sum(x * x for x in raw) ** 0.5 or 1.0
    return [float(x / norm) for x in raw]


def extract_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Decode + feature-extract every media row via mapInPandas: one
    Arrow batch in, one out; Python cost amortized across the batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_decode_stub(p, k) for p, k in zip(pdf["payload"], pdf["kind"])]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["n_bytes"],
                    "sha256": [hashlib.sha256(p).hexdigest() for p in pdf["payload"]],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "n_frames": [m["n_frames"] for m in metas],
                    "feature": [_feature_stub(p) for p in pdf["payload"]],
                }
            )
            yield out

    # guide §4: mapInPandas is opaque to column pruning — project to
    # the columns the function actually reads before crossing the Arrow
    # boundary (mime would otherwise ship with every row)
    return media.select("media_id", "kind", "payload", "n_bytes").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def resize_images(media: DataFrame, max_side: int = 224) -> DataFrame:
    """Image resize plan: filters to images, 'resizes' via the stub
    (real impl: PIL thumbnail in the same mapInPandas shape), keeps the
    payload column binary end-to-end."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_decode_stub(p, "image") for p in pdf["payload"]]
            scale = [
                min(1.0, max_side / max(m["width"], m["height"])) for m in metas
            ]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["payload"],  # stub: real impl re-encodes
                    "width": [int(m["width"] * s) for m, s in zip(metas, scale)],
                    "height": [int(m["height"] * s) for m, s in zip(metas, scale)],
                }
            )
            yield out

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")  # §4 column pruning at the boundary
        .mapInPandas(
            run, schema="media_id bigint, payload binary, width int, height int"
        )
    )


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plan for video: one output row per sampled frame
    (posexplode shape). Frame payloads are stub digests; the real impl
    decodes with pyav inside the same iterator."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                meta = _decode_stub(payload, "video")
                for f in range(0, meta["n_frames"], every_n):
                    # frame fingerprint = sha256(payload ++ ':' ++
                    # ascii(frame_idx)) — the ASCII suffix (instead of
                    # raw BE bytes) keeps the stub replayable by the
                    # DuckDB oracle, whose sha256 only takes VARCHAR
                    rows.append(
                        (
                            int(mid),
                            f,
                            hashlib.sha256(
                                payload + b":" + str(f).encode()
                            ).digest(),
                        )
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload")  # §4 column pruning at the boundary
        .mapInPandas(run, schema="media_id bigint, frame_idx int, frame binary")
    )
