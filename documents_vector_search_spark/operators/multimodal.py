"""Multimodal columns: opaque binary payloads + typed metadata.

North-star addition (BASELINE.json): at 100 TB, images/audio/video ride
along as ``BINARY`` columns with a struct of typed metadata; decode and
feature extraction run as Arrow-batched ``mapInPandas`` stages so bytes
cross the JVM/Python boundary in columnar batches.

The decode step itself is STUBBED (image/audio libraries are not in
this container — clearly marked below); everything Spark-side — schema,
batch iteration, partition sizing, UDF signature — is real and tested
with the deterministic fake extractor.

Scale notes:
- Binary payloads dominate row size: repartition by byte budget (not
  row count) before a decode stage so one Arrow batch fits executor
  memory: ``df.repartition(ceil(total_bytes / 512MB))``.
- Keep payloads OUT of shuffles: extract features first (map-only),
  then join features — never groupBy a DataFrame carrying raw bytes.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "id BIGINT, media_type STRING, byte_len BIGINT, sha256 STRING, "
    "width INT, height INT, n_frames INT"
)


def attach_binary_payload(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Demo payload builder: encodes text as UTF-8 bytes so the binary
    plumbing can be exercised on the synthetic corpus (real pipelines
    read payloads via ``spark.read.format("binaryFile")``)."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.lit("text/plain").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def _fake_decode(media_type: str, payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a real decoder.

    REAL IMPLEMENTATION REQUIRES: PIL/opencv (images), soundfile/ffmpeg
    (audio/video) — not installed here. A real deployment replaces this
    function only; the mapInPandas plumbing is unchanged.
    Returns fake (width, height, n_frames) derived from payload bytes.
    """
    n = len(payload)
    first = payload[0] if n else 0
    return (n % 1920, (n * 7 + first) % 1080, 1)


def extract_media_features(
    media: DataFrame,
    decoder: Callable[[str, bytes], tuple[int, int, int]] | None = None,
) -> DataFrame:
    """mapInPandas feature extraction over (id, media_type, payload).

    Output: MEDIA_SCHEMA (payload dropped — features only, so downstream
    shuffles never carry bytes).
    """
    decode = decoder or _fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            # itertuples, not iterrows: no per-row Series construction
            for rec in pdf.itertuples(index=False):
                payload = bytes(rec.payload)
                width, height, n_frames = decode(rec.media_type, payload)
                rows.append(
                    {
                        "id": rec.id,
                        "media_type": rec.media_type,
                        "byte_len": len(payload),
                        "sha256": hashlib.sha256(payload).hexdigest(),
                        "width": width,
                        "height": height,
                        "n_frames": n_frames,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "id",
                    "media_type",
                    "byte_len",
                    "sha256",
                    "width",
                    "height",
                    "n_frames",
                ],
            )

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


RESIZED_SCHEMA = (
    "id BIGINT, media_type STRING, payload BINARY, width INT, height INT"
)

FRAME_SCHEMA = "id BIGINT, frame_index INT, ts_ms BIGINT, payload BINARY"


def _fake_resize(
    media_type: str, payload: bytes, width: int, height: int
) -> bytes:
    """Deterministic stand-in for a real resizer (PIL/opencv absent —
    see ``_fake_decode``). Real deployments replace this function only.
    Produces a payload-derived pseudo-bitmap of exactly width*height
    bytes so batch-size accounting downstream is realistic."""
    import hashlib

    seed = hashlib.sha256(payload).digest()
    need = width * height
    return (seed * (need // len(seed) + 1))[:need]


def resize_media(
    media: DataFrame,
    width: int,
    height: int,
    resizer: Callable[[str, bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """mapInPandas resize over (id, media_type, payload) → RESIZED_SCHEMA.

    Map-only (no shuffle); payload-in/payload-out, so run it AFTER
    ``repartition_by_bytes`` and BEFORE any shuffle-bearing stage.
    """
    do_resize = resizer or _fake_resize

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                {
                    "id": rec.id,
                    "media_type": rec.media_type,
                    "payload": do_resize(
                        rec.media_type, bytes(rec.payload), width, height
                    ),
                    "width": width,
                    "height": height,
                }
                for rec in pdf.itertuples(index=False)
            ]
            yield pd.DataFrame(
                rows, columns=["id", "media_type", "payload", "width", "height"]
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def _fake_frame_sample(
    media_type: str, payload: bytes, every_ms: int
) -> list[tuple[int, bytes]]:
    """Deterministic stand-in for a real frame sampler (ffmpeg absent).
    Fakes a 1-frame-per-KiB 'video': one (ts_ms, frame_bytes) per
    ``every_ms`` step across the fake duration."""
    duration_ms = max(1, len(payload) // 1024) * 1000
    out = []
    for i, ts in enumerate(range(0, duration_ms, every_ms)):
        lo = (ts * 31) % max(1, len(payload))
        out.append((ts, payload[lo : lo + 64]))
    return out


def sample_frames(
    media: DataFrame,
    every_ms: int = 1000,
    sampler: Callable[[str, bytes, int], list[tuple[int, bytes]]] | None = None,
) -> DataFrame:
    """Frame sampling as a one-to-many mapInPandas: each media row
    yields N (id, frame_index, ts_ms, frame payload) rows.

    The fan-out happens INSIDE the Arrow batch (no explode of a
    collected array column, so the full frame set of a video never
    materializes as one row), and output rows carry only the sampled
    frame bytes — the decode-heavy path stays map-only.
    """
    sample = sampler or _fake_frame_sample

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                for idx, (ts, frame) in enumerate(
                    sample(rec.media_type, bytes(rec.payload), every_ms)
                ):
                    rows.append(
                        {
                            "id": rec.id,
                            "frame_index": idx,
                            "ts_ms": ts,
                            "payload": frame,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["id", "frame_index", "ts_ms", "payload"]
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def repartition_by_bytes(
    media: DataFrame,
    bytes_per_partition: int = 512 * 1024 * 1024,
    payload_col: str = "payload",
) -> DataFrame:
    """Repartition so each partition carries ~``bytes_per_partition``
    of payload — the docstring's byte-budget rule as a function.

    Costs one 1-row aggregate (driver action) + one round-robin
    shuffle; decode stages batch by ROWS, so without this a partition
    of few huge videos OOMs while a partition of many icons wastes
    cores. Row-count repartition cannot see that difference.
    """
    import math

    total = media.agg(
        F.sum(F.octet_length(F.col(payload_col))).alias("b")
    ).first()["b"]
    n = max(1, math.ceil((total or 0) / bytes_per_partition))
    return media.repartition(n)
