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
