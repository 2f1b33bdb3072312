"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas UDFs.

The decode libraries (PIL / torchaudio / ffmpeg) are NOT in this
container, so the actual byte→pixels/samples decode is STUBBED:
`decode_media(real_decode=True)` raises NotImplementedError, and the
default path produces a deterministic fake decode (dimensions derived
from byte length). Everything around the stub — schema, binary Arrow
transfer, mapInPandas batch shape, partitioning — is real and tested.

Scale notes: media bytes are the widest column by far; every operator
here selects only the columns it needs so Catalyst prunes the scan
(never ship bytes through a shuffle unless transforming them), and
batch sizes are bounded by spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "doc_id long, kind string, media binary"
STATS_SCHEMA = "doc_id long, kind string, n_bytes long, width long, height long, n_frames long"


def attach_media(docs: DataFrame) -> DataFrame:
    """Synthesize a deterministic media table from documents: the utf-8
    bytes of the text stand in for encoded media. kind round-robins
    image/audio/video by doc_id."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("media"),
    )


def _fake_dims(n_bytes: int, kind: str) -> tuple[int, int, int]:
    """Deterministic stand-in for a real decode — pure function of
    (byte length, kind) so the DuckDB oracle can reproduce it."""
    width = 16 + n_bytes % 624
    height = 16 + (n_bytes * 7) % 464
    n_frames = 1 if kind == "image" else 1 + n_bytes % 120
    return width, height, n_frames


def decode_media(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """(doc_id, kind, n_bytes, width, height, n_frames) via an
    Arrow-batched pandas UDF over the binary column. With
    real_decode=True this is where PIL/ffmpeg would run — not available
    in this container."""
    if real_decode:
        raise NotImplementedError(
            "real media decode requires PIL/ffmpeg, not present in this "
            "environment; the Spark-side plumbing is exercised by the "
            "deterministic fake decode (real_decode=False)"
        )

    def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            n_bytes = pdf["media"].map(len)
            dims = [
                _fake_dims(nb, k) for nb, k in zip(n_bytes, pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "kind": pdf["kind"].values,
                    "n_bytes": n_bytes.astype("int64").values,
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_frames": [d[2] for d in dims],
                }
            )

    return media.mapInPandas(decode, schema=STATS_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Plumbing for frame sampling: one row per sampled frame index
    (decode stubbed — frame count from the fake decode). Shows the
    explode-by-metadata pattern a real video pipeline uses so frames
    can be processed independently downstream."""
    stats = decode_media(media)
    return stats.filter(F.col("kind") == "video").select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
