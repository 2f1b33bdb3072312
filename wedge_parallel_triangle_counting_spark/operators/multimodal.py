"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas UDFs.

The decode path is import-guarded: when PIL is importable,
`decode_media(real_decode=True)` reads real image dimensions
(header-only, corrupt bytes → null dims); when it is not — as in this
container — real_decode raises NotImplementedError and the default
path produces a deterministic fake decode (dimensions derived from
byte length) so correctness checks stay environment-independent.
Everything around the decode — schema, binary Arrow transfer,
mapInPandas batch shape, partitioning — is real and tested either way.

Scale notes: media bytes are the widest column by far; every operator
here selects only the columns it needs so Catalyst prunes the scan
(never ship bytes through a shuffle unless transforming them), and
batch sizes are bounded by spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

import io
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # import-guarded: PIL exists on real clusters, not in this sandbox
    from PIL import Image as _PILImage

    HAS_PIL = True
except ImportError:  # pragma: no cover - exercised in this container
    _PILImage = None
    HAS_PIL = False

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


def _pil_dims(raw: bytes) -> tuple[int | None, int | None]:
    """Header-only image decode (PIL reads dimensions lazily — no full
    pixel decode). Undecodable bytes yield nulls, never an executor
    crash: at web scale some fraction of fetched media is always
    corrupt, and a poison row must not kill the stage."""
    try:
        with _PILImage.open(io.BytesIO(raw)) as im:
            return int(im.width), int(im.height)
    except Exception:  # noqa: BLE001 - any decode failure → null dims
        return None, None


def decode_media(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """(doc_id, kind, n_bytes, width, height, n_frames) via an
    Arrow-batched pandas UDF over the binary column.

    real_decode=True uses PIL when importable (header-only dimension
    read for kind='image'; corrupt bytes → null dims; audio/video need
    ffmpeg and also yield nulls) and raises when PIL is absent, so the
    same code runs real decodes on a cluster that has the library while
    this container exercises the deterministic fake path."""
    if real_decode and not HAS_PIL:
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
            if real_decode:
                dims = [
                    (*_pil_dims(raw), None) if k == "image" else (None, None, None)
                    for raw, k in zip(pdf["media"], pdf["kind"])
                ]
            else:
                dims = [
                    _fake_dims(nb, k) for nb, k in zip(n_bytes, pdf["kind"])
                ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "kind": pdf["kind"].values,
                    "n_bytes": n_bytes.astype("int64").values,
                    "width": pd.array([d[0] for d in dims], dtype="Int64"),
                    "height": pd.array([d[1] for d in dims], dtype="Int64"),
                    "n_frames": pd.array([d[2] for d in dims], dtype="Int64"),
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


RESIZE_SCHEMA = (
    "doc_id long, kind string, n_bytes long, width long, height long"
)


def resize_media(
    media: DataFrame, max_dim: int = 256, real_resize: bool = False
) -> DataFrame:
    """Fit-in-box resize: (doc_id, kind, n_bytes, width, height) with
    width/height scaled so max(width, height) <= max_dim, aspect
    preserved, computed with INTEGER arithmetic (w*max_dim // max(w,h))
    so the result is exact and oracle-reproducible; applied to every
    kind's (deterministic) dims, mirroring decode_media's fake path.

    real_resize=True additionally re-encodes the image bytes with PIL
    (import-guarded like decode_media; absent → NotImplementedError);
    the default path transforms only the metadata — the Spark-side
    plumbing (schema, Arrow batches, pruned scan) is identical."""
    if real_resize and not HAS_PIL:
        raise NotImplementedError(
            "real media resize requires PIL, not present in this "
            "environment; the metadata path (real_resize=False) "
            "exercises the same Spark plumbing"
        )
    stats = decode_media(media, real_decode=real_resize)
    big = F.greatest("width", "height")
    # integer floor-division end to end (expr DIV, not double `/` +
    # floor): a rounded double quotient could straddle an integer for
    # large dims, silently diverging from the oracle's exact `//`
    scale_w = F.when(big <= max_dim, F.col("width")).otherwise(
        F.expr(f"(width * {max_dim}) DIV greatest(width, height)")
    )
    scale_h = F.when(big <= max_dim, F.col("height")).otherwise(
        F.expr(f"(height * {max_dim}) DIV greatest(width, height)")
    )
    return stats.select(
        "doc_id",
        "kind",
        "n_bytes",
        scale_w.cast("long").alias("width"),
        scale_h.cast("long").alias("height"),
    )


def media_features(
    media: DataFrame, dim: int = 16, normalize: bool = False
) -> DataFrame:
    """(doc_id, features) — a REAL, library-free feature extractor over
    the raw media bytes: the byte-value histogram folded mod `dim`.
    Deterministic, content-derived, identical on any executor; the slot
    where a model embedding would plug in on a cluster that has one.
    The per-byte work is vectorized np.bincount per Arrow batch (the
    per-row object access is inherent to ragged binary columns, same
    as decode_media).

    Default output is integer counts (array<long>) — exact and
    hash-stable across engines for the DuckDB oracle (the corpus_stats
    lesson: never put a derived double in an oracle-checked column).
    normalize=True divides by the byte count for ANN use
    (array<double>): feed to similarity.random_plane_lsh_candidates /
    lsh_bucket_pairs for media-level near-dup, the same composition as
    text MinHash → clusters."""
    import numpy as np

    def feats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            out = []
            for raw in pdf["media"]:
                b = np.frombuffer(bytes(raw), dtype=np.uint8)
                h = np.bincount(b % dim, minlength=dim)
                if normalize:
                    tot = max(int(h.sum()), 1)
                    out.append((h / tot).tolist())
                else:
                    out.append(h.tolist())
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "features": out}
            )

    dtype = "double" if normalize else "long"
    return media.select("doc_id", "media").mapInPandas(
        feats, schema=f"doc_id long, features array<{dtype}>"
    )
