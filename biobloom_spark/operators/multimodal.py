"""Multimodal column operators: images/audio/video as opaque binary columns
with typed metadata.

Training-data-pipeline extension.  The Spark-side plumbing — schemas,
Arrow batch shapes, partition-preserving mapInPandas UDF signatures,
metadata propagation — is real and tested; the codec step is stubbed
because no image/audio library ships in this container:

- ``decoder="stub"`` raises NotImplementedError with installation advice
  (the honest production default when codecs are absent);
- ``decoder="fake"`` runs a deterministic header-parse of the engine's own
  synthetic media format, exercising every byte of the pipeline in tests.

Synthetic media format (``synthesize_media``): magic ``BBMM`` + u8 kind +
u16 width + u16 height + u32 n_frames + payload bytes — enough structure
for decode/resize/frame-sample semantics to be meaningfully testable.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_META_SCHEMA",
    "synthesize_media",
    "decode_media_meta",
    "extract_features",
    "sample_frames",
]

_MAGIC = b"BBMM"
KINDS = {0: "image", 1: "audio", 2: "video"}

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("valid", T.BooleanType(), False),
    ]
)


def synthesize_media(doc_id: int, kind: int, width: int, height: int, n_frames: int) -> bytes:
    """Deterministic fake media blob for a doc id."""
    rng = np.random.default_rng(0x4D454449 ^ doc_id)
    payload = rng.integers(0, 256, size=min(width * height, 4096), dtype=np.uint8).tobytes()
    return _MAGIC + struct.pack("<BHHI", kind, width, height, n_frames) + payload


def _parse_header(blob: bytes):
    if blob is None or len(blob) < 13 or blob[:4] != _MAGIC:
        return None
    kind, width, height, n_frames = struct.unpack("<BHHI", blob[4:13])
    return KINDS.get(kind, "unknown"), width, height, n_frames


def decode_media_meta(
    df: DataFrame, media_col: str = "media", decoder: str = "stub"
) -> DataFrame:
    """Add a typed ``media_meta`` struct column parsed from the binary.

    ``decoder='stub'`` raises at execution (no codecs in this container);
    ``decoder='fake'`` parses the synthetic format.  Either way the plan —
    binary column through an Arrow batch, struct output — is the real one.
    """

    from ..session import ensure_workers

    ensure_workers(df.sparkSession)

    @F.pandas_udf(MEDIA_META_SCHEMA)
    def parse(blobs: pd.Series) -> pd.DataFrame:
        if decoder == "stub":
            raise NotImplementedError(
                "media decoding requires an image/audio codec library "
                "(e.g. pillow / torchaudio) not present in this container; "
                "use decoder='fake' for the synthetic format"
            )
        rows = []
        for blob in blobs:
            hdr = _parse_header(bytes(blob) if blob is not None else None)
            nb = len(blob) if blob is not None else 0
            if hdr is None:
                rows.append((None, None, None, None, nb, False))
            else:
                k, w_, h_, nf = hdr
                rows.append((k, w_, h_, nf, nb, True))
        return pd.DataFrame(
            rows, columns=["kind", "width", "height", "n_frames", "n_bytes", "valid"]
        )

    return df.withColumn("media_meta", parse(F.col(media_col)))


def extract_features(
    df: DataFrame, media_col: str = "media", dim: int = 16, decoder: str = "stub"
) -> DataFrame:
    """Add an ``array<float> features`` column (the embed step).

    Fake decoder: deterministic dim-bucket byte histogram of the payload,
    L2-normalized — a stand-in with the exact schema/batch shape a real
    vision/audio encoder UDF would have (model weights would arrive via a
    broadcast, exactly like the categorizer's filter registry).
    """

    from ..session import ensure_workers

    ensure_workers(df.sparkSession)

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def feats(blobs: pd.Series) -> pd.Series:
        if decoder == "stub":
            raise NotImplementedError(
                "feature extraction requires a codec/model library; "
                "use decoder='fake' for the synthetic format"
            )
        out = []
        for blob in blobs:
            if blob is None or _parse_header(bytes(blob)) is None:
                out.append(None)
                continue
            payload = np.frombuffer(bytes(blob), dtype=np.uint8, offset=13)
            hist = np.bincount(payload % dim, minlength=dim).astype(np.float64)
            n = np.linalg.norm(hist)
            out.append((hist / n if n else hist).astype(np.float32))
        return pd.Series(out)

    return df.withColumn("features", feats(F.col(media_col)))


def sample_frames(
    df: DataFrame,
    media_col: str = "media",
    every_n: int = 10,
    decoder: str = "stub",
) -> DataFrame:
    """Explode videos into sampled frame rows (id, frame_no).

    mapInPandas (not a scalar UDF) because output cardinality differs from
    input — one row per sampled frame, the real fan-out shape of a video
    pipeline; the frame *pixels* would come from the codec (stubbed)."""
    from ..session import ensure_workers

    ensure_workers(df.sparkSession)
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("frame_no", T.IntegerType(), False)]
    )
    cols = [f.name for f in df.schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decoder == "stub":
            raise NotImplementedError(
                "frame sampling requires a video codec; use decoder='fake'"
            )
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                hdr = _parse_header(bytes(row[media_col]) if row[media_col] is not None else None)
                if hdr is None or hdr[0] != "video":
                    continue
                for frame in range(0, hdr[3], every_n):
                    rows.append(tuple(row[c] for c in cols) + (frame,))
            if rows:
                yield pd.DataFrame(rows, columns=cols + ["frame_no"])

    return df.mapInPandas(run, schema=out_schema)
