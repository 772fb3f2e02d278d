"""Multimodal (image/audio/video) column plumbing.

Assets are opaque `binary` columns plus typed metadata.  The Spark-side
contract — schema, Arrow batch shape, partition-stability — is real and
tested; the codec kernels themselves are STUBS behind
`NotImplementedError` (the decode libraries are not in this container)
with a deterministic fake for plumbing tests.

asset schema:  asset: binary, media_type: string
meta schema:   n_bytes: long, magic: string (hex of first 4 bytes),
               sha-free content id: xxhash64(asset)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_DIM = 8

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def asset_metadata(df: DataFrame, asset_col: str = "asset") -> DataFrame:
    """JVM-only typed metadata over the binary column: byte length,
    magic prefix, 64-bit content id.  No decode, no Python."""
    return df.withColumns(
        {
            "n_bytes": F.octet_length(F.col(asset_col)).cast("long"),
            "magic": F.hex(F.substring(F.col(asset_col), 1, 4)),
            "content_id": F.xxhash64(F.col(asset_col)),
        }
    )


def _decode_real(raw: bytes, media_type: str):
    raise NotImplementedError(
        "codec decode requires an image/audio library not present in this "
        "container; wire Pillow/torchaudio/pyav here on a real cluster"
    )


def _decode_fake(raw: bytes, media_type: str) -> list[float]:
    """Deterministic stand-in: FEATURE_DIM floats derived from byte
    statistics — stable across partitionings and retries.

    Every value is INTEGER-valued (exact in float32 below 2^24) so the
    driver's 6dp float canonicalization and the DuckDB oracle agree
    bit-for-bit: feature j = sum(raw[j::8]) mod 997 (byte-content
    dependent — asserts the Arrow binary path carries the exact bytes),
    feature 0 = len mod 100000."""
    if raw is None:
        raw = b""
    n = len(raw)
    out = []
    for j in range(FEATURE_DIM):
        sl = raw[j::FEATURE_DIM]
        out.append(float(sum(sl) % 997) if sl else 0.0)
    out[0] = float(n % 100000)
    return out


def extract_features(
    df: DataFrame,
    id_col: str = "asset_id",
    asset_col: str = "asset",
    media_col: str = "media_type",
    use_fake_decoder: bool = True,
) -> DataFrame:
    """mapInPandas feature extraction: the real Spark plumbing (Arrow
    batches in, bounded by arrow.maxRecordsPerBatch; typed struct out)
    around the stubbed codec kernel."""
    decode = _decode_fake if use_fake_decoder else _decode_real
    cols = df.select(
        F.col(id_col).alias("asset_id"),
        F.col(media_col).alias("media_type"),
        F.col(asset_col).alias("asset"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode(raw, mt)
                for raw, mt in zip(pdf["asset"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(r) if r is not None else 0 for r in pdf["asset"]],
                    "features": feats,
                }
            )

    return cols.mapInPandas(run, FEATURE_SCHEMA)
