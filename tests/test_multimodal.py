"""Multimodal plumbing: schema, determinism, stub behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from app_dupfind_spark.operators.multimodal import (
    FEATURE_DIM,
    _decode_real,
    asset_metadata,
    extract_features,
)


@pytest.fixture(scope="module")
def assets(spark):
    rows = [(i, bytes([i % 256]) * (10 + i * 7), "image/png") for i in range(20)]
    return spark.createDataFrame(rows, "asset_id long, asset binary, media_type string")


def test_metadata_jvm_only(spark, assets):
    out = asset_metadata(assets).collect()
    for r in out:
        assert r["n_bytes"] == len(r["asset"])
        assert r["magic"] == r["asset"][:4].hex().upper()


def test_feature_extraction_schema_and_shape(spark, assets):
    out = extract_features(assets)
    assert [f.name for f in out.schema.fields] == [
        "asset_id", "media_type", "n_bytes", "features",
    ]
    rows = out.collect()
    assert len(rows) == 20
    for r in rows:
        assert len(r["features"]) == FEATURE_DIM


def test_features_partition_invariant(spark, assets):
    a = {r["asset_id"]: list(r["features"]) for r in extract_features(assets.repartition(1)).collect()}
    b = {r["asset_id"]: list(r["features"]) for r in extract_features(assets.repartition(6)).collect()}
    assert a == b


def _wav_bytes(freq_steps: int = 40, n: int = 2000, rate: int = 8000) -> bytes:
    """Deterministic 16-bit mono WAV: a square-ish wave built with
    stdlib only (no audio lib needed to ENCODE either)."""
    import io
    import struct
    import wave as wave_mod

    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        samples = [
            10000 if (i // freq_steps) % 2 == 0 else -10000 for i in range(n)
        ]
        w.writeframes(struct.pack(f"<{n}h", *samples))
    return buf.getvalue()


def test_real_decoder_wav_path(spark):
    """The audio branch of the REAL kernel runs end-to-end through the
    Spark plumbing in this container (stdlib wave decoder)."""
    raw = _wav_bytes()
    direct = _decode_real(raw, "audio/wav")
    assert len(direct) == FEATURE_DIM
    assert direct[0] == 1.0 and direct[1] == 8000.0 and direct[2] == 2000.0
    assert direct[7] == 10000.0 and direct[6] == -10000.0
    df = spark.createDataFrame(
        [(1, raw, "audio/wav"), (2, _wav_bytes(freq_steps=25), "audio/wav")],
        "asset_id long, asset binary, media_type string",
    )
    rows = {
        r["asset_id"]: list(r["features"])
        for r in extract_features(df, use_fake_decoder=False).collect()
    }
    assert rows[1] == direct           # Spark path == direct kernel call
    assert rows[1] != rows[2]          # content-sensitive


def test_real_decoder_image_path_with_pillow(spark):
    """Image branch, gated on Pillow presence (the Iceberg-jar test
    pattern): wherever the lib exists this runs for real; elsewhere it
    skips instead of lying."""
    Image = pytest.importorskip("PIL.Image")
    import io

    import numpy as np

    arr = np.zeros((8, 12), dtype=np.uint8)
    arr[:4, :6] = 200                   # bright top-left quadrant
    buf = io.BytesIO()
    Image.fromarray(arr, mode="L").save(buf, format="PNG")
    raw = buf.getvalue()
    direct = _decode_real(raw, "image/png")
    assert direct[:2] == [12.0, 8.0]
    assert direct[4] == 200.0 and direct[7] == 0.0
    df = spark.createDataFrame(
        [(1, raw, "image/png")],
        "asset_id long, asset binary, media_type string",
    )
    rows = extract_features(df, use_fake_decoder=False).collect()
    assert list(rows[0]["features"]) == direct


def test_real_decoder_unwired_media_is_explicit():
    with pytest.raises(NotImplementedError, match="no decoder wired"):
        _decode_real(b"bytes", "video/mp4")
