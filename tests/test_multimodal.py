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


def test_real_decoder_is_explicit_stub():
    with pytest.raises(NotImplementedError, match="codec decode"):
        _decode_real(b"bytes", "image/png")
