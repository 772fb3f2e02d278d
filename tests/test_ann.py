"""Embedding similarity: brute-force top-k vs numpy oracle, near-dup
pairs, LSH-bucketed recall."""

from __future__ import annotations

import numpy as np
import pytest

from app_dupfind_spark.operators import ann


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(11)
    # three tight clusters + noise: near-dup structure is controlled
    centers = rng.standard_normal((3, 16))
    rows = []
    vid = 0
    for ci in range(3):
        for _ in range(5):
            v = centers[ci] + 0.05 * rng.standard_normal(16)
            rows.append((vid, [float(x) for x in v], ci))
            vid += 1
    for _ in range(15):
        rows.append((vid, [float(x) for x in rng.standard_normal(16)], -1))
        vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    return df, rows


def _np_cosine(a, b):
    a, b = np.asarray(a, dtype=np.float64), np.asarray(b, dtype=np.float64)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_topk_matches_numpy(spark, vecs):
    df, rows = vecs
    k = 4
    out = ann.cosine_topk(df, df.where("vec_id < 5"), k)
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    # float32->float64 casting on the Spark side mirrors numpy here
    emb = {vid: np.asarray(v, dtype=np.float32).astype(np.float64) for vid, v, _ in rows}
    for q in range(5):
        scored = sorted(
            (
                (-round(_np_cosine(emb[q], emb[n]), 6), n)
                for n in emb
                if n != q
            ),
        )[:k]
        want = [(i + 1, n) for i, (_, n) in enumerate(scored)]
        assert sorted(got[q]) == want, q


def test_near_dup_pairs_find_cluster_members(spark, vecs):
    df, rows = vecs
    pairs = ann.embedding_near_dup_pairs(df, 0.9).collect()
    got = {(r["a"], r["b"]) for r in pairs}
    # all intra-cluster pairs (cosine ~0.99) must be found
    want = {
        (a, b)
        for a in range(15)
        for b in range(15)
        if a < b and a // 5 == b // 5
    }
    assert want <= got
    # noise vectors shouldn't pair with anything at 0.9
    noise = {vid for vid, _, lbl in rows if lbl == -1}
    assert not [p for p in got if p[0] in noise or p[1] in noise]


def test_lsh_bucketed_recall(spark, vecs):
    df, rows = vecs
    exact = {(r["a"], r["b"]) for r in ann.embedding_near_dup_pairs(df, 0.9).collect()}
    approx = {
        (r["a"], r["b"])
        for r in ann.lsh_bucketed_neighbors(df, 0.9, bits=4, seed=42, dim=16).collect()
    }
    assert approx <= exact  # no false positives vs exact
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.5, recall  # 4-bit code, tight clusters survive


def test_lsh_code_deterministic_across_partitionings(spark, vecs):
    df, _ = vecs
    from pyspark.sql import functions as F

    udf = ann.make_hyperplane_lsh_udf(16, 8, 42)
    a = {r["vec_id"]: r["c"] for r in df.repartition(1).select("vec_id", udf(F.col("embedding")).alias("c")).collect()}
    b = {r["vec_id"]: r["c"] for r in df.repartition(7).select("vec_id", udf(F.col("embedding")).alias("c")).collect()}
    assert a == b
