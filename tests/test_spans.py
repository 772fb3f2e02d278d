"""Span stage: long-shingle candidates + LCS verification."""

from __future__ import annotations

from pyspark.sql import functions as F

from app_dupfind_spark.config import DedupConfig
from app_dupfind_spark.operators.spans import shared_span_pairs, span_candidates


def test_span_pairs_found_and_borders_rejected(spark, pages, corpus):
    cfg = DedupConfig()
    cand = span_candidates(pages, cfg, "url", "text")
    out = shared_span_pairs(cand, pages, cfg.min_span_chars, "url", "text")
    got = {(r["a"], r["b"]) for r in out.collect()}
    want = corpus.pair_set({"span"})
    assert want <= got
    border = {u for u, k in corpus.kinds.items() if k == "border"}
    assert not [p for p in got if p[0] in border and p[1] in border]


def test_lcs_length_exact(spark):
    span = "S " * 150  # 300 chars
    a = "aa bb " * 30 + span + "cc dd " * 30
    b = "ee ff " * 25 + span + "gg hh " * 35
    docs = spark.createDataFrame([("u1", a), ("u2", b)], "id string, text string")
    pairs = spark.createDataFrame([("u1", "u2")], "a string, b string")
    rows = shared_span_pairs(pairs, docs, 100, "id", "text").collect()
    assert len(rows) == 1
    # the shared span plus one trailing space boundary
    assert rows[0]["lcs_len"] >= 299


def test_mod_sampling_thins_index(spark, pages):
    full = span_candidates(pages, DedupConfig(span_sample_mod=1), "url", "text")
    thin = span_candidates(pages, DedupConfig(span_sample_mod=4), "url", "text")
    f, t = full.count(), thin.count()
    assert t <= f


def test_boilerplate_df_cap(spark):
    # 50 docs all containing the same 20-word run: df cap must drop it
    run = " ".join(f"w{i}" for i in range(25))
    docs = spark.createDataFrame(
        [(f"u{i:02d}", f"unique{i} " * 5 + run) for i in range(50)],
        "id string, text string",
    )
    cand = span_candidates(
        docs, DedupConfig(), "id", "text", max_shingle_df=10
    )
    assert cand.count() == 0
