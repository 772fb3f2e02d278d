"""Exact n-gram Jaccard join vs a python set oracle."""

from __future__ import annotations

import re

from app_dupfind_spark.operators.jaccard import jaccard_pairs


def _shingles(s: str, k: int) -> set[str]:
    toks = [t for t in re.sub(r"\s+", " ", s.lower()).strip().split(" ") if t]
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def test_jaccard_pairs_match_python_oracle(spark, pages, corpus):
    k, tau = 5, 0.5
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in jaccard_pairs(pages, k, tau, "url", "text").collect()
    }
    texts = {r["url"]: r["text"] for r in corpus.rows}
    urls = sorted(texts)
    want = {}
    sh = {u: _shingles(texts[u], k) for u in urls}
    for i, a in enumerate(urls):
        for b in urls[i + 1 :]:
            if not sh[a] or not sh[b]:
                continue
            inter = len(sh[a] & sh[b])
            if inter == 0:
                continue
            j = inter / (len(sh[a]) + len(sh[b]) - inter)
            if round(j, 6) >= tau:
                want[(a, b)] = round(j, 6)
    assert got == want


def test_df_cap_drops_boilerplate_pairs(spark):
    run = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(f"u{i:02d}", run) for i in range(30)], "id string, text string"
    )
    capped = jaccard_pairs(docs, 5, 0.5, "id", "text", max_shingle_df=5)
    assert capped.count() == 0


def test_exact_jaccard_for_pairs_matches_full_join(spark, pages):
    """The pair-targeted verifier must agree exactly with the full
    inverted-index join on every pair it is asked about."""
    from pyspark.sql import functions as F

    from app_dupfind_spark.operators.jaccard import exact_jaccard_for_pairs

    k = 5
    full = {
        (r["a"], r["b"]): (r["n_common"], r["n_a"], r["n_b"], r["jaccard"])
        for r in jaccard_pairs(pages, k, 0.2, "url", "text").collect()
    }
    assert full  # non-vacuous
    pair_df = spark.createDataFrame(
        [(a, b) for a, b in full], "a string, b string"
    )
    targeted = {
        (r["a"], r["b"]): (r["n_common"], r["n_a"], r["n_b"], r["jaccard"])
        for r in exact_jaccard_for_pairs(pair_df, pages, k, "url", "text").collect()
    }
    assert targeted == full


def test_exact_jaccard_for_pairs_drops_zero_overlap(spark):
    docs = spark.createDataFrame(
        [("a", "one two three four five six"),
         ("b", "seven eight nine ten eleven twelve"),
         ("c", "one two three four five six extra")],
        "id string, text string",
    )
    from app_dupfind_spark.operators.jaccard import exact_jaccard_for_pairs

    pairs = spark.createDataFrame([("a", "b"), ("a", "c")], "a string, b string")
    got = {(r["a"], r["b"]) for r in exact_jaccard_for_pairs(pairs, docs, 5, "id", "text").collect()}
    assert got == {("a", "c")}  # (a,b) share nothing -> absent == rejected
