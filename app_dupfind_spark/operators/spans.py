"""Long-shared-span detection (suffix-array substring stage, M5).

For candidate pairs that failed whole-doc similarity but may share a
long verbatim span (quotes, syndicated passages), compute the longest
common substring and keep pairs with LCS >= min_span_chars.

Execution shape: the pair list (small — post-LSH survivors only) joins
each side's text, then a `mapInPandas` computes LCS per Arrow batch.
The per-pair check is inherently algorithmic (not expressible as a
column expression); the kernel is a numpy double-rolling-hash binary
search over the span length — O(n log n) per pair, ~100x faster than a
quadratic DP and exact up to ~2^-60 hash-collision odds.  A
pydivsufsort-style suffix array drops in behind the same `_lcs_len`
interface when available.

Scale: this stage NEVER sees the corpus — only verified-candidate
pairs, the reference's "expensive verify last, on the fewest rows"
posture (Common.pm:112-204).  Texts are capped at `max_chars` before
the quadratic kernel.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StructField,
    StructType,
)

from app_dupfind_spark.config import DedupConfig
from app_dupfind_spark.functions.text import token_hashes, window_hashes
from app_dupfind_spark.plans.barriers import materialize_barrier
from app_dupfind_spark.plans.partitioning import ensure_min_partitions


def span_candidates(
    df: DataFrame,
    cfg: DedupConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int = 100,
) -> DataFrame:
    """Candidate pairs for the span stage: docs sharing at least one
    LONG word shingle (span_shingle_words-gram).

    Recall contract (calibrated, not absolute): a shared verbatim span
    of >= min_span_chars contains a full window of span_shingle_words
    words PROVIDED the span covers that many whole words — i.e.
    min_span_chars >= span_shingle_words * (max_word_len + 1).  For web
    text (mean word ~5-6 chars) the default (200 chars / 20 words)
    holds for words up to 9 chars; spans made of longer words, or spans
    beyond cfg.span_max_chars (both sides index and LCS over the SAME
    truncated prefix), can be missed.  With span_sample_mod = s > 1
    only shingles with xxhash64 % s == 0 enter the index —
    winnowing-style thinning whose miss probability decays
    geometrically in span length (scale path; every config is pinned).

    Boilerplate guard: shingles present in > max_shingle_df docs are
    dropped (a 20-word run shared by hundreds of docs is template text).
    """
    # windows hashed over the token-hash array via scalar element_at
    # reads (see functions.text.window_hashes PERF CONTRACT) — never
    # materializing window strings or per-window arrays
    w = cfg.span_shingle_words
    # parallelism guard (small inputs arrive single-partition and the
    # interpreted window work would serialize)
    df = ensure_min_partitions(
        df, df.sparkSession.sparkContext.defaultParallelism, id_col
    )
    # index over the SAME truncated prefix the LCS kernel sees
    capped = F.substring(F.col(text_col), 1, cfg.span_max_chars)
    wh = window_hashes(F.col("__th"), w)
    if cfg.span_sample_mod > 1:
        # winnowing sample INSIDE the array (one JVM filter over the
        # bound hashes) so the barrier below stores only kept windows
        wh = F.filter(
            wh, lambda h: F.pmod(h, F.lit(cfg.span_sample_mod)) == 0
        )
    # (window_hashes is array_distinct per doc — hashes arrive unique,
    # no extra distinct shuffle needed.)  The index fans out twice
    # (dfreq + the member probe): bind the PER-DOC ARRAYS behind the
    # barrier (r6, same shape as doc_shingles/minhash_lsh) — one row
    # per doc instead of one per window, the interpreted window pass
    # runs once, and consumers replay a cheap explode.  The explode
    # must sit AFTER the barrier: unbarriered, the inferred
    # size(..)>0 filter would push the HOF below the repartition and
    # serialize it (the q_minhash_signatures hazard).
    arr = materialize_barrier(
        df.select(
            F.col(id_col).alias("id"), token_hashes(capped).alias("__th")
        ).select("id", wh.alias("__wh")),
        cfg,
    )
    sh = arr.select("id", F.explode("__wh").alias("sh"))
    # pair generation in the LSH 'arrays' shape (minhash_lsh.py, r6):
    # sizes first (map-side-combined aggregate), then each surviving
    # shingle's sorted member array streams i<j pairs from one nested
    # JVM explode.  vs the former index self-join this removes the
    # second full read of the index plus the shuffled self-join of
    # df^2 rows (measured 2.7-4.9 s -> ~2.3 s on the 50k point).  The
    # collect_list buffer is bounded by max_shingle_df (the sizes
    # semi-join runs BEFORE any array aggregates), and sort_array
    # makes a < b free — same skew contract as the LSH bucket path.
    sizes = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    member = sh.join(
        sizes.where(
            (F.col("df") >= 2) & (F.col("df") <= max_shingle_df)
        ).select("sh"),
        "sh",
    )
    arrays = member.groupBy("sh").agg(
        F.sort_array(F.collect_list("id")).alias("ms")
    )
    return (
        arrays.select("ms", F.posexplode("ms").alias("i", "a"))
        .select(
            "a",
            # slice is 1-based: elements strictly after 0-based index i
            F.explode(
                F.slice("ms", F.col("i") + F.lit(2), F.size("ms"))
            ).alias("b"),
        )
        .distinct()
    )


# double polynomial rolling hash: collisions ~2^-60 per comparison, so
# the reported length equals the true LCS length for all practical
# purposes (and is never under-reported below min_len)
_P1, _B1 = (1 << 31) - 1, 131
_P2, _B2 = 1073741789, 137

# power / inverse-power tables per (B, P), grown on demand and cached
# per python worker — makes every window-hash evaluation a pure O(n)
# numpy expression with no python-level loop
_TABLES: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}


def _tables(B: int, P: int, n: int) -> tuple[np.ndarray, np.ndarray]:
    pw, inv = _TABLES.get((B, P), (None, None))
    if pw is None or pw.size < n:
        size = max(n, 1 << 12)
        pw = np.empty(size, dtype=np.int64)
        iv = np.empty(size, dtype=np.int64)
        binv = pow(B, P - 2, P)
        v = w = 1
        for i in range(size):
            pw[i], iv[i] = v, w
            v = (v * B) % P
            w = (w * binv) % P
        _TABLES[(B, P)] = (pw, iv)
        return pw, iv
    return pw, inv


def _codes(s: str) -> np.ndarray:
    return np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)


def _prefix(c: np.ndarray, B: int, P: int) -> np.ndarray:
    """S[i] = sum_{j<i} c[j]*B^j — EXACT int64 (terms < 2^31, so up to
    ~2^31 chars stay within int64); window hash derives from S by
    subtraction + one modular multiply."""
    pw, _ = _tables(B, P, c.size + 1)
    a = (pw[: c.size] * (c % P)) % P
    s = np.empty(c.size + 1, dtype=np.int64)
    s[0] = 0
    np.cumsum(a, out=s[1:])
    return s


def _window_keys_from_prefix(
    s1: np.ndarray, s2: np.ndarray, L: int
) -> np.ndarray:
    _, iv1 = _tables(_B1, _P1, s1.size)
    _, iv2 = _tables(_B2, _P2, s2.size)
    n_win = s1.size - L
    d1 = (s1[L:] - s1[:-L]) % _P1
    d2 = (s2[L:] - s2[:-L]) % _P2
    h1 = (d1 * iv1[:n_win]) % _P1
    h2 = (d2 * iv2[:n_win]) % _P2
    return (h1 << np.int64(31)) | h2


def _has_common(px, py, L: int) -> bool:
    if L <= 0 or L >= px[0].size or L >= py[0].size:
        return False
    kx = _window_keys_from_prefix(px[0], px[1], L)
    ky = _window_keys_from_prefix(py[0], py[1], L)
    return np.intersect1d(kx, ky).size > 0


def _lcs_len(x: str, y: str, min_len: int = 1) -> int:
    """Longest common substring length, certified by double rolling
    hash; returns 0 early when no common substring reaches min_len
    (the gate), else binary-searches the exact maximum (common-substring
    existence is monotone in L)."""
    cx, cy = _codes(x), _codes(y)
    hi_cap = min(cx.size, cy.size)
    if min_len > hi_cap or min_len < 1:
        return 0
    px = (_prefix(cx, _B1, _P1), _prefix(cx, _B2, _P2))
    py = (_prefix(cy, _B1, _P1), _prefix(cy, _B2, _P2))
    if not _has_common(px, py, min_len):
        return 0
    lo, hi = min_len, hi_cap  # invariant: common substring of len lo exists
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if _has_common(px, py, mid):
            lo = mid
        else:
            hi = mid - 1
    return lo


def shared_span_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    min_span_chars: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_chars: int = 20_000,
) -> DataFrame:
    """(a, b, lcs_len) for pairs whose longest common substring is at
    least min_span_chars."""
    ta = docs.select(
        F.col(id_col).alias("a"),
        F.substring(F.col(text_col), 1, max_chars).alias("text_a"),
    )
    tb = docs.select(
        F.col(id_col).alias("b"),
        F.substring(F.col(text_col), 1, max_chars).alias("text_b"),
    )
    joined = pairs.select("a", "b").join(ta, "a").join(tb, "b")
    # spread the Python LCS kernel across the pool — the pair table is
    # small enough that AQE would otherwise coalesce it onto one core
    joined = joined.repartition(
        max(joined.sparkSession.sparkContext.defaultParallelism, 8), "a", "b"
    )

    out_schema = StructType(
        [f for f in joined.schema.fields if f.name in ("a", "b")]
        + [StructField("lcs_len", IntegerType())]
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lens = [
                _lcs_len(x or "", y or "", min_span_chars)
                for x, y in zip(pdf["text_a"], pdf["text_b"])
            ]
            yield pd.DataFrame(
                {"a": pdf["a"], "b": pdf["b"], "lcs_len": pd.array(lens, dtype="int32")}
            )

    return (
        joined.mapInPandas(compute, out_schema)
        .where(F.col("lcs_len") >= min_span_chars)
    )
