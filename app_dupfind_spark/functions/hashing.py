"""Signature math: MinHash + SimHash (vectorized pandas/Arrow UDFs) and
LSH band hashing (pure JVM expressions).

The JVM side produces the 64-bit shingle-hash universe once
(functions.text.shingle_hashes — built-in xxhash64 inside transform());
the Python side is numpy-only integer math over those arrays, crossing
the boundary in Arrow batches.  No strings ever cross into Python and
nothing is per-row Python.

Determinism: permutations are derived from a seeded numpy Generator at
UDF-definition time (config.seed), independent of partitioning, task
retries, and row order — a hard requirement for resumable checkpoints
and the recall-vs-oracle metric.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from app_dupfind_spark.config import MINHASH_PRIME, DedupConfig


def _minhash_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) permutation parameters: h_i(x) = (a_i * x + b_i) mod p,
    a in [1, p), b in [0, p).  int64 throughout: a,x < 2^31 => a*x < 2^62."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MINHASH_PRIME, size=num_perm, dtype=np.int64)
    b = rng.integers(0, MINHASH_PRIME, size=num_perm, dtype=np.int64)
    return a, b


def make_minhash_udf(cfg: DedupConfig):
    """pandas UDF: array<long> shingle hashes -> array<long> MinHash
    signature of length cfg.num_perm; NULL for rows with no shingles
    (short docs ride the exact-only path)."""
    a, b = _minhash_params(cfg.num_perm, cfg.seed)
    num_perm = cfg.num_perm
    # chunk the permutation axis so the (chunk, total_shingles) work
    # matrix stays ~10 MB regardless of Arrow batch size (cache- and
    # allocator-friendly across 32 concurrent workers)
    perm_chunk = max(1, min(num_perm, 16))

    @F.pandas_udf(ArrayType(LongType()))
    def minhash_sig(hashes: pd.Series) -> pd.Series:
        n = len(hashes)
        lengths = np.fromiter(
            (0 if h is None else len(h) for h in hashes), dtype=np.int64, count=n
        )
        valid = lengths > 0
        if not valid.any():
            return pd.Series([None] * n)
        # flatten ALL shingle hashes of the batch: one numpy kernel per
        # permutation chunk + minimum.reduceat at row offsets — no
        # per-row Python loop
        flat = np.concatenate(
            [np.asarray(h, dtype=np.int64) for h in hashes if h is not None and len(h)]
        )
        x = flat % MINHASH_PRIME
        np.add(x, MINHASH_PRIME, out=x, where=x < 0)
        starts = np.zeros(int(valid.sum()), dtype=np.int64)
        np.cumsum(lengths[valid][:-1], out=starts[1:])
        sig_valid = np.empty((starts.size, num_perm), dtype=np.int64)
        for c0 in range(0, num_perm, perm_chunk):
            c1 = min(c0 + perm_chunk, num_perm)
            # (chunk, total_shingles); a*x+b < 2^62 — safe in int64
            hm = (a[c0:c1, None] * x[None, :] + b[c0:c1, None]) % MINHASH_PRIME
            sig_valid[:, c0:c1] = np.minimum.reduceat(hm, starts, axis=1).T
        out = np.empty(n, dtype=object)
        for j, i in enumerate(np.nonzero(valid)[0]):
            out[i] = sig_valid[j]
        return pd.Series(out)

    return minhash_sig


def make_simhash_udf(cfg: DedupConfig):
    """pandas UDF: array<long> shingle hashes -> 64-bit SimHash.

    Classic Charikar sign-sum: bit j of the result is 1 iff the sum over
    features of (bit j present ? +1 : -1) is positive.  Vectorized as a
    (n_features, 64) bit matrix per row.
    """

    @F.pandas_udf(LongType())
    def simhash(hashes: pd.Series) -> pd.Series:
        n = len(hashes)
        lengths = np.fromiter(
            (0 if h is None else len(h) for h in hashes), dtype=np.int64, count=n
        )
        valid = lengths > 0
        if not valid.any():
            return pd.Series([None] * n, dtype="Int64")
        shifts = np.arange(64, dtype=np.uint64)
        flat = np.concatenate(
            [np.asarray(h, dtype=np.int64) for h in hashes if h is not None and len(h)]
        ).astype(np.uint64)
        # (total_shingles, 64) sign matrix, summed per row via reduceat
        bits = ((flat[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
        signs = 2 * bits - 1
        starts = np.zeros(int(valid.sum()), dtype=np.int64)
        np.cumsum(lengths[valid][:-1], out=starts[1:])
        counts = np.add.reduceat(signs, starts, axis=0)  # (n_valid, 64)
        # pack: set bits are disjoint powers of two — exact uint64 sum
        powers = (np.uint64(1) << shifts)
        words = ((counts > 0).astype(np.uint64) * powers[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        out = np.empty(n, dtype=object)
        out[valid] = list(words.astype(np.int64))
        out[~valid] = None
        return pd.Series(out, dtype="Int64")

    return simhash


def band_hashes(sig: Column, bands: int, rows: int) -> Column:
    """LSH band hashes, pure JVM: hash each r-slice of the signature
    together with its band index (so identical slices in different bands
    never collide).  xxhash64 accepts array columns natively."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda i: F.xxhash64(F.slice(sig, i * rows + 1, rows), i),
    )


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures: bit_count(a^b),
    JVM built-in (Spark 3.5+)."""
    return F.bit_count(a.bitwiseXOR(b))
