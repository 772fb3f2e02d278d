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

    @F.pandas_udf(ArrayType(LongType()))
    def minhash_sig(hashes: pd.Series) -> pd.Series:
        out = []
        for h in hashes:
            if h is None or len(h) == 0:
                out.append(None)
                continue
            # fold the 64-bit shingle hash into [0, p): cheap, uniform
            x = np.asarray(h, dtype=np.int64) % MINHASH_PRIME  # may be <0
            x = np.where(x < 0, x + MINHASH_PRIME, x)
            # (num_perm, n_shingles) outer product stays < 2^62
            sig = ((a[:, None] * x[None, :] + b[:, None]) % MINHASH_PRIME).min(axis=1)
            out.append(sig)
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
        shifts = np.arange(64, dtype=np.uint64)
        out = np.zeros(len(hashes), dtype=np.int64)
        valid = np.zeros(len(hashes), dtype=bool)
        for i, h in enumerate(hashes):
            if h is None or len(h) == 0:
                continue
            x = np.asarray(h, dtype=np.int64).astype(np.uint64)
            bits = ((x[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
            counts = (2 * bits - 1).sum(axis=0)
            word = np.uint64(0)
            for j in np.nonzero(counts > 0)[0]:
                word |= np.uint64(1) << np.uint64(j)
            out[i] = word.astype(np.int64)
            valid[i] = True
        return pd.Series(np.where(valid, out, None), dtype="object").astype("Int64")

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
