"""Candidate-pair verification — the graft's analog of the reference's
"verify by full digest" final stage
(/root/reference/lib/App/dupfind/Common.pm:154-187): the expensive
check runs last, on the fewest rows.

Verifiers, cheapest-first (the cascade discipline again):

1. `minhash_estimate` — estimated Jaccard = matching fraction of the
   two MinHash signatures.  Pure JVM (zip_with + filter + size) on
   columns already in hand; unbiased estimator with σ ≈ 0.044 at
   num_perm=128.  This is the primary gate (Broder's operating point).
2. `simhash` — bit_count(xor) Hamming gate, for the near-identical
   regime (hamming <= 3 of 64 ≈ cosine > 0.995).  Catches template
   pages whose shingle sets differ more than their weighted bits.
3. exact Jaccard (operators.jaccard) — gold verifier, optional, only
   for borderline pairs (|est - τ| small), because it re-touches text.

J2 in SURVEY §2.5: two hash joins attach each side's signature to the
pair, then the verdict is pure JVM column math — no Python, no text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from app_dupfind_spark.config import DedupConfig
from app_dupfind_spark.functions.hashing import hamming64


def attach_signatures(
    pairs: DataFrame, sigs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Join minhash+simhash of both members onto each candidate pair."""
    sa = sigs.select(
        F.col(id_col).alias("a"),
        F.col("minhash").alias("minhash_a"),
        F.col("simhash").alias("simhash_a"),
    )
    sb = sigs.select(
        F.col(id_col).alias("b"),
        F.col("minhash").alias("minhash_b"),
        F.col("simhash").alias("simhash_b"),
    )
    return pairs.join(sa, "a").join(sb, "b")


def minhash_est_jaccard(sig_a: Column, sig_b: Column) -> Column:
    """Fraction of agreeing MinHash components — unbiased Jaccard
    estimate, computed JVM-side over the signature arrays."""
    matches = F.size(
        F.filter(
            F.zip_with(sig_a, sig_b, lambda x, y: x == y),
            lambda eq: eq,
        )
    )
    return F.round(matches / F.size(sig_a).cast("double"), 6)


def verify_pairs(pairs_with_sigs: DataFrame, cfg: DedupConfig) -> DataFrame:
    """(a, b, est_jaccard, hamming, method) for pairs passing either
    gate.  method = 'minhash' | 'simhash' (minhash wins when both).

    Null-safe (P4 posture): rows lacking a signature cannot be verified
    here and are dropped — such docs are exact-path-only by
    construction (they had no shingles to bucket on).
    """
    est = minhash_est_jaccard(F.col("minhash_a"), F.col("minhash_b"))
    ham = hamming64(F.col("simhash_a"), F.col("simhash_b"))
    out = (
        pairs_with_sigs.where(
            F.col("minhash_a").isNotNull() & F.col("minhash_b").isNotNull()
        )
        .withColumn("est_jaccard", est)
        .withColumn("hamming", ham)
        .withColumn(
            "method",
            F.when(F.col("est_jaccard") >= cfg.jaccard_threshold, F.lit("minhash"))
            .when(F.col("hamming") <= cfg.simhash_max_hamming, F.lit("simhash")),
        )
        .where(F.col("method").isNotNull())
    )
    return out.select("a", "b", "est_jaccard", "hamming", "method")


def simhash_verify(pairs_with_sigs: DataFrame, cfg: DedupConfig) -> DataFrame:
    """SimHash-only gate (near-identical regime), kept as a standalone
    operator for the simhash query surface."""
    h = hamming64(F.col("simhash_a"), F.col("simhash_b"))
    return (
        pairs_with_sigs.withColumn("hamming", h)
        .where(
            F.col("simhash_a").isNotNull()
            & F.col("simhash_b").isNotNull()
            & (F.col("hamming") <= cfg.simhash_max_hamming)
        )
        .select("a", "b", "hamming", F.lit("simhash").alias("method"))
    )


def verified_pairs(
    candidates: DataFrame,
    sigs: DataFrame,
    cfg: DedupConfig,
    id_col: str = "doc_id",
    exact_jaccard: DataFrame | None = None,
) -> DataFrame:
    """Full verification: attach signatures, gate, optionally union
    exact-Jaccard confirmations (reference precedent for the re-merge:
    Common.pm:107 re-inserts the bypass branch)."""
    out = verify_pairs(attach_signatures(candidates, sigs, id_col), cfg)
    if exact_jaccard is not None:
        jac = exact_jaccard.select(
            "a",
            "b",
            F.col("jaccard").alias("est_jaccard"),
            F.lit(None).cast("int").alias("hamming"),
            F.lit("jaccard").alias("method"),
        )
        out = out.unionByName(jac).dropDuplicates(["a", "b"])
    return out
