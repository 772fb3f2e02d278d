"""Similarity search over embedding columns.

Three paths, per the training-data-pipeline requirements:

1. `cosine_topk` — brute-force exact top-k of a (small, broadcast)
   query set against the corpus.  JVM-only math (zip_with/aggregate),
   the corpus side streams through one codegen stage; the only shuffle
   is the final per-query top-k window, which is tiny (corpus_rows ×
   |queries| never materializes — the broadcast nested-loop join emits
   and filters in-line... practically: |queries| must be small, that is
   the contract of the brute-force baseline).

2. `embedding_near_dup_pairs` — EXACT all-pairs cosine join.  All-pairs
   is inherently O(n²) compute; the scale question is only how that
   work is laid out.  With `n_blocks=B` the rows are hashed into B
   blocks and the join runs over the B(B+1)/2 block pairs as an
   equi-join on the target block — every task gets an equal (n/B)²
   chunk, nothing is broadcast, no single straggler task holds the
   whole cartesian (the plan the naive crossJoin degenerates into).
   Use this for exact small/medium-n verification; at web scale the
   exact all-pairs is the oracle baseline, not the production path.

3. `banded_lsh_neighbors` — the scale path: banded random-hyperplane
   (sign) LSH.  Each vector gets `bands` codes of `rows_per_band` sign
   bits; two vectors are candidates if they share any band's bucket
   (multi-probe optionally also probes all single-bit flips of each
   band code).  Candidates are exact-cosine re-ranked within buckets,
   so precision is exact and only recall is approximate — the same
   shape as the MinHash/LSH text path (operators/minhash_lsh.py).
   Buckets above `bucket_cap` are dropped from pair generation and
   REPORTED (skew report), mirroring minhash_lsh.py:118-160: a
   mega-bucket at web scale is a degenerate direction (zero vectors,
   boilerplate embeddings) and m² pair explosion from one key is the
   classic straggler.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from app_dupfind_spark.functions.vectors import as_double_array, dot, l2_norm
from app_dupfind_spark.plans.barriers import materialize_barrier


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 100_000,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self-match excluded).

    Returns (query_id, neighbor_id, rank, cos_sim) with cos_sim rounded
    to 6dp; ties broken by neighbor_id (deterministic).

    Plan: the (small, capped) query matrix rides to every task and the
    corpus streams through ONE mapInPandas GEMM pass that emits only
    each batch's top-k per query under the EXACT final metric; a tiny
    global window then merges batch winners into the true top-k.  An
    interpreted per-pair `dot` join measured 8x slower at 20k corpus
    vectors.  Parity (ADVICE r4): GEMM pre-selects a candidate BAND —
    every row whose 6dp-rounded GEMM sim is within one rounding
    quantum of the k-th best (|round6(gemm) - round6(seq-fold)| <=
    1e-6, so nothing outside the band can reach the final top-k; a
    fixed +8 margin could drop quantum-tied low ids when many
    near-identical vectors crowd the boundary — the normal dedup-corpus
    case).  Band survivors then recompute dot/norms in strict
    sequential cumsum order (bit-identical to the JVM fold / DuckDB)
    and the batch applies the final (rounded sim desc, id asc) order
    itself, so batch-local top-k IS globally sufficient."""
    q_rows = (
        queries.select(
            F.col(id_col).alias("qid"),
            as_double_array(F.col(vec_col)).alias("qv"),
        )
        .limit(max_queries + 1)
        .collect()
    )
    if len(q_rows) > max_queries:
        raise ValueError(
            f"queries side exceeds max_queries={max_queries}; "
            "broadcasting the query matrix is the whole plan — split "
            "the query set or use the LSH/IVF paths"
        )
    qids = np.array([r["qid"] for r in q_rows])
    Q = np.stack([np.asarray(r["qv"], dtype=np.float64) for r in q_rows])
    nq_gemm = np.sqrt(np.einsum("ij,ij->i", Q, Q))
    nq_seq = np.sqrt(np.cumsum(Q * Q, axis=1)[:, -1])

    id_type = [f for f in corpus.select(F.col(id_col)).schema.fields][0]
    out_schema = StructType(
        [
            StructField("query_id", id_type.dataType),
            StructField("neighbor_id", id_type.dataType),
            StructField("cos_sim", DoubleType()),
        ]
    )

    def score(it):
        for pdf in it:
            if pdf.empty:
                continue
            V = np.stack(pdf["cv"].to_numpy()).astype(np.float64)
            ids = pdf["cid"].to_numpy()
            nv = np.sqrt(np.einsum("ij,ij->i", V, V))
            sims = (V @ Q.T) / np.outer(nv, nq_gemm)
            sims[ids[:, None] == qids[None, :]] = -np.inf   # self-match
            nv_seq = np.sqrt(np.cumsum(V * V, axis=1)[:, -1])
            out_q, out_n, out_c = [], [], []
            for j in range(len(qids)):
                # candidate BAND under 6dp-rounded GEMM sims: everything
                # within one rounding quantum of the k-th best (2.5e-6
                # = 1 quantum GEMM-vs-fold slack + float-compare fuzz)
                r = np.round(sims[:, j], 6)
                order0 = np.lexsort((ids, -r))
                order0 = order0[np.isfinite(sims[order0, j])]
                if len(order0) == 0:
                    continue
                if len(order0) > k:
                    band = order0[r[order0] >= r[order0[k - 1]] - 2.5e-6]
                else:
                    band = order0
                num = np.cumsum(V[band] * Q[j], axis=1)[:, -1]
                cos = np.round(num / (nv_seq[band] * nq_seq[j]), 6)
                # final order applied IN the batch: the selection metric
                # now EQUALS the global window's, so batch top-k suffices
                sel = np.lexsort((ids[band], -cos))[:k]
                out_q.extend([qids[j]] * len(sel))
                out_n.extend(ids[band][sel])
                out_c.extend(cos[sel])
            if out_q:
                yield pd.DataFrame(
                    {"query_id": out_q, "neighbor_id": out_n,
                     "cos_sim": out_c}
                )

    scored = corpus.select(
        F.col(id_col).alias("cid"),
        as_double_array(F.col(vec_col)).alias("cv"),
    ).mapInPandas(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )


def cosine_pairs_vs_queries(
    corpus: DataFrame,
    queries: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 100_000,
) -> DataFrame:
    """All unordered pairs (a < b, cos_sim >= threshold) with at least
    one endpoint in `queries` — EXACT, but bounded: the query matrix
    rides to every task (driver-materialized, capped at `max_queries`
    rows — the IVF centroid-sketch precedent) and the corpus streams
    through ONE mapInPandas GEMM pass: O(|corpus| x |queries|) BLAS
    instead of the all-pairs O(|corpus|^2) cogroup.

    This is the truth-side operator for recall properties over PLANTED
    pairs (every planted pair has a planted endpoint, so restricting
    truth to query-incident pairs loses nothing) — VERDICT r3 #5: the
    unbounded GEMM truth was quadratic and would dominate the bench at
    the next scale point.

    Parity contract (same as blocked_gemm_pairs): the GEMM is a
    prefilter with one rounding quantum of slack; survivors recompute
    dot and norms in strict sequential (cumsum) order, so emitted
    cos_sim values and threshold decisions are bit-identical to the
    JVM `aggregate` fold and DuckDB's list_dot_product.
    """
    q_rows = (
        queries.select(
            F.col(id_col).alias("qid"),
            as_double_array(F.col(vec_col)).alias("qv"),
        )
        .limit(max_queries + 1)
        .collect()
    )
    if len(q_rows) > max_queries:
        raise ValueError(
            f"queries side exceeds max_queries={max_queries}; this "
            "operator broadcasts the query matrix — use "
            "blocked_gemm_pairs or banded_lsh_neighbors for large sides"
        )
    qids = np.array([r["qid"] for r in q_rows])
    Q = np.stack([np.asarray(r["qv"], dtype=np.float64) for r in q_rows])
    nq_gemm = np.sqrt(np.einsum("ij,ij->i", Q, Q))
    nq_seq = np.sqrt(np.cumsum(Q * Q, axis=1)[:, -1])

    id_field = [f for f in corpus.select(F.col(id_col)).schema.fields][0]
    out_schema = StructType(
        [
            StructField("a", id_field.dataType),
            StructField("b", id_field.dataType),
            StructField("cos_sim", DoubleType()),
        ]
    )

    def score(it):
        for pdf in it:
            if pdf.empty:
                continue
            V = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            ids = pdf["cid"].to_numpy()
            nv = np.sqrt(np.einsum("ij,ij->i", V, V))
            sims = (V @ Q.T) / np.outer(nv, nq_gemm)
            mask = (sims >= threshold - 1e-6) & (
                ids[:, None] != qids[None, :]
            )
            ci, qi = np.nonzero(mask)
            if len(ci) == 0:
                continue
            num = np.cumsum(V[ci] * Q[qi], axis=1)[:, -1]
            nv_seq = np.sqrt(np.cumsum(V * V, axis=1)[:, -1])
            cos = np.round(num / (nv_seq[ci] * nq_seq[qi]), 6)
            keep = cos >= threshold
            ci, qi, cos = ci[keep], qi[keep], cos[keep]
            if len(ci) == 0:
                continue
            yield pd.DataFrame(
                {
                    "a": np.minimum(ids[ci], qids[qi]),
                    "b": np.maximum(ids[ci], qids[qi]),
                    "cos_sim": cos,
                }
            )

    cand = corpus.select(
        F.col(id_col).alias("cid"),
        as_double_array(F.col(vec_col)).alias("v"),
    ).mapInPandas(score, out_schema)
    # a pair with BOTH endpoints in the query set meets twice (each
    # side once in the query role) — dedupe; cos_sim identical both
    # times (same sequential recompute), max is a deterministic pick
    return cand.groupBy("a", "b").agg(F.max("cos_sim").alias("cos_sim"))


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
    n_blocks: int | None = None,
) -> DataFrame:
    """All unordered pairs (a < b) with cosine >= threshold — EXACT.

    Layout options (mutually exclusive):
    - `block_col`: a user-supplied equi-key (e.g. an LSH bucket) — the
      join only compares same-key rows (approximate completeness,
      exact values).
    - `n_blocks=B`: exact-complete blocked cartesian.  Rows are hashed
      into B blocks; the left side explodes to every target block
      j >= own block, the right side keys on its own block, and the
      equi-join on j covers each unordered block pair exactly once.
      Work per task is (n/B)², replication factor ~B/2 on one side —
      pick B ≈ sqrt(cluster cores) so tasks saturate the cluster with
      bounded memory.  AQE skew-split further divides residual
      imbalance.
    - neither: plain crossJoin — ONLY for oracle-sized inputs.
    """
    base = df.select(
        F.col(id_col).alias("id"),
        as_double_array(F.col(vec_col)).alias("v"),
        *([F.col(block_col).alias("blk")] if block_col else []),
    ).withColumn("n", l2_norm(F.col("v")))  # norm once per row, pre-join

    if block_col is not None:
        a = base.select(
            F.col("id").alias("a"), F.col("v").alias("va"),
            F.col("n").alias("na"), "blk",
        )
        b = base.select(
            F.col("id").alias("b"), F.col("v").alias("vb"),
            F.col("n").alias("nb"), "blk",
        )
        joined = a.join(b, "blk").where(F.col("a") < F.col("b"))
    elif n_blocks and n_blocks > 1:
        B = int(n_blocks)
        blocked = base.withColumn(
            "blk", F.pmod(F.xxhash64(F.col("id")), F.lit(B)).cast("int")
        )
        a = blocked.select(
            F.col("id").alias("a"), F.col("v").alias("va"),
            F.col("n").alias("na"), F.col("blk").alias("blk_a"),
            # left side participates in every block pair (blk, j>=blk)
            F.explode(F.sequence(F.col("blk"), F.lit(B - 1))).alias("j"),
        )
        b = blocked.select(
            F.col("id").alias("b"), F.col("v").alias("vb"),
            F.col("n").alias("nb"), F.col("blk").alias("j"),
        )
        # each unordered pair meets exactly once: the smaller-block row
        # is always the left role; same-block pairs dedup via id order
        joined = a.join(b, "j").where(
            (F.col("blk_a") < F.col("j")) | (F.col("a") < F.col("b"))
        )
    else:
        a = base.select(
            F.col("id").alias("a"), F.col("v").alias("va"), F.col("n").alias("na")
        )
        b = base.select(
            F.col("id").alias("b"), F.col("v").alias("vb"), F.col("n").alias("nb")
        )
        joined = a.crossJoin(b).where(F.col("a") < F.col("b"))

    return (
        joined.withColumn(
            "cos_sim",
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
            ),
        )
        .where(F.col("cos_sim") >= threshold)
        # cross-block pairs can surface with a > b; normalize
        .select(
            F.least("a", "b").alias("a"),
            F.greatest("a", "b").alias("b"),
            "cos_sim",
        )
    )


def blocked_gemm_pairs(
    df: DataFrame,
    threshold: float,
    n_blocks: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs cosine >= threshold via blocked GEMM: rows hash
    into B blocks; each of the B(B+1)/2 unordered block pairs becomes
    one cogroup whose kernel is a single numpy matrix multiply
    ((n/B) x dim) @ (dim x (n/B)) — BLAS throughput instead of
    interpreted per-pair expression evaluation (measured ~10x on the
    same layout).  Only thresholded pairs leave Python; the dense sim
    matrix never crosses Arrow.

    Memory contract: one block (n/B rows x dim doubles) must fit a
    task — pick B accordingly; replication factor is ~B/2 per side.

    Parity: the GEMM is a PREFILTER (threshold minus one rounding
    quantum of slack); surviving pairs are recomputed in strict
    sequential fold order (np.cumsum accumulates left-to-right — the
    exact operation order of the JVM `aggregate` fold and DuckDB's
    list_dot_product), so the emitted cos_sim and the threshold
    decision are bit-identical to the SQL-expression baseline
    (`embedding_near_dup_pairs`) while the O(n²) bulk stays BLAS."""
    B = int(n_blocks)
    base = df.select(
        F.col(id_col).alias("id"),
        as_double_array(F.col(vec_col)).alias("v"),
    ).withColumn("blk", F.pmod(F.xxhash64(F.col("id")), F.lit(B)).cast("int"))
    left = base.select(
        "id", "v", F.col("blk").alias("i"),
        F.explode(F.sequence(F.col("blk"), F.lit(B - 1))).alias("j"),
    )
    # distinct right-side names: cogrouping two frames with identical
    # column names AND shared lineage makes the attribute dedup prune
    # the right side's data columns out of the Arrow payload
    right = base.select(
        F.col("id").alias("id_r"), F.col("v").alias("v_r"),
        F.explode(F.sequence(F.lit(0), F.col("blk"))).alias("i"),
        F.col("blk").alias("j"),
    )

    id_field = [f for f in base.schema.fields if f.name == "id"][0]
    out_schema = StructType(
        [
            StructField("a", id_field.dataType),
            StructField("b", id_field.dataType),
            StructField("cos_sim", DoubleType()),
        ]
    )

    def score(key, lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty or rpdf.empty:
            return pd.DataFrame({"a": [], "b": [], "cos_sim": []})
        i, j = key
        A = np.stack(lpdf["v"].to_numpy())
        Bm = np.stack(rpdf["v_r"].to_numpy())
        na = np.sqrt(np.einsum("ij,ij->i", A, A))
        nb = np.sqrt(np.einsum("ij,ij->i", Bm, Bm))
        sims = (A @ Bm.T) / np.outer(na, nb)
        ids_a = lpdf["id"].to_numpy()
        ids_b = rpdf["id_r"].to_numpy()
        # GEMM as prefilter only: one rounding quantum of slack covers
        # any last-bit divergence between blocked and sequential sums
        mask = sims >= threshold - 1e-6
        if i == j:  # same block: strict upper triangle by id
            mask &= ids_a[:, None] < ids_b[None, :]
        ai, bi = np.nonzero(mask)
        if len(ai) == 0:
            return pd.DataFrame({"a": [], "b": [], "cos_sim": []})
        # sequential-fold recompute for survivors only: cumsum
        # accumulates strictly left-to-right, matching the JVM
        # aggregate() fold and DuckDB's list_dot_product bit-for-bit
        num = np.cumsum(A[ai] * Bm[bi], axis=1)[:, -1]
        na_seq = np.sqrt(np.cumsum(A * A, axis=1)[:, -1])
        nb_seq = np.sqrt(np.cumsum(Bm * Bm, axis=1)[:, -1])
        cos = np.round(num / (na_seq[ai] * nb_seq[bi]), 6)
        keep = cos >= threshold
        ai, bi, cos = ai[keep], bi[keep], cos[keep]
        lo = np.minimum(ids_a[ai], ids_b[bi])
        hi = np.maximum(ids_a[ai], ids_b[bi])
        return pd.DataFrame({"a": lo, "b": hi, "cos_sim": cos})

    return (
        left.groupBy("i", "j")
        .cogroup(right.groupBy("i", "j"))
        .applyInPandas(score, out_schema)
    )


def train_ivf_centroids(
    df: DataFrame,
    n_cells: int,
    seed: int = 42,
    sample_n: int = 20_000,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Seeded spherical k-means on a deterministic sample — the IVF
    coarse quantizer.  The sample (<= sample_n rows, chosen by the
    smallest xxhash64(id) — stable under partitioning/order) is the ONE
    deliberate driver-side collect here: centroid training is model
    fitting on a bounded sketch, the standard IVF construction; the
    resulting (n_cells x dim) matrix is a tiny model shipped to
    executors inside the assignment UDF closure."""
    sample = (
        df.select(F.col(id_col).alias("id"), as_double_array(F.col(vec_col)).alias("v"))
        .orderBy(F.xxhash64(F.col("id")))
        .limit(sample_n)
        .collect()
    )
    X = np.stack([r["v"] for r in sample])
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(n_cells, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(C.shape[0]):
            members = X[assign == c]
            if len(members):
                m = members.sum(axis=0)
                C[c] = m / max(np.linalg.norm(m), 1e-12)
    return C


def make_ivf_cells_udf(centroids: np.ndarray, nprobe: int = 1):
    """pandas UDF: embedding -> the nprobe nearest centroid ids (by
    cosine; centroids are unit-norm so argmax dot suffices)."""
    C = centroids

    @F.pandas_udf(ArrayType(LongType()))
    def cells(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mat @ C.T
        top = np.argsort(-sims, axis=1)[:, :nprobe].astype(np.int64)
        return pd.Series(list(top))

    return cells


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: corpus rows live in their single nearest
    cell; each query probes its `nprobe` nearest cells and exact-cosine
    re-ranks only those cells' members.  Cost per query ~ nprobe *
    (n / n_cells) instead of n; recall is governed by nprobe (identical
    vectors always share cell 1 — the planted-dup recall invariant the
    driver query checks).  Equi-join on cell => hash-partitioned, no
    broadcast of the corpus, AQE-splittable on hot cells."""
    cell1 = make_ivf_cells_udf(centroids, 1)
    celln = make_ivf_cells_udf(centroids, nprobe)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double_array(F.col(vec_col)).alias("cv"),
    ).withColumn("cn", l2_norm(F.col("cv"))).withColumn(
        "cell", F.element_at(cell1(F.col("cv")), 1)
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double_array(F.col(vec_col)).alias("qv"),
    ).withColumn("qn", l2_norm(F.col("qv"))).withColumn(
        "cell", F.explode(celln(F.col("qv")))
    )
    # a query probing several cells never sees a neighbor twice
    # (corpus rows live in exactly one cell) — no dedup needed.
    # Scoring is a vectorized mapInPandas cumsum (bit-identical fold
    # order; norms bound per-row pre-join) — an interpreted per-pair
    # `dot` was the same hot-path flaw the banded-LSH re-rank had.
    joined = q.join(c, "cell").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    id_type = [f for f in c.schema.fields if f.name == "neighbor_id"][0]
    out_schema = StructType(
        [
            StructField("query_id", id_type.dataType),
            StructField("neighbor_id", id_type.dataType),
            StructField("cos_sim", DoubleType()),
        ]
    )

    def rerank(it):
        for pdf in it:
            if pdf.empty:
                continue
            Qv = np.stack(pdf["qv"].to_numpy()).astype(np.float64)
            Cv = np.stack(pdf["cv"].to_numpy()).astype(np.float64)
            num = np.cumsum(Qv * Cv, axis=1)[:, -1]
            cos = np.round(
                num / (pdf["qn"].to_numpy() * pdf["cn"].to_numpy()), 6
            )
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(),
                    "neighbor_id": pdf["neighbor_id"].to_numpy(),
                    "cos_sim": cos,
                }
            )

    scored = joined.mapInPandas(rerank, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("rank"), "neighbor_id", "cos_sim")
    )


def lsh_planes(
    dim: int, bands: int, rows_per_band: int, seed: int
) -> np.ndarray:
    """The (dim, bands*rows_per_band) hyperplane matrix — the single
    source of truth shared by the executor UDF and any driver-side
    construction that must agree with it bit-for-bit (e.g. the
    multi-probe recall-property query plants pairs engineered against
    these exact planes)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, bands * rows_per_band))


def make_band_codes_udf(dim: int, bands: int, rows_per_band: int, seed: int):
    """pandas UDF: embedding -> array of `bands` LSH band codes, each
    packing `rows_per_band` hyperplane sign bits.  Hyperplanes drawn
    once from a seeded Generator at definition time — deterministic
    across partitions, task retries, and row order."""
    planes = lsh_planes(dim, bands, rows_per_band, seed)
    r = rows_per_band
    weights = 1 << np.arange(r, dtype=np.int64)

    @F.pandas_udf(ArrayType(LongType()))
    def band_codes(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)  # (batch, dim)
        bits = (mat @ planes) > 0  # (batch, bands*r)
        bb = bits.reshape(mat.shape[0], bands, r).astype(np.int64)
        codes = (bb * weights[None, None, :]).sum(axis=2)  # (batch, bands)
        return pd.Series(list(codes))

    return band_codes


def banded_lsh_neighbors(
    df: DataFrame,
    threshold: float,
    dim: int,
    bands: int = 16,
    rows_per_band: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_cap: int = 2000,
    probe_bits: int = 0,
    materialize: bool = True,
    barrier_strategy: str = "local",
) -> tuple[DataFrame, DataFrame]:
    """Scale path: (near-dup pairs, skew report).

    Pairs sharing any band bucket (optionally within `probe_bits`
    bit-flips of one, multi-probe) are exact-cosine re-ranked; output
    is (a, b, cos_sim) with cos_sim >= threshold, a < b.  `dim` is a
    required parameter (array columns carry no length in the schema,
    and probing a row for it would put a driver action inside operator
    construction).

    Recall calibration: a pair at cosine c shares a band with
    probability p(c)^rows_per_band per band, p(c) = 1 - arccos(c)/pi;
    identical directions (exact/scale duplicates) share every band
    deterministically.  Pick bands/rows for the target recall at your
    operating threshold; this is the documented approximation of the
    production path (the exact verifier stays available above).
    """
    if dim is None or dim <= 0:
        raise ValueError("dim must be provided (array schemas carry no length)")
    codes = make_band_codes_udf(dim, bands, rows_per_band, seed)
    base = (
        df.select(
            F.col(id_col).alias("id"),
            as_double_array(F.col(vec_col)).alias("v"),
        )
        .withColumn("n", l2_norm(F.col("v")))
        .withColumn("codes", codes(F.col("v")))
    )
    if materialize:
        # the UDF lineage fans out three ways (both join sides of the
        # bucket join + the re-rank vector lookup) — bind it once
        base = materialize_barrier(base, strategy=barrier_strategy)

    memb = base.select("id", F.posexplode("codes").alias("band", "code"))

    # bucket sizes from a partial-aggregated groupBy-count + join back,
    # never a count WINDOW (r5, same fix as minhash_lsh): an embedding
    # mega-bucket — a dense mass of near-identical vectors sharing a
    # band code, the normal dedup-corpus case — would funnel through
    # one window partition just to learn the size that disqualifies
    # it; the aggregate gets map-side combine and the join is
    # AQE-skew-splittable.  Buckets above the cap are excluded from
    # pair generation and surfaced in the skew report.
    sizes = memb.groupBy("band", "code").agg(
        F.count(F.lit(1)).alias("bucket_size")
    )
    ok = memb.join(
        sizes.where(F.col("bucket_size") <= bucket_cap).select("band", "code"),
        ["band", "code"],
    ).select("id", "band", "code")
    skew_report = sizes.where(F.col("bucket_size") > bucket_cap)

    if probe_bits >= 1:
        # multi-probe: the probe side also visits every single-bit flip
        # of each band code — catches pairs whose codes differ by one
        # plane per band (symmetric, so one-sided expansion suffices)
        probe_codes = F.array(
            F.col("code"),
            *[F.col("code").bitwiseXOR(F.lit(1 << b)) for b in range(rows_per_band)],
        )
        probe = memb.select(
            "id", "band", F.explode(probe_codes).alias("code")
        )
    else:
        probe = memb

    cand = (
        probe.withColumnRenamed("id", "a")
        .join(ok.withColumnRenamed("id", "b"), ["band", "code"])
        .where(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
    )

    va = base.select(F.col("id").alias("a"), F.col("v").alias("va"), F.col("n").alias("na"))
    vb = base.select(F.col("id").alias("b"), F.col("v").alias("vb"), F.col("n").alias("nb"))
    joined = cand.join(va, "a").join(vb, "b")

    # exact-cosine re-rank, VECTORIZED: correlated corpora put many
    # pairs in shared buckets, and an interpreted per-pair `dot` fold
    # was the dominant cost at 20k vectors (~17 s -> ~2 s).  The numpy
    # row-wise cumsum accumulates strictly left-to-right — the same
    # operation order as the JVM aggregate fold / DuckDB
    # list_dot_product — and the norms were bound per-row pre-join, so
    # emitted values and threshold decisions are unchanged bit-for-bit.
    id_type = [f for f in base.schema.fields if f.name == "id"][0].dataType
    rerank_schema = StructType(
        [
            StructField("a", id_type),
            StructField("b", id_type),
            StructField("cos_sim", DoubleType()),
        ]
    )

    def rerank(it):
        for pdf in it:
            if pdf.empty:
                continue
            A = np.stack(pdf["va"].to_numpy()).astype(np.float64)
            Bv = np.stack(pdf["vb"].to_numpy()).astype(np.float64)
            num = np.cumsum(A * Bv, axis=1)[:, -1]
            cos = np.round(
                num / (pdf["na"].to_numpy() * pdf["nb"].to_numpy()), 6
            )
            keep = cos >= threshold
            if not keep.any():
                continue
            yield pd.DataFrame(
                {
                    "a": pdf["a"].to_numpy()[keep],
                    "b": pdf["b"].to_numpy()[keep],
                    "cos_sim": cos[keep],
                }
            )

    pairs = joined.mapInPandas(rerank, rerank_schema)
    return pairs, skew_report
