"""The flagship end-to-end pipeline: exact + near dedup over a `pages`
table -> cluster assignments.

Stage graph (SURVEY §3.4), each stage checkpointable via PipelineRunner:

  pages (url, warc_ts, html, text, lang)
    -> canon    A5 keep-first per url (earliest warc_ts)
    -> exact    size/weed/xxhash64 cascade -> exact dup members
    -> sigs     shingle -> MinHash + SimHash signatures
    -> cands    LSH band buckets -> candidate pairs (skew-capped)
    -> verify   SimHash Hamming gate
    -> cc       large-star/small-star components over exact ∪ near edges
    -> clusters (url, cluster_id, is_canonical, kind)

Exact dup groups enter CC as star edges (member -> digest-group min), so
exact and near evidence merge into one equivalence relation — the
reference's single final clustering (Common.pm:187) generalized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from app_dupfind_spark.config import DedupConfig
from app_dupfind_spark.operators.components import connected_components
from app_dupfind_spark.operators.exact import (
    exact_dup_cascade,
    keep_first,
)
from app_dupfind_spark.operators.minhash_lsh import candidate_pairs, signatures
from app_dupfind_spark.operators.spans import span_candidates, shared_span_pairs
from app_dupfind_spark.operators.verify import attach_signatures, verify_pairs
from app_dupfind_spark.plans.pipeline import PipelineRunner


def exact_star_edges(dup_members: DataFrame, id_col: str = "url") -> DataFrame:
    """Exact digest groups as (member, group_min) star edges for CC."""
    w_min = F.min(id_col).over(Window.partitionBy("digest"))
    return (
        dup_members.withColumn("m", w_min)
        .where(F.col(id_col) != F.col("m"))
        .select(F.col(id_col).alias("a"), F.col("m").alias("b"))
    )


def assemble_clusters(
    docs: DataFrame, components: DataFrame, id_col: str = "url"
) -> DataFrame:
    """Attach component labels to all docs; unlabeled docs are singleton
    clusters of themselves.  cluster_id = component min (the
    reference's min-member cluster identity, Common.pm:248-251)."""
    labeled = docs.select(id_col).join(
        components.withColumnRenamed("node", id_col), id_col, "left"
    )
    return labeled.select(
        id_col,
        F.coalesce("component", F.col(id_col)).alias("cluster_id"),
    ).withColumn("is_canonical", F.col(id_col) == F.col("cluster_id"))


def near_dup_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    cfg: DedupConfig,
    checkpoint_dir: str,
    id_col: str = "url",
    text_col: str = "text",
    order_col: str = "warc_ts",
    persist_mode: str = "parquet",
) -> tuple[DataFrame, PipelineRunner]:
    """Run (or resume) the full pipeline; returns (clusters, runner).

    Column pruning is explicit and early: html:binary never leaves the
    canon stage; only (id, text) reach the cascade, only (id, hashes)
    cross into Python.
    """
    runner = PipelineRunner(spark, cfg, checkpoint_dir, persist_mode=persist_mode)

    canon = runner.run_stage(
        "canon",
        lambda: keep_first(
            pages.select(id_col, order_col, text_col), [id_col], order_col, id_col
        ).select(id_col, text_col),
    )
    fp = runner.fingerprint("canon")

    exact = runner.run_stage(
        "exact",
        lambda: exact_dup_cascade(canon.df, cfg, id_col, text_col),
        upstream_fingerprint=fp,
    )

    # signatures are range-partitioned on the doc key before the
    # checkpoint write (north_rule): balanced files, and downstream
    # per-doc joins (verify stage) read a clustered layout
    sigs = runner.run_stage(
        "sigs",
        lambda: signatures(canon.df, cfg, id_col, text_col).repartitionByRange(
            cfg.shuffle_partitions, id_col
        ),
        upstream_fingerprint=fp,
    )

    cands = runner.run_stage(
        "cands",
        lambda: candidate_pairs(sigs.df, cfg, id_col)[0],
        upstream_fingerprint=runner.fingerprint("sigs"),
    )

    verified = runner.run_stage(
        "verify",
        lambda: verify_pairs(
            attach_signatures(cands.df, sigs.df, id_col), cfg
        ),
        upstream_fingerprint=runner.fingerprint("cands"),
    )

    # Span stage (M5): long-shared-span pairs the whole-doc LSH cannot
    # see (Jaccard far below threshold but a >=min_span_chars verbatim
    # run).  Candidates from the long-shingle index minus pairs already
    # verified; LCS gate in Arrow batches.
    if cfg.span_enabled:
        def _spans() -> DataFrame:
            cand = span_candidates(canon.df, cfg, id_col, text_col)
            fresh = cand.join(verified.df.select("a", "b"), ["a", "b"], "left_anti")
            return shared_span_pairs(
                fresh, canon.df, cfg.min_span_chars, id_col, text_col
            )

        spans = runner.run_stage(
            "spans",
            _spans,
            upstream_fingerprint=runner.fingerprint("verify"),
        )
        span_edges = spans.df.select("a", "b")
    else:
        span_edges = None

    def _cc() -> DataFrame:
        near_edges = verified.df.select("a", "b")
        ex_edges = exact_star_edges(exact.df, id_col)
        edges = near_edges.unionByName(ex_edges)
        if span_edges is not None:
            edges = edges.unionByName(span_edges)
        return connected_components(edges, cfg.cc_max_iterations)

    cc = runner.run_stage(
        "cc",
        _cc,
        upstream_fingerprint=runner.fingerprint("verify") + "|" + runner.fingerprint("exact")
        + ("|" + runner.fingerprint("spans") if cfg.span_enabled else ""),
    )

    clusters = runner.run_stage(
        "clusters",
        lambda: assemble_clusters(canon.df, cc.df, id_col),
        upstream_fingerprint=runner.fingerprint("cc"),
    )
    return clusters.df, runner
