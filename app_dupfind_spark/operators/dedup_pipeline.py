"""The flagship end-to-end pipeline: exact + near dedup over a `pages`
table -> cluster assignments.

Stage graph (SURVEY §3.4), each stage checkpointable via PipelineRunner:

  pages (url, warc_ts, html, text, lang)
    -> canon    A5 keep-first per url (earliest warc_ts)
    -> exact    size/weed/xxhash64 cascade -> exact dup members
    -> sigs     shingle -> MinHash + SimHash signatures
    -> cands    LSH band buckets -> candidate pairs (skew-capped)
    -> span_cand (optional) long-shingle candidate index
    (exact, sigs->cands and span_cand depend only on canon and run
    CONCURRENTLY from a driver thread pool — guide §2.6 back-fill)
    -> verify   cfg.verify_mode: 'exact' = pair-targeted exact
                shingle-Jaccard gate (deterministic truth, no estimator
                noise at the threshold boundary); 'estimate' = MinHash
                estimate OR SimHash Hamming gate (no second shingle
                touch)
    -> spans    (optional) long-shared-span pairs the whole-doc LSH
                cannot see
    -> cc       large-star/small-star components over exact ∪ near edges
    -> clusters (url, cluster_id, is_canonical)

Exact dup groups enter CC as star edges (member -> digest-group min), so
exact and near evidence merge into one equivalence relation — the
reference's single final clustering (Common.pm:187) generalized.

Q1 early-exit (App.pm:268,285,302,319: `say '** NO DUPLICATES FOUND'
and exit`): a stage that empties its candidate set short-circuits its
downstream — empty candidates skip verification, and an empty edge set
skips connected components entirely (clusters degrade to all-singleton
without scheduling CC jobs).  Unlike the exact-only reference, an empty
EXACT dup set must NOT exit: the near-dup branch is independent.

A6 run counters (App.pm:424-429 scan/size-dup/real-dup triplet): ride
the stages' own actions via df.observe() — see runner.counters /
counters_df(); no second pass over any stage input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from app_dupfind_spark.config import DedupConfig
from app_dupfind_spark.operators.components import connected_components
from app_dupfind_spark.operators.exact import (
    exact_dup_cascade,
    keep_first,
)
from app_dupfind_spark.operators.jaccard import exact_jaccard_for_pairs
from app_dupfind_spark.operators.minhash_lsh import candidate_pairs, signatures
from app_dupfind_spark.operators.spans import span_candidates, shared_span_pairs
from app_dupfind_spark.operators.verify import attach_signatures, verify_pairs
from app_dupfind_spark.plans.barriers import materialize_barrier
from app_dupfind_spark.plans.pipeline import PipelineRunner, input_fingerprint


def exact_star_edges(dup_members: DataFrame, id_col: str = "url") -> DataFrame:
    """Exact digest groups as (member, group_min) star edges for CC.

    groupBy-min + join back, never a digest-partitioned window
    (VERDICT r4 #1): a window-min funnels a degenerate exact
    mega-cluster through one task; the aggregate gets map-side combine
    and the join is AQE-skew-splittable.  Plan-shape-tested."""
    mins = dup_members.groupBy("digest").agg(F.min(id_col).alias("m"))
    return (
        dup_members.join(mins, "digest")
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


def _exact_verify(
    cands: DataFrame,
    sigs: DataFrame,
    docs: DataFrame,
    cfg: DedupConfig,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """verify_mode='exact', BANDED: the MinHash estimate (signatures
    already in hand — no text touched) decides pairs that clear the
    threshold by cfg.est_clear_margin in either direction (~5 sigma:
    per-pair error odds ~3e-7); only the borderline band pays the
    pair-targeted exact-Jaccard recompute (operators/jaccard.py), so
    the second shingle pass runs over borderline DOCS, not every
    candidate doc.  est_jaccard carries the EXACT value for banded
    pairs and the estimate for clear accepts; method says which."""
    from app_dupfind_spark.operators.verify import minhash_est_jaccard

    tau, m = cfg.jaccard_threshold, cfg.est_clear_margin
    # minhash-only attach (r6): this mode never reads SimHash, and the
    # sigs checkpoint may legitimately not carry it (see _sigs_fn) —
    # selecting only the columns the gate needs also keeps the join
    # payload narrow (guide §2.3 project-before-the-exchange)
    sa = sigs.select(F.col(id_col).alias("a"), F.col("minhash").alias("minhash_a"))
    sb = sigs.select(F.col(id_col).alias("b"), F.col("minhash").alias("minhash_b"))
    scored = (
        cands.select("a", "b").join(sa, "a").join(sb, "b")
        .where(F.col("minhash_a").isNotNull() & F.col("minhash_b").isNotNull())
        .withColumn(
            "est", minhash_est_jaccard(F.col("minhash_a"), F.col("minhash_b"))
        )
        .select("a", "b", "est")
    )
    # pairs-only frame feeding two branches: bind it once
    scored = materialize_barrier(scored, cfg)
    clear = scored.where(F.col("est") >= tau + m).select(
        "a",
        "b",
        F.col("est").alias("est_jaccard"),
        F.lit(None).cast("int").alias("hamming"),
        F.lit("minhash").alias("method"),
    )
    border = scored.where(
        (F.col("est") < tau + m) & (F.col("est") > tau - m)
    ).select("a", "b")
    exact = (
        exact_jaccard_for_pairs(
            border, docs, cfg.shingle_k, id_col, text_col,
            barrier_strategy=cfg.barrier_strategy,
        )
        .where(F.col("jaccard") >= tau)
        .select(
            "a",
            "b",
            F.col("jaccard").alias("est_jaccard"),
            F.lit(None).cast("int").alias("hamming"),
            F.lit("jaccard").alias("method"),
        )
    )
    return clear.unionByName(exact)


def near_dup_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    cfg: DedupConfig,
    checkpoint_dir: str,
    id_col: str = "url",
    text_col: str = "text",
    order_col: str = "warc_ts",
    persist_mode: str = "parquet",
    source_fingerprint: str | None = None,
    iceberg_catalog: str | None = None,
    iceberg_namespace: str = "dupfind",
) -> tuple[DataFrame, PipelineRunner]:
    """Run (or resume) the full pipeline; returns (clusters, runner).

    Column pruning is explicit and early: html:binary never leaves the
    canon stage; only (id, text) reach the cascade, only (id, hashes)
    cross into Python.

    `source_fingerprint` pins the INPUT identity into the resume chain
    (pass an Iceberg snapshot id on a real cluster).  When omitted and
    resuming durably, a content fingerprint (count + id-hash sum) is
    computed in one column-pruned pass — re-pointing the same
    checkpoint dir at a different input can never silently resume the
    old corpus (the staleness hazard of count-only fingerprints).
    """
    from app_dupfind_spark.session import ensure_session_hygiene

    ensure_session_hygiene(spark)
    runner = PipelineRunner(
        spark, cfg, checkpoint_dir, persist_mode=persist_mode,
        iceberg_catalog=iceberg_catalog, iceberg_namespace=iceberg_namespace,
    )

    if source_fingerprint is None and persist_mode in ("parquet", "iceberg"):
        source_fingerprint = input_fingerprint(pages, id_col)

    def _canon() -> DataFrame:
        src = runner.observed(
            pages.select(id_col, order_col, text_col), "canon", "rows_in"
        )
        return keep_first(src, [id_col], order_col, id_col).select(id_col, text_col)

    canon = runner.run_stage(
        "canon", _canon, upstream_fingerprint=source_fingerprint or ""
    )
    fp = runner.fingerprint("canon")

    def _exact() -> DataFrame:
        obs = {k: Observation() for k in ("scan", "size", "weed", "digest")}
        for k, o in obs.items():
            runner.track("exact", k, o)
        return exact_dup_cascade(canon.df, cfg, id_col, text_col, counters=obs)

    # --- concurrent independent stages (guide §2.6) -----------------
    # exact, the LSH chain (sigs -> cands) and the span candidate index
    # all depend ONLY on canon.  Driver code calling actions
    # sequentially was the only thing serializing them; submitting the
    # three chains from a small thread pool lets each job's tasks
    # back-fill executors freed by another job's stragglers (FIFO
    # scheduling does exactly this).  Stage outputs, fingerprints and
    # checkpoint dirs are per-stage, so the resume contract is
    # unchanged; metrics are re-sorted to the canonical stage order
    # below (the run summary stays deterministic).

    def _sigs_fn() -> DataFrame:
        # signatures are HASH-partitioned on the doc key before the
        # checkpoint write: balanced files, and downstream per-doc
        # joins (verify stage) read a clustered layout.  Hash, not
        # range (r6): a range exchange SAMPLES its child to compute
        # bounds, and the child here is the MinHash/SimHash UDF
        # lineage — the sampling pass re-evaluated the whole
        # Arrow/pandas stage before the real one (measured 2.4-3.9 s
        # vs 1.5-1.7 s for the hash exchange on the 50k point, guide
        # §2.4: no shuffle should run twice).  Every consumer re-keys
        # by equi-join/groupBy, so range clustering bought nothing
        # hash clustering doesn't.  SimHash is computed only when a
        # downstream consumer exists (r6): the default 'exact' verify
        # gates on the MinHash estimate + exact Jaccard and never
        # reads it, so the exact-mode stage skips the second Arrow
        # kernel and halves the checkpoint's signature payload.
        return signatures(
            canon.df, cfg, id_col, text_col,
            with_simhash=(cfg.verify_mode != "exact"),
        ).repartition(cfg.shuffle_partitions, id_col)

    def _lsh_chain() -> tuple:
        s = runner.run_stage("sigs", _sigs_fn, upstream_fingerprint=fp)
        c = runner.run_stage(
            "cands",
            # s.df reads from the stage checkpoint — already a barrier
            lambda: candidate_pairs(s.df, cfg, id_col, sigs_materialized=True)[0],
            upstream_fingerprint=runner.fingerprint("sigs"),
        )
        return s, c

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        f_lsh = pool.submit(_lsh_chain)
        f_exact = pool.submit(
            runner.run_stage, "exact", _exact, upstream_fingerprint=fp
        )
        f_span_cand = None
        if cfg.span_enabled:
            # the span candidate index (the stage's expensive half)
            # needs only canon; the verified-pair anti-join + LCS stay
            # downstream of verify in the 'spans' stage
            f_span_cand = pool.submit(
                runner.run_stage,
                "span_cand",
                lambda: span_candidates(canon.df, cfg, id_col, text_col),
                upstream_fingerprint=fp,
            )
        exact = f_exact.result()
        sigs, cands = f_lsh.result()
        span_cand = f_span_cand.result() if f_span_cand is not None else None

    _order = {
        s: i
        for i, s in enumerate(
            ["canon", "exact", "sigs", "cands", "span_cand", "verify",
             "spans", "cc", "clusters"]
        )
    }
    runner.metrics.sort(key=lambda m: _order.get(m["stage"], 99))

    # Q1: no candidates -> skip verification outright
    if cands.rows == 0:
        empty_verified = cands.df.select(
            "a",
            "b",
            F.lit(None).cast("double").alias("est_jaccard"),
            F.lit(None).cast("int").alias("hamming"),
            F.lit(None).cast("string").alias("method"),
        ).limit(0)
        verified = runner.skip_stage(
            "verify", empty_verified, "no candidate pairs",
            upstream_fingerprint=runner.fingerprint("cands"),
        )
    else:
        def _verify() -> DataFrame:
            if cfg.verify_mode == "exact":
                return _exact_verify(
                    cands.df, sigs.df, canon.df, cfg, id_col, text_col
                )
            return verify_pairs(
                attach_signatures(cands.df, sigs.df, id_col), cfg
            )

        verified = runner.run_stage(
            "verify", _verify, upstream_fingerprint=runner.fingerprint("cands")
        )

    # Span stage (M5): long-shared-span pairs the whole-doc LSH cannot
    # see (Jaccard far below threshold but a >=min_span_chars verbatim
    # run).  Candidates from the long-shingle index minus pairs already
    # verified; LCS gate in Arrow batches.  Independent of the LSH
    # branch, so an empty candidate set above does NOT skip it.
    if cfg.span_enabled:
        def _spans() -> DataFrame:
            fresh = span_cand.df.join(
                verified.df.select("a", "b"), ["a", "b"], "left_anti"
            )
            return shared_span_pairs(
                fresh, canon.df, cfg.min_span_chars, id_col, text_col,
                max_chars=cfg.span_max_chars,
            )

        spans = runner.run_stage(
            "spans",
            _spans,
            upstream_fingerprint=runner.fingerprint("span_cand")
            + "|" + runner.fingerprint("verify"),
        )
        span_edges = spans.df.select("a", "b")
        n_span_edges = spans.rows
    else:
        span_edges = None
        n_span_edges = 0

    # Q1: no edges at all -> skip CC, clusters are all singletons
    if exact.rows == 0 and verified.rows == 0 and n_span_edges == 0:
        empty_cc = canon.df.select(
            F.col(id_col).alias("node"), F.col(id_col).alias("component")
        ).limit(0)
        cc = runner.skip_stage(
            "cc", empty_cc, "no dup evidence (NO DUPLICATES FOUND)",
            upstream_fingerprint=runner.fingerprint("verify")
            + "|" + runner.fingerprint("exact")
            + ("|" + runner.fingerprint("spans") if cfg.span_enabled else ""),
        )
    else:
        def _cc() -> DataFrame:
            near_edges = verified.df.select("a", "b")
            ex_edges = exact_star_edges(exact.df, id_col)
            edges = near_edges.unionByName(ex_edges)
            if span_edges is not None:
                edges = edges.unionByName(span_edges)
            return connected_components(
                edges, cfg.cc_max_iterations,
                barrier_strategy=cfg.barrier_strategy,
            )

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
