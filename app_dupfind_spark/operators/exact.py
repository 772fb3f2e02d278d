"""Exact-duplicate cascade — the reference's core pipeline, relational.

Reference shape (/root/reference/lib/App/dupfind/Common.pm:38-204):
group by size -> drop singleton groups -> re-group by byte samples
("weed" passes) -> drop singletons -> group by full xxHash64 digest ->
drop singletons -> sorted clusters.  Every stage only ever SHRINKS the
candidate set, and the expensive full-content hash runs last, on the
fewest rows.

Spark realization: the "master dupes hash" {key => [members]}
(Common.pm:337-367) is kept in its exploded relational form
(key, member) and every "drop singleton groups" is a group-size HAVING
implemented as a count window — one shuffle per stage, no driver-side
state, no collect.

Scale notes (100 TB):
- Stages communicate survivors as DataFrames; each HAVING is one hash
  shuffle on the stage key.  Probe keys for one weed stage are fused
  into a single composite grouping key => all configured passes cost
  ONE shuffle, not one per pass (the reference pays a full re-group per
  pass, Guts.pm:71-98).
- The final digest group-by is global (crosses size groups), exactly
  like the reference's rekeying (Common.pm:187): partial aggregation
  (map-side combine) makes this cheap because true dup groups are tiny.
- Never carries `html:binary` or the full text through a shuffle except
  where the digest needs it; callers should select the minimal columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation, Window
from pyspark.sql import functions as F

from app_dupfind_spark.config import DedupConfig
from app_dupfind_spark.functions.probes import WEED_PASS_REGISTRY
from app_dupfind_spark.plans.barriers import materialize_barrier

# xxhash64('' , seed=42) — Spark's pinned seed.  The reference assigns
# all zero-size files the digest of the empty string without reading
# them (Common.pm:127-128); Catalyst constant-folds this literal.
XXHASH64_SEED = 42


def with_size(df: DataFrame, text_col: str = "text") -> DataFrame:
    """P1: size-key projection (ref Common.pm:57, `-s $_`)."""
    return df.withColumn("size", F.length(F.col(text_col)).cast("long"))


def having_at_least(
    df: DataFrame,
    keys: list[str | Column],
    n: int = 2,
    observation: Observation | None = None,
    counter_prefix: str = "grp",
) -> DataFrame:
    """P2: singleton-group elimination — THE load-bearing reduction,
    applied after every stage (ref Common.pm:63-65, 196-198;
    Guts.pm:145-147; MapReduce.pm:70-73).

    Implementation: groupBy-count (map-side partial aggregation makes
    the count itself skew-immune — each input partition contributes at
    most one row per key) + left-semi join back.  A count WINDOW would
    be one shuffle cheaper but funnels every row of a hot key through
    one partition with no mitigation; the shuffled semi-join is
    AQE-skew-splittable, which is what survives a 10^12-row size group.
    Null-safe: NULL probe keys group together and survive (the
    reference retains probe-failed files as potential dups,
    Guts.pm:137,158 — recall-preserving failure mode).

    `observation` (A6): in-flight counters `<prefix>_members` (rows in
    surviving groups) and `<prefix>_groups`, attached to the aggregate
    — which feeds exactly ONE consumer (the semi-join build side), so
    the count is exact with zero extra passes.  The reference's
    size-dup/real-dup run counters (App.pm:424-429) ride here.
    """
    key_cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    names = [f"__k{i}" for i in range(len(key_cols))]
    keyed = df.withColumns(dict(zip(names, key_cols)))
    survivors = (
        keyed.groupBy(*names)
        .agg(F.count(F.lit(1)).alias("__grp_n"))
        .where(F.col("__grp_n") >= n)
    )
    if observation is not None:
        survivors = survivors.observe(
            observation,
            F.sum("__grp_n").alias(f"{counter_prefix}_members"),
            F.count(F.lit(1)).alias(f"{counter_prefix}_groups"),
        )
    survivors = survivors.select(*[F.col(m).alias(f"{m}_s") for m in names])
    # eqNullSafe: NULL keys are a real group (P4) and must survive the
    # join back — plain equi-join semantics would silently drop them
    cond = None
    for m in names:
        c = keyed[m].eqNullSafe(survivors[f"{m}_s"])
        cond = c if cond is None else (cond & c)
    out = keyed.join(survivors, on=cond, how="left_semi")
    return out.drop(*names)


def weed_key(cfg: DedupConfig, text_col: str = "text") -> Column:
    """A2: composite probe key for all configured weed passes, fused.

    The reference runs passes sequentially, re-grouping after each
    (Guts.pm:100-164); grouping by the concatenation of all pass probes
    is a strictly finer partition computed in one pass — same final
    survivor set for the cascade (equal text => equal probes), one
    shuffle total.  NULL probes (almost_middle on short text) map to a
    sentinel so probe-failed rows keep flowing (P4).
    """
    parts = []
    for name in cfg.weed_passes:
        probe = WEED_PASS_REGISTRY[name](F.col(text_col), cfg.probe_width)
        parts.append(F.coalesce(probe, F.lit("\x00__probe_null__")))
    return F.concat_ws("\x01", *parts)


def text_digest(text_col: str = "text") -> Column:
    """F1: full-content digest.  Spark's built-in xxhash64 (LongType,
    seed 42) — same algorithm family as the reference's Digest::xxHash
    (Common.pm:11); we keep it numeric rather than reproducing Perl's
    signed-hex rendering (t/solutions/007_digest.pl:6).
    Zero-length texts get the constant empty-digest without branching
    cost (ref Common.pm:127-128)."""
    return F.xxhash64(F.col(text_col))


def exact_dup_cascade(
    df: DataFrame,
    cfg: DedupConfig,
    id_col: str = "url",
    text_col: str = "text",
    counters: dict[str, Observation] | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Full cascade: size HAVING -> weed HAVING -> digest HAVING.

    Returns (id_col, size, digest) for every member of a multi-member
    digest group — the relational "master dupes hash" after the digest
    stage (Common.pm:187-198).

    `materialize` binds the skinny projection behind a localCheckpoint:
    each downstream HAVING references its input from two plan branches
    (aggregate + semi-join probe), so without a barrier the TEXT column
    would be re-scanned and re-hashed once per branch product — at
    100 TB that's the dominant cost.  With the barrier, text is read
    exactly once and every re-reference replays ~30-byte rows.

    `counters` (A6): optional Observations keyed 'scan', 'size',
    'weed', 'digest' — the reference's run-summary counter triplet
    (App.pm:424-429) collected in-flight.  'scan' rides the skinny
    projection (exact only with `materialize`, which forces the single
    evaluation); the others ride each HAVING's aggregate.
    """
    # ALL text-derived keys are projected in ONE pass over the scan and
    # the text column is DROPPED before any shuffle: the cascade's
    # staged HAVINGs then move (id, size, probe, digest) — ~30 bytes —
    # instead of whole documents.  The reference staged probe-then-
    # digest to avoid READING files it could prune (Guts.pm:218-222);
    # with text already columnar, xxhash64 costs ~nothing relative to
    # shuffling text, so computing every key upfront and pruning on
    # skinny rows is the scale-correct inversion of the same idea.
    # The logical cascade (size -> weed -> digest, P2 after each) is
    # unchanged — only the projection point moved.
    base = df.select(id_col, text_col).where(F.col(text_col).isNotNull())
    base = with_size(base, text_col).where(F.col("size") <= cfg.max_chars)
    probe = (
        weed_key(cfg, text_col)
        if (cfg.weed_enabled and cfg.weed_passes)
        else F.lit(None).cast("string")
    )
    skinny = base.select(
        F.col(id_col),
        F.col("size"),
        probe.alias("__probe"),
        text_digest(text_col).alias("digest"),
    )
    counters = counters or {}
    if "scan" in counters:
        skinny = skinny.observe(
            counters["scan"], F.count(F.lit(1)).alias("scan_members")
        )
    if materialize:
        skinny = materialize_barrier(skinny, cfg)

    # Stage 1: same-size candidates (A1 + P2).
    survivors = having_at_least(
        skinny, ["size"], observation=counters.get("size"), counter_prefix="size"
    )

    # Stage 2: weed passes (A2 + P2), zero-size bypass (P3): size-0 rows
    # skip probing (their samples are undefined in the reference,
    # Common.pm:100,107) and ride straight to the digest stage.
    if cfg.weed_enabled and cfg.weed_passes:
        zero = survivors.where(F.col("size") == 0)
        nonzero = survivors.where(F.col("size") > 0)
        weeded = having_at_least(
            nonzero, ["size", "__probe"],
            observation=counters.get("weed"), counter_prefix="weed",
        )
        survivors = weeded.unionByName(zero)

    # Stage 3: global digest grouping (A3 + P2).
    dup_members = having_at_least(
        survivors, ["digest"], observation=counters.get("digest"),
        counter_prefix="digest",
    )
    return dup_members.select(id_col, "size", "digest")


def clusters_from_digests(
    dup_members: DataFrame, id_col: str = "url"
) -> DataFrame:
    """O1/O2/O3: cluster assembly.  cluster_id = min(id) within digest
    group (lex-first member is the 'original', ref Common.pm:206-219,
    273); is_canonical marks the cluster minimum (keep-first semantics
    of the delete stage, Common.pm:263-300 — materialized as a column,
    the deletion itself is a MERGE/DELETE against the table, never
    row-at-a-time).

    Join-based, never a digest window (VERDICT r4 #1): a min/rank
    WINDOW partitioned by the digest funnels a degenerate exact
    mega-cluster (10^8 identical boilerplate/empty pages at web scale)
    through ONE task for the sort; groupBy-min gets map-side partial
    aggregation and the join back is AQE-skew-splittable — the same
    shape already proven on the query surface (queries.py
    q_exact_dup_clusters).  `is_canonical = (id == cluster_id)` is
    exactly rank-1 of the old (digest, id-asc) window because
    cluster_id IS the group minimum.  Enforced by the pipeline
    plan-shape test (tests/test_report.py)."""
    mins = dup_members.groupBy("digest").agg(F.min(id_col).alias("cluster_id"))
    cols = dup_members.columns
    return (
        dup_members.join(mins, "digest")
        .withColumn("is_canonical", F.col(id_col) == F.col("cluster_id"))
        .select(*cols, "cluster_id", "is_canonical")
    )


def exact_dup_clusters(
    df: DataFrame, cfg: DedupConfig, id_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """End-to-end exact pipeline: cascade + cluster assembly."""
    return clusters_from_digests(exact_dup_cascade(df, cfg, id_col, text_col), id_col)


def keep_first(
    df: DataFrame, key_cols: list[str], order_col: str, id_col: str = "url"
) -> DataFrame:
    """A5: dedup-by-composite-key, keep-first — the hardlink-prune
    analog (ref toss_out_hardlinks, Common.pm:70-94: keeps the
    asciibetically-first path per (dev,inode)).  Graft form: one row per
    key, earliest order_col wins, id_col as deterministic tiebreak.

    Plan shape: a pure min_by aggregate, NOT a row_number window — the
    aggregate gets map-side partial combine (each map task forwards one
    winner per key), so a degenerate mega-key shuffles one row per map
    partition instead of sorting its whole group in one task (the same
    de-windowing rule as clusters_from_digests above; a rank window
    would be WindowGroupLimit-eligible, but the aggregate needs no sort
    at all).  The (order_col, id_col) ordering struct is unique per row
    whenever id_col is, so the winner is deterministic."""
    return (
        df.groupBy(*key_cols)
        .agg(
            F.min_by(
                F.struct(*[F.col(c) for c in df.columns]),
                F.struct(F.col(order_col), F.col(id_col)),
            ).alias("__w")
        )
        .select("__w.*")
    )
