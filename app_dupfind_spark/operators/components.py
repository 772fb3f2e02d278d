"""Connected components over verified dup pairs — J3 in SURVEY §2.5.

The reference's clusters are single-key equivalence classes (one digest
= one cluster, Common.pm:187) so closure is trivial there; near-dup
pairs form an arbitrary graph and need real CC.

Primary algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — named by the
north_star).  Each round is two DataFrame aggregations + joins; the
edge set converges to a star forest where every node points at its
component minimum.  O(log^2 n) rounds; dup clusters are near-cliques so
it converges in 2–3 rounds in practice.

Also provided: min-label propagation (hash-min), a simpler O(diameter)
algorithm used as a cross-check in tests.

Scale notes:
- A lazy barrier after every round cuts the lineage — iterative
  self-joins otherwise compound the plan exponentially.  The barrier
  strategy is selectable (`barrier_strategy`, plans/barriers.py):
  'local' (default) is fastest but an executor loss mid-CC rewinds the
  whole iterative stage to its input checkpoint; 'reliable' makes each
  ROUND durable, so recovery replays at most one round.
- Fixpoint detection compares the edge multiset via a count+checksum
  aggregate (one cheap job), not exceptAll (a full shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from app_dupfind_spark.plans.barriers import materialize_barrier


def _canonical_edges(pairs: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Undirected edge list, self-loops dropped, (u,v) with u != v."""
    return (
        pairs.select(F.col(a).alias("u"), F.col(b).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect every strictly-larger neighbor to
    min(N(u) ∪ {u})."""
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.withColumn("m", F.least("mn", "u")).select("u", "m")
    # no trailing distinct (r6): every caller feeds this into
    # _small_star, whose first step re-maps to (greatest, least) and
    # dedups — a distinct here was a third Aggregate per round paying
    # plan-time and an exchange for rows the next operator dedups
    # anyway.  (The per-round driver PLANNING cost, ~0.4-0.9 s of the
    # round at the 50k point, scales with operator count — guide §7.3.)
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Direct every edge large->small; for each node u connect u and all
    its smaller neighbors to min(N⁻(u) ∪ {u})."""
    directed = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v")).distinct()
    mins = directed.groupBy("u").agg(F.min("v").alias("m"))
    neigh = directed.join(mins, "u").select(
        F.col("v").alias("n"), F.col("m"), F.col("u")
    )
    selfrows = mins.select(F.col("u").alias("n"), F.col("m"), F.col("u"))
    out = (
        neigh.select("n", "m")
        .unionByName(selfrows.select("n", "m"))
        .where(F.col("n") != F.col("m"))
        .select(F.col("n").alias("u"), F.col("m").alias("v"))
        .distinct()
    )
    return out


def _edge_checksum(edges: DataFrame) -> tuple[int, int, int]:
    """(count, bit_xor of full 64-bit xxhash64(u,v), sum of 40-bit-
    masked hashes) — the fixpoint identity of an edge SET.

    bit_xor over the full hash is commutative and overflow-free under
    ANSI (the input_fingerprint pattern, plans/pipeline.py), closing
    the round-2 defect where a sum-of-masked-hashes collision between
    two consecutive DIFFERENT edge sets would stop CC early with a
    silently wrong clustering; the masked sum stays as an independent
    second channel (a set pair colliding in all three simultaneously
    has no construction short of engineering the hash itself)."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)
        ).alias("xr"),
        # mask to 40 bits before summing: ANSI-safe (no long overflow
        # until ~8M billion rows) while still change-sensitive
        F.coalesce(
            F.sum(F.xxhash64("u", "v").bitwiseAND(F.lit((1 << 40) - 1))), F.lit(0)
        ).alias("chk"),
    ).collect()[0]
    return row["n"], row["xr"], row["chk"]


def connected_components(
    pairs: DataFrame,
    max_iterations: int = 50,
    a: str = "a",
    b: str = "b",
    barrier_strategy: str = "local",
) -> DataFrame:
    """(node, component) for every node appearing in `pairs`; component
    is the minimum node id of the connected component (matching the
    reference's min-member cluster identity, Common.pm:248-251)."""
    # 'persist' KEEPS lineage (barriers.py: "do not use around
    # iterative self-joins") — inside this loop it compounds the plan
    # exponentially, the exact hazard the barrier exists to prevent.  A
    # global barrier_strategy='persist' must not poison CC: downgrade
    # to 'local' for the iterative rounds only (ADVICE r4).
    if barrier_strategy == "persist":
        barrier_strategy = "local"
    # lazy barrier: the checksum action right after it both
    # materializes the barrier and reads the aggregate — ONE Spark
    # job per iteration instead of two (driver job latency is the fixed
    # cost that caps scaling efficiency of the iterative stage)
    edges = materialize_barrier(
        _canonical_edges(pairs, a, b),
        strategy=barrier_strategy, eager=False,
    )
    prev = _edge_checksum(edges)
    for _ in range(max_iterations):
        edges = materialize_barrier(
            _small_star(_large_star(edges)),
            strategy=barrier_strategy, eager=False,
        )
        cur = _edge_checksum(edges)
        if cur == prev:
            break
        prev = cur
    # converged: every edge points node -> component min (or min -> min)
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    return sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("component")).select(
        F.col("u").alias("node"), "component"
    )


def label_propagation_components(
    pairs: DataFrame, max_iterations: int = 50, a: str = "a", b: str = "b"
) -> DataFrame:
    """Cross-check implementation: iterate label(u) = min(label(u),
    min over neighbors' labels) until fixpoint.  O(diameter) rounds."""
    edges = _canonical_edges(pairs, a, b)
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)
    labels = sym.select("u").distinct().withColumn("label", F.col("u"))
    for _ in range(max_iterations):
        neigh = (
            sym.join(labels.withColumnRenamed("u", "v"), "v")
            .groupBy("u")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neigh, "u", "left")
            .select(
                "u",
                F.least(F.col("label"), F.coalesce("nmin", "label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "u")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("u").alias("node"), F.col("label").alias("component"))
