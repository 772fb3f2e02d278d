"""MinHash signatures + LSH banding -> candidate pairs.

The web-scale generalization of the reference's weed stage: a cheap,
recall-preserving prefilter that shrinks the candidate space before the
expensive verifier — same "cheap filters first, drop non-candidates
early" shape as /root/reference/lib/App/dupfind/Guts.pm:100-164, at
10^12-doc scale.

Plan shape:
  pages -> [JVM] normalize/shingle/xxhash64       (one codegen pass)
        -> [Arrow] minhash pandas UDF             (numpy batch math)
        -> [JVM] band hashes (xxhash64 on slices) (one codegen pass)
        -> posexplode -> (band, band_hash) buckets
        -> bucket self-join (a < b) -> distinct candidate pairs

Skew handling (north_rule: "salts skewed LSH buckets"):
- Bucket sizes are measured first (one cheap aggregation).  Buckets
  larger than cfg.lsh_bucket_cap are dropped from pair generation and
  REPORTED (returned as a DataFrame + counted) — at web scale a
  mega-bucket is boilerplate/stop-shingle mass, and m^2 pair explosion
  from one key is precisely the straggler the reference's
  one-group-per-work-item queue suffered from (MapReduce.pm:122-125).
- The surviving bucket join still shuffles on (band, band_hash); AQE
  skew-join splitting handles residual imbalance, and the signature
  table is range-partitioned on the band key to keep bucket rows
  co-located (north_rule: "range-partitions signatures").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from app_dupfind_spark.config import DedupConfig
from app_dupfind_spark.functions.hashing import (
    band_hashes,
    make_minhash_udf,
    make_simhash_udf,
)
from app_dupfind_spark.functions.text import token_hashes, window_hashes
from app_dupfind_spark.plans.barriers import materialize_barrier
from app_dupfind_spark.plans.partitioning import ensure_min_partitions


def signatures(
    df: DataFrame,
    cfg: DedupConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
    with_simhash: bool = True,
) -> DataFrame:
    """(id, n_shingles, minhash:array<long>, simhash:long).

    Docs with < k tokens get NULL signatures — they cannot be shingled
    and ride the exact-only path (the reference's zero-size bypass
    precedent, Common.pm:100,107).
    """
    # Parallelism guard: the Arrow/pandas stage must not run on one
    # core when a checkpoint read-back arrives narrow (see
    # plans.partitioning).
    df = ensure_min_partitions(df, cfg.shuffle_partitions, id_col)
    minhash_udf = make_minhash_udf(cfg)
    # two-step projection: token hashes bound as a real column FIRST,
    # windows second (see window_hashes PERF CONTRACT)
    hashed = df.select(
        F.col(id_col), token_hashes(F.col(text_col)).alias("__th")
    ).select(
        id_col,
        window_hashes(F.col("__th"), cfg.shingle_k).alias("sh_hashes"),
    )
    out = hashed.select(
        id_col,
        F.size("sh_hashes").alias("n_shingles"),
        minhash_udf("sh_hashes").alias("minhash"),
        *( [make_simhash_udf(cfg)("sh_hashes").alias("simhash")] if with_simhash else [] ),
    )
    return out


def band_buckets(sigs: DataFrame, cfg: DedupConfig, id_col: str = "doc_id") -> DataFrame:
    """Explode signatures into (id, band, band_hash) bucket membership."""
    banded = sigs.where(F.col("minhash").isNotNull()).select(
        id_col,
        F.posexplode(band_hashes(F.col("minhash"), cfg.lsh_bands, cfg.lsh_rows)).alias(
            "band", "band_hash"
        ),
    )
    return banded


def candidate_pairs(
    sigs: DataFrame,
    cfg: DedupConfig,
    id_col: str = "doc_id",
    materialize: bool = True,
    sigs_materialized: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """LSH candidate pairs (a, b, n_bands) with a < b, plus the skew
    report (band, band_hash, bucket_size) of truncated buckets.

    J1 in SURVEY §2.5: same-key self-pairing, the grouping-as-join
    pattern the reference uses everywhere (A1–A3).

    Plan shape: bucket sizes come from a partial-aggregated
    groupBy-count + join back on (band, band_hash), never a count
    WINDOW (r5, closing the last mega-group-keyed window on a default
    path): a boilerplate mega-bucket — 10^8 docs sharing every band
    hash at web scale — would route through ONE window partition of
    one task just to learn the size that disqualifies it, while the
    aggregate gets map-side combine and the equi-join is
    AQE-skew-splittable.  Both the aggregate and the probe side read
    the (materialized) signature table, so the Arrow/pandas UDF still
    evaluates once; the sized membership is then localCheckpoint'ed
    (when `materialize`) because the self-join fans the DAG out again.
    (The pipeline runner's parquet checkpoints play this role across
    stages; this covers standalone use.)  AQE's skew-join splitting
    handles residual imbalance above the explicit bucket cap.
    """
    if materialize and not sigs_materialized:
        # bind the UDF-produced signature column behind a barrier: the
        # band explode references it once per band and measured a 30x
        # re-evaluation penalty when fed the raw UDF plan.  Callers
        # whose sigs already sit behind a stage checkpoint pass
        # sigs_materialized=True and skip this duplicate barrier.
        sigs = materialize_barrier(sigs, cfg)
    buckets = band_buckets(sigs, cfg, id_col)

    sizes = buckets.groupBy("band", "band_hash").agg(
        F.count(F.lit(1)).alias("bucket_size")
    )
    member = buckets.join(
        sizes.where(
            (F.col("bucket_size") >= 2)
            & (F.col("bucket_size") <= cfg.lsh_bucket_cap)
        ),
        ["band", "band_hash"],
    ).select("band", "band_hash", id_col, "bucket_size")
    if materialize:
        member = materialize_barrier(member, cfg)

    skew_report = sizes.where(F.col("bucket_size") > cfg.lsh_bucket_cap)

    # SALTED bucket self-join (north_rule), ADAPTIVE: each member gets
    # a salt g = xxhash64(id) mod G_b where G_b grows with ITS bucket's
    # size (1 for ordinary buckets — zero replication overhead — up to
    # cfg.salt_buckets for buckets near the cap).  The left side is
    # replicated to every block g' >= g and the join key includes the
    # block, so one big bucket's quadratic pair enumeration spreads
    # over G_b(G_b+1)/2 independent tasks instead of one straggler
    # (the reference's one-group-per-work-item pitfall,
    # MapReduce.pm:122-125).  Typical dup buckets (2-5 docs) pay
    # nothing; only genuinely hot buckets fan out.
    Gmax = max(1, cfg.salt_buckets)
    g_b = F.least(
        F.greatest((F.col("bucket_size") / 256).cast("int"), F.lit(1)),
        F.lit(Gmax),
    )
    salted = member.withColumn("G", g_b).withColumn(
        "g", F.pmod(F.xxhash64(F.col(id_col)), F.col("G")).cast("int")
    )
    a = salted.select(
        "band",
        "band_hash",
        F.col(id_col).alias("a"),
        F.explode(F.sequence(F.col("g"), F.col("G") - 1)).alias("blk"),
    )
    b = salted.select(
        "band", "band_hash", F.col(id_col).alias("b"), F.col("g").alias("blk")
    )
    # normalize to unordered (least, greatest) — the pair surfaces from
    # whichever side's salt is smaller, in either id order — and dedup
    # per band (same-salt pairs appear twice per band)
    pairs = (
        a.join(b, ["band", "band_hash", "blk"])
        .where(F.col("a") != F.col("b"))
        .select(
            "band",
            F.least("a", "b").alias("a"),
            F.greatest("a", "b").alias("b"),
        )
        .dropDuplicates(["a", "b", "band"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )
    return pairs, skew_report
