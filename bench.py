"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "docs_per_sec": ..., "cpus": ...}

Every query is forced through the noop datasource sink (full plan
executes JVM-side, nothing collects to the driver).

Scaling evidence (north_rule N vs 4N): scripts/scaling_bench.py runs
this file at two parallelism levels in fresh JVMs.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "exact_dup_clusters",
    "ngram_jaccard_pairs",
    "jaccard_components",
    "near_dup_clusters",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "quality_scores",
    "token_counts",
    "lang_id",
    "doc_fingerprints",
    "embedding_topk",
    "embedding_near_dup",
    "embedding_ann_recall",
    "span_candidate_pairs",
]


def _pipeline_full(spark, sf_dir):
    """Full-config pipeline (span stage ON — the driver suite's
    near_dup_clusters runs NEAR_CFG with spans off; this is the
    every-stage number)."""
    import tempfile

    from pyspark.sql import functions as F

    from app_dupfind_spark.config import DedupConfig
    from app_dupfind_spark.operators.dedup_pipeline import near_dup_pipeline

    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .withColumn("__ord", F.col("doc_id"))
    )
    cfg = DedupConfig(jaccard_threshold=0.7, span_enabled=True)
    clusters, _ = near_dup_pipeline(
        spark, d, cfg, tempfile.mkdtemp(prefix="bench_full_"),
        id_col="doc_id", text_col="text", order_col="__ord",
    )
    return clusters


def run(sf_dir: str, cpus: int, names: list[str] | None = None) -> dict:
    from app_dupfind_spark.queries import QUERIES
    from app_dupfind_spark.session import get_spark

    spark = get_spark(
        app_name="app-dupfind-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    # untimed warmup: exercise codegen, shuffle, window, pandas-UDF and
    # join paths once so the first timed query doesn't pay JVM/JIT cost
    from app_dupfind_spark.config import DedupConfig
    from app_dupfind_spark.operators.minhash_lsh import signatures

    # spread over >=cpus partitions so every per-core python worker
    # pays its one-time numpy/pandas import here, not in a timed query
    warm = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .limit(40 * cpus)
        .repartition(2 * cpus)
    )
    signatures(warm, DedupConfig(), "doc_id", "text").join(
        warm.select("doc_id"), "doc_id"
    ).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in names or (HEADLINE + ["pipeline_full"]):
        fn = _pipeline_full if name == "pipeline_full" else QUERIES[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
    total = round(sum(timings.values()), 3)
    pipeline_t = timings.get("near_dup_clusters")
    out = {
        "metric": "dedup-suite-runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
        "cpus": cpus,
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / pipeline_t, 1) if pipeline_t else None,
    }
    spark.stop()
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    names = sys.argv[1:] or None
    print(json.dumps(run(sf_dir, cpus, names)))


if __name__ == "__main__":
    main()
