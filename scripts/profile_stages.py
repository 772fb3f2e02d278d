"""Per-stage wall-clock profile of the near-dup pipeline (guide §1):
runs q_near_dup_clusters-shaped pipelines and prints the runner's
stage metrics, so optimization effort goes to the stage that costs.

Usage: python scripts/profile_stages.py [sf_dir] [--full]
  --full: span stage on (the bench's pipeline_full config)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    full = "--full" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf1.0"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from app_dupfind_spark.config import DedupConfig
    from app_dupfind_spark.operators.dedup_pipeline import near_dup_pipeline
    from app_dupfind_spark.session import get_spark

    spark = get_spark(
        app_name="profile-stages",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    # warmup: one full pass untimed
    for timed in (False, True, True):
        d = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .withColumn("__ord", F.col("doc_id"))
        )
        cfg = (
            DedupConfig(jaccard_threshold=0.7, span_enabled=True)
            if full
            else DedupConfig(jaccard_threshold=0.7, span_enabled=False)
        )
        t0 = time.time()
        clusters, runner = near_dup_pipeline(
            spark, d, cfg, tempfile.mkdtemp(prefix="prof_"),
            id_col="doc_id", text_col="text", order_col="__ord",
            persist_mode="memory", source_fingerprint="profile-fresh",
        )
        clusters.write.format("noop").mode("overwrite").save()
        total = time.time() - t0
        if timed:
            print(json.dumps({
                "total": round(total, 3),
                "stages": [
                    {"stage": m["stage"], "seconds": m["seconds"],
                     "rows_out": m["rows_out"]}
                    for m in runner.metrics
                ],
            }))
    spark.stop()


if __name__ == "__main__":
    main()
