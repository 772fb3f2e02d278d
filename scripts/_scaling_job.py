"""One scaling-bench measurement: run the full near-dup pipeline over a
pre-generated pages parquet at a given parallelism, print JSON.

Invoked by scripts/scaling_bench.py in a fresh JVM per level.
Usage: _scaling_job.py <pages_parquet> <cpus> [persist_mode]
  persist_mode: parquet (durable checkpoints, default) | memory
  (localCheckpoint — isolates executor scaling from the sandbox's
  single-disk checkpoint I/O)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from app_dupfind_spark.config import DedupConfig  # noqa: E402
from app_dupfind_spark.operators.dedup_pipeline import near_dup_pipeline  # noqa: E402
from app_dupfind_spark.operators.minhash_lsh import signatures  # noqa: E402
from app_dupfind_spark.session import get_spark  # noqa: E402


def main() -> None:
    pages_path, cpus = sys.argv[1], int(sys.argv[2])
    persist_mode = sys.argv[3] if len(sys.argv) > 3 else "parquet"
    # Shuffle partitions are DATA-sized, not core-sized, and therefore
    # IDENTICAL at every parallelism level — the north_rule compares
    # the same job at N vs 4N, so the only thing allowed to vary is
    # the core count.  Target ~63k docs/partition (~100-200 MB of
    # signature/pair state): measured on this corpus, 8 partitions
    # leaves cores idle behind stragglers at local[8] (664 s) while 48
    # both smooths skew and gives AQE room to coalesce (571 s), and
    # local[2] is insensitive to the difference.  SPARK_GRAFT_SHUFFLE
    # overrides for experiments.
    import pyarrow.dataset as pads

    # row count from parquet FOOTER metadata only — no column read, no
    # driver materialization, no column-name dependency (ADVICE r3)
    n_rows = sum(
        frag.metadata.num_rows
        for frag in pads.dataset(pages_path, format="parquet").get_fragments()
    )
    shuffle = int(
        os.environ.get(
            "SPARK_GRAFT_SHUFFLE", max(8, min(256, n_rows // 63_000))
        )
    )
    spark = get_spark(
        app_name=f"scaling-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=shuffle,
    )
    pages = spark.read.parquet(pages_path)
    n_docs = pages.count()

    # untimed warmup (codegen/UDF/join paths).  Spread over >=cpus
    # partitions: python workers are per-core and each pays the
    # numpy/pandas import once — warming one partition leaves the other
    # cores cold inside the timed run
    warm = pages.limit(40 * cpus).repartition(2 * cpus)
    signatures(warm, DedupConfig(), "url", "text").write.format(
        "noop"
    ).mode("overwrite").save()

    ckpt = tempfile.mkdtemp(prefix=f"scal{cpus}_")
    t0 = time.time()
    clusters, runner = near_dup_pipeline(
        spark, pages, DedupConfig(), ckpt, persist_mode=persist_mode,
    )
    n_out = clusters.count()
    dt = time.time() - t0
    print(json.dumps({
        "cpus": cpus, "n_docs": n_docs, "rows_out": n_out,
        "sec": round(dt, 3), "docs_per_sec": round(n_docs / dt, 1),
        "persist_mode": persist_mode,
        "stages": {m["stage"]: m["seconds"] for m in runner.metrics},
    }))
    spark.stop()
    # stage checkpoints are ~GB per run at bench scale; leaking one
    # tempdir per rep filled the sandbox disk (round-4 campaign death)
    import shutil

    shutil.rmtree(ckpt, ignore_errors=True)


if __name__ == "__main__":
    main()
