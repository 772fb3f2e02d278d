"""Optimization-round measurement harness (guide §1): per-query noop
timing + .explain('formatted') plan capture, WITHOUT touching the
frozen bench.py.

Usage:
  python bench_extra.py [--plans DIR_SUFFIX] [--reps N] [query ...]

Env (same contract as bench.py): SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.

Prints one JSON line {query: {"median": s, "samples": [...]}} and, with
--plans SUFFIX, writes plans/r06/<query>_<SUFFIX>.txt with the
formatted physical plan of each timed query.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    args = sys.argv[1:]
    plans_suffix = None
    reps = 3
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--plans":
            plans_suffix = args[i + 1]
            i += 2
        elif args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import bench
    from app_dupfind_spark.queries import QUERIES
    from app_dupfind_spark.session import get_spark

    spark = get_spark(
        app_name="app-dupfind-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )

    query_names = names or (bench.HEADLINE + ["pipeline_full"])

    # same untimed warmup as bench.py
    from app_dupfind_spark.config import DedupConfig
    from app_dupfind_spark.operators.minhash_lsh import signatures

    warm = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .limit(40 * cpus)
        .repartition(2 * cpus)
    )
    signatures(warm, DedupConfig(), "doc_id", "text").join(
        warm.select("doc_id"), "doc_id"
    ).write.format("noop").mode("overwrite").save()

    plan_dir = Path(__file__).resolve().parent / "plans" / "r06"
    if plans_suffix:
        plan_dir.mkdir(parents=True, exist_ok=True)

    samples: dict[str, list[float]] = {n: [] for n in query_names}
    for rep in range(max(1, reps)):
        for name in query_names:
            fn = (
                bench._pipeline_full
                if name == "pipeline_full"
                else QUERIES[name]
            )
            spark.sparkContext.setJobDescription(f"r06 bench_extra: {name}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples[name].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            if plans_suffix and rep == 0 and name != "pipeline_full":
                # pipeline_full's plan is per-stage (checkpointed);
                # the near_dup_clusters surface covers the same graph
                (plan_dir / f"{name}_{plans_suffix}.txt").write_text(
                    df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"
                    )
                )
    out = {}
    for n, s in samples.items():
        ss = sorted(s)
        out[n] = {"median": ss[len(ss) // 2], "samples": s}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
