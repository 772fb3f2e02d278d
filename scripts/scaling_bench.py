"""Scaling-efficiency evidence for the north_rule's N vs 4N criterion.

No real cluster exists in this sandbox, so (per BASELINE.md sandbox
protocol) the identical job — the full near-dup pipeline over a
deterministic synthetic corpus (FIXTURES.md 'bench' profile) — runs at
two local parallelism levels, fresh JVM each (subprocess), on the same
input.  Reported: docs/sec at both + efficiency =
(throughput_4N / throughput_N) / 4.

The corpus is sized so the job is compute-bound (signature UDFs, LSH
join, CC) rather than fixed-cost-bound — that is what a 4x-core run
measures on a real cluster at 10^12 docs, where per-stage constants
amortize to zero.

Writes/updates the '## Measured' section of BASELINE.md and prints the
JSON result.

Usage: python scripts/scaling_bench.py [scale=600] [n_small=8]
       [n_large=32] [reps=2]
"""

from __future__ import annotations

import json
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

MARKER = "## Measured (sandbox scaling evidence)"


def generate_corpus(scale: int) -> tuple[str, int]:
    """Deterministic bench corpus (seed=42), written once, read by both
    levels.  Large scales are generated in <=7000-scale CHUNKS (distinct
    seeds, url-prefixed to keep urls unique across chunks): a single
    createDataFrame of millions of driver-side rows thrashes the
    driver heap."""
    from pyspark.sql import functions as F

    from app_dupfind_spark.fixtures import build_corpus, pages_df
    from app_dupfind_spark.session import get_spark

    path = Path(tempfile.gettempdir()) / f"bench_pages_scale{scale}.parquet"
    chunk = 7000
    if path.exists():
        import pyarrow.parquet as pq

        n = pq.ParquetDataset(str(path)).read(columns=["url"]).num_rows
        return str(path), n
    spark = get_spark(app_name="gen-corpus", master="local[8]",
                      shuffle_partitions=8)
    total = 0
    n_chunks = max(1, (scale + chunk - 1) // chunk)
    per = scale // n_chunks
    for i in range(n_chunks):
        corpus = build_corpus(seed=42 + i, scale=per)
        total += len(corpus.rows)
        df = pages_df(spark, corpus)
        if n_chunks > 1:
            df = df.withColumn("url", F.concat(F.lit(f"c{i}~"), F.col("url")))
        df.repartition(32 // n_chunks or 1).write.mode("append").parquet(str(path))
    spark.stop()
    return str(path), total


def _one_run(pages_path: str, cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "_scaling_job.py"),
         pages_path, str(cpus)],
        capture_output=True, text=True, check=True, timeout=10800,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def run_levels_interleaved(
    pages_path: str, n_small: int, n_large: int, reps: int
) -> tuple[dict, dict, dict]:
    """INTERLEAVED level runs (VERDICT r4 #4): each round runs BOTH
    levels back-to-back (order alternating round-to-round), so the
    box's slow co-tenant drift — documented +/-30% across sessions —
    lands on both levels' sample sets instead of biasing whichever
    level ran in the quieter hour (the round-3 0.808 vs round-4 0.611
    discrepancy was exactly cross-session drift).  Per level the
    MINIMUM is the interference-free estimate; per-round paired
    efficiencies expose the spread."""
    samples: dict[int, list[dict]] = {n_small: [], n_large: []}
    for r in range(max(1, reps)):
        order = [n_small, n_large] if r % 2 == 0 else [n_large, n_small]
        for cpus in order:
            res = _one_run(pages_path, cpus)
            samples[cpus].append(res)
            print(
                f"round {r + 1}/{reps} local[{cpus}]: "
                f"{res['sec']}s {res['docs_per_sec']} docs/s",
                file=sys.stderr,
            )
    best = {c: min(rs, key=lambda x: x["sec"]) for c, rs in samples.items()}
    factor = n_large / n_small
    per_round = [
        round(
            (samples[n_large][i]["docs_per_sec"]
             / samples[n_small][i]["docs_per_sec"]) / factor, 3,
        )
        for i in range(len(samples[n_small]))
    ]
    spread = {
        c: [x["sec"] for x in rs] for c, rs in samples.items()
    }
    return best, {"per_round_efficiency": per_round, "sec_samples": spread}, samples


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_large = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    pages_path, n_rows = generate_corpus(scale)

    best, spread, _ = run_levels_interleaved(pages_path, n_small, n_large, reps)
    small, large = best[n_small], best[n_large]
    factor = n_large / n_small
    efficiency = (large["docs_per_sec"] / small["docs_per_sec"]) / factor

    result = {
        "job": "near_dup_clusters full pipeline",
        "corpus": {"scale": scale, "rows": n_rows, "path": pages_path},
        f"local[{n_small}]": small,
        f"local[{n_large}]": large,
        "speedup": round(large["docs_per_sec"] / small["docs_per_sec"], 3),
        "scaling_efficiency": round(efficiency, 3),
        "interleaved": spread,
    }
    print(json.dumps(result))

    sm = ", ".join(f"{s:.0f}" for s in spread["sec_samples"][n_small])
    lg = ", ".join(f"{s:.0f}" for s in spread["sec_samples"][n_large])
    section = f"""{MARKER}

No real cluster exists in this sandbox; per the protocol above, the
identical job (full near-dup pipeline: canon -> exact cascade ->
MinHash signatures -> LSH candidates -> verify -> spans -> CC ->
clusters, all stages checkpointed) ran at two local parallelism levels
in fresh JVMs on the same deterministic synthetic corpus
(fixtures.build_corpus seed=42 scale={scale}, {n_rows} pages).
Levels were INTERLEAVED within one session (each round runs both
levels back-to-back, order alternating), so co-tenant drift lands on
both sample sets; per level the minimum is the interference-free
estimate.

| quantity | local[{n_small}] (N) | local[{n_large}] (4N) |
|---|---|---|
| pipeline wall time (best) | {small['sec']:.2f} s | {large['sec']:.2f} s |
| wall-time samples | {sm} s | {lg} s |
| throughput (best) | {small['docs_per_sec']:.1f} docs/s | {large['docs_per_sec']:.1f} docs/s |

Speedup N->4N: {result['speedup']}x; **scaling efficiency
(throughput_4N / throughput_N) / 4 = {efficiency:.3f}** (best-of-level);
per-round paired efficiencies: {spread['per_round_efficiency']}.

Reproduce: `python scripts/scaling_bench.py {scale} {n_small} {n_large} <reps>`.
"""
    baseline = REPO / "BASELINE.md"
    txt = baseline.read_text()
    if MARKER in txt:
        # replace ONLY the marker section: everything from the marker
        # up to the next heading (## or ###) survives untouched — the
        # historical per-stage/experiment subsections and later
        # round sections live below it
        start = txt.index(MARKER)
        import re as _re

        m = _re.search(r"\n(##+ )", txt[start + len(MARKER):])
        end = start + len(MARKER) + m.start() + 1 if m else len(txt)
        txt = txt[:start] + section.rstrip() + "\n\n" + txt[end:]
    else:
        txt = txt.rstrip() + "\n\n" + section
    baseline.write_text(txt)


if __name__ == "__main__":
    main()
