"""Pure-function checks of the bench variance protocol (no Spark)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import _stats  # noqa: E402


def test_stats_single_sample_degenerates():
    s = _stats([1.5])
    assert s["median"] == 1.5
    assert s["iqr"] == 0.0
    assert s["min"] == s["max"] == 1.5
    assert s["samples"] == [1.5]


def test_stats_median_and_iqr_odd_n():
    # sorted [1, 2, 3, 4, 100]: median 3, q25 = 2, q75 = 4 -> iqr 2
    s = _stats([3.0, 100.0, 1.0, 4.0, 2.0])
    assert s["median"] == 3.0
    assert s["iqr"] == 2.0
    assert s["min"] == 1.0 and s["max"] == 100.0
    assert s["samples"] == [1.0, 2.0, 3.0, 4.0, 100.0]


def test_stats_outlier_robustness():
    # an interleaved-rep spike moves max, not the median
    clean = _stats([1.0, 1.1, 1.2, 1.0, 1.1])
    spiky = _stats([1.0, 1.1, 1.2, 9.0, 1.1])
    assert clean["median"] == 1.1
    assert spiky["median"] == 1.1
    assert spiky["max"] == 9.0


def test_compact_split_fits_driver_tail():
    """VERDICT r4 #2: the driver captures only a 2 kB stdout tail — the
    final bench line must stay under it with BOTH scale points and all
    headline queries, spreads diverted to the sidecar."""
    import json

    import bench

    spread = {
        n: {"median": 12.345, "iqr": 1.234, "min": 11.1, "max": 15.9,
            "samples": [12.3, 12.4, 12.5, 13.0, 11.1]}
        for n in bench.HEADLINE + ["pipeline_full"]
    }
    base = {
        "metric": "dedup-suite-runtime", "value": 123.456, "unit": "sec",
        "queries": {n: s["median"] for n, s in spread.items()},
        "spread": spread, "reps": 5, "sf": "0.1", "cpus": 32,
        "n_docs": 50000, "docs_per_sec": 6723.4,
    }
    base["scale2"] = {
        "sf": "synth50k", "value": 222.333,
        "queries": dict(base["queries"]), "spread": spread, "reps": 2,
        "n_docs": 50000, "docs_per_sec": 5661.2,
    }
    compact, detail = bench.compact_split(base)
    line = json.dumps(compact)
    assert len(line) < 1900, len(line)
    assert "spread" not in compact
    assert "spread" not in compact["scale2"]
    assert compact["queries"] == base["queries"]
    assert compact["scale2"]["queries"] == base["queries"]
    assert detail["spread"] == spread
    assert detail["scale2"]["spread"] == spread
