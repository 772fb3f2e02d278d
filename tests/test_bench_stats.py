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
