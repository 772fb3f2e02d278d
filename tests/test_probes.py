"""Probe expressions vs a character-level python oracle implementing
the reference's seek/read semantics
(/root/reference/lib/App/dupfind/Guts/Algorithms.pm:16-160)."""

from __future__ import annotations

from pyspark.sql import functions as F

from app_dupfind_spark.functions import probes

SAMPLES = [
    "",                        # zero size
    "a",                       # size 1
    "ab",
    "abcdefgh",                # < probe width
    "x" * 32,                  # == probe width
    "the quick brown fox jumps over the lazy dog " * 3,
    "🦊 unicode ÷ middle ÷ test " * 5,
]
N = 32


def _oracle(s: str, which: str) -> str | None:
    size = len(s)
    first = s[:N]
    last = s[max(size - N, 0):] if size else ""
    # ref seeks to int(size/2), reads 1 byte (0-based offset)
    mid = s[size // 2: size // 2 + 1]
    if which == "first":
        return first
    if which == "last":
        return last
    if which == "middle":
        return mid
    if which == "middle_last":
        return mid + last
    if which == "first_middle_last":
        # short-input early return (Algorithms.pm:78)
        return first if size <= N else first + mid + last
    if which == "almost_middle":
        # undef when size <= len (Algorithms.pm:145)
        if size <= N:
            return None
        return s[size // 3: size // 3 + N]
    raise AssertionError(which)


def test_all_probes_match_reference_semantics(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], "t string")
    exprs = {
        name: fac(F.col("t"), N).alias(name)
        for name, fac in probes.WEED_PASS_REGISTRY.items()
    }
    rows = df.select("t", *exprs.values()).collect()
    for row in rows:
        for name in probes.WEED_PASS_REGISTRY:
            expected = _oracle(row["t"], name)
            got = row[name]
            # Spark substr returns '' where slicing is empty; oracle too
            assert got == expected, (
                f"probe {name} on {row['t']!r}: got {got!r}, want {expected!r}"
            )


def test_equal_text_implies_equal_probe(spark):
    """Soundness: probes are pure functions of text (the cascade never
    splits true duplicates)."""
    df = spark.createDataFrame(
        [(s,) for s in SAMPLES * 2], "t string"
    )
    for name, fac in probes.WEED_PASS_REGISTRY.items():
        n_texts = df.select("t").distinct().count()
        n_keys = (
            df.select("t", fac(F.col("t"), N).alias("p"))
            .select("t", "p")
            .distinct()
            .count()
        )
        assert n_keys == n_texts, name
