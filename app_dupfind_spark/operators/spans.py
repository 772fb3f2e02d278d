"""Long-shared-span detection (suffix-array substring stage, M5).

For candidate pairs that failed whole-doc similarity but may share a
long verbatim span (quotes, syndicated passages), compute the longest
common substring and keep pairs with LCS >= min_span_chars.

Execution shape: the pair list (small — post-LSH survivors only) joins
each side's text, then a `mapInPandas` computes LCS per Arrow batch.
The per-pair check is inherently algorithmic (not expressible as a
column expression); stdlib difflib's find_longest_match (autojunk off)
is the deterministic kernel — a pydivsufsort-style suffix array drops
in behind the same interface when available.

Scale: this stage NEVER sees the corpus — only verified-candidate
pairs, the reference's "expensive verify last, on the fewest rows"
posture (Common.pm:112-204).  Texts are capped at `max_chars` before
the quadratic kernel.
"""

from __future__ import annotations

from collections.abc import Iterator
from difflib import SequenceMatcher

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StructField,
    StructType,
)

from app_dupfind_spark.config import DedupConfig
from app_dupfind_spark.functions.text import tokens, word_shingles


def span_candidates(
    df: DataFrame,
    cfg: DedupConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int = 100,
) -> DataFrame:
    """Candidate pairs for the span stage: docs sharing at least one
    LONG word shingle (span_shingle_words-gram).

    Guarantee: a shared verbatim span of >= min_span_chars contains a
    full window of span_shingle_words words, so span-sharing pairs
    always co-occur in this index (recall 1.0 without sampling).  With
    span_sample_mod = s > 1 only shingles with xxhash64 % s == 0 enter
    the index — winnowing-style thinning whose miss probability decays
    geometrically in span length (scale path; every config is pinned).

    Boilerplate guard: shingles present in > max_shingle_df docs are
    dropped (a 20-word run shared by hundreds of docs is template text).
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            word_shingles(tokens(F.col(text_col)), cfg.span_shingle_words)
        ).alias("shingle"),
    ).select("id", F.xxhash64("shingle").alias("sh"))
    if cfg.span_sample_mod > 1:
        sh = sh.where(F.pmod(F.col("sh"), F.lit(cfg.span_sample_mod)) == 0)
    sh = sh.distinct()
    dfreq = (
        sh.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
        .where((F.col("df") >= 2) & (F.col("df") <= max_shingle_df))
    )
    keyed = sh.join(dfreq.select("sh"), "sh")
    a = keyed.select("sh", F.col("id").alias("a"))
    b = keyed.select("sh", F.col("id").alias("b"))
    return (
        a.join(b, "sh")
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def _lcs_len(x: str, y: str) -> int:
    m = SequenceMatcher(a=x, b=y, autojunk=False)
    return m.find_longest_match(0, len(x), 0, len(y)).size


def shared_span_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    min_span_chars: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_chars: int = 20_000,
) -> DataFrame:
    """(a, b, lcs_len) for pairs whose longest common substring is at
    least min_span_chars."""
    ta = docs.select(
        F.col(id_col).alias("a"),
        F.substring(F.col(text_col), 1, max_chars).alias("text_a"),
    )
    tb = docs.select(
        F.col(id_col).alias("b"),
        F.substring(F.col(text_col), 1, max_chars).alias("text_b"),
    )
    joined = pairs.select("a", "b").join(ta, "a").join(tb, "b")

    out_schema = StructType(
        [f for f in joined.schema.fields if f.name in ("a", "b")]
        + [StructField("lcs_len", IntegerType())]
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lens = [
                _lcs_len(x or "", y or "")
                for x, y in zip(pdf["text_a"], pdf["text_b"])
            ]
            yield pd.DataFrame(
                {"a": pdf["a"], "b": pdf["b"], "lcs_len": pd.array(lens, dtype="int32")}
            )

    return (
        joined.mapInPandas(compute, out_schema)
        .where(F.col("lcs_len") >= min_span_chars)
    )
