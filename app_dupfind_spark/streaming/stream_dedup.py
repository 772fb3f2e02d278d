"""Structured Streaming variant of the exact-dedup stage.

The reference is strictly batch (a directory scan with a beginning and
an end — SURVEY §1.2), so streaming is a graft extension, not parity:
a continuously-arriving pages stream (e.g. a crawl frontier) is
de-duplicated online against itself within a watermark window.

Semantics: emit each page once per (digest) within the watermark —
`dropDuplicatesWithinWatermark` keeps state bounded (old digests age
out), which is the only sane contract at an unbounded 10^12-doc scale;
global exactly-once digest dedup belongs to the batch pipeline.

Full near-dup (MinHash/LSH) online would need a stateful
applyInPandasWithState bucket store; the exact stage is the streaming
cut-point the cascade design gives for free (cheap filters first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from app_dupfind_spark.operators.exact import text_digest


def dedup_stream(
    pages_stream: DataFrame,
    watermark: str = "1 hour",
    ts_col: str = "warc_ts",
    text_col: str = "text",
) -> DataFrame:
    """streaming DataFrame -> streaming DataFrame with exactly one row
    per content digest within the watermark horizon."""
    return (
        pages_stream.where(F.col(text_col).isNotNull())
        .withColumn("digest", text_digest(text_col))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["digest"])
    )


def run_file_stream(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema: str = (
        "url string, warc_ts timestamp, html binary, text string, lang string"
    ),
    watermark: str = "1 hour",
):
    """File-source -> parquet-sink wiring with availableNow trigger
    (drains what exists, then stops — the testable entry point)."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    deduped = dedup_stream(stream, watermark)
    return (
        deduped.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
