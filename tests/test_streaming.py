"""Streaming exact-dedup: file source -> watermarked digest dedup ->
parquet sink, drained with availableNow."""

from __future__ import annotations

from datetime import datetime, timezone


def test_stream_dedup_drains_and_dedups(spark, tmp_path):
    from app_dupfind_spark.streaming.stream_dedup import run_file_stream

    t = datetime(2024, 1, 1, tzinfo=timezone.utc)
    rows = [
        ("u1", t, b"", "same text " * 10, "en"),
        ("u2", t, b"", "same text " * 10, "en"),   # exact dup of u1
        ("u3", t, b"", "other text " * 10, "en"),
        ("u4", t, b"", None, "en"),                 # null text dropped
    ]
    src = tmp_path / "src"
    spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, text string, lang string",
    ).write.parquet(str(src))

    q = run_file_stream(
        spark, str(src), str(tmp_path / "out"), str(tmp_path / "ck")
    )
    q.awaitTermination(120)

    out = spark.read.parquet(str(tmp_path / "out"))
    digests = [r["digest"] for r in out.collect()]
    assert len(digests) == 2            # one per distinct content
    assert len(set(digests)) == 2
