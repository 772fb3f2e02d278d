"""Partitioning probes and guards.

Small local inputs (checkpoint read-backs, tiny parquet) arrive as 1-2
partitions because files pack below `spark.sql.files.maxPartitionBytes`;
an Arrow/pandas or interpreted-HOF stage fed that layout runs on one
core.  The guard repartitions ONLY when under-partitioned — at real
scale inputs always arrive wide and the extra shuffle of wide rows
would be pure waste.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def num_partitions(df: DataFrame) -> int:
    """Physical partition count of a DataFrame WITHOUT building the
    Python-side RDD wrapper (serializer pipeline, javaToPython bridge):
    ask the JVM Dataset's RDD directly.  Triggers physical planning
    (unavoidable — partitioning is a physical property) but no job."""
    try:
        return df._jdf.rdd().getNumPartitions()
    except Exception:  # pragma: no cover - Connect or API drift
        return df.rdd.getNumPartitions()


def ensure_min_partitions(df: DataFrame, target: int, *cols: str) -> DataFrame:
    """Repartition to `target` (hashed on `cols`) iff the current layout
    is below half the target; otherwise pass through untouched."""
    if num_partitions(df) < max(2, target // 2):
        return df.repartition(target, *cols)
    return df
