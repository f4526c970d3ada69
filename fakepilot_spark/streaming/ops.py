"""Streaming operators over the ``events`` table (file-source micro-batches).

Both run with ``trigger(availableNow=True)`` in tests so they are
deterministic and comparable 1:1 against their batch equivalents
(:mod:`fakepilot_spark.ops.relational`).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (one file per micro-batch).

    The file source requires a *directory*; the single driver-provided
    parquet file is staged into one via symlink (read-only testdata stays
    untouched).
    """
    import hashlib
    import os
    import tempfile

    stage = os.path.join(
        tempfile.gettempdir(),
        "fps_stream_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8],
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(f"{sf_dir}/events.parquet", link)
    return (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )


def stream_events_hourly(
    spark: SparkSession, sf_dir: str, checkpoint: str, queryName: str = "events_hourly_stream"
):
    """Watermarked tumbling-window aggregation (event-time, late data ≤ 1h
    dropped after the watermark passes). Returns the started query; results
    land in the in-memory sink table ``queryName``."""
    stream = read_events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").start.alias("hour_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("total_value"),
        )
    )
    return (
        agg.writeStream.format("memory")
        .queryName(queryName)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def _running_stats(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    """Custom stateful operator: per-user running event count + value sum.

    State survives across micro-batches — the applyInPandasWithState pattern
    the crawl would use for per-host adaptive politeness online.
    """
    (user_id,) = key
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 2)]}
    )


def stream_user_running_stats(
    spark: SparkSession, sf_dir: str, checkpoint: str, queryName: str = "user_stats_stream"
):
    stream = read_events_stream(spark, sf_dir)
    out = stream.groupBy("user_id").applyInPandasWithState(
        _running_stats,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.format("memory")
        .queryName(queryName)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
