"""Streaming gate: streaming results must equal their batch equivalents."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def sf_dir():
    return "/root/testdata/sf0.001"


def test_windowed_agg_matches_batch(spark, sf_dir, tmp_path_factory):
    from fakepilot_spark.ops.relational import q_events_hourly
    from fakepilot_spark.streaming import stream_events_hourly

    ckpt = tmp_path_factory.mktemp("stream_ckpt")
    q = stream_events_hourly(spark, sf_dir, str(ckpt), queryName="t_hourly")
    q.awaitTermination(120)
    got = {
        (r["hour_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("select * from t_hourly").collect()
    }
    want = {
        (r["hour_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in q_events_hourly(spark, sf_dir).collect()
    }
    assert got == want


def test_stateful_running_stats(spark, sf_dir, tmp_path_factory):
    import pyspark.sql.functions as F

    from fakepilot_spark.streaming import stream_user_running_stats

    ckpt = tmp_path_factory.mktemp("stream_state_ckpt")
    q = stream_user_running_stats(spark, sf_dir, str(ckpt), queryName="t_users")
    q.awaitTermination(120)
    # update-mode memory sink: the LAST row per user is the final state
    got_rows = spark.sql("select * from t_users").collect()
    final = {}
    for r in got_rows:
        final[r["user_id"]] = (r["n_events"], r["total_value"])
    want = {
        r["user_id"]: (r["n"], round(r["t"], 2))
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert set(final) == set(want)
    for user_id, (n, _total) in final.items():
        assert n == want[user_id][0]


def test_stream_event_dedup_survives_batch_boundaries(spark, sf_dir):
    """The planted duplicate copies arrive in different micro-batches than
    their originals; the deduped output must equal the original table
    exactly (the streaming analogue of the crawl URL-seen gate)."""
    import hashlib
    import os
    import tempfile

    from fakepilot_spark.streaming.ops import q_stream_event_dedup

    out = q_stream_event_dedup(spark, sf_dir)
    base = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_base = base.count()
    assert out.count() == n_base
    assert out.select("event_id").distinct().count() == n_base

    # the staged input really contains cross-file duplicates: the copies
    # were appended as separate files, so staged rows > original rows.
    # Recompute the op's content-keyed stage path (other sf_dirs may have
    # their own stage dirs in tempdir — never glob).
    src = os.path.join(sf_dir, "events.parquet")
    st = os.stat(src)
    key = hashlib.md5(
        f"dedup:{src}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:12]
    stage = os.path.join(tempfile.gettempdir(), "fps_sdedup_" + key)
    assert os.path.exists(os.path.join(stage, "_FPS_STAGED")), "stage dir missing"
    staged = spark.read.parquet(stage)
    n_dups = base.filter("event_id % 7 = 0").count()
    assert n_dups > 0
    assert staged.count() == n_base + n_dups
